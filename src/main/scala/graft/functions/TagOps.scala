package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's core transform: idempotent array append.
  *
  * Models `tag.py:31-46` of the reference (`modify_ans`): append a tag to
  * `ans.taxonomy.tags` only if not already present, creating the array when
  * the document has no taxonomy / no tags yet. We implement the *intended*
  * semantics (reference `README.md:241`), not the reference's KeyError bug
  * on a missing taxonomy (SURVEY.md §0).
  *
  * Idempotence (`f(f(x)) == f(x)`) is what makes the downstream upsert sink
  * safe under at-least-once redelivery — checked by scalacheck property
  * tests.
  */
object TagOps {

  /** Append `tag` to array column `tags` iff absent; null/missing array
    * initializes to `[tag]` (the fixed `tag.py:33-35,41-42` semantics).
    * Preserves existing element order and duplicates (unlike
    * `array_union`, which would also dedupe pre-existing elements).
    */
  def appendIfAbsent(tags: Column, tag: Column): Column =
    when(tags.isNull, array(tag))
      .when(array_contains(tags, tag), tags)
      .otherwise(concat(tags, array(tag)))

  /** Derive a slug from tag text: `"kinesis autotag"` -> `"kinesis-autotag"`
    * (shape of the constant pair at `tag.py:60-61`).
    */
  def slugify(text: Column): Column =
    regexp_replace(lower(text), " ", "-")

  /** Open-schema tag append over a RAW ANS JSON column — the byte-
    * preserving splice ([[graft.streaming.RawAns]], `tag.py:64`'s
    * "modify only what you understand, preserve the rest") as a fused
    * codegen expression. The tag is a construction-time constant, like
    * the reference's (`tag.py:59-62`).
    */
  def appendTagRaw(json: Column, slug: String, text: String): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.expressions.JsonTagAppend(toExpression(json), slug, text))
  }

  /** Per-document schema-drift profile: array of `path<U+0001>type`
    * entries for every top-level member and one nested level
    * ([[graft.expressions.JsonSchemaProfile]] — the MEASUREMENT leg of
    * the open-schema discipline).
    */
  def schemaProfile(json: Column): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.expressions.JsonSchemaProfile(toExpression(json)))
  }
}
