package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

import graft.streaming.AnsModel.Tag

/** Custom typed UDAF: tag-set accumulation across revisions — the fold of
  * idempotent appends the reference performs one PUT at a time
  * (`tag.py:37-44` accumulated over a document's event history), as a
  * distributive aggregate (SURVEY.md §2.11: "the one custom UDAF worth
  * writing").
  *
  * Merge-safe by construction (duplicate-free union is associative +
  * commutative + idempotent), so Spark can partial-aggregate map-side and
  * merge across partitions in any order — the aggregation itself carries
  * the redelivery tolerance. Output is sorted for cross-engine
  * determinism.
  *
  * The buffer is a duplicate-free `Seq[Tag]` under the PRODUCT encoder —
  * Tungsten rows of (slug, text) pairs — not `Encoders.kryo[Set[Tag]]`:
  * the Kryo buffer serialized the whole set through reflective Java
  * object graphs on every partial-merge exchange, which dominated q57's
  * runtime; the product encoding is columnar, codegen-written, and
  * spill-friendly. Set semantics are preserved by inserting only absent
  * tags (tag sets are small — linear probes beat hash overhead here).
  *
  * Register with `udaf(TagSetAgg)` or use via
  * `df.as[Tag].groupByKey(...).agg(TagSetAgg.toColumn)`.
  */
object TagSetAgg extends org.apache.spark.sql.expressions.Aggregator[Tag, Seq[Tag], String] {

  override def zero: Seq[Tag] = Seq.empty

  override def reduce(acc: Seq[Tag], t: Tag): Seq[Tag] =
    if (acc.contains(t)) acc else acc :+ t

  override def merge(a: Seq[Tag], b: Seq[Tag]): Seq[Tag] =
    a ++ b.filterNot(a.contains)

  /** Deterministic presentation: sorted "slug|text" pairs, comma-joined
    * (a flat string keeps the oracle compare type-trivial).
    */
  override def finish(acc: Seq[Tag]): String =
    acc.map(t => s"${t.slug}|${t.text}").sorted.mkString(",")

  override def bufferEncoder: Encoder[Seq[Tag]] = ExpressionEncoder()

  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Adapt the aggregator to any input type via a tag extractor (the
    * Dataset.agg API takes an Aggregator over the row type).
    */
  def on[I](f: I => Tag): org.apache.spark.sql.expressions.Aggregator[I, Seq[Tag], String] =
    new org.apache.spark.sql.expressions.Aggregator[I, Seq[Tag], String] {
      override def zero: Seq[Tag] = TagSetAgg.zero
      override def reduce(acc: Seq[Tag], i: I): Seq[Tag] =
        TagSetAgg.reduce(acc, f(i))
      override def merge(a: Seq[Tag], b: Seq[Tag]): Seq[Tag] =
        TagSetAgg.merge(a, b)
      override def finish(acc: Seq[Tag]): String = TagSetAgg.finish(acc)
      override def bufferEncoder: Encoder[Seq[Tag]] = TagSetAgg.bufferEncoder
      override def outputEncoder: Encoder[String] = TagSetAgg.outputEncoder
    }
}
