package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * multilingual-pipeline primitive every hash-keyed stage silently
  * assumes: "café" arrives from real crawls BOTH composed (é = U+00E9)
  * and decomposed (e + U+0301), byte-distinct but canonically equal, so
  * un-normalized corpora leak duplicates straight past content-hash
  * dedup (q42/q174), shingle hashing (q46/q58/q158), and every md5 gate.
  * Normalize-then-hash is the published discipline (UAX #15; every
  * production text pipeline NFCs or NFKCs before fingerprinting).
  *
  * Spark ships no normalization function; a Scala UDF would serialize a
  * closure and break codegen. This is the (b)-tier answer from the
  * design notes: a real `doGenCode` that emits a static call, keeping
  * the whole-stage pipeline fused. The hot path is the ASCII/NFC fast
  * check (`Normalizer.isNormalized` — a table lookup scan, no
  * allocation) since real corpora are mostly already NFC; only
  * denormalized rows pay the compose.
  *
  * Cross-engine: DuckDB's `nfc_normalize` (utf8proc) and Java's
  * `java.text.Normalizer` implement the same UAX #15 algorithm over the
  * same canonical-composition data, so q182 hash-matches byte-level.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize needs string, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Static entry shared by eval and generated code. Returns the INPUT
    * object unchanged when it is already NFC (the common case) — zero
    * allocation on the fast path.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
