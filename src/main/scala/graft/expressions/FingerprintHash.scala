package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint of a string in one native pass:
  * h = fold over code points of (h * 31 + cp) mod 1e9+7.
  *
  * Replaces the `aggregate(filter(split(text, "")), ...)` higher-order
  * fold (one interpreted lambda call — and one single-char UTF8String
  * allocation — per character). Code-point iteration matches the
  * split-on-""/ascii() formulation exactly on BMP text, and every step
  * stays below 2^63 so the arithmetic is portable to overflow-checked
  * engines — the same contract as the fold it replaces (bit parity
  * pinned in ExpressionParitySpec; the DuckDB oracle is unchanged).
  */
case class FingerprintHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val Mod = 1000000007L

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fingerprint_hash needs string, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  override protected def withNewChildInternal(c: Expression): FingerprintHash =
    copy(child = c)

  override def prettyName: String = "fingerprint_hash"
}
