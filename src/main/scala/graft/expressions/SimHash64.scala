package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in ONE pass: each token is xxhash64'd
  * once (seed 42 — byte-identical to `functions.xxhash64`) and votes on
  * all 64 bit positions; bit j of the result is set iff the +1/−1 vote
  * sum at position j is positive.
  *
  * Replaces the 64 per-bit `aggregate(...)` higher-order folds of the
  * original q47 formulation, which re-hashed EVERY token once per bit —
  * 64× the hashing, each through an interpreted lambda (13.8 s of the
  * sf0.1 bench once the bench stopped letting Catalyst prune it). Bit
  * parity with that formulation is pinned in ExpressionParitySpec.
  *
  * Null array → null (standard propagation); null elements hash to the
  * seed, matching `xxhash64`'s null behavior in the fold.
  *
  * CodegenFallback is deliberate (same stance as ShingleHashes): one
  * virtual call per ROW with a native loop inside — codegen would buy
  * nothing.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val m = ws.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h =
        if (ws.isNullAt(i)) 42L
        else XxHash64Function.hash(ws.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)

  override def prettyName: String = "simhash64"
}
