package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash in ONE pass, over either of two inputs:
  *
  *  - `array<string>` — each token is xxhash64'd once (seed 42 —
  *    byte-identical to `functions.xxhash64`); the fast tier when no
  *    cross-engine mirror is needed;
  *  - `array<bigint>` — PRE-HASHED tokens vote directly: the caller
  *    picks a hash both engines can compute (TextOps.simhashMd5 feeds
  *    the first 15 md5 hex chars as a BIGINT — a 60-bit hash), which is
  *    what makes q47 fully DuckDB-oracle-able.
  *
  * Each hash votes on all 64 bit positions; bit j of the result is set
  * iff the +1/−1 vote sum at position j is positive (hashes below 2⁶⁰
  * therefore always produce zero top bits — the 60-bit measure is
  * defined, not truncated).
  *
  * Replaces the 64 per-bit `aggregate(...)` higher-order folds of the
  * original q47 formulation, which re-hashed EVERY token once per bit —
  * 64× the hashing, each through an interpreted lambda (13.8 s of the
  * sf0.1 bench once the bench stopped letting Catalyst prune it). Bit
  * parity with that formulation is pinned in ExpressionParitySpec.
  *
  * Null array → null (standard propagation); null string elements hash
  * to the seed (matching `xxhash64`'s null behavior in the fold); null
  * long elements vote as 0.
  *
  * CodegenFallback is deliberate (same stance as ShingleHashes): one
  * virtual call per ROW with a native loop inside — codegen would buy
  * nothing.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  // lazy val, not def: this expression is CodegenFallback, so eval runs
  // per row — the dataType match must not
  private lazy val preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string> or array<bigint>, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val m = ws.numElements()
    val long = preHashed
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h =
        if (long) { if (ws.isNullAt(i)) 0L else ws.getLong(i) }
        else if (ws.isNullAt(i)) 42L
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
