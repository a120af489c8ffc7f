package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** n-word-shingle hashes of a token array, in one native pass.
  *
  * Output element i is `xxhash64("w_i w_{i+1} … w_{i+n-1}")` (space-joined,
  * default seed 42 — byte-identical to
  * `xxhash64(concat_ws(" ", …))` on the same tokens). With
  * `distinct = true` (the default, and the MinHash/Jaccard input shape)
  * hashes are deduplicated in first-occurrence order; with
  * `distinct = false` every position keeps its hash, in positional order —
  * the shape span-level analyses (q90 duplicated-span fraction) need,
  * where multiplicity IS the signal.
  *
  * Replaces the `array_distinct(transform(sequence(...), i ->
  * concat_ws(...)))` higher-order pipeline, which paid an interpreted
  * lambda eval per shingle and dominated MinHash dedup (~4.5 s of shingle
  * building at sf0.1 vs milliseconds here). Downstream consumers (MinHash
  * signatures, candidate-pair Jaccard verification) only ever need shingle
  * identity, not shingle text, and 64-bit hash identity preserves Jaccard
  * up to a ~2^-64 per-pair collision chance — irrelevant at the τ=0.5
  * decision boundary with true pairs at J≥0.9.
  *
  * CodegenFallback is deliberate: one virtual call per ROW with a native
  * loop inside (not per element), so codegen would buy nothing.
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes needs array<string>, got ${dt.sql}")
    }

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val m = ws.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val gram = new Array[UTF8String](n)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i <= m - n) {
        var j = 0
        while (j < n) { gram(j) = ws.getUTF8String(i + j); j += 1 }
        val s = UTF8String.concatWs(sep, gram: _*)
        seen.add(XxHash64Function.hash(s, StringType, 42L))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](m - n + 1)
      var i = 0
      while (i <= m - n) {
        var j = 0
        while (j < n) { gram(j) = ws.getUTF8String(i + j); j += 1 }
        val s = UTF8String.concatWs(sep, gram: _*)
        out(i) = XxHash64Function.hash(s, StringType, 42L)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)

  override def prettyName: String = "shingle_hashes"
}
