package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** LSH band keys from a MinHash signature: output[b] is the xxhash64 fold
  * (seed 42, then sequential — the same fold `xxhash64(c1..c4)` performs)
  * of signature rows `[b*rowsPerBand, (b+1)*rowsPerBand)`.
  *
  * Collapses a 32-branch `array(struct(xxhash64(element_at×4))...)`
  * expression tree into one per-row pass: identical bucketing power, a
  * fraction of the analysis/codegen surface. Pairs with
  * `posexplode` — the position IS the band id.
  */
case class BandHashes(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_hashes needs array<bigint>, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    require(sig.numElements() >= numBands * rowsPerBand,
      s"signature has ${sig.numElements()} slots, need ${numBands * rowsPerBand}")
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var acc = 42L // xxhash64's default seed
      var r = 0
      while (r < rowsPerBand) {
        acc = XxHash64Function.hash(sig.getLong(b * rowsPerBand + r), LongType, acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): BandHashes =
    copy(child = c)

  override def prettyName: String = "band_hashes"
}
