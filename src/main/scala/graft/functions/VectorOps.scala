package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, built entirely from
  * codegen'd higher-order functions — no UDFs, no per-row JVM closures.
  *
  * Determinism contract: `dot` folds elements sequentially
  * (index 1..n, left-to-right) with a double accumulator. A float*float
  * product is exact in double, and a fixed summation order makes the result
  * bit-identical across engines that fold in the same order — which is what
  * lets similarity queries hash-match a DuckDB `list_reduce` oracle.
  *
  * At 100 TB scale these are per-row expressions (no shuffle); the pair
  * generation around them (join strategy, LSH bucketing) is where scale is
  * won — see operators/Similarity.scala and operators/Dedup.scala.
  */
object VectorOps {

  /** Sequential-fold dot product of two equal-length float/double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; both norms assumed nonzero. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
