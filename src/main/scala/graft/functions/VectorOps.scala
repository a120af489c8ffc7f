package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

import graft.expressions.VecDot

/** Embedding-vector math over `array<float>` columns.
  *
  * Determinism contract: `dot` accumulates elements sequentially
  * (left-to-right) into a double accumulator, widening each float to
  * double first. A float*float product is exact in double, and a fixed
  * summation order makes the result bit-identical across engines that
  * fold in the same order — which is what lets similarity queries
  * hash-match a DuckDB `list_reduce` oracle.
  *
  * `dot` is a custom codegen'd Catalyst expression ([[VecDot]]): the same
  * fold as `aggregate(zip_with(...))` but compiled to a scalar loop
  * instead of one interpreted lambda call per element (the HOF form was
  * ~70% of bench time in the all-pairs queries).
  *
  * At 100 TB scale these are per-row expressions (no shuffle); the pair
  * generation around them (join strategy, LSH bucketing) is where scale is
  * won — see operators/Similarity.scala and operators/Dedup.scala.
  */
object VectorOps {

  /** Sequential-fold dot product of two equal-length float/double arrays. */
  def dot(a: Column, b: Column): Column =
    toColumn(VecDot(toExpression(a), toExpression(b)))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; both norms assumed nonzero. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
