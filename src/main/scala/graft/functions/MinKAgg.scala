package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded DISTINCT min-k over BIGINTs — the synopsis builder of the
  * KMV/theta distinct sketch (q203).
  *
  * Why not TopKAgg with score = -h: the sketch hashes are 60-bit
  * integers and a Double mantissa holds 53 — near the k-th-smallest
  * threshold (~k·2^60/n) two distinct hashes can collapse to one score
  * and the synopsis silently picks the wrong member. This aggregator
  * orders on the Long itself, exact at any width.
  *
  * Semantics: the k smallest DISTINCT values. Dedup lives inside the
  * buffer, which is what makes min-k idempotent over a multiset — the
  * caller can feed the RAW token stream (no distinct shuffle first) and
  * the synopsis equals the one over the set; that idempotence is the
  * whole 100 TB story (map-side partials carry ≤ k longs, the exchange
  * carries ≤ k per partition, and re-delivered stream rows are free).
  * Commutative + associative + idempotent ⇒ equally valid as a batch
  * partial agg and a streaming complete-mode aggregate.
  */
class MinKAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  require(k > 0, "minK needs k > 0")

  private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(acc: Seq[Long], a: Long): Seq[Long] =
    // cheap reject: full buffer and no better than the current ceiling
    if (acc.length >= k && a >= acc.last) acc
    else trim(acc :+ a)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)

  override def finish(acc: Seq[Long]): Seq[Long] = trim(acc)

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
