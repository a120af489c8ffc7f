package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation: the partial-aggregating replacement for
  * `row_number().over(Window.partitionBy(...)).filter(rank <= k)`.
  *
  * A rank window shuffles EVERY scored row to the group's reducer and
  * sorts there; this Aggregator keeps at most k candidates in its buffer,
  * so the map-side partials already carry ≤ k rows per (group, partition)
  * into the exchange — at 100 TB the difference between shuffling the
  * corpus and shuffling k·partitions rows. Ordering is (score DESC,
  * id ASC), the same deterministic tie-break the window form used.
  *
  * The buffer is product-encoded (Tungsten rows), not Kryo — same stance
  * as TagSetAgg.
  */
case class Scored(score: Double, id: Long)

class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(e => (-e.score, e.id)).take(k)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(acc: Seq[Scored], a: Scored): Seq[Scored] =
    // cheap reject before the sort: full buffer + worse than the floor
    if (acc.length >= k && {
      val floor = acc.last
      a.score < floor.score || (a.score == floor.score && a.id > floor.id)
    }) acc
    else trim(acc :+ a)

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    trim(x ++ y)

  override def finish(acc: Seq[Scored]): Seq[Scored] = trim(acc)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
