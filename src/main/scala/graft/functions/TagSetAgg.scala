package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.streaming.AnsModel.Tag

/** Custom typed UDAF: tag-set accumulation across revisions — the fold of
  * idempotent appends the reference performs one PUT at a time
  * (`tag.py:37-44` accumulated over a document's event history), as a
  * distributive aggregate (SURVEY.md §2.11: "the one custom UDAF worth
  * writing").
  *
  * Merge-safe by construction (set union is associative + commutative +
  * idempotent), so Spark can partial-aggregate map-side and merge across
  * partitions in any order — the aggregation itself carries the
  * redelivery tolerance. Output is sorted for cross-engine determinism.
  *
  * Register with `udaf(TagSetAgg)` or use via
  * `df.as[Tag].groupByKey(...).agg(TagSetAgg.toColumn)`.
  */
object TagSetAgg extends Aggregator[Tag, Set[Tag], String] {

  override def zero: Set[Tag] = Set.empty

  override def reduce(acc: Set[Tag], t: Tag): Set[Tag] = acc + t

  override def merge(a: Set[Tag], b: Set[Tag]): Set[Tag] = a union b

  /** Deterministic presentation: sorted "slug|text" pairs, comma-joined
    * (a flat string keeps the oracle compare type-trivial).
    */
  override def finish(acc: Set[Tag]): String =
    acc.toSeq.map(t => s"${t.slug}|${t.text}").sorted.mkString(",")

  override def bufferEncoder: Encoder[Set[Tag]] = Encoders.kryo[Set[Tag]]

  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Adapt the aggregator to any input type via a tag extractor (the
    * Dataset.agg API takes an Aggregator over the row type).
    */
  def on[I](f: I => Tag): Aggregator[I, Set[Tag], String] =
    new Aggregator[I, Set[Tag], String] {
      override def zero: Set[Tag] = TagSetAgg.zero
      override def reduce(acc: Set[Tag], i: I): Set[Tag] =
        TagSetAgg.reduce(acc, f(i))
      override def merge(a: Set[Tag], b: Set[Tag]): Set[Tag] =
        TagSetAgg.merge(a, b)
      override def finish(acc: Set[Tag]): String = TagSetAgg.finish(acc)
      override def bufferEncoder: Encoder[Set[Tag]] = TagSetAgg.bufferEncoder
      override def outputEncoder: Encoder[String] = TagSetAgg.outputEncoder
    }
}
