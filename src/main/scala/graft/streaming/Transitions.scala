package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch transition matrix (q115): per-user
  * "previous event type" kept in `GroupState`, one `(prev, next)` pair
  * emitted per consumed event — the downstream count-by-pair is then the
  * SAME partial aggregation the batch form plans (SURVEY.md §2.9
  * batch≡stream unification; StreamingSpec asserts pair-count equality
  * against q115 on bounded data).
  *
  * Ordering discipline: within a micro-batch the group's iterator is
  * sorted by event_id (the unique, time-correlated key the batch window
  * orders by); ACROSS batches the state carries the last seen event_id
  * and anything older is dropped as late — the same late-data posture as
  * the watermarked windows, made explicit because lag() has no watermark
  * to lean on.
  *
  * Scale: state is ONE record per user (two fields), independent of
  * stream length — the minimal sessionless journey state; with `stateTtl`
  * set, idle users expire and their next event emits no pair (a journey
  * restart), bounding state to the active-user set.
  */
object Transitions {

  case class Ev(user_id: Long, event_id: Long, event_type: String)
  case class Pair(user_id: Long, prev_type: String, next_type: String)
  case class Last(event_id: Long, event_type: String)

  private[streaming] def advance(ttl: Option[String])(
      key: Long, events: Iterator[Ev],
      state: GroupState[Last]): Iterator[Pair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val ordered = events.toVector.sortBy(_.event_id)
    val init = state.getOption
    val (last, out) =
      ordered.foldLeft((init, Vector.empty[Pair])) {
        case ((prev, acc), e) =>
          prev match {
            case Some(p) if e.event_id <= p.event_id => (prev, acc) // late
            case Some(p) =>
              (Some(Last(e.event_id, e.event_type)),
                acc :+ Pair(key, p.event_type, e.event_type))
            case None => (Some(Last(e.event_id, e.event_type)), acc)
          }
      }
    last.filter(l => !init.contains(l)).foreach(state.update)
    ttl.foreach(state.setTimeoutDuration)
    out.iterator
  }

  /** Streaming (or batch) transform: events → transition pairs. */
  def pairs(spark: SparkSession, events: Dataset[Ev],
      stateTtl: Option[String] = None): Dataset[Pair] = {
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(advance(stateTtl))
  }
}
