package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch session-id assignment (q125): per-user
  * `(last event time, session ordinal)` in `GroupState`, each event
  * emitted with its session id the moment it arrives — the live form of
  * the batch lag-gap + running-sum window (StreamingSpec asserts
  * per-event equality against q125 on bounded, ordered data).
  *
  * A >30-minute gap starts session n+1, exactly the session_window
  * semantics q125 is partition-equivalent to. Late events (at or before
  * the state's high-water mark) are dropped explicitly, the
  * Transitions discipline. State is two longs per user; with `stateTtl`
  * set, idle users expire and their next event starts session 1 of a
  * fresh journey — the same trade TagHistory documents.
  */
object Sessionizer {

  private val GapUs = 1800L * 1000000L

  case class Ev(user_id: Long, event_id: Long, us: Long)
  case class Tagged(event_id: Long, user_id: Long, session_seq: Long,
      session_start: Long)
  case class Cursor(last_us: Long, last_event_id: Long, seq: Long)

  private[streaming] def advance(ttl: Option[String])(
      key: Long, events: Iterator[Ev],
      state: GroupState[Cursor]): Iterator[Tagged] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val init = state.getOption
    val ordered = events.toVector.sortBy(e => (e.us, e.event_id))
    val (fin, out) = ordered.foldLeft((init, Vector.empty[Tagged])) {
      case ((cur, acc), e) =>
        cur match {
          case Some(c) if e.us < c.last_us ||
              (e.us == c.last_us && e.event_id <= c.last_event_id) =>
            (cur, acc) // late or redelivered: drop
          case Some(c) =>
            val fresh = e.us - c.last_us > GapUs
            val seq = if (fresh) c.seq + 1 else c.seq
            (Some(Cursor(e.us, e.event_id, seq)),
              acc :+ Tagged(e.event_id, key, seq, if (fresh) 1L else 0L))
          case None =>
            (Some(Cursor(e.us, e.event_id, 1L)),
              acc :+ Tagged(e.event_id, key, 1L, 1L))
        }
    }
    fin.filter(f => !init.contains(f)).foreach(state.update)
    ttl.foreach(state.setTimeoutDuration)
    out.iterator
  }

  /** Streaming (or batch) transform: events → session-tagged events. */
  def tag(spark: SparkSession, events: Dataset[Ev],
      stateTtl: Option[String] = None): Dataset[Tagged] = {
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(advance(stateTtl))
  }
}
