package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch conversion funnel (q107): a per-user
  * three-step state machine (view → click ≤1h → purchase ≤1h) kept in
  * `GroupState`, one change record emitted each time a user ADVANCES a
  * stage — the live-dashboard form of the batch report (StreamingSpec
  * asserts final-state equality against q107 on bounded, time-ordered
  * data).
  *
  * The state is monotone by construction — each step's timestamp is
  * set once and never overwritten — so redelivery is absorbed (an event
  * that does not advance the machine emits nothing) and the final state
  * equals the batch semantics whenever arrival order respects event
  * time per user (the Transitions late-drop discipline; ordering inside
  * each micro-batch is restored by sorting on (us, event_id)).
  *
  * Scale: O(1) state per user (three longs); with `stateTtl` set, idle
  * users expire — a funnel that hasn't advanced within the TTL stops
  * counting, which is the product semantics of a conversion window.
  */
object Funnel {

  private val HourUs = 3600L * 1000000L

  case class Ev(user_id: Long, event_id: Long, event_type: String, us: Long)
  case class Stages(view_us: Long, click_us: Long, purch_us: Long)
  case class Advance(user_id: Long, stage: Long,
      view_us: Long, click_us: Long, purch_us: Long)

  private def stageOf(s: Stages): Long =
    Seq(s.view_us, s.click_us, s.purch_us).count(_ >= 0).toLong

  private[streaming] def step(s: Stages, e: Ev): Stages = e.event_type match {
    case "view" if s.view_us < 0 => s.copy(view_us = e.us)
    case "click" if s.view_us >= 0 && s.click_us < 0 &&
        e.us > s.view_us && e.us <= s.view_us + HourUs =>
      s.copy(click_us = e.us)
    case "purchase" if s.click_us >= 0 && s.purch_us < 0 &&
        e.us > s.click_us && e.us <= s.click_us + HourUs =>
      s.copy(purch_us = e.us)
    case _ => s
  }

  private[streaming] def advance(ttl: Option[String])(
      key: Long, events: Iterator[Ev],
      state: GroupState[Stages]): Iterator[Advance] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val init = state.getOption.getOrElse(Stages(-1L, -1L, -1L))
    val (fin, out) = events.toVector.sortBy(e => (e.us, e.event_id))
      .foldLeft((init, Vector.empty[Advance])) { case ((s, acc), e) =>
        val next = step(s, e)
        if (next == s) (s, acc)
        else (next, acc :+ Advance(key, stageOf(next),
          next.view_us, next.click_us, next.purch_us))
      }
    if (fin != init) state.update(fin)
    ttl.foreach(state.setTimeoutDuration)
    out.iterator
  }

  /** Streaming (or batch) transform: events → stage-advance change log. */
  def advances(spark: SparkSession, events: Dataset[Ev],
      stateTtl: Option[String] = None): Dataset[Advance] = {
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(advance(stateTtl))
  }
}
