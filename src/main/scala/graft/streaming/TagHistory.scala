package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary stateful processing: per-document tag history
  * (SURVEY.md §2.9 "arbitrary state" — [CLOSURE] of the reference's
  * tag-accumulation-across-revisions fold, `tag.py:37-44`).
  *
  * Keeps the accumulated tag set per doc id in `GroupState` and emits one
  * change record per NEWLY-applied tag (idempotence made observable: a
  * redelivered tag produces no output).
  *
  * State growth: with `stateTtl` set (the production posture), idle keys
  * expire on a processing-time timeout, bounding state to documents seen
  * within the TTL — after expiry, a re-tag of a long-idle document emits
  * one duplicate change record, which downstream idempotent sinks absorb
  * (the same at-least-once trade the upsert sink makes). With
  * `stateTtl = None` (tests, bounded backfills) state is exact but grows
  * with the total key space.
  */
object TagHistory {

  case class TagEvent(doc_id: String, slug: String, text: String)
  case class TagChange(doc_id: String, slug: String, n_tags_after: Int,
      first_application: Boolean)
  case class TagSetState(slugs: Set[String])

  private[streaming] def applyEvents(ttl: Option[String])(
      key: String, events: Iterator[TagEvent],
      state: GroupState[TagSetState]): Iterator[TagChange] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val before = state.getOption.getOrElse(TagSetState(Set.empty))
    val (after, changes) = events.foldLeft((before, Vector.empty[TagChange])) {
      case ((st, out), ev) =>
        if (st.slugs.contains(ev.slug)) (st, out) // idempotent re-apply: no emit
        else {
          val next = TagSetState(st.slugs + ev.slug)
          (next, out :+ TagChange(key, ev.slug, next.slugs.size,
            first_application = st.slugs.isEmpty))
        }
    }
    if (after != before) state.update(after)
    ttl.foreach(state.setTimeoutDuration)
    changes.iterator
  }

  /** Streaming (or batch) transform: tag events → change log.
    *
    * @param stateTtl idle-key expiry (e.g. `Some("2 hours")`) — required
    *                 for unbounded key spaces; None keeps exact state.
    */
  def changes(spark: SparkSession, events: Dataset[TagEvent],
      stateTtl: Option[String] = None): Dataset[TagChange] = {
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(applyEvents(stateTtl))
  }
}
