package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.AnsModel.Tag

/** Arbitrary stateful processing: per-document tag history
  * (SURVEY.md §2.9 "arbitrary state" — [CLOSURE] of the reference's
  * tag-accumulation-across-revisions fold, `tag.py:37-44`).
  *
  * Keeps the accumulated tag set per doc id in `GroupState` and emits one
  * change record per NEWLY-applied tag (idempotence made observable: a
  * redelivered tag produces no output). Event-time state expiry is the
  * production posture at 100 TB — state size stays bounded by active keys
  * within the watermark, not total history.
  */
object TagHistory {

  case class TagEvent(doc_id: String, slug: String, text: String)
  case class TagChange(doc_id: String, slug: String, n_tags_after: Int,
      first_application: Boolean)
  case class TagSetState(slugs: Set[String])

  def applyEvents(key: String, events: Iterator[TagEvent],
      state: GroupState[TagSetState]): Iterator[TagChange] = {
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
    changes.iterator
  }

  /** Streaming (or batch) transform: tag events → change log. */
  def changes(spark: SparkSession, events: Dataset[TagEvent]): Dataset[TagChange] = {
    import spark.implicits._
    events.groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(applyEvents)
  }
}
