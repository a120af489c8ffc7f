package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for intermediates that query BUILDERS persist.
  *
  * Several dedup builders cache a frame that multiple branches of the
  * RETURNED plan consume (shingle pipelines, block indexes) — the
  * builder cannot unpersist it, because the caller's terminal action
  * hasn't run yet. Left alone, those cached blocks outlive the query:
  * harmless in a run-one-query process, a steady leak of executor
  * storage memory in a long-lived session running many queries (the
  * r5 audit's unbalanced-persist finding).
  *
  * Builders therefore register such frames here instead of bare
  * `.persist()`, and the terminal consumer calls [[releaseAll]] once it
  * has materialized the result (Verify and Bench do, after every query;
  * a library user does the same — or calls `spark.catalog.clearCache()`
  * which drops the blocks but not this queue's references, hence the
  * drain-always loop).
  */
object CachePool {

  private val tracked = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[releaseAll]]. */
  private[graft] def track(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(p)
    p
  }

  /** Unpersist every builder-cached intermediate registered since the
    * last call. Non-blocking: block deletion proceeds asynchronously,
    * the plans stay valid (they recompute from lineage if re-run).
    */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
  }
}
