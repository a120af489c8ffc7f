package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral event analytics — the funnel/densification shapes an
  * event-stream product (the reference's domain: tagged content events,
  * `app.py:16-78`) reports on. Both are batch forms over `events.parquet`
  * so the DuckDB oracle applies; both follow the Windows timestamp
  * discipline (never output raw ns timestamps — epoch micros / ISO dates
  * only).
  *
  * Scale shapes:
  *  - q107 is three partial-aggregating min() group-bys keyed on user_id
  *    plus equi-keyed joins on user_id — each stage's input is FILTERED to
  *    one event type before it joins (the funnel narrows left to right),
  *    so the widest shuffle is the first stage, not the join fanout. The
  *    final assembly joins per-user one-row tables; at 100 TB those are
  *    |users| rows, not |events|, and AQE picks broadcast where one side
  *    collapses far enough.
  *  - q108's calendar explode fans out |days-in-range| rows per user
  *    (bounded by the retention window, independent of event volume); the
  *    zero-fill join is equi-keyed on (user_id, day) — co-partitioned with
  *    the daily aggregate it fills, no broadcast needed and no global
  *    state. This is the standard gap-densification plan: generate from
  *    the AGGREGATE's own min/max (tiny), never cross-join a calendar
  *    dimension against raw events.
  */
object Behavior extends QueryGroup {

  private val HourUs = 3600L * 1000000L

  def queries: Map[String, Q] = Map(
    // q107 [CLOSURE]: sequential conversion funnel view → click →
    // purchase, each step within one hour of the previous step's first
    // completion. `stage` counts completed steps; step timestamps are
    // epoch micros with -1 for "never reached" (the nullable-BIGINT
    // columns are coalesced on both engines so the compare never sees
    // engine-specific null encodings).
    "q107_funnel" -> ((spark, dir) => {
      val ev = Tables(spark, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("view_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .join(views, "user_id")
        .filter(col("us") > col("view_us") &&
          col("us") <= col("view_us") + HourUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("click_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .join(clicks, "user_id")
        .filter(col("us") > col("click_us") &&
          col("us") <= col("click_us") + HourUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("purch_us"))
      ev.select(col("user_id")).distinct()
        .join(views, Seq("user_id"), "left")
        .join(clicks, Seq("user_id"), "left")
        .join(purchases, Seq("user_id"), "left")
        .select(col("user_id"),
          (when(col("view_us").isNotNull, 1L).otherwise(0L) +
            when(col("click_us").isNotNull, 1L).otherwise(0L) +
            when(col("purch_us").isNotNull, 1L).otherwise(0L)).as("stage"),
          coalesce(col("view_us"), lit(-1L)).as("view_us"),
          coalesce(col("click_us"), lit(-1L)).as("click_us"),
          coalesce(col("purch_us"), lit(-1L)).as("purch_us"))
        .orderBy("user_id")
    }),

    // q108 [CLOSURE]: per-user daily activity with calendar gap-fill —
    // every day between the user's own first and last active day appears,
    // missing days zero-filled (the densification step before any
    // day-over-day window math is trustworthy). Dates are ISO strings
    // (Scalars convention: a physical DATE column hashes differently
    // across engines).
    "q108_gap_fill" -> ((spark, dir) => {
      val daily = Tables(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .groupBy(col("user_id"), col("d"))
        .agg(count(lit(1)).as("n_events"))
      val cal = daily.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"),
            expr("interval 1 day"))).as("d"))
      cal.join(daily, Seq("user_id", "d"), "left")
        .select(col("user_id"),
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("user_id", "day")
    }))

  def oracles: Map[String, String] = Map(
    "q107_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS view_us FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(us) AS click_us FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us > view_us
        |        AND us <= view_us + 3600000000 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(us) AS purch_us FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us > click_us
        |        AND us <= click_us + 3600000000 GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id,
        |  CAST(CASE WHEN view_us IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN purch_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |  COALESCE(view_us, -1) AS view_us,
        |  COALESCE(click_us, -1) AS click_us,
        |  COALESCE(purch_us, -1) AS purch_us
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |       LEFT JOIN p USING (user_id)
        |ORDER BY u.user_id""".stripMargin,
    "q108_gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |        CAST(count(*) AS BIGINT) AS n_events
        |      FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |cal AS (SELECT user_id,
        |        unnest(list_transform(
        |          generate_series(min(d), max(d), INTERVAL 1 DAY),
        |          x -> CAST(x AS DATE))) AS d
        |      FROM daily GROUP BY user_id)
        |SELECT cal.user_id, strftime(cal.d, '%Y-%m-%d') AS day,
        |  COALESCE(daily.n_events, 0) AS n_events
        |FROM cal LEFT JOIN daily ON daily.user_id = cal.user_id
        |                        AND daily.d = cal.d
        |ORDER BY cal.user_id, day""".stripMargin)
}
