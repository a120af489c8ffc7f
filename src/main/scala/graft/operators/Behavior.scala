package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** q175's noisy-pair margin filter, in exact cents. */
  val MinMarginCents = 500L

  def queries: Map[String, Q] = Map(
    // q206 [north star, r12]: EWMA spike/collapse detection — the
    // SEQUENTIAL anomaly tier next to q117's population z-test (q117
    // asks "is this day unusual for this user overall?"; this follows
    // the TREND: "did the value jump vs its exponentially-weighted
    // recent past?" — the online-monitoring primitive). The smoothing
    // recurrence is exact-integer: cents (the q175 idiom), α = 1/8 so
    // e' = ⌊(7e + v)/8⌋ is a divide-by-power-of-two (floor ≡ exact
    // binary division — zero rounding ambiguity cross-engine), spike =
    // v > 3e, collapse = 3v < e, both pure BIGINT predicates; the first
    // observation seeds the state and is never flagged. Scale: ONE
    // user-keyed shuffle; per-user fold via array_sort(collect_list)
    // + aggregate() — bounded by the user's own history (the q160
    // stance), map-only after the exchange, no windows over the corpus.
    // Oracle: the identical fold as DuckDB list_reduce over the same
    // (us, event_id)-ordered list — struct state, left fold, two
    // independent implementations of the recurrence.
    "q206_ewma_anomaly" -> ((spark, dir) =>
      ewmaAnomaly(Tables(spark, dir, "events"))),

    // q175 [north star, r10]: PREFERENCE-PAIR construction — the
    // behavior-log → RLHF/DPO bridge (q160 renders SFT transcripts;
    // this mines (chosen, rejected) item pairs from implicit feedback).
    // Per (user, item=props.k): engagement = exact SUM of value in
    // integer cents (value carries 2 decimals; a double sum's low bits
    // are association-order-dependent and would diverge cross-engine).
    // Per user with ≥2 distinct items: chosen = highest-scored item
    // (ties → lowest k), rejected = lowest-scored (ties → highest k),
    // kept only when the margin ≥ MinMarginCents — the standard noisy-
    // pair filter. Scale: two partial-aggregating shuffles (user,k →
    // user), no windows over the corpus, no joins.
    "q175_preference_pairs" -> ((spark, dir) => {
      Tables(spark, dir, "events")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
        // value NULLs are excluded EXPLICITLY: an all-NULL item would
        // make s NULL, and Spark's struct min ranks NULL first while the
        // oracle's ORDER BY ranks it last — the one place the two
        // engines' NULL orderings would silently pick different
        // 'rejected' items (r10 review finding)
        .filter(col("k").isNotNull && col("cents").isNotNull)
        .groupBy(col("user_id"), col("k"))
        .agg(sum(col("cents")).as("s"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_items"),
          max_by(col("k"), struct(col("s"), (-col("k")).as("t"))).as("chosen_k"),
          max(struct(col("s"), (-col("k")).as("t"))).getField("s").as("cs"),
          min_by(col("k"), struct(col("s"), (-col("k")).as("t"))).as("rejected_k"),
          min(struct(col("s"), (-col("k")).as("t"))).getField("s").as("rs"))
        .filter(col("n_items") >= 2 &&
          col("cs") - col("rs") >= MinMarginCents)
        .select(col("user_id"), col("chosen_k"), col("rejected_k"),
          (col("cs") - col("rs")).as("margin_cents"), col("n_items"))
        .orderBy("user_id")
    }),
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
    }),

    // q115 [CLOSURE]: event-type TRANSITION matrix — the first-order
    // Markov view of user journeys (which action follows which): one lag
    // window per user in event_id order (the Windows ordering
    // discipline), then a partial-aggregating pair count. One user-keyed
    // shuffle + one (prev, next)-keyed aggregation whose output is at
    // most |types|² rows regardless of corpus size.
    "q115_transitions" -> ((spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("prev_type"), col("next_type"), col("n"))
        .orderBy("prev_type", "next_type")
    }),

    // q116 [CLOSURE]: COHORT RETENTION — users grouped by first-active
    // day, counted per day-offset since that day (the triangle matrix
    // behind every retention chart). Distinct (user, day) first so a
    // burst of same-day events counts once; the cohort join is
    // equi-keyed on user_id against a per-user one-row aggregate —
    // co-partitioned with the activity it labels, no broadcast needed at
    // any scale. Output days are ISO strings (Scalars convention).
    "q116_retention" -> ((spark, dir) => {
      val act = Tables(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val cohorts = act.groupBy(col("user_id"))
        .agg(min(col("d")).as("cohort_d"))
      act.join(cohorts, "user_id")
        .groupBy(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort"),
          datediff(col("d"), col("cohort_d")).cast("long").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort", "day_offset")
    }),

    // q120 [CLOSURE]: ROLLING 7-DAY ACTIVE USERS — the WAU curve: for
    // every calendar day in the fixture's span, how many distinct users
    // were active in the trailing 7 days. count(DISTINCT) is not a
    // window function in Spark, so the rolling set is materialized by a
    // bounded offset explode: each distinct (user, day) activation
    // contributes to exactly 7 target days, then one (day)-keyed
    // distinct count. Fanout is a CONSTANT 7 per activation —
    // independent of corpus size, cheaper than a range self-join, and
    // partial-aggregating end to end. Days with zero trailing activity
    // simply don't appear (no users to count).
    "q120_rolling_actives" -> ((spark, dir) =>
      rollingActives(Tables(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct())),

    // q122 [CLOSURE]: RECENCY-WEIGHTED engagement — per-user sum of
    // event values decayed by age, with the decay spelled as division
    // by 2^age_days instead of exp(-λ·age): scaling by an exact power
    // of two is a lossless IEEE exponent shift, so the per-row math is
    // bit-identical on both engines (exp/pow are libm calls whose last
    // bit differs — the q83 log-avoidance discipline applied to decay).
    // The reference date is the corpus's own max day (one-row
    // broadcast); the per-user sum follows the rounded-aggregate rule.
    "q122_engagement" -> ((spark, dir) =>
      engagement(Tables(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"), col("value")))),

    // q124 [CLOSURE]: SCD-2 HISTORY — each user's event stream becomes
    // validity intervals (valid_from/valid_to, current-row flag): the
    // slowly-changing-dimension shape every warehouse keeps for
    // point-in-time joins. One lead() window per user ordered by
    // (ts, event_id) (ties broken by the unique id, the Windows
    // discipline); epoch-micros output with -1 for the open interval.
    "q124_scd2_history" -> ((spark, dir) =>
      scd2(Tables(spark, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("vf"), col("value")))),

    // q125 [CLOSURE]: SESSION-ID assignment — the per-EVENT form of
    // q41's session windows: a session break is a >30-minute gap, and
    // the session ordinal is the running sum of break flags (lag +
    // cumulative sum composed in one window pass). Downstream
    // funnel-within-session analytics key on (user_id, session_seq).
    // Same single user-keyed shuffle as any per-user window.
    "q125_session_ids" -> ((spark, dir) => {
      val order = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val cum = order.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      Tables(spark, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("brk",
          when(col("us") - lag(col("us"), 1).over(order) > 1800L * 1000000L, 1L)
            .when(lag(col("us"), 1).over(order).isNull, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("brk")).over(cum))
        .select(col("event_id"), col("user_id"), col("session_seq"),
          col("brk").as("session_start"))
        .orderBy("event_id")
    }),

    // q160 [north star, r9]: SESSION-TRANSCRIPT rendering — the
    // behavior-log → training-corpus bridge (chat/interaction logs
    // become SFT documents): each (user, session) under q125's
    // 30-minute-gap rule is rendered as one text document, the
    // event-type sequence in (ts, event_id) order, plus the span and
    // size metadata a downstream packer (q82/q151) consumes. The
    // transcript is STRINGS ONLY (event types) — doubles never enter
    // the rendered text, so the rewrite is bit-deterministic on both
    // engines. Scale: q125's one user-keyed window shuffle, then one
    // (user, session) partial agg whose per-key width is bounded by
    // the session itself (the 30-min gap rule caps how much one key
    // can accumulate; a bot session pathologically long is exactly
    // what the q99-style gates drop upstream). The in-group ordering
    // rides a struct array_sort — (us, event_id) is a total order, so
    // collect_list's arrival nondeterminism is sorted away.
    "q160_session_transcripts" -> ((spark, dir) => {
      val order = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val cum = order.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      Tables(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("brk",
          when(col("us") - lag(col("us"), 1).over(order) > 1800L * 1000000L, 1L)
            .when(lag(col("us"), 1).over(order).isNull, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("brk")).over(cum))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("t_start"),
          max(col("us")).as("t_end"),
          array_join(transform(
            array_sort(collect_list(struct(col("us"), col("event_id"),
              col("event_type")))),
            t => t.getField("event_type")), " ").as("transcript"))
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("t_start"), col("t_end"), col("transcript"))
        .orderBy("user_id", "session_seq")
    }),

    // q117 [CLOSURE]: EXACT anomaly flags over daily activity — each
    // (user, day) is flagged when its event count sits more than 2
    // population-σ from the user's own mean. The z-test is
    // cross-multiplied into pure BIGINT — (c·D − S)² > 4·(D·SS − S²)
    // with D = days observed, S = Σc, SS = Σc² — so there is NO
    // floating-point variance anywhere and the oracle is exact (the
    // same trick as q113's cosine test; stddev_samp would be
    // association-order-dependent across engines). Zero-variance users
    // flag nothing by definition. Scale: one (user, day) partial agg,
    // one user-keyed stats agg, one co-partitioned equi-join — the
    // gap-filled calendar is NOT needed because absent days carry no
    // row to flag.
    "q117_anomaly_days" -> ((spark, dir) => {
      val daily = Tables(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .groupBy(col("user_id"), col("d"))
        .agg(count(lit(1)).as("c"))
      val stats = daily.groupBy(col("user_id"))
        .agg(count(lit(1)).as("dd"), sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("ss"))
      daily.join(stats, "user_id")
        .select(col("user_id"),
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("c").as("n_events"),
          when((col("c") * col("dd") - col("s")) *
              (col("c") * col("dd") - col("s")) >
              lit(4L) * (col("dd") * col("ss") - col("s") * col("s")),
            1L).otherwise(0L).as("is_anomaly"))
        .orderBy("user_id", "day")
    }))

  /** q120's operator over a distinct `(user_id, d: date)` activation
    * frame. The activation fanout emits up to 6 offset rows past a
    * user's own last day, so the result is clipped to the CORPUS's last
    * active day (one-row broadcast) — days after the data end are a
    * statement about days we have not observed, not zero-activity days.
    */
  private[graft] def rollingActives(act: DataFrame): DataFrame = {
    val ref = act.agg(max(col("d")).as("maxd"))
    act.select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("k"),
        col("d"))
      .select(col("user_id"), date_add(col("d"), col("k")).as("day"))
      .crossJoin(broadcast(ref))
      .filter(col("day") <= col("maxd"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("active_7d"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("active_7d"))
      .orderBy("day")
  }

  /** q122's operator over a `(user_id, d: date, value)` frame. The decay
    * divisor 2^age is computed with shiftleft, and Spark masks shift
    * amounts mod 64 — age 63 would yield a NEGATIVE divisor and age 64 a
    * divisor of 1 (while DuckDB overshifts to 0, i.e. ÷0 → inf), so ages
    * past 62 are clamped to a zero contribution on BOTH engines.
    * Semantically lossless: 2⁻⁶³ ≈ 1e-19 sits far below the 4dp
    * rounded-aggregate output, so the clamp only removes noise terms.
    * Valid for any event-history span (the wrap is unreachable).
    */
  private[graft] def engagement(ev: DataFrame): DataFrame = {
    val ref = ev.agg(max(col("d")).as("maxd"))
    ev.crossJoin(broadcast(ref))
      .withColumn("age", datediff(col("maxd"), col("d")))
      .withColumn("contrib",
        when(col("age") <= 62,
          col("value") / expr("cast(shiftleft(cast(1 as bigint), age) as double)"))
          .otherwise(lit(0.0)))
      .groupBy(col("user_id"))
      .agg(round(sum(col("contrib")), 4).as("engagement"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** q124's operator over a `(user_id, event_id, vf: epoch-µs, value)`
    * frame. Intervals are HALF-OPEN `[valid_from_us, valid_to_us)` — the
    * standard SCD-2 convention: a point-in-time lookup
    * `valid_from_us <= t AND t < valid_to_us` matches at most one
    * revision per user. Two events with IDENTICAL timestamps collapse
    * the superseded revision to a zero-width interval that no lookup
    * matches (an inclusive close floored at the open would instead
    * OVERLAP the successor's first instant and double every as-of join
    * row at that timestamp); `lead` over the same ordering guarantees
    * `nxt >= vf`, so inversion is impossible by construction. The open
    * row keeps the -1 sentinel.
    */
  private[graft] def scd2(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("vf"), col("event_id"))
    ev.withColumn("nxt", lead(col("vf"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("vf").as("valid_from_us"),
        coalesce(col("nxt"), lit(-1L)).as("valid_to_us"),
        when(col("nxt").isNull, 1L).otherwise(0L).as("is_current"),
        col("value"))
      .orderBy("user_id", "valid_from_us", "event_id")
  }

  /** q206's operator over a `(user_id, ts, event_id, value)` frame. */
  private[graft] def ewmaAnomaly(
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .filter(col("cents").isNotNull)
    val init = struct(lit(0L).as("e"), lit(0L).as("a"), lit(0L).as("n"))
    ev.groupBy(col("user_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("us"), col("event_id"),
          col("cents")))),
        init,
        (acc, x) => {
          val v = x.getField("cents")
          val e = acc.getField("e")
          val n = acc.getField("n")
          val anom = n > 0L && (v > e * 3L || v * 3L < e)
          struct(
            when(n === 0L, v)
              // (7e+v)/8.0 is division by a power of two — exact in
              // binary, so floor(double) ≡ DuckDB's integer //
              .otherwise(floor((e * 7L + v).cast("double") / 8.0)
                .cast("long")).as("e"),
            (acc.getField("a") + when(anom, 1L).otherwise(0L)).as("a"),
            (n + 1L).as("n"))
        }).as("st"))
      .select(col("user_id"), col("st.n").as("n_events"),
        col("st.e").as("ewma_cents"), col("st.a").as("anomalies"))
      .orderBy("user_id")
  }

  def oracles: Map[String, String] = Map(
    // q206: the identical integer EWMA fold as a recursive CTE (the
    // q198 proof shape). NOT list_reduce: DuckDB 1.0's list_reduce
    // mis-evaluates COMPARISONS against the accumulator struct on long
    // lists (arithmetic fields stay exact while predicate fields
    // silently undercount — measured on this very fixture: 15 vs the
    // true 18 anomalies for user 1, e-trace bit-exact throughout), so
    // stateful folds with predicates must take the recursive road.
    "q206_ewma_anomaly" ->
      """WITH RECURSIVE ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |       FROM events WHERE value IS NOT NULL),
        |seq AS (SELECT user_id, cents,
        |          row_number() OVER (PARTITION BY user_id
        |            ORDER BY us, event_id) AS rn FROM ev),
        |nu AS (SELECT user_id, COUNT(*) AS n FROM seq GROUP BY user_id),
        |r AS (
        |  SELECT user_id, 1 AS i, cents AS e, CAST(0 AS BIGINT) AS a
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.i + 1, (7*r.e + s.cents) // 8,
        |         r.a + CAST(s.cents > 3*r.e OR 3*s.cents < r.e AS BIGINT)
        |  FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.i + 1)
        |SELECT r.user_id AS user_id, CAST(n.n AS BIGINT) AS n_events,
        |  CAST(r.e AS BIGINT) AS ewma_cents, CAST(r.a AS BIGINT) AS anomalies
        |FROM r JOIN nu n ON n.user_id = r.user_id AND r.i = n.n
        |ORDER BY user_id""".stripMargin,

    // q175: same exact-cents scoring; chosen/rejected re-derived with
    // deterministic row_number tie-breaks ((s DESC, k ASC) / (s ASC,
    // k DESC) ≡ max/min of the (s, −k) struct).
    "q175_preference_pairs" ->
      s"""WITH scored AS (
         |  SELECT user_id, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
         |    SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS s
         |  FROM events
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |    AND value IS NOT NULL
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT user_id, k, s,
         |    row_number() OVER (PARTITION BY user_id ORDER BY s DESC, k ASC) AS top,
         |    row_number() OVER (PARTITION BY user_id ORDER BY s ASC, k DESC) AS bot,
         |    COUNT(*) OVER (PARTITION BY user_id) AS n_items
         |  FROM scored),
         |pairs AS (
         |  SELECT t.user_id, t.k AS chosen_k, b.k AS rejected_k,
         |    t.s - b.s AS margin_cents, t.n_items
         |  FROM ranked t JOIN ranked b
         |    ON t.user_id = b.user_id AND t.top = 1 AND b.bot = 1)
         |SELECT user_id, chosen_k, rejected_k,
         |  CAST(margin_cents AS BIGINT) AS margin_cents,
         |  CAST(n_items AS BIGINT) AS n_items
         |FROM pairs
         |WHERE n_items >= 2 AND margin_cents >= $MinMarginCents
         |ORDER BY user_id""".stripMargin,
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
        |ORDER BY cal.user_id, day""".stripMargin,
    "q115_transitions" ->
      """WITH t AS (SELECT user_id, event_type,
        |        lag(event_type, 1) OVER (PARTITION BY user_id
        |          ORDER BY event_id) AS prev_type
        |      FROM events)
        |SELECT prev_type, event_type AS next_type,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, next_type""".stripMargin,
    "q116_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |coh AS (SELECT user_id, min(d) AS cohort_d FROM act GROUP BY user_id)
        |SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort,
        |  CAST(act.d - cohort_d AS BIGINT) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM act JOIN coh USING (user_id)
        |GROUP BY cohort_d, act.d - cohort_d
        |ORDER BY cohort, day_offset""".stripMargin,
    "q122_engagement" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, value FROM events),
        |r AS (SELECT max(d) AS maxd FROM e)
        |SELECT user_id,
        |  ROUND(SUM(CASE WHEN (maxd - d) <= 62
        |    THEN value / CAST((CAST(1 AS BIGINT) << (maxd - d)) AS DOUBLE)
        |    ELSE 0.0 END), 4) AS engagement,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM e, r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q124_scd2_history" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS vf, value FROM events),
        |x AS (SELECT user_id, event_id, vf, value,
        |        lead(vf, 1) OVER (PARTITION BY user_id
        |          ORDER BY vf, event_id) AS nxt
        |      FROM t)
        |SELECT user_id, event_id, vf AS valid_from_us,
        |  COALESCE(nxt, -1) AS valid_to_us,
        |  CAST(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current,
        |  value
        |FROM x ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    "q125_session_ids" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |b AS (SELECT user_id, event_id, us,
        |        CAST(CASE WHEN lag(us, 1) OVER w IS NULL THEN 1
        |                  WHEN us - lag(us, 1) OVER w > 1800000000 THEN 1
        |                  ELSE 0 END AS BIGINT) AS brk
        |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT event_id, user_id,
        |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_seq,
        |  brk AS session_start
        |FROM b ORDER BY event_id""".stripMargin,
    // q160: q125's sessionization, then one ordered string_agg per
    // session — STRING_AGG with ORDER BY mirrors the struct-sorted
    // collect_list exactly because (us, event_id) is a total order.
    "q160_session_transcripts" ->
      """WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |b AS (SELECT user_id, event_id, event_type, us,
        |        CAST(CASE WHEN lag(us, 1) OVER w IS NULL THEN 1
        |                  WHEN us - lag(us, 1) OVER w > 1800000000 THEN 1
        |                  ELSE 0 END AS BIGINT) AS brk
        |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, event_id, event_type, us,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |      FROM b)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(us) AS BIGINT) AS t_start,
        |  CAST(max(us) AS BIGINT) AS t_end,
        |  string_agg(event_type, ' ' ORDER BY us, event_id) AS transcript
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q120_rolling_actives" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |x AS (SELECT user_id, d + CAST(k AS INT) AS day
        |      FROM act, (SELECT unnest(range(0, 7)) AS k) o)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
        |FROM x WHERE day <= (SELECT max(d) FROM act)
        |GROUP BY day ORDER BY day""".stripMargin,
    "q117_anomaly_days" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS dd,
        |         CAST(sum(c) AS BIGINT) AS s, CAST(sum(c*c) AS BIGINT) AS ss
        |       FROM daily GROUP BY user_id)
        |SELECT daily.user_id, strftime(daily.d, '%Y-%m-%d') AS day,
        |  daily.c AS n_events,
        |  CAST(CASE WHEN (c*dd - s)*(c*dd - s) > 4*(dd*ss - s*s)
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM daily JOIN st USING (user_id)
        |ORDER BY daily.user_id, day""".stripMargin)
}
