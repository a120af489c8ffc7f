package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Privacy / compliance auditing over a release surface (SURVEY.md §2
  * north star): before a record-level table leaves the building, the
  * release gate must PROVE no quasi-identifier combination isolates a
  * person. q201 is the classic formalization — k-ANONYMITY (Sweeney,
  * IJUFKS'02): every equivalence class of the released quasi-identifier
  * tuple must contain ≥ k records.
  *
  * The operator audits a fixed GENERALIZATION LADDER (the Datafly-style
  * global-recoding simplification of the full per-attribute lattice —
  * one deterministic sequence of strictly coarser recodings, documented
  * per level below) and reports, per level: class count, violating
  * classes, records at risk, and whether the level satisfies k; the
  * CHOSEN level is the first satisfying one — the minimal information
  * loss under the ladder. Because every level is a strict coarsening of
  * the previous (classes only ever MERGE going up), `satisfies` is
  * monotone and the at-risk record set shrinks monotonically — both
  * pinned in OperatorSpec against a plain-Scala reference audit.
  *
  * Loudness: a corpus where even the fully-suppressed top level
  * violates (n < k) gets `raise_error`, never a non-verdict audit; a
  * NULL quasi-identifier value forms its OWN class (a silent merge into
  * a real value would hide exactly the isolation the audit exists to
  * find).
  *
  * Scale shape (100 TB): the region recoding joins the BROADCAST nation
  * dimension; the ladder is ONE Expand-style pass (explode over the L
  * level recodings — the grouping-sets/rollup execution shape) into one
  * (level, QI)-keyed partial-aggregating count; the audit rollup then
  * reduces to L rows. No self-joins, no windows over the corpus; the
  * single corpus shuffle carries (level, class) partial counts, and the
  * coarse levels' huge classes are exactly where map-side combine
  * collapses hardest.
  */
object Privacy extends QueryGroup {

  /** The anonymity bar: every released class must hold ≥ AnonK records. */
  private[graft] val AnonK = 5L

  /** The acctbal band widths of ladder levels 0/1/3 (dollars). */
  private[graft] val BalBands = Seq(100, 1000, 5000)

  /** The l-diversity bar: every class must hold ≥ DivL distinct
    * sensitive values.
    */
  private[graft] val DivL = 3L

  private def s(x: Column): Column = coalesce(x.cast("string"), lit("<null>"))
  private def nat: Column = concat(lit("n"), s(col("c_nationkey")))
  private def reg: Column = concat(lit("r"), s(col("n_regionkey")))
  // floor(double / exact-binary width) is the same IEEE op pair on
  // both engines; the band label never leaves the plan (group key)
  private def bal(w: Int): Column =
    concat(lit(s"b$w:"), s(floor(col("c_acctbal") / lit(w.toDouble))))
  private def star: Column = lit("*")

  private def withRegion(customer: DataFrame, nation: DataFrame): DataFrame =
    customer.join(
      broadcast(nation.select(col("n_nationkey"), col("n_regionkey"))),
      customer("c_nationkey") === col("n_nationkey"), "left")

  /** The per-level audit over `(c_nationkey, c_mktsegment, c_acctbal)`
    * quasi-identifiers, generalized through the 5-rung ladder:
    *   0: nation          × segment × $100 band
    *   1: nation          × segment × $1000 band
    *   2: region (dim)    × segment × $1000 band
    *   3: region          × *       × $5000 band
    *   4: *               × *       × *        (full suppression)
    */
  private[graft] def kAnonymityAudit(
      customer: DataFrame, nation: DataFrame, k: Long): DataFrame = {
    val c = withRegion(customer, nation)
    val seg = s(col("c_mktsegment"))
    val ladder: Seq[(Column, Column, Column)] = Seq(
      (nat, seg, bal(BalBands(0))),
      (nat, seg, bal(BalBands(1))),
      (reg, seg, bal(BalBands(1))),
      (reg, star, bal(BalBands(2))),
      (star, star, star))
    val exploded = c.select(explode(array(ladder.zipWithIndex.map {
      case ((qn, qs, qb), i) => struct(lit(i.toLong).as("level"),
        qn.as("q_nat"), qs.as("q_seg"), qb.as("q_bal"))
    }: _*)).as("g")).select(col("g.*"))
    val classes = exploded
      .groupBy(col("level"), col("q_nat"), col("q_seg"), col("q_bal"))
      .agg(count(lit(1)).as("sz"))
    val audit = classes.groupBy(col("level")).agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("violating_classes"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("records_at_risk"))
      .withColumn("satisfies", col("violating_classes") === lit(0L))
    val chosen = audit.filter(col("satisfies"))
      .agg(min(col("level")).as("chosen_level"))
    audit.crossJoin(broadcast(chosen))
      .filter(when(col("chosen_level").isNull,
        raise_error(lit(s"q201: no ladder level reaches $k-anonymity " +
          "(corpus smaller than k?) — refusing to emit a non-verdict audit")))
        .otherwise(lit(true)))
      .select(col("level"), col("n_classes"), col("violating_classes"),
        col("records_at_risk"), col("satisfies"),
        (col("level") === col("chosen_level")).as("chosen"))
      .orderBy("level")
  }

  /** l-DIVERSITY audit (Machanavajjhala et al., ICDE'06) — the
    * homogeneity-attack closure of q201: a k-anonymous class whose
    * SENSITIVE attribute is uniform still discloses it ("all 7 people
    * in this class are in AUTOMOBILE"), so every class must also hold
    * ≥ l DISTINCT sensitive values. Here the sensitive attribute is
    * c_mktsegment and the quasi-identifiers are (nation/region,
    * acctbal band), generalized through a 4-rung strict-coarsening
    * ladder:
    *   0: nation × $1000 band
    *   1: region × $1000 band
    *   2: region × $5000 band
    *   3: *      (full suppression)
    * Coarsening merges classes, and distinct-count over a union
    * dominates the max over its parts — so `satisfies` is monotone and
    * the at-risk set shrinks, same proof shape as q201. The audit also
    * counts HOMOGENEOUS classes (exactly one sensitive value — the
    * worst-case disclosure) per rung. A NULL sensitive value counts as
    * its own VALUE (the attacker still learns "balance segment
    * unknown"), via the same sentinel rule as the QI side.
    */
  private[graft] def lDiversityAudit(
      customer: DataFrame, nation: DataFrame, l: Long): DataFrame = {
    val c = withRegion(customer, nation)
    val sens = s(col("c_mktsegment"))
    val ladder: Seq[(Column, Column)] = Seq(
      (nat, bal(BalBands(1))),
      (reg, bal(BalBands(1))),
      (reg, bal(BalBands(2))),
      (star, star))
    val exploded = c.select(explode(array(ladder.zipWithIndex.map {
      case ((qn, qb), i) => struct(lit(i.toLong).as("level"),
        qn.as("q_nat"), qb.as("q_bal"), sens.as("sens"))
    }: _*)).as("g")).select(col("g.*"))
    val classes = exploded
      .groupBy(col("level"), col("q_nat"), col("q_bal"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("sens")).as("n_sens"))
    val audit = classes.groupBy(col("level")).agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("n_sens") < l, 1L).otherwise(0L)).as("violating_classes"),
        sum(when(col("n_sens") < l, col("sz")).otherwise(0L)).as("records_at_risk"),
        sum(when(col("n_sens") === 1L, 1L).otherwise(0L)).as("homogeneous_classes"))
      .withColumn("satisfies", col("violating_classes") === lit(0L))
    val chosen = audit.filter(col("satisfies"))
      .agg(min(col("level")).as("chosen_level"))
    audit.crossJoin(broadcast(chosen))
      .filter(when(col("chosen_level").isNull,
        raise_error(lit(s"q202: no ladder level reaches $l-diversity " +
          "(fewer than l sensitive values exist?) — refusing to emit a non-verdict audit")))
        .otherwise(lit(true)))
      .select(col("level"), col("n_classes"), col("violating_classes"),
        col("records_at_risk"), col("homogeneous_classes"), col("satisfies"),
        (col("level") === col("chosen_level")).as("chosen"))
      .orderBy("level")
  }

  def queries: Map[String, Q] = Map(
    // q201 [north star, r12]: the k-anonymity release audit over the
    // customer table's (nation, segment, acctbal) quasi-identifiers.
    "q201_k_anonymity" -> ((spark, dir) =>
      kAnonymityAudit(Tables(spark, dir, "customer"),
        Tables(spark, dir, "nation"), AnonK)),

    // q202 [north star, r12]: the l-diversity audit — q201's
    // homogeneity-attack closure over the same release surface.
    "q202_l_diversity" -> ((spark, dir) =>
      lDiversityAudit(Tables(spark, dir, "customer"),
        Tables(spark, dir, "nation"), DivL)))

  def oracles: Map[String, String] = {
    // the identical ladder, re-derived: same recodings, same floor/band
    // arithmetic, same NULL-is-its-own-class rule
    val nat = "'n'||COALESCE(CAST(c_nationkey AS VARCHAR),'<null>')"
    val reg = "'r'||COALESCE(CAST(n_regionkey AS VARCHAR),'<null>')"
    val seg = "COALESCE(c_mktsegment,'<null>')"
    def bal(w: Int) =
      s"'b$w:'||COALESCE(CAST(floor(c_acctbal/$w.0) AS VARCHAR),'<null>')"
    val rungs = Seq(
      (nat, seg, bal(100)), (nat, seg, bal(1000)), (reg, seg, bal(1000)),
      (reg, "'*'", bal(5000)), ("'*'", "'*'", "'*'"))
    val lv = rungs.zipWithIndex.map { case ((qn, qs, qb), i) =>
      s"SELECT $i AS level, $qn AS q_nat, $qs AS q_seg, $qb AS q_bal FROM cn"
    }.mkString("\n  UNION ALL\n  ")
    val sens = "COALESCE(c_mktsegment,'<null>')"
    val drungs = Seq(
      (nat, bal(1000)), (reg, bal(1000)), (reg, bal(5000)), ("'*'", "'*'"))
    val dlv = drungs.zipWithIndex.map { case ((qn, qb), i) =>
      s"SELECT $i AS level, $qn AS q_nat, $qb AS q_bal, $sens AS sens FROM cn"
    }.mkString("\n  UNION ALL\n  ")
    Map(
      "q202_l_diversity" ->
        s"""WITH cn AS (SELECT c.*, n.n_regionkey FROM customer c
           |            LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey),
           |lv AS (
           |  $dlv),
           |cls AS (SELECT level, q_nat, q_bal, COUNT(*) AS sz,
           |          COUNT(DISTINCT sens) AS n_sens
           |        FROM lv GROUP BY level, q_nat, q_bal),
           |aud AS (SELECT level, COUNT(*) AS n_classes,
           |          SUM(CASE WHEN n_sens < $DivL THEN 1 ELSE 0 END) AS violating_classes,
           |          SUM(CASE WHEN n_sens < $DivL THEN sz ELSE 0 END) AS records_at_risk,
           |          SUM(CASE WHEN n_sens = 1 THEN 1 ELSE 0 END) AS homogeneous_classes
           |        FROM cls GROUP BY level),
           |ch AS (SELECT MIN(level) AS chosen_level FROM aud WHERE violating_classes = 0)
           |SELECT CAST(level AS BIGINT) AS level,
           |  CAST(n_classes AS BIGINT) AS n_classes,
           |  CAST(violating_classes AS BIGINT) AS violating_classes,
           |  CAST(records_at_risk AS BIGINT) AS records_at_risk,
           |  CAST(homogeneous_classes AS BIGINT) AS homogeneous_classes,
           |  violating_classes = 0 AS satisfies,
           |  level = (SELECT chosen_level FROM ch) AS chosen
           |FROM aud ORDER BY level""".stripMargin,
      "q201_k_anonymity" ->
      s"""WITH cn AS (SELECT c.*, n.n_regionkey FROM customer c
         |            LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey),
         |lv AS (
         |  $lv),
         |cls AS (SELECT level, q_nat, q_seg, q_bal, COUNT(*) AS sz
         |        FROM lv GROUP BY level, q_nat, q_seg, q_bal),
         |aud AS (SELECT level, COUNT(*) AS n_classes,
         |          SUM(CASE WHEN sz < $AnonK THEN 1 ELSE 0 END) AS violating_classes,
         |          SUM(CASE WHEN sz < $AnonK THEN sz ELSE 0 END) AS records_at_risk
         |        FROM cls GROUP BY level),
         |ch AS (SELECT MIN(level) AS chosen_level FROM aud WHERE violating_classes = 0)
         |SELECT CAST(level AS BIGINT) AS level,
         |  CAST(n_classes AS BIGINT) AS n_classes,
         |  CAST(violating_classes AS BIGINT) AS violating_classes,
         |  CAST(records_at_risk AS BIGINT) AS records_at_risk,
         |  violating_classes = 0 AS satisfies,
         |  level = (SELECT chosen_level FROM ch) AS chosen
         |FROM aud ORDER BY level""".stripMargin)
  }
}
