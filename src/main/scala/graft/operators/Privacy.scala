package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** The t-closeness bar as an exact rational: EMD ≤ TNum/TDen. */
  private[graft] val TNum = 1L
  private[graft] val TDen = 8L

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

  /** t-CLOSENESS audit (Li, Li & Venkatasubramanian, ICDE'07) — the
    * skewness/similarity-attack closure of q201+q202: an l-diverse class
    * can still disclose ("this class skews hard toward the top balance
    * band"), so every class's sensitive-value DISTRIBUTION must stay
    * within Earth-Mover's Distance t of the GLOBAL distribution. The
    * sensitive attribute here is ORDERED — the \$1000 acctbal band — so
    * EMD has the closed form (Li et al. §5.2, ordered-distance ground
    * metric):
    *
    *   EMD(P, Q) = (1/(m−1)) · Σ_{i=1}^{m−1} |cum_i(P) − cum_i(Q)|
    *
    * Evaluated EXACTLY in integers by scaling both cumulatives to a
    * common denominator: with class size n, corpus size N, the class
    * violates iff  TDen · Σ|N·cumc_i − n·cumC_i|  >  TNum · n·N·(m−1)
    * — all BIGINT, no division, hash-portable. The QI ladder (strict
    * coarsenings, so `satisfies` is monotone by EMD's joint convexity:
    * a merged class is a mixture and EMD(mixture, Q) ≤ max over parts):
    *   0: nation × segment    1: region × segment
    *   2: region × *          3: *   (P ≡ Q, EMD = 0 by identity)
    *
    * Loudness: a NULL sensitive value is REFUSED (`raise_error`) — an
    * ordered-ground-distance EMD is undefined for an unordered sentinel,
    * and silently pinning NULL to either end of the order would move
    * mass through every cumulative term. A degenerate order (m < 2)
    * is refused (the 1/(m−1) normalization vanishes). The BIGINT
    * envelope is guarded in-plan: TDen·(m−1)·N² must fit int64 (a
    * double-precision pre-check — exact products appear only below it).
    *
    * Scale shape (100 TB): ONE corpus shuffle (the level-explode into
    * (level, QI, band) partial counts — q201's Expand shape). Everything
    * after is DOMAIN-bounded, not corpus-bounded: the global band frame
    * has ≤ range/width rows (broadcast), the class frame ≤ Σ_level
    * |QI-domain_level| rows, and the per-class cumulative window holds
    * exactly m rows. The band grid is a crossJoin against the BROADCAST
    * band frame — never a corpus-sized window.
    */
  private[graft] def tClosenessAudit(
      customer: DataFrame, nation: DataFrame,
      tNum: Long, tDen: Long): DataFrame = {
    val c = withRegion(customer, nation).withColumn("band",
      when(col("c_acctbal").isNull, raise_error(lit(
        "q214: NULL sensitive value — ordered-EMD t-closeness is " +
          "undefined for an unordered sentinel; scrub or impute upstream")))
        .otherwise(floor(col("c_acctbal") / lit(BalBands(1).toDouble))
          .cast("long")))
    // global ordered distribution — DOMAIN-bounded (≤ range/width rows),
    // so the single-partition cumulative window is safe at any corpus size
    val gw = Window.orderBy(col("band"))
    val glob = c.groupBy(col("band")).agg(count(lit(1)).as("gcnt"))
      .select(col("band"), sum(col("gcnt")).over(gw).as("cum_g"),
        row_number().over(gw).cast("long").as("idx"))
    val tot = glob.agg(max(col("cum_g")).as("n_total"),
      count(lit(1)).as("m_vals"))
    val globT = glob.crossJoin(broadcast(tot))
      .filter(when(col("m_vals") < 2L, raise_error(lit(
        "q214: fewer than 2 ordered sensitive values — the 1/(m-1) EMD " +
          "normalization is degenerate; nothing to audit")))
        .otherwise(lit(true)))
      .filter(when(col("n_total").cast("double") * col("n_total")
          * (col("m_vals") - 1L) * lit(tDen.toDouble) > lit(9.0e18),
        raise_error(lit("q214: TDen*(m-1)*N^2 exceeds the exact-BIGINT " +
          "envelope — rescale the band width or move the comparison to " +
          "DECIMAL(38,0) before trusting this audit")))
        .otherwise(lit(true)))
    val seg = s(col("c_mktsegment"))
    val ladder: Seq[(Column, Column)] =
      Seq((nat, seg), (reg, seg), (reg, star), (star, star))
    val exploded = c.select(explode(array(ladder.zipWithIndex.map {
      case ((q1, q2), i) => struct(lit(i.toLong).as("level"),
        q1.as("q1"), q2.as("q2"), col("band").as("band"))
    }: _*)).as("g")).select(col("g.*"))
    val clsBand = exploded.groupBy(col("level"), col("q1"), col("q2"),
      col("band")).agg(count(lit(1)).as("cnt"))
    val cls = clsBand.groupBy(col("level"), col("q1"), col("q2"))
      .agg(sum(col("cnt")).as("n_class"))
    // every class × every global band (absent bands carry cnt 0 but
    // still contribute |N·cumc − n·cumC| terms); band frame is broadcast
    val grid = cls.crossJoin(broadcast(globT))
      .join(clsBand, Seq("level", "q1", "q2", "band"), "left")
      .na.fill(0L, Seq("cnt"))
    val cw = Window.partitionBy(col("level"), col("q1"), col("q2"))
      .orderBy(col("band")) // exactly m rows per partition
    val perClass = grid
      .withColumn("cum_c", sum(col("cnt")).over(cw))
      .withColumn("term", when(col("idx") < col("m_vals"),
        abs(col("n_total") * col("cum_c") - col("n_class") * col("cum_g")))
        .otherwise(0L))
      .groupBy(col("level"), col("q1"), col("q2"), col("n_class"),
        col("n_total"), col("m_vals"))
      .agg(sum(col("term")).as("d_num"))
      .withColumn("violates", lit(tDen) * col("d_num") >
        lit(tNum) * col("n_class") * col("n_total") * (col("m_vals") - 1L))
    val audit = perClass.groupBy(col("level")).agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("violates"), 1L).otherwise(0L)).as("violating_classes"),
        sum(when(col("violates"), col("n_class")).otherwise(0L))
          .as("records_at_risk"))
      .withColumn("satisfies", col("violating_classes") === lit(0L))
    val chosen = audit.filter(col("satisfies"))
      .agg(min(col("level")).as("chosen_level"))
    audit.crossJoin(broadcast(chosen))
      .filter(when(col("chosen_level").isNull,
        raise_error(lit("q214: no ladder level reaches t-closeness — " +
          "impossible (the top rung is P ≡ Q, EMD 0); corrupted audit")))
        .otherwise(lit(true)))
      .select(col("level"), col("n_classes"), col("violating_classes"),
        col("records_at_risk"), col("satisfies"),
        (col("level") === col("chosen_level")).as("chosen"))
      .orderBy("level")
  }

  def queries: Map[String, Q] = Map(
    // q201 [north star, r12]: the k-anonymity release audit over the
    // customer table's (nation, segment, acctbal) quasi-identifiers.
    "q201_k_anonymity" -> ((spark, dir) => kAnonMemo(spark, dir)),

    // q202 [north star, r12]: the l-diversity audit — q201's
    // homogeneity-attack closure over the same release surface.
    "q202_l_diversity" -> ((spark, dir) => lDivMemo(spark, dir)),

    // q214 [north star, r12]: the t-closeness audit — the triad's
    // skewness-attack closure, exact-integer ordered EMD vs the global
    // sensitive distribution.
    "q214_t_closeness" -> ((spark, dir) => tCloseMemo(spark, dir)))

  /** Session-memoized audit frames (CachePool.memo): the q229 release
    * card consumes the SAME rows the standalone registrations return, so
    * the suite builds each audit once per sf-dir. Plan pins target the
    * raw `*Audit` builders.
    */
  private[graft] def kAnonMemo(spark: SparkSession, dir: String): DataFrame =
    graft.CachePool.memo("q201_k_anonymity", dir)(
      kAnonymityAudit(Tables(spark, dir, "customer"),
        Tables(spark, dir, "nation"), AnonK))

  private[graft] def lDivMemo(spark: SparkSession, dir: String): DataFrame =
    graft.CachePool.memo("q202_l_diversity", dir)(
      lDiversityAudit(Tables(spark, dir, "customer"),
        Tables(spark, dir, "nation"), DivL))

  private[graft] def tCloseMemo(spark: SparkSession, dir: String): DataFrame =
    graft.CachePool.memo("q214_t_closeness", dir)(
      tClosenessAudit(Tables(spark, dir, "customer"),
        Tables(spark, dir, "nation"), TNum, TDen))

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
    val trungs = Seq((nat, seg), (reg, seg), (reg, "'*'"), ("'*'", "'*'"))
    val tlv = trungs.zipWithIndex.map { case ((q1, q2), i) =>
      s"SELECT $i AS level, $q1 AS q1, $q2 AS q2, band FROM cn"
    }.mkString("\n  UNION ALL\n  ")
    Map(
      // the identical exact-integer ordered EMD, re-derived: same band
      // arithmetic, same cumulative scaling, same rational threshold
      "q214_t_closeness" ->
        s"""WITH cn AS (SELECT c.*, n.n_regionkey,
           |              CAST(floor(c_acctbal/${BalBands(1)}.0) AS BIGINT) AS band
           |            FROM customer c
           |            LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey),
           |gt AS (SELECT band,
           |         SUM(gcnt) OVER (ORDER BY band) AS cum_g,
           |         CAST(ROW_NUMBER() OVER (ORDER BY band) AS BIGINT) AS idx
           |       FROM (SELECT band, COUNT(*) AS gcnt FROM cn GROUP BY band)),
           |tots AS (SELECT MAX(cum_g) AS n_total, COUNT(*) AS m_vals FROM gt),
           |lv AS (
           |  $tlv),
           |cb AS (SELECT level, q1, q2, band, COUNT(*) AS cnt
           |       FROM lv GROUP BY level, q1, q2, band),
           |cl AS (SELECT level, q1, q2, SUM(cnt) AS n_class
           |       FROM cb GROUP BY level, q1, q2),
           |grid AS (SELECT cl.level, cl.q1, cl.q2, cl.n_class,
           |           gt.band, gt.cum_g, gt.idx,
           |           t.n_total, t.m_vals, COALESCE(cb.cnt, 0) AS cnt
           |         FROM cl CROSS JOIN gt CROSS JOIN tots t
           |         LEFT JOIN cb ON cb.level = cl.level AND cb.q1 = cl.q1
           |           AND cb.q2 = cl.q2 AND cb.band = gt.band),
           |terms AS (SELECT level, q1, q2, n_class, n_total, m_vals,
           |            CASE WHEN idx < m_vals THEN ABS(n_total *
           |              SUM(cnt) OVER (PARTITION BY level, q1, q2
           |                             ORDER BY band)
           |              - n_class * cum_g) ELSE 0 END AS term
           |          FROM grid),
           |pc AS (SELECT level, q1, q2, n_class,
           |         $TDen * SUM(term) >
           |           $TNum * n_class * n_total * (m_vals - 1) AS violates
           |       FROM terms
           |       GROUP BY level, q1, q2, n_class, n_total, m_vals),
           |aud AS (SELECT level, COUNT(*) AS n_classes,
           |          SUM(CASE WHEN violates THEN 1 ELSE 0 END) AS violating_classes,
           |          SUM(CASE WHEN violates THEN n_class ELSE 0 END) AS records_at_risk
           |        FROM pc GROUP BY level),
           |ch AS (SELECT MIN(level) AS chosen_level FROM aud
           |       WHERE violating_classes = 0)
           |SELECT CAST(level AS BIGINT) AS level,
           |  CAST(n_classes AS BIGINT) AS n_classes,
           |  CAST(violating_classes AS BIGINT) AS violating_classes,
           |  CAST(records_at_risk AS BIGINT) AS records_at_risk,
           |  violating_classes = 0 AS satisfies,
           |  level = (SELECT chosen_level FROM ch) AS chosen
           |FROM aud ORDER BY level""".stripMargin,
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
