package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.operators.Footer

/** The planner-rule half of the session install — injected by THE single
  * extensions entry point [[graft.GraftExtensions]] (r15 verdict #4: two
  * classes shared the simple name `GraftExtensions` in different
  * packages, functions in one and rules in the other, and a user passing
  * either conf key silently lost half the surface; this object is no
  * longer injectable by name, it only contributes [[inject]]).
  *
  * Both rules plan from the footer-stats catalog: [[JoinReorderRule]]
  * for ORDER, then [[StatsBroadcastRule]] for STRATEGY (reorder first,
  * so the broadcast decision sees the rebuilt chain; the q267
  * composition spec pins exactly this pairing).
  *
  * The catalog comes from the session conf `spark.graft.catalogDir`
  * (a directory of parquet tables whose footers carry the stats),
  * resolved AT OPTIMIZATION TIME per rule application and memoized per
  * directory (one footer walk per table per JVM — the q268 stance:
  * plan from a catalog, not from file tails on every query). Soundness
  * composes by abstention end to end: no conf → empty catalog → the
  * rules find no estimates → every plan is left untouched.
  */
object PlannerRules {

  /** Install both catalog-driven rules — order first, strategy second.
    * The reorder rule additionally receives the numeric column RANGES,
    * so selective filters discount an item's effective row count
    * (r15 verdict #5); the broadcast rule keeps the raw counts.
    */
  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session =>
      ConfCatalogRule(session, cs => JoinReorderRule(cs.rows, cs.ranges)))
    ext.injectOptimizerRule(session =>
      ConfCatalogRule(session, cs => StatsBroadcastRule(cs.rows)))
  }

  /** What a catalog row carries per table: the footer row count and
    * every numeric column's (min, max) envelope — the q239 facts the
    * rules consume (rows → size; ranges → bounded selectivity).
    */
  private[graft] case class CatalogStats(rows: Map[String, Long],
      ranges: Map[String, Map[String, (Long, Long)]])

  /** One memoized footer-walk per catalog directory per JVM. */
  private val catalogCache =
    new java.util.concurrent.ConcurrentHashMap[String, CatalogStats]()

  /** The catalog for `dir`: every known table's max column row count
    * AND numeric min/max envelopes from its parquet footers (the q239
    * walk), memoized.
    */
  private[graft] def catalogStatsFor(dir: String): CatalogStats =
    catalogCache.computeIfAbsent(dir, d => {
      val per = graft.Tables.all.map { n =>
        val st = Footer.tableStats(d, n)
        val rng = st.collect {
          case (c, s) if s.physical == "INT64" || s.physical == "INT32" =>
            c -> (s.min_value.toLong, s.max_value.toLong)
        }.toMap
        (n, st.values.map(_.n_values).max, rng)
      }
      CatalogStats(per.map(p => p._1 -> p._2).toMap,
        per.map(p => p._1 -> p._3).toMap)
    })

  private[graft] def catalogFor(dir: String): Map[String, Long] =
    catalogStatsFor(dir).rows

  /** Bridges session conf → catalog → rule at APPLY time (the conf may
    * be set after sessionState construction; a builder-time snapshot
    * would silently pin an empty catalog). Unset conf → empty catalog
    * → the wrapped rule abstains everywhere.
    */
  private[graft] case class ConfCatalogRule(session: SparkSession,
      mk: CatalogStats => Rule[LogicalPlan]) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val dir =
        try Option(session.conf.get("spark.graft.catalogDir"))
        catch { case _: Exception => None }
      dir match {
        case Some(d) if d.nonEmpty => mk(catalogStatsFor(d)).apply(plan)
        case _                     => plan
      }
    }
  }
}
