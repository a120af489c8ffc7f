package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Link-graph centrality for crawl prioritization (SURVEY.md §2 north
  * star): a production crawl orders its frontier by PageRank-class
  * centrality (Page et al. '99; OPIC is the online variant), and a
  * training-data pipeline reuses the same signal as a document-quality
  * prior (Common Crawl ships host-level centrality beside every dump).
  *
  * q204 runs PageRank with the house exactness stance: the damping
  * recurrence in pure BIGINT arithmetic —
  *   r₀(v) = SCALE;  r_{t+1}(v) = ⌊0.15·SCALE⌋ + Σ_{u→v} ⌊85·r_t(u) / (100·d)⌋
  * with fixed out-degree d, T=5 unrolled iterations. Integer floors make
  * every rank value hash cross-engine (the q83/q198 log-free stance);
  * the float classic is the same dataflow with the same convergence
  * order structure. The graph is a deterministic md5-derived 4-regular
  * (out-degree) digraph over the corpus — self-loops and parallel edges
  * kept (both are legal PageRank inputs and both are deterministic), so
  * the oracle regenerates the identical edge set from the same hashes.
  *
  * Scale shape (100 TB): the classic iterative dataflow — edges are
  * generated ONCE and cached; each iteration is one equi-join
  * (edges ⋈ ranks on src) + one partial-aggregating sum keyed dst.
  * T iterations = T shuffles, each linear in |E|; on a real cluster
  * edges and ranks are CO-PARTITIONED on the join key so the edge side
  * never re-shuffles (here: one explicit repartition before the loop,
  * reused by every iteration). No windows, no pair joins; the top-k
  * frontier cut would be TakeOrderedAndProject (the output here keeps
  * all ranks, doc-ordered, so the oracle hashes the full fixpoint).
  */
object Graph extends QueryGroup {

  /** Rank fixed-point scale, damping split, out-degree, iterations. */
  private[graft] val PrScale = 1000000000000L // 10^12
  private[graft] val PrBase = 15L * PrScale / 100L
  private[graft] val OutDeg = 4
  private[graft] val PrIters = 5

  /** The deterministic out-edges: doc u's j-th link targets
    * md5("edge:u:j") mod n — linear generation, identical in SQL.
    */
  private[graft] def edges(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n"))
    docs.select(col("doc_id").as("src")).crossJoin(broadcast(n))
      .select(col("src"), explode(array((1 to OutDeg).map(j =>
        pmod(conv(substring(md5(concat(lit("edge:"),
          col("src").cast("string"), lit(s":$j"))), 1, 15), 16, 10)
          .cast("long"), col("n"))): _*)).as("dst"))
  }

  private[graft] def pageRank(docs: DataFrame): DataFrame = {
    // co-partition once; every iteration's join reuses this layout
    val e = edges(docs).repartition(col("src")).cache()
    val verts = docs.select(col("doc_id").as("v"), col("source"))
    var ranks: DataFrame = verts.select(col("v"), lit(PrScale).as("r"))
    for (_ <- 1 to PrIters) {
      val contrib = e.join(ranks, e("src") === ranks("v"))
        .groupBy(col("dst"))
        .agg(sum(expr(s"(r * 85) div ${100L * OutDeg}")).as("m"))
      ranks = verts.select(col("v"))
        .join(contrib, col("v") === col("dst"), "left")
        .select(col("v"), (lit(PrBase) + coalesce(col("m"), lit(0L))).as("r"))
    }
    verts.join(ranks, "v")
      .select(col("v").as("doc_id"), col("source"), col("r").as("pr"))
      .orderBy("doc_id")
  }

  def queries: Map[String, Q] = Map(
    // q204 [north star, r12]: exact-integer PageRank over the corpus
    // link graph — the crawl-frontier / quality-prior centrality tier.
    "q204_pagerank" -> ((spark, dir) =>
      pageRank(Tables(spark, dir, "documents"))))

  def oracles: Map[String, String] = {
    val div = 100L * OutDeg
    // r_{t} CTEs unrolled: the identical integer recurrence
    val iters = (1 to PrIters).map { t =>
      s"""r$t AS (SELECT d.doc_id AS v,
         |  $PrBase + COALESCE(SUM((r.r * 85) // $div), 0) AS r
         |FROM documents d
         |LEFT JOIN e ON e.dst = d.doc_id
         |LEFT JOIN r${t - 1} r ON r.v = e.src
         |GROUP BY d.doc_id)""".stripMargin
    }.mkString(",\n")
    Map("q204_pagerank" ->
      s"""WITH nc AS (SELECT COUNT(*) AS n FROM documents),
         |e AS (SELECT d.doc_id AS src,
         |        ('0x'||substring(md5('edge:'||CAST(d.doc_id AS VARCHAR)||':'||CAST(j.j AS VARCHAR)),1,15))::BIGINT
         |          % (SELECT n FROM nc) AS dst
         |      FROM documents d, UNNEST(generate_series(1, $OutDeg)) AS j(j)),
         |r0 AS (SELECT doc_id AS v, CAST($PrScale AS BIGINT) AS r FROM documents),
         |$iters
         |SELECT d.doc_id, d.source, CAST(f.r AS BIGINT) AS pr
         |FROM documents d JOIN r$PrIters f ON f.v = d.doc_id
         |ORDER BY d.doc_id""".stripMargin)
  }
}
