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
        pmod(graft.functions.Hashing.md5Long60(concat(lit("edge:"),
          col("src").cast("string"), lit(s":$j"))), col("n"))): _*)).as("dst"))
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

  /** HITS fixed-point scale (scores re-normalized to max = 2^20 each
    * half-step — integer max-normalization replaces the classic L2
    * norm, whose sqrt is not bit-portable; the ORDER structure HITS is
    * used for survives any monotone rescale) and iteration count.
    */
  private[graft] val HitsScale = 1L << 20
  private[graft] val HitsIters = 3

  /** q208: HITS (Kleinberg JACM'99) on the REAL user–item bipartite
    * graph in the event log (props.k = the touched item): hub(user) =
    * Σ authority(item) over the user's items, authority(item) =
    * Σ hub(user) over the item's users, alternating, each half-step
    * max-normalized back to [0, 2^20] in pure BIGINT (⌊s·2^20/max⌋).
    * This is the engagement-quality decomposition a curation pipeline
    * reads: authorities = items endorsed by well-connected users,
    * hubs = users whose attention predicts item quality.
    *
    * Scale shape: the dedup'd edge list is built once, repartitioned on
    * user and cached; each half-step is one equi-join + one
    * partial-aggregating sum + a one-row broadcast max. 2T shuffles
    * total, linear in |E|.
    */
  private[graft] def hitsBipartite(events: DataFrame): DataFrame = {
    val edges = events
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
      .distinct()
      .repartition(col("user_id")).cache()
    var auth: DataFrame = edges.select(col("item")).distinct()
      .select(col("item"), lit(HitsScale).as("a"))
    // classic uniform h₀ — always overwritten when HitsIters ≥ 1, but a
    // real frame keeps the alternation well-defined at any iteration
    // count (a schemaless placeholder would trap a future reorder)
    var hub: DataFrame = edges.select(col("user_id")).distinct()
      .select(col("user_id"), lit(HitsScale).as("h"))
    for (_ <- 1 to HitsIters) {
      // localCheckpoint per half-step: the broadcast max re-reads its
      // input, so without lineage truncation every half-step recomputes
      // the whole alternating prefix — the r11 SuffixScrub lesson
      // (measured here: 58 s → ~2 s at sf0.1)
      val hubRaw = edges.join(auth, "item")
        .groupBy(col("user_id")).agg(sum(col("a")).as("hr"))
        .localCheckpoint()
      hub = hubRaw.crossJoin(broadcast(hubRaw.agg(max(col("hr")).as("hm"))))
        .select(col("user_id"), expr(s"(hr * $HitsScale) div hm").as("h"))
      val authRaw = edges.join(hub, "user_id")
        .groupBy(col("item")).agg(sum(col("h")).as("ar"))
        .localCheckpoint()
      auth = authRaw.crossJoin(broadcast(authRaw.agg(max(col("ar")).as("am"))))
        .select(col("item"), expr(s"(ar * $HitsScale) div am").as("a"))
    }
    hub.select(lit("hub").as("kind"), col("user_id").as("id"),
        col("h").as("score"))
      .unionByName(auth.select(lit("authority").as("kind"),
        col("item").as("id"), col("a").as("score")))
      .orderBy("kind", "id")
  }

  def queries: Map[String, Q] = Map(
    // q204 [north star, r12]: exact-integer PageRank over the corpus
    // link graph — the crawl-frontier / quality-prior centrality tier.
    "q204_pagerank" -> ((spark, dir) =>
      pageRank(Tables(spark, dir, "documents"))),

    // q208 [north star, r12]: HITS hubs/authorities on the user–item
    // engagement graph — integer max-normalized, order-preserving.
    "q208_hits_bipartite" -> ((spark, dir) =>
      hitsBipartite(Tables(spark, dir, "events"))))

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
    val hits = (1 to HitsIters).map { t =>
      val pa = if (t == 1) "a0" else s"a${t - 1}"
      s"""h${t}r AS (SELECT user_id, SUM(a) AS hr FROM e JOIN $pa USING (item)
         |        GROUP BY user_id),
         |h$t AS (SELECT user_id,
         |        (hr * $HitsScale) // (SELECT MAX(hr) FROM h${t}r) AS h
         |      FROM h${t}r),
         |a${t}r AS (SELECT item, SUM(h) AS ar FROM e JOIN h$t USING (user_id)
         |        GROUP BY item),
         |a$t AS (SELECT item,
         |        (ar * $HitsScale) // (SELECT MAX(ar) FROM a${t}r) AS a
         |      FROM a${t}r)""".stripMargin
    }.mkString(",\n")
    Map(
      "q208_hits_bipartite" ->
        s"""WITH e AS (SELECT DISTINCT user_id,
           |        CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
           |      FROM events
           |      WHERE json_extract_string(props, '$$.k') IS NOT NULL),
           |a0 AS (SELECT DISTINCT item, CAST($HitsScale AS BIGINT) AS a FROM e),
           |$hits
           |SELECT kind, id, CAST(score AS BIGINT) AS score FROM (
           |  SELECT 'hub' AS kind, user_id AS id, h AS score FROM h$HitsIters
           |  UNION ALL
           |  SELECT 'authority', item, a FROM a$HitsIters
           |) z ORDER BY kind, id""".stripMargin,
      "q204_pagerank" ->
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
