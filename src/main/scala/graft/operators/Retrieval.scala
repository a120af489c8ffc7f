package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextOps

/** Ranked full-text retrieval over the document corpus — the search-side
  * capability of a training-data pipeline (SURVEY.md §2.10 north star):
  * "find the documents most relevant to these terms" is the primitive
  * behind corpus inspection, eval-set mining, and targeted curation.
  *
  * q83 scores BM25 (Robertson et al., TREC-3) with one deliberate change:
  * the usual `log`-shaped IDF is replaced by its rational core
  * `(N - df + 0.5) / (df + 0.5)`. `log` is a libm call whose last-bit
  * rounding differs across engines, which would poison the DuckDB oracle;
  * the rational form is division-only (bit-identical IEEE on both sides),
  * keeps the same relevance ORDER (x -> log x is monotone), and stays
  * positive on common terms where the log form goes negative. k1 = 1.25
  * and b = 0.75 are exact binary fractions for the same reason.
  *
  * Scale shape (100 TB): the corpus statistics (N, avg doc length, per-term
  * document frequencies) reduce to ONE row — a partial-aggregating global
  * agg — which re-joins the corpus as a broadcast; per-document scoring is
  * then map-only expression work fused into the scan, and the top-20 cut is
  * TakeOrderedAndProject (each partition keeps its local 20; no global sort
  * shuffle). The only single-partition step is the row_number over the 20
  * survivors. The stats pass does re-scan the corpus once; a deployment
  * serving many query sets would materialize the stats row instead.
  */
object Retrieval extends QueryGroup {

  /** The fixed query terms of the q83 instance: two common terms and one
    * rare term (df ≈ 5% of docs) so the IDF spread actually exercises the
    * ranking, not just the tf term.
    */
  private[graft] val QueryTerms = Seq("scan", "join", "dup")

  private val K1 = 1.25 // term-frequency saturation; exact in binary
  private val B = 0.75  // length-normalization strength; exact in binary

  /** RRF constant k (Cormack & Clarke SIGIR'09 use 60; any positive
    * constant preserves the method — 4 keeps the exact-integer weights
    * below 2^33, see [[RrfLcm]]) and the fused cut depth.
    */
  private[graft] val RrfK = 4L
  private[graft] val RrfLegK = 20
  private[graft] val RrfTopK = 15

  /** lcm(5..24) — the RRF denominators `RrfK + rank` for ranks 1..20.
    * Scaling the reciprocal-rank weight 1/(k+r) by this makes every
    * contribution an EXACT BIGINT (`RrfLcm div (k+r)`, zero remainder by
    * construction), so the fused score is pure integer arithmetic and
    * the cross-engine hash cannot drift on float summation order — the
    * q83/q153 log-free stance applied to rank fusion. Scores are scaled
    * by a shared constant, so the fused ORDER is exactly the textbook
    * RRF order. OperatorSpec asserts the divisibility invariant and
    * re-derives the order from exact rational arithmetic.
    */
  private[graft] val RrfLcm = 5354228880L

  /** q200's fusion: reciprocal-rank fusion of the BM25 leg (q83's exact
    * operator, top-20) and the dense-cosine leg (q43's exact operator,
    * top-20, query = doc 0's embedding — the ANN contract excludes the
    * query vector itself from its own neighbor list). A doc missing
    * from a leg contributes 0 from that leg and carries a NULL leg rank
    * in the output (standard RRF: absence is not rank-∞-with-weight,
    * it is no contribution).
    *
    * Scale shape (100 TB): both legs are already the scale-shaped
    * operators — BM25's one-row stats broadcast + TakeOrderedAndProject
    * cut, cosine's broadcast query + bounded TopKAgg partial agg — so
    * the corpus is scanned exactly twice (once per modality) with no
    * pair joins; the fusion itself joins two ≤RrfLegK-row lists,
    * CONSTANT work independent of corpus size. A multi-query deployment
    * fans both legs out on q_id and fuses per q_id with the identical
    * constant-size join.
    */
  private[graft] def rrfHybrid(
      docs: org.apache.spark.sql.DataFrame,
      emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sparse = bm25TopK(docs, QueryTerms, RrfLegK)
      .select(col("doc_id"), col("rank").as("bm25_rank"))
    val dense = Similarity.cosineTopK(
        emb, emb.filter(col("vec_id") === 0), RrfLegK)
      .select(col("n_id").as("doc_id"), col("rank").as("cos_rank"))
    val contrib = (r: String) =>
      coalesce(expr(s"$RrfLcm div ($RrfK + $r)"), lit(0L))
    val fused = sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("cos_rank"),
        (contrib("bm25_rank") + contrib("cos_rank")).as("rrf_score"))
    fused
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(RrfTopK)
      .withColumn("fused_rank",
        row_number().over(Window.orderBy(col("rrf_score").desc, col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("fused_rank"), col("rrf_score"),
        col("bm25_rank"), col("cos_rank"))
      .orderBy("fused_rank")
  }

  /** q209: the L2 PROXIMITY RERANK over q200's fused candidates — the
    * classic retrieval cascade (cheap L1 recall, expensive L2
    * precision on a bounded candidate set): per candidate, the minimum
    * token window covering ALL query terms (Clarke et al.'s minimal
    * cover — terms appearing near each other beat the same terms
    * scattered), an exact-integer score; candidates lacking a term
    * carry NULL and sort last, ties broken by the L1 fused rank.
    *
    * Scale shape: the candidate set is ≤ RrfTopK rows — the rerank
    * joins the BROADCAST candidate list against the corpus scan once
    * to fetch text, then all window work is per-row expression
    * arithmetic on 15 docs. L2 cost is INDEPENDENT of corpus size by
    * construction; a deeper cascade just raises the candidate k.
    */
  private[graft] def proximityRerank(
      docs: org.apache.spark.sql.DataFrame,
      emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cand = rrfHybrid(docs, emb).select(col("doc_id"), col("fused_rank"))
    def posOf(t: String): Column =
      filter(transform(col("ws"), (w, i) =>
        when(w === lit(t), i + 1).otherwise(lit(null).cast("int"))),
        x => x.isNotNull)
    val win = array_min(flatten(transform(col("p1"), x1 =>
      flatten(transform(col("p2"), x2 =>
        transform(col("p3"), x3 =>
          greatest(x1, x2, x3) - least(x1, x2, x3) + 1))))))
    docs.join(broadcast(cand), "doc_id")
      .select(col("doc_id"), col("fused_rank"), split(col("text"), " ").as("ws"))
      .withColumn("p1", posOf(QueryTerms(0)))
      .withColumn("p2", posOf(QueryTerms(1)))
      .withColumn("p3", posOf(QueryTerms(2)))
      .withColumn("win", win.cast("long"))
      .withColumn("rerank", row_number().over(
        Window.orderBy(col("win").asc_nulls_last, col("fused_rank").asc))
        .cast("long"))
      .select(col("doc_id"), col("rerank"), col("win"), col("fused_rank"))
      .orderBy("rerank")
  }

  /** BM25 top-k over `(doc_id, text)`-shaped docs for `terms`. Output
    * carries ids, ranks, and exact-integer term frequencies — never the
    * double score (QueryGroup determinism rules).
    */
  private[graft] def bm25TopK(
      docs: org.apache.spark.sql.DataFrame, terms: Seq[String],
      k: Int): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty && terms.size <= 8,
      s"bm25TopK is the few-term interactive tier (got ${terms.size} terms); " +
        "a many-term workload should go through an inverted index instead")
    val tfCol = (t: String) =>
      size(filter(col("ws"), w => w === lit(t))).cast("long")
    val base = docs
      .withColumn("ws", TextOps.tokens(col("text")))
      .withColumn("dl", size(col("ws")).cast("long"))
      .select(Seq(col("doc_id"), col("dl")) ++
        terms.zipWithIndex.map { case (t, i) => tfCol(t).as(s"tf${i + 1}") }: _*)
    val statCols = sum(col("dl")).as("sumdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf${i + 1}") > 0, 1L).otherwise(0L))
          .as(s"df${i + 1}"))
    val stats = base.agg(count(lit(1)).as("n"), statCols: _*)
    // identical expression TREE to the oracle SQL — float determinism
    // depends on op-for-op association, not just the same formula
    val avgdl = col("sumdl").cast("double") / col("n").cast("double")
    val lnorm = lit(K1) * (lit(1.0 - B) + lit(B) * (col("dl").cast("double") / avgdl))
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      val idf = ((col("n") - col(s"df$i")).cast("double") + 0.5) /
        (col(s"df$i").cast("double") + 0.5)
      (idf * (tf * lit(K1 + 1.0))) / (tf + lnorm)
    }
    val score = terms.indices.map(i => termScore(i + 1)).reduce(_ + _)
    val top = base.crossJoin(broadcast(stats))
      .withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .select(Seq(col("doc_id"), col("rank")) ++
        terms.indices.map(i => col(s"tf${i + 1}")): _*)
      .orderBy("rank")
  }

  def queries: Map[String, Q] = Map(
    // q83 [north star]: BM25 ranked retrieval, the 3-term/top-20 instance.
    "q83_bm25" -> ((spark, dir) =>
      bm25TopK(Tables(spark, dir, "documents"), QueryTerms, 20)),

    // q200 [north star, r12]: RECIPROCAL-RANK FUSION hybrid retrieval
    // (Cormack & Clarke, SIGIR'09) — the closure of the retrieval tier:
    // production search over a training corpus is HYBRID (a sparse
    // lexical leg + a dense embedding leg, fused by rank), because the
    // two modalities fail differently and RRF needs no score
    // calibration — only ranks. Legs are the already-verified exact
    // operators (q83 BM25, q43 brute-force cosine); fusion weights are
    // LCM-scaled exact integers (see RrfLcm), so the fused surface
    // hashes cross-engine with zero float-summation risk. Output: the
    // fused top-15 with each leg's rank beside the integer RRF score
    // (NULL rank = absent from that leg).
    "q200_rrf_hybrid" -> ((spark, dir) =>
      rrfHybrid(Tables(spark, dir, "documents"),
        Tables(spark, dir, "embeddings"))),

    // q209 [north star, r12]: proximity rerank — the L2 stage of the
    // retrieval cascade over q200's fused candidates (min covering
    // window of all query terms, exact integers, cost independent of
    // corpus size).
    "q209_proximity_rerank" -> ((spark, dir) =>
      proximityRerank(Tables(spark, dir, "documents"),
        Tables(spark, dir, "embeddings"))),

    // q130 [north star]: INVERTED-INDEX construction — the index-build
    // side of q83's query-time scoring: per vocabulary term, document
    // frequency plus the posting list itself (the 50 LOWEST doc ids,
    // ascending — a q58-style cap so a stop-word's postings cannot make
    // one output row corpus-sized; real indexes tier or skip such
    // terms, and df carries the true count regardless). The cap is
    // enforced by the bounded TopKAgg, so map-side partials carry ≤ 50
    // ids per (word, partition) — a collect_list-then-slice would
    // materialize the full corpus-sized posting before cutting it.
    // One (word)-keyed shuffle; the vocabulary cut is the q123
    // TakeOrderedAndProject + broadcast.
    "q130_posting_lists" -> ((spark, dir) => {
      val topk = udaf(new graft.functions.TopKAgg(50),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      val dw = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("w"))
      val vocab = dw.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("w")).limit(100)
      dw.join(broadcast(vocab), "w")
        .groupBy(col("w"))
        .agg(first(col("df")).as("df"),
          // score = -doc_id: TopKAgg's (score DESC, id ASC) order yields
          // the 50 smallest ids, already ascending
          topk((-col("doc_id")).cast("double"), col("doc_id")).as("top"))
        .select(col("w"), col("df"),
          array_join(col("top.id").cast("array<string>"), ",").as("postings"))
        .orderBy("w")
    }),

    // q96 [north star]: per-document top-3 TF-IDF terms — the keyword
    // summary a curation pipeline attaches to every doc (topic tagging,
    // index keys, dedup explanations). Same rational log-free IDF as q83
    // so both engines rank by bit-identical doubles; the output carries
    // only ids/ranks/exact integers, never the double score (QueryGroup
    // rules). Scale: (doc, word) tf and word df are partial-aggregating
    // group-bys; the df join is equi-keyed (fanout = 1 df row per word);
    // the one-row corpus count broadcasts; the per-doc top-3 is a
    // row_number window partitioned on doc_id — the q26 top-k-per-group
    // shape, one shuffle keyed on the document, no global sort.
    "q96_tfidf_topterms" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val dw = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = dw.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      dw.join(dfreq, "word").crossJoin(broadcast(n))
        .withColumn("score",
          col("tf").cast("double") *
            (((col("n") - col("df")).cast("double") + 0.5) /
              (col("df").cast("double") + 0.5)))
        .withColumn("rank", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("score").desc, col("word"))).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("word"),
          col("tf"), col("df"))
        .orderBy("doc_id", "rank")
    }))

  def oracles: Map[String, String] = {
    // the same expression tree as the Spark side, term by term
    val termSql = (i: Int) =>
      s"""((CAST(n - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)
         |   * (CAST(tf$i AS DOUBLE) * 2.25))
         |  / (CAST(tf$i AS DOUBLE)
         |     + 1.25 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
         |                              / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))"""
        .stripMargin
    val tfSql = QueryTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(ws, x -> x = '$t')) AS tf${i + 1}"
    }.mkString(",\n        ")
    val dfSql = QueryTerms.indices.map(i =>
      s"sum(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END) AS df${i + 1}")
      .mkString(",\n         ")
    val tfOut = QueryTerms.indices.map(i =>
      s"CAST(tf${i + 1} AS BIGINT) AS tf${i + 1}").mkString(", ")
    // the q83 scoring chain (shared verbatim by the q200 fusion oracle:
    // the sparse leg of a hybrid result must be EXACTLY the standalone
    // BM25 result, so the SQL is factored, not re-derived)
    val bm25Ctes =
      s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |t AS (SELECT doc_id, len(ws) AS dl,
         |        $tfSql
         |      FROM w),
         |st AS (SELECT count(*) AS n, sum(dl) AS sumdl,
         |         $dfSql
         |       FROM t),
         |s AS (SELECT doc_id, dl, tf1, tf2, tf3, n, sumdl, df1, df2, df3,
         |        ${QueryTerms.indices.map(i => s"(${termSql(i + 1)})").mkString("\n        + ")} AS score
         |      FROM t, st),
         |top AS (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 20)"""
        .stripMargin
    val cosQ0 = {
      val d = (a: String, b: String) => Similarity.dot(a, b)
      s"(${d("q.q_emb", "e.embedding")} / (sqrt(${d("q.q_emb", "q.q_emb")}) * sqrt(${d("e.embedding", "e.embedding")})))"
    }
    // the whole q200 fusion chain, ending in `fused` (the top-RrfTopK
    // candidates) — shared verbatim by the q209 rerank oracle: the L2
    // stage must rerank EXACTLY the L1 stage's candidates
    val rrfCtes =
      s"""$bm25Ctes,
         |sp AS (SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bm25_rank
         |       FROM top),
         |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |dcos AS (SELECT e.vec_id AS doc_id, $cosQ0 AS cos
         |         FROM embeddings e, q WHERE e.vec_id <> 0),
         |de AS (SELECT doc_id, cos_rank FROM (
         |         SELECT doc_id,
         |           CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS cos_rank
         |         FROM dcos) t WHERE cos_rank <= $RrfLegK),
         |f AS (SELECT COALESCE(sp.doc_id, de.doc_id) AS doc_id,
         |        sp.bm25_rank, de.cos_rank,
         |        COALESCE($RrfLcm // ($RrfK + sp.bm25_rank), 0)
         |          + COALESCE($RrfLcm // ($RrfK + de.cos_rank), 0) AS rrf_score
         |      FROM sp FULL OUTER JOIN de ON de.doc_id = sp.doc_id),
         |r AS (SELECT doc_id,
         |        CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank,
         |        rrf_score, bm25_rank, cos_rank
         |      FROM f),
         |fused AS (SELECT * FROM r WHERE fused_rank <= $RrfTopK)""".stripMargin
    Map(
      // q200: both legs re-derived through their standalone oracles
      // (q83's CTEs verbatim; q43's cosine fold with query = vec 0),
      // fused with the same lcm-scaled integer weights (// = BIGINT
      // division in DuckDB, exact by the divisibility invariant)
      "q200_rrf_hybrid" ->
        s"""WITH $rrfCtes
           |SELECT doc_id, fused_rank, CAST(rrf_score AS BIGINT) AS rrf_score,
           |  bm25_rank, cos_rank
           |FROM fused ORDER BY fused_rank""".stripMargin,
      // q209: the fusion chain verbatim, then the L2 rerank — term
      // positions via generate_series, the min covering window as the
      // min over all position triples (the candidate set is 15 docs,
      // so the triple product is bounded, the same shape the engine's
      // nested transform takes)
      "q209_proximity_rerank" ->
        s"""WITH $rrfCtes,
           |cd AS (SELECT f.doc_id, f.fused_rank, d.text FROM fused f
           |       JOIN documents d ON d.doc_id = f.doc_id),
           |ws AS (SELECT doc_id, fused_rank, string_split(text, ' ') AS w FROM cd),
           |pos AS (SELECT doc_id, CAST(i AS BIGINT) AS p, w[i] AS tok
           |        FROM ws, UNNEST(generate_series(1, len(w))) AS t(i)),
           |win AS (SELECT p1.doc_id,
           |          MIN(GREATEST(p1.p, p2.p, p3.p) - LEAST(p1.p, p2.p, p3.p) + 1) AS win
           |        FROM pos p1
           |        JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.tok = '${QueryTerms(1)}'
           |        JOIN pos p3 ON p3.doc_id = p1.doc_id AND p3.tok = '${QueryTerms(2)}'
           |        WHERE p1.tok = '${QueryTerms(0)}'
           |        GROUP BY p1.doc_id)
           |SELECT c.doc_id,
           |  CAST(row_number() OVER (ORDER BY w.win ASC NULLS LAST, c.fused_rank ASC) AS BIGINT) AS rerank,
           |  CAST(w.win AS BIGINT) AS win, c.fused_rank
           |FROM cd c LEFT JOIN win w ON w.doc_id = c.doc_id
           |ORDER BY rerank""".stripMargin,
      "q130_posting_lists" ->
        """WITH dw AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
          |            FROM documents),
          |v AS (SELECT w, df FROM (
          |        SELECT w, CAST(count(*) AS BIGINT) AS df,
          |               row_number() OVER (ORDER BY count(*) DESC, w) AS rk
          |        FROM dw GROUP BY w) t WHERE rk <= 100)
          |SELECT v.w, v.df,
          |  array_to_string(list_sort(list(dw.doc_id))[1:50], ',') AS postings
          |FROM dw JOIN v ON v.w = dw.w
          |GROUP BY v.w, v.df ORDER BY v.w""".stripMargin,
      "q83_bm25" ->
        s"""WITH $bm25Ctes
           |SELECT doc_id,
           |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
           |  $tfOut
           |FROM top ORDER BY rank""".stripMargin,
      "q96_tfidf_topterms" ->
        """WITH dw AS (SELECT doc_id, word, count(*) AS tf
          |            FROM (SELECT doc_id, unnest(string_split(text,' ')) AS word
          |                  FROM documents) t
          |            GROUP BY doc_id, word),
          |f AS (SELECT word, count(*) AS df FROM dw GROUP BY word),
          |nn AS (SELECT count(*) AS n FROM documents),
          |s AS (SELECT dw.doc_id, dw.word, dw.tf, f.df,
          |        CAST(dw.tf AS DOUBLE)
          |          * ((CAST(nn.n - f.df AS DOUBLE) + 0.5)
          |             / (CAST(f.df AS DOUBLE) + 0.5)) AS score
          |      FROM dw JOIN f USING (word) CROSS JOIN nn),
          |r AS (SELECT doc_id, word, tf, df,
          |        row_number() OVER (PARTITION BY doc_id
          |          ORDER BY score DESC, word) AS rank
          |      FROM s)
          |SELECT doc_id, CAST(rank AS BIGINT) AS rank, word,
          |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
          |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)
  }
}
