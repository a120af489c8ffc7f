package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextOps

/** Text-analysis operators for training-data pipelines — SURVEY.md §2.10
  * (q44–q45) plus the north-star additions: language ID, quality scoring,
  * token counting, document fingerprinting (q50–q53).
  *
  * Scale: q44 is the only shuffling query (token group-by — partial
  * aggregation makes the shuffle carry one row per distinct token per
  * partition, not per occurrence). Everything else is per-row expression
  * work fused into the scan.
  */
object TextAnalysis extends QueryGroup {

  /** q89: a token is "rare" when its document frequency is at or below
    * this. 2 ≈ hapax/dis legomena — the classic noise band.
    */
  val RareDfMax = 2

  /** q90: width (in tokens) of the duplicated-span n-grams. 5 is wide
    * enough that a shared span implies copying, not phrase reuse, while
    * still catching partial-paragraph duplication that document-level
    * Jaccard misses.
    */
  val SpanWidth = 5

  /** Canonically-DECOMPOSED probe suffix for q182: 'e'+U+0301 and
    * 'i'+U+0308 are byte-distinct from but canonically equal to é/ï —
    * exactly how real crawls ship mixed-normalization text. Guarantees
    * every fixture doc exercises an actual compose (changed = true).
    */
  private val DenormProbe = " cafe\u0301 nai\u0308ve"

  /** q232's term blocklist: corpus terms + a phrase + a guaranteed
    * miss. Every entry is border-free (no proper prefix = suffix), the
    * condition [[graft.expressions.BlocklistScan]] enforces loudly so
    * the automaton's all-positions count and the oracle's greedy
    * replace-count cannot diverge on self-overlapping text.
    */
  private[graft] val Blocklist = Seq("key", "agg", "scan", "merge",
    "table", "spark", "batch", "value", "fast row", "qqzz")

  def queries: Map[String, Q] = Map(
    // q232 [north star, r12]: AHO-CORASICK blocklist scan — the
    // one-pass multi-pattern scrubber behind every production
    // term-filter (FlashText is the trie-only simplification): all
    // patterns compile into one goto/fail automaton riding the
    // expression as executor model state, and a document scans in
    // O(len + hits) REGARDLESS of pattern count — a 10⁵-term blocklist
    // costs the same pass as ten terms. Corpus pass is map-only; the
    // oracle counts per-pattern occurrences by the greedy replace
    // formula (equal to all-positions under the border-free guard).
    "q232_blocklist_scan" -> ((spark, dir) => {
      import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
      Tables(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), toColumn(graft.expressions.BlocklistScan(
          toExpression(col("text")), Blocklist.toArray)).as("b"))
        .select(col("doc_id"), col("b.hits").as("n_hits"),
          col("b.patterns_hit").as("n_patterns"),
          (col("b.hits") > 0L).as("flagged"))
        .orderBy("doc_id")
    }),
    // q182 [north star, r11]: Unicode NFC NORMALIZATION — the
    // multilingual primitive every hash-keyed stage assumes: composed
    // and decomposed forms of the same text are byte-distinct but
    // canonically equal, so an un-normalized corpus leaks duplicates
    // past content-hash dedup, shingle hashing, and every md5 gate.
    // Spark ships no normalization function and a Scala UDF would break
    // codegen — this is the custom-Expression tier
    // ([[graft.expressions.NfcNormalize]], real doGenCode, already-NFC
    // fast path returns the input object). Map-only; the oracle is
    // DuckDB's utf8proc nfc_normalize — both implement UAX #15, and the
    // md5-of-normalized hash match proves byte-level agreement.
    "q182_nfc_normalize" -> ((spark, dir) => {
      val raw = concat(col("text"), lit(DenormProbe))
      val norm = TextOps.nfc(raw)
      Tables(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          octet_length(raw).cast("long").as("octets_raw"),
          octet_length(norm).cast("long").as("octets_nfc"),
          (norm =!= raw).as("changed"),
          md5(norm).as("nfc_md5"))
        .orderBy("doc_id")
    }),

    // q183 [north star, r11]: CORPUS RELEASE MANIFEST — the integrity
    // artifact a dataset release ships next to its data card: per
    // source, the doc inventory, NULL accounting, total octets, and an
    // ORDER-INDEPENDENT content checksum (bit_xor of each doc's 60-bit
    // md5 prefix — commutative, so it is partition-order-stable AND
    // incrementally maintainable: adding/removing a doc xors its hash
    // in/out, no rescan). One partial-aggregating rollup to |sources|
    // rows; any single-doc corruption flips the checksum (pinned in
    // OperatorSpec). The 60-bit md5→BIGINT bridge is the q47/simhashMd5
    // cross-engine identity.
    "q183_corpus_manifest" -> ((spark, dir) =>
      manifestOf(Tables(spark, dir, "documents"))),

    // q184 [north star, r11]: INCREMENTAL manifest maintenance — the
    // reason q183's checksum is an XOR: when a 100 TB release takes a
    // point fix (a new dump lands, a retraction batch leaves), the
    // manifest updates from STORED PER-SOURCE PARTIALS plus the delta's
    // partials — counts/octets add signed, the xor is its own inverse
    // (retracting a doc = xor its hash again) — and the old corpus is
    // NEVER rescanned. Registered as: old dump (md5 'dump:' < 'cd')
    // minus retractions ('retract:' < '10', ⊂ old) plus the new dump,
    // combined purely from the three partial frames; the oracle
    // recomputes the manifest over the FINAL corpus directly, so the
    // hash match proves the incremental combine is EXACT, not an
    // approximation of a rescan.
    "q184_manifest_incremental" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      def gate(prefix: String) =
        substring(md5(concat(lit(prefix), col("doc_id").cast("string"))), 1, 2)
      val old = docs.filter(gate("dump:") < "cd")
      val removed = old.filter(gate("retract:") < "10")
      val delta = docs.filter(gate("dump:") >= "cd")
      combineManifestPartials(Seq(
        (manifestPartials(old), 1L),
        (manifestPartials(removed), -1L),
        (manifestPartials(delta), 1L)))
    }),

    // q44 [CLOSURE]: tokenize + term frequency.
    "q44_token_tf" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("word"))),

    // q45 [CLOSURE]: corpus stats per source.
    "q45_text_stats" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          round(avg(col("n_chars").cast("double")), 4).as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(TextOps.wsTokenCount(col("text"))).as("total_tokens"))
        .orderBy("source")),

    // q50 [north star]: language-ID heuristic — stopword-ratio n-gram
    // scorer. (The synthetic corpus shares one vocabulary across langs, so
    // the classifier itself is what is under test, not its accuracy.)
    // Staged projection: the token array and stopword count materialize
    // once as named columns instead of repeating the subtree per output
    // column — smaller generated code, one evaluation guaranteed.
    "q50_langid" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("ws", TextOps.tokens(col("text")))
        .withColumn("nStop", TextOps.stopwordCount(col("ws")))
        .select(col("doc_id"),
          col("nStop").cast("long").as("n_stopwords"),
          when(col("nStop").cast("double") / size(col("ws")).cast("double")
            > 0.05, lit("en"))
            .otherwise(lit("unknown")).as("pred_lang"))
        .orderBy("doc_id")),

    // q51 [north star]: quality scoring — length / repetition / character-
    // class bands (the punct ratio is genuinely 0 on this all-lowercase
    // corpus; the operator still computes it, oracle-checked). Staged
    // like q50: token/distinct counts computed once.
    "q51_quality" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("ws", TextOps.tokens(col("text")))
        .withColumn("nTok", size(col("ws")).cast("long"))
        .withColumn("nDis", size(array_distinct(col("ws"))).cast("long"))
        .select(col("doc_id"),
          col("nTok").as("n_tokens"), col("nDis").as("n_distinct"),
          when(col("n_chars") < 150, lit("short"))
            .when(col("n_chars") < 350, lit("medium"))
            .otherwise(lit("long")).as("len_band"),
          when(col("nDis").cast("double") / col("nTok").cast("double") < 0.35,
            lit("repetitive")).otherwise(lit("diverse")).as("diversity"),
          floor(length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
            .cast("double") / col("n_chars").cast("double") * 10000)
            .cast("long").as("punct_bp"))
        .orderBy("doc_id")),

    // q52 [north star]: rolling-hash document fingerprint.
    "q52_fingerprint" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // q53 [north star]: token counting — whitespace + regex (BPE-ish
    // fixed-width chunking as the stand-in for subword merges).
    "q53_token_count" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          TextOps.wsTokenCount(col("text")).as("ws_tokens"),
          // NULL text → NULL counts on both engines (legacy size(NULL) is
          // -1 under ANSI-off; DuckDB's len(NULL) is NULL)
          when(col("text").isNull, lit(null).cast("long"))
            .otherwise(size(expr("regexp_extract_all(text, '[a-z]+', 0)"))
              .cast("long")).as("word_tokens"),
          when(col("text").isNull, lit(null).cast("long"))
            .otherwise(size(expr("regexp_extract_all(text, '[a-z]{1,4}', 0)"))
              .cast("long")).as("bpe_ish_tokens"))
        .orderBy("doc_id")),

    // q77 [north star]: within-document repetition stats (Gopher-style
    // quality rules): type-token ratio and duplicate-bigram fraction.
    // All per-row expression work fused into the scan; the doubles are
    // exact-integer divisions (deterministic on both engines). Distinct
    // bigrams are counted via ShingleHashes(n=2) — the same
    // hash-identity assumption as q46/q58's shingle sets.
    "q77_repetition" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("ws", TextOps.tokens(col("text")))
        .withColumn("nTok", size(col("ws")).cast("long"))
        .withColumn("nBi", greatest(size(col("ws")) - 1, lit(0)).cast("long"))
        .withColumn("nDisBi",
          size(TextOps.shingleHashes(col("ws"), 2)).cast("long"))
        .select(col("doc_id"),
          col("nTok").as("n_tokens"),
          size(array_distinct(col("ws"))).cast("long").as("n_types"),
          (size(array_distinct(col("ws"))).cast("double") /
            col("nTok").cast("double")).as("ttr"),
          col("nBi").as("n_bigrams"),
          col("nDisBi").as("n_distinct_bigrams"),
          when(col("nBi") > 0,
            (col("nBi") - col("nDisBi")).cast("double") /
              col("nBi").cast("double"))
            .otherwise(lit(0.0)).as("dup_bigram_frac"))
        .orderBy("doc_id")),

    // q89 [north star]: rare-token rarity score — the log-free sibling of
    // unigram-LM quality scoring (the q83 IDF trick: keep the math
    // rational so the oracle is bit-deterministic; -log df/N is monotone
    // in df, so df-threshold bands carry the same signal). Per doc:
    // distinct-token count, count of tokens rare in the corpus
    // (document frequency <= RareDfMax), and the rare fraction — a high
    // fraction flags OCR junk / codey noise, near-zero flags boilerplate.
    // Scale: (doc, word) is corpus-sized; the df group-by partial-
    // aggregates; the df join is equi-keyed on word with per-key fanout
    // = postings × 1 (one df row per word) — a stopword cannot go
    // quadratic. Same shape q88 uses for its OOV vocab anti-join.
    "q89_rare_token_score" -> ((spark, dir) => {
      val dw = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("word"))
      val df = dw.groupBy(col("word")).agg(count(lit(1)).as("df"))
      dw.join(df, "word")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_distinct"),
          sum(when(col("df") <= RareDfMax, lit(1L)).otherwise(lit(0L)))
            .as("n_rare"))
        .select(col("doc_id"), col("n_distinct"), col("n_rare"),
          (col("n_rare").cast("double") / col("n_distinct").cast("double"))
            .as("rare_frac"))
        .orderBy("doc_id")
    }),

    // q90 [north star]: duplicated-span fraction — the substring-level
    // memorization measure (Lee et al., "Deduplicating Training Data
    // Makes Language Models Better", ACL'22): for each document, the
    // fraction of its SpanWidth-gram positions whose n-gram also occurs
    // in at least one OTHER document. Distinct from q77 (within-doc
    // repetition) and q58 (document-pair Jaccard): a doc can be globally
    // unique yet 40% copied span-by-span from many different docs.
    // Scale: positional spans are corpus-sized (map-only expression);
    // the shared-span set is built from DISTINCT (doc, span) so a hot
    // span contributes one row per doc, partial-aggregated; the
    // flag join is equi-keyed with fanout ≤ 1 row per probe. Same
    // hash-identity assumption as q77/q86 shingles.
    "q90_dup_spans" -> ((spark, dir) =>
      dupSpans(Tables(spark, dir, "documents"), SpanWidth)),

    // q95 [north star]: corpus-wide top-25 trigram HEAVY HITTERS — the
    // inspection primitive behind boilerplate discovery ("which exact
    // phrases dominate this crawl") and stop-span lists for the capped
    // dedup tiers. Counts carry multiplicity (unlike q86's distinct
    // per-source sets). Scale: the n-gram explode is map-only; the
    // group-by partial-aggregates (one row per distinct trigram per
    // partition crosses the wire); the top-25 cut is
    // TakeOrderedAndProject — each partition keeps a local 25, no global
    // sort shuffle. String n-grams (not ShingleHashes) on purpose: the
    // output is human-readable phrases and the oracle compares content,
    // not hash identity.
    "q95_top_ngrams" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("ws", TextOps.tokens(col("text")))
        .select(explode(when(size(col("ws")) >= 3,
            transform(sequence(lit(1), size(col("ws")) - 2),
              i => concat_ws(" ", element_at(col("ws"), i),
                element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("ngram"))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(25)),

    // q129 [north star]: TEXTRANK keywords (Mihalcea & Tarau, EMNLP'04)
    // — PageRank over the word co-occurrence graph, the
    // centrality-based keyword extractor next to q96's TF-IDF. The
    // whole computation is EXACT FIXED-POINT INTEGER arithmetic so the
    // iterative oracle can be unrolled bit-for-bit (the q91 unrolled-
    // Lloyd discipline applied to graph centrality): ranks live in
    // 1e12-scaled BIGINT units, each contribution is one integer
    // floor-division rank÷degree, and the 0.85 damping is the exact
    // rational 17/20 applied as (17·sum) div 20 — no doubles exist
    // anywhere, so ten iterations cannot drift between engines.
    // Scale shape — the kmeansCore discipline applied to a graph: the
    // corpus-sized work (tokenize, vocabulary cut, pair mining) runs
    // distributed with the q123 bounds, and the RANK VECTOR is model
    // state — ≤100 nodes and ≤C(100,2) edges BY CONSTRUCTION, held on
    // the driver exactly as k-means holds its k·dim centroids, so ten
    // iterations cost ten array passes instead of ten Spark jobs over
    // a 100-row table. A web-scale graph (nodes ∝ corpus) would flip
    // to the distributed join-agg PageRank step; this operator's graph
    // is capped, so driver-held is the honest plan at every corpus
    // size.
    "q129_textrank" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val dw = docs.select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("w"))
      val vocab = dw.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("w")).limit(100)
      val inv = dw.join(broadcast(vocab.select(col("w"))), "w")
      val pairRows = inv.alias("a")
        .join(inv.alias("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
        .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= 5)
        .select(col("w1"), col("w2")).collect() // bounded model state
      val words = vocab.select(col("w")).collect().map(_.getString(0))
      val edges = pairRows.flatMap(r =>
        Seq(r.getString(0) -> r.getString(1), r.getString(1) -> r.getString(0)))
      val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
      val in = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
      val nN = words.length.toLong
      val Scale = 1000000000000L
      val base = (3L * Scale) / (20L * nN) // (1-d)·SCALE/N, d = 17/20
      var rank: Map[String, Long] = words.map(_ -> Scale / nN).toMap
      (0 until 10).foreach { _ =>
        val r = rank
        rank = words.map { w =>
          val csum = in.getOrElse(w, Array.empty[String])
            .map(src => r(src) / deg(src)).sum
          w -> (base + (17L * csum) / 20L)
        }.toMap
      }
      val top = rank.toSeq.sortBy { case (w, r) => (-r, w) }.take(20)
        .zipWithIndex
        .map { case ((w, r), i) => (i + 1L, w, r) }
      import spark.implicits._
      top.toDF("rank", "w", "r").orderBy("rank")
    }),

    // q123 [north star]: PMI CO-OCCURRENCE pairs — which vocabulary
    // words appear in the same documents far more than independence
    // predicts (collocation/topic-pair mining; PMI = p(xy)/(p(x)p(y))
    // up to the log, and ranking doesn't need the log — the q83
    // monotone-transform discipline). All inputs to the ratio are exact
    // BIGINTs, so the one double division is bit-identical on both
    // engines and the rank is deterministic with the (w1, w2)
    // tie-break. Scale: the pair space is bounded BY CONSTRUCTION —
    // co-occurrence is restricted to the top-100-df vocabulary
    // (TakeOrderedAndProject + broadcast), so the within-doc self-join
    // fans out ≤ C(100,2) pairs per doc regardless of corpus size, and
    // the unbounded-vocab blowup (every rare typo × every word) never
    // enters the plan. The final top-25 is the same local-cut shape as
    // q95.
    "q123_pmi_pairs" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val dw = docs.select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("w"))
      val vocab = dw.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("w")).limit(100)
      val inv = dw.join(broadcast(vocab), "w")
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val pairs = inv.alias("a")
        .join(inv.alias("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
        .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
        .agg(count(lit(1)).as("n_pair"),
          first(col("a.df")).as("df1"), first(col("b.df")).as("df2"))
        .filter(col("n_pair") >= 5)
      val ranked = pairs.crossJoin(broadcast(n))
        .withColumn("lift",
          (col("n_pair") * col("n_docs")).cast("double") /
            (col("df1") * col("df2")).cast("double"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(25)
      ranked
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("lift").desc, col("w1"), col("w2"))).cast("long"))
        .select(col("rank"), col("w1"), col("w2"),
          col("n_pair"), col("df1"), col("df2"))
        .orderBy("rank")
    }),

    // q99 [north star]: Gopher-style composite quality gate (Rae et al.,
    // arXiv:2112.11446 §A1.1 adapted to this corpus's bands): token-count
    // window, mean word length band, minimum stopword evidence, and a
    // duplicate-bigram repetition cap — each rule surfaced as its own
    // 0/1 flag plus the conjunctive keep bit, the shape a curation run
    // audits ("how many docs failed WHICH rule"). All per-row expression
    // work fused into the scan (the same single-division determinism as
    // q77); the bigram distinct count reuses q77's ShingleHashes identity
    // assumption, which the q77 oracle already pins against distinct
    // strings.
    "q99_gopher_filter" -> ((spark, dir) =>
      gopherGate(Tables(spark, dir, "documents"))
        .select(col("doc_id"),
          col("n_tokens"), col("mean_word_len"), col("n_stopwords"),
          col("dup_bigram_frac"), col("ok_len"), col("ok_mwl"),
          col("ok_stop"), col("ok_rep"), col("keep"))
        .orderBy("doc_id")),

    // q102 [north star]: bigram language-model fluency score — the
    // perplexity PROXY a quality pipeline runs without a neural LM:
    // per doc, the mean corpus conditional probability P(w2|w1) =
    // c(w1 w2) / c(w1 ·) over its bigram positions. High mean ⇒ the
    // doc's transitions are common corpus-wide (fluent/boilerplate);
    // low ⇒ rare transitions (novel or junk — triage with q89).
    // Float determinism: each p is ONE division of exact BIGINT counts;
    // the per-doc sum is folded in POSITION ORDER (sort_array of
    // (pos, p) then a left fold with 0.0 init — bit-identical to
    // DuckDB's list_reduce over the pos-ordered list because 0.0 + p1
    // == p1 exactly for p1 > 0); the mean is one further division.
    // Scale: bigram and start counts partial-aggregate; both prob
    // joins are equi-keyed with fanout 1 (one count row per key); the
    // per-doc regroup is keyed on doc_id with per-key width bounded by
    // the document. A stopword-heavy w1 fans out 1 row per probe, not
    // per pair — no skew hazard.
    "q102_bigram_lm" -> ((spark, dir) =>
      bigramLmScores(Tables(spark, dir, "documents")).orderBy("doc_id")),

    // q142 [north star]: perplexity-bucket partitioning — CCNet's
    // (Wenzek et al. LREC'20) head/middle/tail split, run on q102's
    // bigram-LM proxy instead of a neural LM: per source, rank docs by
    // fluency (mean_p DESC — high mean ⇒ low perplexity ⇒ head) and cut
    // terciles with q138's integer rank arithmetic (3·rk ≤ n / 2·n — no
    // percent_rank doubles at the boundary). mean_p is the same
    // bit-exact double on both engines (q102's fold-order discipline),
    // so ranks cannot drift. Downstream mixing then samples the buckets
    // at different rates (the q93 temperature step). Scale shape: the
    // LM stage is q102's (partial-aggregating counts, fanout-1 equi-
    // joins); the cut adds ONE source-keyed shuffle of (doc_id, mean_p)
    // pairs and #sources is fixed, so partitions grow only with docs-
    // per-source — the q138 bound.
    "q142_perplexity_buckets" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val byFluent = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("mean_p").desc, col("doc_id"))
      val bySource = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      bigramLmScores(docs)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .withColumn("rk", row_number().over(byFluent).cast("long"))
        .withColumn("n", count(lit(1)).over(bySource))
        .select(col("doc_id"), col("source"), col("rk").as("rk_fluent"),
          when(lit(3L) * col("rk") <= col("n"), "head")
            .when(lit(3L) * col("rk") <= lit(2L) * col("n"), "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    }),

    // q104 [north star]: vocabulary frequency SPECTRUM — the Zipf
    // diagnostic a corpus audit reads before trusting token statistics:
    // how many word types (and what occurrence mass) sit in each
    // power-of-two frequency band. The band is floor(log2 tf)+1 computed
    // as length(bin(tf)) — INTEGER arithmetic, no libm log, identical
    // on both engines. A healthy natural corpus shows the monotone
    // Zipf decay of types per band; a bot-heavy one shows mass spikes
    // in high bands. Counted over TRIGRAM types (q95's unit), whose
    // space is large enough to show the decay even on a small shared
    // vocabulary — and whose high-band outliers are exactly the
    // boilerplate spans q95 surfaces. Scale: tf is a partial-
    // aggregating group-by; the band regroup reduces |types| rows
    // to ~64.
    "q104_zipf_bands" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("ws", TextOps.tokens(col("text")))
        .select(explode(when(size(col("ws")) >= 3,
            transform(sequence(lit(1), size(col("ws")) - 2),
              i => concat_ws(" ", element_at(col("ws"), i),
                element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("tf"))
        .withColumn("band", length(bin(col("tf"))).cast("long"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_types"), sum(col("tf")).as("n_occurrences"))
        .orderBy("band")),

    // q105 [north star]: per-source CORPUS-HEALTH report — the dashboard
    // row a curation run publishes per ingest source: volume, q99
    // quality-gate pass count, exact-duplicate involvement, and mean
    // length. Composes the gopher gate (per-row expression work) with
    // q42's hash-cluster counts via one equi-keyed fanout-1 join (each
    // doc meets exactly one hash-count row); the per-source rollup
    // partial-aggregates. The avg is rounded 4dp (QueryGroup rules for
    // aggregated doubles).
    "q105_source_report" -> ((spark, dir) => {
      val gated = gopherGate(Tables(spark, dir, "documents"))
        .withColumn("h", sha2(col("text"), 256))
      val hashCounts = gated.groupBy(col("h"))
        .agg(count(lit(1)).as("n_same"))
      gated.join(hashCounts, "h")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("keep")).as("n_kept"),
          sum(when(col("n_same") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          round(avg(col("n_tokens").cast("double")), 4).as("avg_tokens"))
        .orderBy("source")
    }),

    // q86 [north star]: cross-source shingle-overlap matrix — the
    // corpus-level contamination measure ("how much does source A share
    // with source B"), the aggregate sibling of q81's per-doc
    // decontamination flag. Distinct (source, trigram-hash) first, THEN
    // the equi-keyed self-join: after the distinct, one shingle key
    // carries at most #sources rows per side, so per-key join fanout is
    // bounded by sources² regardless of corpus size — a hot shingle
    // cannot go quadratic in documents. Three bounded shuffles total
    // (distinct, join, pair group-by); the per-source totals are a tiny
    // broadcast. Same trigram-hash identity assumption as q77's bigrams
    // (distinct counts match the oracle's distinct strings).
    "q86_source_overlap" -> ((spark, dir) =>
      sourceOverlap(Tables(spark, dir, "documents"))),

    // q137 [north star]: token-DISTRIBUTION drift between sources —
    // the corpus-composition monitor behind "did this dump shift the
    // mixture" decisions: exact total-variation distance between the
    // unigram distributions of every source pair. Emitted EXACT: with
    // c_s(t) the token count and N_s the total, TVD = num/(2·N_a·N_b)
    // where num = Σ_t |c_a(t)·N_b − c_b(t)·N_a| — pure BIGINT (the
    // q131 no-means trick applied to distributions; the caller divides
    // if it wants the [0,1] value). Only tokens present in BOTH
    // sources need the join: the one-sided tails collapse to totals,
    // num = Σ_both |…| + (N_a − Σ_both c_a)·N_b + (N_b − Σ_both c_b)·N_a,
    // so a disjoint-vocabulary pair (no join rows) correctly reads
    // 2·N_a·N_b = max drift via the pair-universe left join. BIGINT
    // exactness bound, enforced in-plan (q131 discipline): num ≤
    // 2·N_a·N_b, so sources stay exact while N_a·N_b ≤ 2^62 (~2·10⁹
    // tokens per source balanced — beyond that, widen to DOUBLE).
    // Scale shape: one corpus-sized shuffle for the (source, token)
    // counts; the token-keyed self-join's per-key fanout is ≤ sources²
    // (q86's bound — a hot token cannot go quadratic in documents);
    // totals and the pair universe are |sources|-sized broadcasts.
    "q137_source_drift" -> ((spark, dir) => {
      val cnt = graft.CachePool.track(
        Tables(spark, dir, "documents")
          .select(col("source"),
            explode(TextOps.tokens(col("text"))).as("t"))
          .groupBy(col("source"), col("t"))
          .agg(count(lit(1)).as("c")))
      val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("n"))
      val both = cnt.select(col("source").as("src_a"), col("t"),
          col("c").as("c_a"))
        .join(cnt.select(col("source").as("src_b"), col("t"),
          col("c").as("c_b")), Seq("t"))
        .filter(col("src_a") < col("src_b"))
        .join(broadcast(tot.select(col("source").as("src_a"),
          col("n").as("na"))), "src_a")
        .join(broadcast(tot.select(col("source").as("src_b"),
          col("n").as("nb"))), "src_b")
        .groupBy(col("src_a"), col("src_b"))
        .agg(sum(abs(col("c_a") * col("nb") - col("c_b") * col("na")))
            .as("shared_term"),
          sum(col("c_a")).as("s_ab"), sum(col("c_b")).as("s_ba"))
      val pairLimit = (Long.MaxValue / 2).toDouble
      tot.alias("ta").join(broadcast(tot.alias("tb")),
          col("ta.source") < col("tb.source"))
        .select(col("ta.source").as("src_a"), col("tb.source").as("src_b"),
          col("ta.n").as("n_a"), col("tb.n").as("n_b"))
        .join(both, Seq("src_a", "src_b"), "left")
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          when(col("n_a").cast("double") * col("n_b").cast("double") >
              pairLimit,
            raise_error(lit("q137 TVD numerator exceeds BIGINT " +
              "exactness bound (n_a*n_b > 2^62); widen the numerator " +
              "to DOUBLE for sources this large")))
            .otherwise(coalesce(col("shared_term"), lit(0L)) +
              (col("n_a") - coalesce(col("s_ab"), lit(0L))) * col("n_b") +
              (col("n_b") - coalesce(col("s_ba"), lit(0L))) * col("n_a"))
            .as("tvd_num"))
        .orderBy("src_a", "src_b")
    }),
  )

  /** q99's gate over any `(doc_id, text, ...)`-shaped corpus: the input
    * row plus the rule stats, per-rule 0/1 flags, and the conjunctive
    * `keep` bit — pure per-row expression work, reused by the q105
    * per-source report.
    */
  private[graft] def gopherGate(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("ws", TextOps.tokens(col("text")))
      .withColumn("nTok", size(col("ws")).cast("long"))
      .withColumn("mwl",
        length(regexp_replace(col("text"), " ", "")).cast("double") /
          col("nTok").cast("double"))
      .withColumn("nStop", TextOps.stopwordCount(col("ws")).cast("long"))
      .withColumn("nBi", greatest(size(col("ws")) - 1, lit(0)).cast("long"))
      .withColumn("dupBi",
        when(col("nBi") > 0,
          (col("nBi") - size(TextOps.shingleHashes(col("ws"), 2))
            .cast("long")).cast("double") / col("nBi").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("n_tokens", col("nTok"))
      .withColumn("mean_word_len", col("mwl"))
      .withColumn("n_stopwords", col("nStop"))
      .withColumn("dup_bigram_frac", col("dupBi"))
      .withColumn("ok_len",
        (col("nTok") >= 40 && col("nTok") <= 1000).cast("long"))
      .withColumn("ok_mwl", (col("mwl") >= 3.0 && col("mwl") <= 8.0).cast("long"))
      .withColumn("ok_stop", (col("nStop") >= 2).cast("long"))
      .withColumn("ok_rep", (col("dupBi") <= 0.2).cast("long"))
      .withColumn("keep",
        (col("ok_len") * col("ok_mwl") * col("ok_stop") * col("ok_rep"))
          .cast("long"))
      .drop("ws", "nTok", "mwl", "nStop", "nBi", "dupBi")

  /** q90's operator over any `(doc_id, text)`-shaped corpus — see the
    * query comment above for the scale analysis.
    */
  private[graft] def dupSpans(
      docs: org.apache.spark.sql.DataFrame,
      width: Int): org.apache.spark.sql.DataFrame = {
    val spans = docs
      .select(col("doc_id"),
        explode(TextOps.shingleHashesAll(TextOps.tokens(col("text")), width))
          .as("sh"))
    val shared = spans.distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("sh"), lit(1L).as("is_shared"))
    val perDoc = spans.join(shared, Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("is_shared"), lit(0L))).as("n_dup_spans"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(coalesce(col("n_spans"), lit(0L)) > 0,
          col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
          .otherwise(lit(0.0)).as("dup_span_frac"))
      .orderBy("doc_id")
  }

  /** q86's operator over any `(source, text)`-shaped corpus — see the
    * query comment above for the scale analysis.
    */
  private[graft] def sourceOverlap(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sh = docs
      .select(col("source"),
        explode(TextOps.shingleHashes(TextOps.tokens(col("text")), 3))
          .as("sh"))
      .distinct()
    val counts = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    sh.alias("a")
      .join(sh.alias("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared"))
      .join(broadcast(counts.select(col("source").as("src_a"),
        col("n_sh").as("n_a"))), "src_a")
      .join(broadcast(counts.select(col("source").as("src_b"),
        col("n_sh").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("shared"),
        (col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
          .as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** The q99 gate's keep bit as a DuckDB SQL fragment over a CTE named
    * `w` carrying (doc_id, text, ws) — shared by the q99 and q105
    * oracles so the two stay the same measure by construction.
    */
  /** q102's per-doc fluency frame (doc_id, n_bigrams, mean_p) — shared
    * with q142's bucket cut. Float determinism: each p is one division
    * of exact BIGINT counts, the per-doc sum folds in POSITION ORDER
    * with a 0.0 init (bit-identical to DuckDB's list_reduce over the
    * pos-ordered list), and the mean is one further division.
    */
  private def bigramLmScores(docs: DataFrame): DataFrame = {
    val bg = docs
      .withColumn("ws", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("ws"),
        posexplode(when(size(col("ws")) >= 2,
            sequence(lit(1), size(col("ws")) - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("col").as("p1"),
        concat_ws(" ", element_at(col("ws"), col("col")),
          element_at(col("ws"), col("col") + 1)).as("b"),
        element_at(col("ws"), col("col")).as("w1"))
    val c2 = bg.groupBy(col("b")).agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val probs = bg.join(c2, "b").join(c1, "w1")
      .select(col("doc_id"), col("p1"),
        (col("c2").cast("double") / col("c1").cast("double")).as("p"))
    val perDoc = probs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("p1"), col("p")))),
            t => t.getField("p")),
          lit(0.0), (acc, x) => acc + x).as("sum_p"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNotNull,
          col("sum_p") / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)).as("mean_p"))
  }

  /** The q102 oracle chain as a reusable CTE body ending in
    * `lm (doc_id, n_bigrams, mean_p)` — shared by q102 and q142.
    */
  private val bigramLmCte =
    """w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |e AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS p1 FROM w),
      |bg AS (SELECT doc_id, p1, ws[p1] || ' ' || ws[p1+1] AS b, ws[p1] AS w1 FROM e),
      |cb AS (SELECT b, count(*) AS c2 FROM bg GROUP BY b),
      |cw AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
      |pr AS (SELECT bg.doc_id, bg.p1,
      |         CAST(cb.c2 AS DOUBLE) / CAST(cw.c1 AS DOUBLE) AS p
      |       FROM bg JOIN cb USING (b) JOIN cw USING (w1)),
      |pd AS (SELECT doc_id, count(*) AS n_bigrams,
      |         list_reduce(list_prepend(0.0, list(p ORDER BY p1)),
      |                     (x, y) -> x + y) AS sum_p
      |       FROM pr GROUP BY doc_id),
      |lm AS (SELECT d.doc_id, CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |         CASE WHEN pd.n_bigrams IS NOT NULL
      |           THEN pd.sum_p / CAST(pd.n_bigrams AS DOUBLE) ELSE 0.0 END AS mean_p
      |       FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id)""".stripMargin

  private val gopherKeepSql =
    """(CASE WHEN len(ws) >= 40 AND len(ws) <= 1000 THEN 1 ELSE 0 END)
      |* (CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |          / CAST(len(ws) AS DOUBLE) >= 3.0
      |        AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |          / CAST(len(ws) AS DOUBLE) <= 8.0 THEN 1 ELSE 0 END)
      |* (CASE WHEN len(list_filter(ws,
      |      t -> t IN ('the','a','of','and','to','in','is'))) >= 2
      |    THEN 1 ELSE 0 END)
      |* (CASE WHEN (CASE WHEN len(ws) > 1
      |      THEN CAST(greatest(len(ws) - 1, 0)
      |             - len(list_distinct(list_transform(range(1, len(ws)),
      |                 i -> ws[i] || ' ' || ws[i+1]))) AS DOUBLE)
      |           / CAST(greatest(len(ws) - 1, 0) AS DOUBLE)
      |      ELSE 0.0 END) <= 0.2 THEN 1 ELSE 0 END)""".stripMargin

  // q129 mirror: the identical fixed-point PageRank, unrolled — every
  // iteration is the same integer floor-divisions in the same places, so
  // ranks match bit-for-bit after ten rounds.
  private def textrankSql: String = {
    val iters = (0 until 10).map { i =>
      s"""r${i + 1} AS (SELECT n.w,
         |  (SELECT (3 * 1000000000000) // (20 * count(*)) FROM nodes)
         |    + (17 * COALESCE(s.csum, 0)) // 20 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS w, SUM(r$i.r // d.deg) AS csum
         |    FROM r$i JOIN edges e ON e.src = r$i.w
         |             JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) s ON s.w = n.w)""".stripMargin
    }.mkString(",\n")
    s"""WITH dw AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
       |            FROM documents),
       |vocab AS (SELECT w FROM (
       |            SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rk
       |            FROM dw GROUP BY w) t WHERE rk <= 100),
       |inv AS (SELECT dw.doc_id, dw.w FROM dw JOIN vocab USING (w)),
       |p AS (SELECT a.w AS w1, b.w AS w2
       |      FROM inv a JOIN inv b ON a.doc_id = b.doc_id AND a.w < b.w
       |      GROUP BY a.w, b.w HAVING count(*) >= 5),
       |edges AS (SELECT w1 AS src, w2 AS dst FROM p
       |          UNION ALL SELECT w2, w1 FROM p),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
       |nodes AS (SELECT w FROM vocab),
       |r0 AS (SELECT w, (SELECT 1000000000000 // count(*) FROM nodes) AS r
       |       FROM nodes),
       |$iters,
       |top AS (SELECT w, r FROM r10 ORDER BY r DESC, w LIMIT 20)
       |SELECT CAST(row_number() OVER (ORDER BY r DESC, w) AS BIGINT) AS rank,
       |  w, CAST(r AS BIGINT) AS r
       |FROM top ORDER BY rank""".stripMargin
  }

  /** q183's rollup over any `(text, source)`-shaped frame — the spec's
    * corruption-detection property runs it over a tampered copy.
    */
  private[graft] def manifestOf(docs: DataFrame): DataFrame =
    manifestPartials(docs).orderBy("source")

  /** The per-source manifest PARTIALS (q183 without the presentation
    * sort) — the stored state q184's incremental combine maintains.
    */
  private[graft] def manifestPartials(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
        sum(octet_length(col("text")).cast("long")).as("total_octets"),
        bit_xor(conv(substring(md5(col("text")), 1, 15), 16, 10)
          .cast("long")).as("content_xor"))

  /** Combine signed partial frames into the final manifest: counts and
    * octets add with their sign; the xor needs NO sign (self-inverse —
    * retracting re-xors the same hash). Sources whose net inventory
    * hits zero leave the manifest, exactly as a full recompute would
    * drop them. Touches ONLY the |sources|-row partials — the
    * incremental-view-maintenance contract.
    */
  private[graft] def combineManifestPartials(
      parts: Seq[(DataFrame, Long)]): DataFrame =
    parts.map { case (p, sgn) =>
      p.select(col("source"), (col("n_docs") * sgn).as("n_docs"),
        (col("n_null_text") * sgn).as("n_null_text"),
        (col("total_octets") * sgn).as("total_octets"), col("content_xor"))
    }.reduce(_ unionByName _)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_null_text")).as("n_null_text"),
        sum(col("total_octets")).as("total_octets"),
        bit_xor(col("content_xor")).as("content_xor"))
      .filter(col("n_docs") > 0L)
      .orderBy("source")

  def oracles: Map[String, String] = Map(
    // q232: per-pattern greedy occurrence counts via the replace
    // formula, summed; equality with the automaton's all-positions
    // count is guaranteed by the border-free guard.
    "q232_blocklist_scan" -> {
      val occ = Blocklist.map(p =>
        s"(length(text) - length(replace(text, '$p', ''))) // ${p.length}")
      val hits = occ.mkString("(", " + ", ")")
      val npat = occ.map(o => s"CASE WHEN $o > 0 THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""SELECT doc_id, CAST($hits AS BIGINT) AS n_hits,
         |  CAST($npat AS BIGINT) AS n_patterns,
         |  $hits > 0 AS flagged
         |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
    },
    // q184: the oracle takes the OTHER road — recompute the manifest
    // over the final corpus directly; the hash match proves the
    // engine's partial-combine path is exactly equivalent to a rescan.
    "q184_manifest_incremental" ->
      """WITH fin AS (
        |  SELECT * FROM documents
        |  WHERE (substring(md5('dump:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
        |         AND substring(md5('retract:' || CAST(doc_id AS VARCHAR)), 1, 2) >= '10')
        |     OR substring(md5('dump:' || CAST(doc_id AS VARCHAR)), 1, 2) >= 'cd')
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS total_octets,
        |  CAST(bit_xor(CAST('0x' || substring(md5(text), 1, 15) AS BIGINT)) AS BIGINT) AS content_xor
        |FROM fin GROUP BY source ORDER BY source""".stripMargin,
    // q183: same rollup; bit_xor skips NULLs on both engines (the
    // n_null_text column accounts for them explicitly).
    "q183_corpus_manifest" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS total_octets,
        |  CAST(bit_xor(CAST('0x' || substring(md5(text), 1, 15) AS BIGINT)) AS BIGINT) AS content_xor
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // q182: DuckDB's utf8proc NFC vs Java's Normalizer — same UAX #15
    // algorithm/data; md5-of-normalized pins byte-level agreement. The
    // probe suffix is spelled with chr() so the SQL file itself cannot
    // be accidentally re-normalized by an editor.
    "q182_nfc_normalize" ->
      """WITH r AS (SELECT doc_id,
        |  text || ' cafe' || chr(769) || ' nai' || chr(776) || 've' AS raw
        |  FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM r)
        |SELECT doc_id, CAST(strlen(raw) AS BIGINT) AS octets_raw,
        |  CAST(strlen(norm) AS BIGINT) AS octets_nfc,
        |  norm <> raw AS changed, md5(norm) AS nfc_md5
        |FROM n ORDER BY doc_id""".stripMargin,
    "q129_textrank" -> textrankSql,
    "q123_pmi_pairs" ->
      """WITH dw AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
        |            FROM documents),
        |v AS (SELECT w, df FROM (
        |        SELECT w, CAST(count(*) AS BIGINT) AS df,
        |               row_number() OVER (ORDER BY count(*) DESC, w) AS rk
        |        FROM dw GROUP BY w) t WHERE rk <= 100),
        |inv AS (SELECT dw.doc_id, dw.w, v.df FROM dw JOIN v USING (w)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |p AS (SELECT a.w AS w1, b.w AS w2,
        |        CAST(count(*) AS BIGINT) AS n_pair,
        |        any_value(a.df) AS df1, any_value(b.df) AS df2
        |      FROM inv a JOIN inv b ON a.doc_id = b.doc_id AND a.w < b.w
        |      GROUP BY a.w, b.w HAVING count(*) >= 5),
        |r AS (SELECT w1, w2, n_pair, df1, df2,
        |        CAST(n_pair * n_docs AS DOUBLE) / CAST(df1 * df2 AS DOUBLE) AS lift
        |      FROM p, nn ORDER BY lift DESC, w1, w2 LIMIT 25)
        |SELECT CAST(row_number() OVER (ORDER BY lift DESC, w1, w2) AS BIGINT) AS rank,
        |  w1, w2, n_pair, df1, df2
        |FROM r ORDER BY rank""".stripMargin,
    "q104_zipf_bands" ->
      """WITH w AS (SELECT string_split(text,' ') AS ws FROM documents),
        |g AS (SELECT unnest(CASE WHEN len(ws) >= 3
        |        THEN list_transform(range(1, len(ws) - 1),
        |               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |        ELSE CAST([] AS VARCHAR[]) END) AS t FROM w),
        |c AS (SELECT t, count(*) AS tf FROM g GROUP BY t)
        |SELECT CAST(length(bin(tf)) AS BIGINT) AS band,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(tf) AS BIGINT) AS n_occurrences
        |FROM c GROUP BY band ORDER BY band""".stripMargin,
    "q105_source_report" ->
      s"""WITH w AS (SELECT doc_id, text, source, string_split(text,' ') AS ws
         |           FROM documents),
         |g AS (SELECT doc_id, source, text, len(ws) AS n_tokens,
         |        $gopherKeepSql AS keep
         |      FROM w),
         |hc AS (SELECT text, count(*) AS n_same FROM documents GROUP BY text)
         |SELECT g.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(g.keep) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN hc.n_same > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_docs,
         |  round(avg(CAST(g.n_tokens AS DOUBLE)), 4) AS avg_tokens
         |FROM g JOIN hc ON hc.text = g.text
         |GROUP BY g.source ORDER BY g.source""".stripMargin,
    // q102: list_prepend(0.0, ...) mirrors the Spark fold's 0.0 init
    // literally, so both engines evaluate the identical reduction tree
    "q102_bigram_lm" ->
      s"""WITH $bigramLmCte
         |SELECT doc_id, n_bigrams, mean_p FROM lm ORDER BY doc_id""".stripMargin,
    // q142 mirror: the same lm CTE, the same (mean_p DESC, doc_id)
    // rank, the same integer tercile cut — buckets cannot drift.
    "q142_perplexity_buckets" ->
      s"""WITH $bigramLmCte,
         |s AS (SELECT lm.doc_id, d.source,
         |        row_number() OVER (PARTITION BY d.source
         |          ORDER BY lm.mean_p DESC, lm.doc_id) AS rk,
         |        count(*) OVER (PARTITION BY d.source) AS n
         |      FROM lm JOIN documents d ON d.doc_id = lm.doc_id)
         |SELECT doc_id, source, CAST(rk AS BIGINT) AS rk_fluent,
         |  CASE WHEN 3 * rk <= n THEN 'head'
         |       WHEN 3 * rk <= 2 * n THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM s ORDER BY doc_id""".stripMargin,
    "q95_top_ngrams" ->
      """WITH w AS (SELECT string_split(text,' ') AS ws FROM documents),
        |g AS (SELECT unnest(CASE WHEN len(ws) >= 3
        |        THEN list_transform(range(1, len(ws) - 1),
        |               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |        ELSE CAST([] AS VARCHAR[]) END) AS ngram FROM w)
        |SELECT ngram, CAST(count(*) AS BIGINT) AS n
        |FROM g GROUP BY ngram
        |ORDER BY n DESC, ngram LIMIT 25""".stripMargin,
    "q99_gopher_filter" ->
      """WITH w AS (SELECT doc_id, text, string_split(text,' ') AS ws FROM documents),
        |s AS (SELECT doc_id,
        |        CAST(len(ws) AS BIGINT) AS n_tokens,
        |        CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |          / CAST(len(ws) AS DOUBLE) AS mean_word_len,
        |        CAST(len(list_filter(ws,
        |          t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT)
        |          AS n_stopwords,
        |        greatest(len(ws) - 1, 0) AS n_bigrams,
        |        CASE WHEN len(ws) > 1
        |          THEN len(list_distinct(list_transform(range(1, len(ws)),
        |                 i -> ws[i] || ' ' || ws[i+1])))
        |          ELSE 0 END AS n_distinct_bigrams
        |      FROM w),
        |f AS (SELECT doc_id, n_tokens, mean_word_len, n_stopwords,
        |        CASE WHEN n_bigrams > 0
        |          THEN CAST(n_bigrams - n_distinct_bigrams AS DOUBLE)
        |               / CAST(n_bigrams AS DOUBLE)
        |          ELSE 0.0 END AS dup_bigram_frac
        |      FROM s)
        |SELECT doc_id, n_tokens, mean_word_len, n_stopwords, dup_bigram_frac,
        |  CAST(CASE WHEN n_tokens >= 40 AND n_tokens <= 1000 THEN 1 ELSE 0 END AS BIGINT) AS ok_len,
        |  CAST(CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 8.0 THEN 1 ELSE 0 END AS BIGINT) AS ok_mwl,
        |  CAST(CASE WHEN n_stopwords >= 2 THEN 1 ELSE 0 END AS BIGINT) AS ok_stop,
        |  CAST(CASE WHEN dup_bigram_frac <= 0.2 THEN 1 ELSE 0 END AS BIGINT) AS ok_rep,
        |  CAST((CASE WHEN n_tokens >= 40 AND n_tokens <= 1000 THEN 1 ELSE 0 END)
        |     * (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 8.0 THEN 1 ELSE 0 END)
        |     * (CASE WHEN n_stopwords >= 2 THEN 1 ELSE 0 END)
        |     * (CASE WHEN dup_bigram_frac <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    "q89_rare_token_score" ->
      """WITH dw AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS word
        |            FROM documents),
        |f AS (SELECT word, count(*) AS df FROM dw GROUP BY word)
        |SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(CASE WHEN f.df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  CAST(sum(CASE WHEN f.df <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS rare_frac
        |FROM dw JOIN f USING (word)
        |GROUP BY dw.doc_id ORDER BY doc_id""".stripMargin,
    "q90_dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |sp AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 5
        |         THEN list_transform(range(1, len(ws) - 3),
        |                i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])
        |         ELSE CAST([] AS VARCHAR[]) END) AS g FROM w),
        |f AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM sp) t
        |      GROUP BY g HAVING count(*) >= 2),
        |a AS (SELECT sp.doc_id, count(*) AS n_spans,
        |        sum(CASE WHEN f.g IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
        |      FROM sp LEFT JOIN f ON f.g = sp.g GROUP BY sp.doc_id)
        |SELECT d.doc_id, CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup_spans,
        |  CASE WHEN coalesce(a.n_spans, 0) > 0
        |    THEN CAST(a.n_dup AS DOUBLE) / CAST(a.n_spans AS DOUBLE)
        |    ELSE 0.0 END AS dup_span_frac
        |FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q86_source_overlap" ->
      """WITH g AS (SELECT DISTINCT source, g FROM (
        |       SELECT source,
        |         unnest(CASE WHEN len(ws) >= 3
        |           THEN list_transform(range(1, len(ws) - 1),
        |                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |           ELSE CAST([] AS VARCHAR[]) END) AS g
        |       FROM (SELECT source, string_split(text, ' ') AS ws
        |             FROM documents) w) t),
        |c AS (SELECT source, count(*) AS n FROM g GROUP BY source),
        |p AS (SELECT a.source AS src_a, b.source AS src_b,
        |        count(*) AS shared
        |      FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, CAST(ca.n AS BIGINT) AS n_a,
        |  CAST(cb.n AS BIGINT) AS n_b, CAST(shared AS BIGINT) AS shared,
        |  CAST(shared AS DOUBLE) / CAST(ca.n + cb.n - shared AS DOUBLE) AS jaccard
        |FROM p
        |JOIN c ca ON ca.source = p.src_a
        |JOIN c cb ON cb.source = p.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    // q137: same counts/totals/shared-token decomposition — the
    // one-sided tails are reconstructed from totals, so only tokens in
    // both sources are joined; integer arithmetic end to end.
    "q137_source_drift" ->
      s"""WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS t
        |             FROM documents),
        |cnt AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
        |        FROM cnt GROUP BY 1),
        |b AS (SELECT a.source AS src_a, bb.source AS src_b,
        |        CAST(SUM(abs(a.c * tb.n - bb.c * ta.n)) AS BIGINT) AS shared_term,
        |        CAST(SUM(a.c) AS BIGINT) AS s_ab,
        |        CAST(SUM(bb.c) AS BIGINT) AS s_ba
        |      FROM cnt a JOIN cnt bb ON a.t = bb.t AND a.source < bb.source
        |      JOIN tot ta ON ta.source = a.source
        |      JOIN tot tb ON tb.source = bb.source
        |      GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, p.n_a, p.n_b,
        |  CASE WHEN CAST(p.n_a AS DOUBLE) * CAST(p.n_b AS DOUBLE) >
        |         CAST(${Long.MaxValue / 2} AS DOUBLE)
        |    THEN error('q137 TVD numerator exceeds BIGINT exactness bound (n_a*n_b > 2^62); widen the numerator to DOUBLE for sources this large')
        |    ELSE CAST(COALESCE(b.shared_term, 0)
        |      + (p.n_a - COALESCE(b.s_ab, 0)) * p.n_b
        |      + (p.n_b - COALESCE(b.s_ba, 0)) * p.n_a AS BIGINT) END AS tvd_num
        |FROM (SELECT ta.source AS src_a, tb.source AS src_b,
        |        ta.n AS n_a, tb.n AS n_b
        |      FROM tot ta JOIN tot tb ON ta.source < tb.source) p
        |LEFT JOIN b ON b.src_a = p.src_a AND b.src_b = p.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,
    "q44_token_tf" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS tf
        |FROM (SELECT unnest(string_split(text,' ')) AS word FROM documents) t
        |GROUP BY word ORDER BY tf DESC, word""".stripMargin,
    "q45_text_stats" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        | ROUND(AVG(CAST(n_chars AS DOUBLE)),4) AS avg_chars,
        | CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        | CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        | CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q50_langid" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stopwords,
        | CASE WHEN CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |          / CAST(len(string_split(text,' ')) AS DOUBLE) > 0.05
        |      THEN 'en' ELSE 'unknown' END AS pred_lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q51_quality" ->
      """SELECT doc_id,
        | CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
        | CASE WHEN n_chars < 150 THEN 'short' WHEN n_chars < 350 THEN 'medium' ELSE 'long' END AS len_band,
        | CASE WHEN CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
        |          / CAST(len(string_split(text,' ')) AS DOUBLE) < 0.35
        |      THEN 'repetitive' ELSE 'diverse' END AS diversity,
        | CAST(floor(CAST(length(regexp_replace(text,'[a-z0-9 ]','','g')) AS DOUBLE)
        |            / CAST(n_chars AS DOUBLE) * 10000) AS BIGINT) AS punct_bp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q52_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_transform(string_split(text,''), c -> CAST(ascii(c) AS BIGINT)),
        |             (h, a) -> (h * 31 + a) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q53_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split(text,' ')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text,'[a-z]+')) AS BIGINT) AS word_tokens,
        | CAST(len(regexp_extract_all(text,'[a-z]{1,4}')) AS BIGINT) AS bpe_ish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q77_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |s AS (SELECT doc_id, len(ws) AS n_tokens,
        |        len(list_distinct(ws)) AS n_types,
        |        greatest(len(ws) - 1, 0) AS n_bigrams,
        |        CASE WHEN len(ws) > 1
        |          THEN len(list_distinct(list_transform(range(1, len(ws)),
        |                 i -> ws[i] || ' ' || ws[i+1])))
        |          ELSE 0 END AS n_distinct_bigrams
        |      FROM w)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(n_types AS BIGINT) AS n_types,
        | CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
        | CAST(n_bigrams AS BIGINT) AS n_bigrams,
        | CAST(n_distinct_bigrams AS BIGINT) AS n_distinct_bigrams,
        | CASE WHEN n_bigrams > 0
        |   THEN CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        |   ELSE 0.0 END AS dup_bigram_frac
        |FROM s ORDER BY doc_id""".stripMargin,
  )
}
