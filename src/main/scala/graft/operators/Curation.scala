package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextOps

/** Dataset-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity (SURVEY.md §2.10 north-star family): split
  * assignment, domain mixing, and context-window chunking.
  *
  * Determinism contract: all sampling decisions are HASH-GATED (md5 of a
  * salted record key compared against a hex threshold), never rand() —
  * the same record lands in the same split on every engine, every run,
  * every cluster size. That is how production pipelines make train/val
  * assignment reproducible and join-stable (the gate is a pure per-row
  * expression; both engines compute identical md5 hex, so the DuckDB
  * oracle checks the exact membership, not just proportions).
  *
  * Scale: q65/q66 are per-row expression work fused into the scan (no
  * shuffle at all before the presentation sort); q67 is a narrow explode
  * whose fanout is |text|/stride per row.
  */
object Curation extends QueryGroup {

  def queries: Map[String, Q] = Map(
    // q65 [north star]: deterministic train/val split. Threshold 'cd' =
    // 205/256 ≈ 80% train; the bucket is exposed so downstream re-splits
    // (e.g. 10-fold CV) reuse the same hash.
    "q65_train_split" -> ((spark, dir) => {
      val bucket = substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 2)
      Tables(spark, dir, "documents")
        .select(col("doc_id"), bucket.as("bucket"),
          when(bucket < "cd", lit("train")).otherwise(lit("val")).as("split"))
        .orderBy("doc_id")
    }),

    // q66 [north star]: domain-mixture sampling — keep 100% of the
    // high-value domain and a deterministic 50% of the rest ('80' =
    // 128/256). The salt decorrelates the mix gate from the split gate:
    // the same doc can be train in q65 and dropped here, independently.
    "q66_domain_mix" -> ((spark, dir) => {
      val gate = substring(md5(concat(lit("mix:"),
        col("doc_id").cast("string"))), 1, 2)
      Tables(spark, dir, "documents")
        .filter(col("lang") === "en" || gate < "80")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // q93 [north star]: temperature-flattened domain mixing — the
    // sub-linear source reweighting a multi-corpus training mix uses
    // (small sources keep proportionally more; the α=0.5 instance of
    // quota ∝ n^α). Per-source quota = floor(4·√n_s); members are the
    // quota hash-lowest docs, so membership is EXACT on both engines:
    // sqrt and the one multiply are correctly-rounded IEEE ops on
    // identical inputs (no libm pow — α=0.5 is chosen precisely so the
    // quota math stays bit-deterministic), and the selection gate is the
    // same md5 rank as q65/q72. Scale: the quota table is #sources rows
    // (broadcast); ranking shuffles once keyed by source. A single
    // mega-source makes that partition hot — the scale variant is a
    // two-pass threshold selection (estimate the hash cutoff from
    // quota/n, then fix the boundary exactly), same shape as q58's
    // cap-then-verify discipline.
    "q93_temperature_mix" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val quotas = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .select(col("source"),
          floor(sqrt(col("n_docs").cast("double")) * lit(4.0))
            .cast("long").as("quota"))
      val h = substring(md5(concat(lit("tmix:"),
        col("doc_id").cast("string"))), 1, 8)
      docs.select(col("doc_id"), col("source"), h.as("h"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id")))
          .cast("long"))
        .join(broadcast(quotas), "source")
        .filter(col("rk") <= col("quota"))
        .select(col("doc_id"), col("source"), col("rk"))
        .orderBy("doc_id")
    }),

    // q69 [north star]: document-frequency vocabulary pruning (the
    // C4-style "drop boilerplate tokens" pass): tokens present in > 79%
    // of documents are removed, texts are rebuilt IN ORDER. Scale shape:
    // the df table is one word-keyed shuffle of (doc, word) distincts;
    // the stop list is tiny by construction (high-df tail) so the
    // anti-join broadcasts; the rebuild is one doc-keyed shuffle whose
    // ordering is restored by sorting (pos, word) structs inside each
    // group — order survives any partitioning.
    "q69_df_prune" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val words = docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("word"))
      val total = docs.agg(count(lit(1)).as("n_docs"))
      val dfreq = words.select(col("doc_id"), col("word")).distinct()
        .groupBy(col("word")).agg(count(lit(1)).as("df"))
      val stop = dfreq.join(broadcast(total), lit(true))
        .filter(col("df").cast("double") >
          col("n_docs").cast("double") * 0.79)
        .select(col("word"))
      val pruned = words
        .join(broadcast(stop), Seq("word"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("word")))),
            x => x.getField("word")), " ").as("pruned_text"),
          count(lit(1)).as("n_kept"))
      docs.select(col("doc_id"))
        .join(pruned, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("pruned_text"), lit("")).as("pruned_text"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("doc_id")
    }),

    // q70 [north star]: PII-style scrubbing — digit runs redacted to a
    // placeholder (the shape of email/phone/ssn scrubbing; the fixture's
    // only digit-bearing column is the JSON props). Pure per-row regex,
    // fused into the scan.
    "q70_pii_scrub" -> ((spark, dir) =>
      Tables(spark, dir, "events")
        .select(col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "<NUM>").as("scrubbed"),
          (length(col("props")) -
            length(regexp_replace(col("props"), "[0-9]", "")))
            .cast("long").as("n_digits"))
        .orderBy("event_id")),

    // q72 [north star]: deterministic fixed-SIZE stratified sample — the
    // k lowest salted-hash docs per language (hash-ranked reservoir: the
    // reproducible version of per-stratum uniform sampling). Reuses the
    // bounded TopKAgg, so map-side partials carry ≤ k rows per (lang,
    // partition); the 8-hex-char hash prefix is exact in a double and
    // its numeric order equals the oracle's fixed-width hex string order.
    "q72_stratified_sample" -> ((spark, dir) => {
      val topk = udaf(new graft.functions.TopKAgg(50),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      val h = conv(substring(md5(concat(lit("sample:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double")
      Tables(spark, dir, "documents")
        .groupBy(col("lang"))
        .agg(topk(-h, col("doc_id")).as("top"))
        .select(col("lang"), explode(col("top.id")).as("doc_id"))
        .orderBy("lang", "doc_id")
    }),

    // q71 [north star]: the operators composed as one curation pipeline —
    // exact dedup (keep lowest doc_id per content hash) → quality filter
    // → deterministic split → per-(split, lang) corpus stats. One semi
    // join + two hash aggregations; the shape a real corpus refresh runs.
    "q71_curation_pipeline" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val keep = docs.groupBy(sha2(col("text"), 256))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val bucket = substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 2)
      docs.join(keep, Seq("doc_id"), "left_semi")
        .filter(col("n_chars") >= 150)
        .select(col("lang"),
          when(bucket < "cd", lit("train")).otherwise(lit("val")).as("split"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "lang")
    }),

    // q67 [north star]: context-window chunking — fixed 200-char windows
    // at stride 150 (50-char overlap), tail partial kept, ordinal chunk
    // ids. The explode is narrow (no shuffle); at 100 TB chunking is a
    // map-only stage whose output partitioning follows the input's.
    // Zero-length text must yield zero chunks, not an error: Spark's
    // sequence(1, 0, 150) throws (start > stop with positive step) where
    // DuckDB's range(1, 1, 150) is simply empty, so the empty case is
    // short-circuited to an empty array before the posexplode.
    "q67_chunk" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"),
          posexplode(when(length(col("text")) > 0,
              sequence(lit(1), length(col("text")), lit(150)))
            .otherwise(array().cast("array<int>"))))
        .select(col("doc_id"),
          col("pos").cast("long").as("chunk_id"),
          col("col").cast("long").as("start"),
          expr("substring(text, col, 200)").as("chunk"))
        .withColumn("n_chunk_chars", length(col("chunk")).cast("long"))
        .orderBy("doc_id", "chunk_id")),
    // q97 [north star]: chunk-level exact dedup — the C4/RefinedWeb
    // passage-granularity pass document-level q42 misses: boilerplate
    // paragraphs repeated across otherwise-distinct docs are removed
    // EVERYWHERE except their first occurrence (global order = (doc_id,
    // chunk_id)), and each doc is rebuilt from its surviving chunks.
    // Non-overlapping 200-char windows (q67's machinery at stride =
    // width, so the rebuild concatenation is lossless). Scale: the
    // first-occurrence choice shuffles on the chunk CONTENT HASH (q42's
    // exact-dedup shape one level down — sha256 keying keeps the
    // shuffle rows narrow, no chunk text travels twice); the rebuild
    // group-by is keyed on doc_id with per-key width bounded by the
    // document itself. Same hash-identity assumption as q42.
    "q97_chunk_dedup" -> ((spark, dir) =>
      chunkDedup(Tables(spark, dir, "documents"))),

    // q81 [north star]: train/test DECONTAMINATION — flag every training
    // doc that shares an n-gram shingle with the held-out set (the
    // holdout is q65's hash-gated val split, so membership is exactly
    // reproducible on both engines). Scale shape: the holdout's distinct
    // shingle set is a ~20% fraction with heavy dedup, so the hit join is
    // equi-keyed and broadcast-eligible; the training side stays a
    // narrow explode feeding a partial-aggregating count. Same
    // shingle-hash identity assumption as q46/q58.
    "q81_decontaminate" -> ((spark, dir) => {
      val isVal = substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 2) >= "cd"
      val sh = Tables(spark, dir, "documents")
        .select(col("doc_id"), isVal.as("is_val"),
          explode(TextOps.shingleHashes(TextOps.tokens(col("text")), 3))
            .as("g"))
      val holdout = sh.filter(col("is_val")).select(col("g")).distinct()
      sh.filter(!col("is_val"))
        .join(holdout, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_contaminated"))
        .orderBy("doc_id")
    }),

    // q82 [north star]: context-window PACKING — assign documents to
    // fixed-budget training sequences by greedy sequential fill per
    // source: running token total in doc_id order, a doc packs into the
    // sequence its cumulative-before total falls in (budget 512). One
    // window shuffle keyed on source; the cumsum is exact integer math,
    // so sequence ids are deterministic on both engines.
    "q82_pack_sequences" -> ((spark, dir) => {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(spark, dir, "documents")
        .withColumn("n_tokens", TextOps.wsTokenCount(col("text")))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          floor((col("cum") - col("n_tokens")).cast("double") / 512.0)
            .cast("long").as("seq_id"))
        .orderBy("doc_id")
    }),

    // q88 [north star]: OOV-NOVELTY scoring — the graded sibling of
    // q81's binary contamination flag, in the opposite direction: each
    // VALIDATION doc is scored by the fraction of its distinct bigrams
    // absent from the TRAIN split's bigram vocabulary (0 = fully seen in
    // train, 1 = fully novel). The n-gram-model answer to "is this eval
    // doc actually held out, or does train already cover it". Scale
    // shape: unlike q81 (small holdout -> broadcast), the train vocab is
    // corpus-sized, so the anti-join is a SHUFFLE join equi-keyed on the
    // bigram hash — the right plan when neither side is small. Exact
    // integer counts + one division; same bigram-hash identity
    // assumption as q77.
    "q88_oov_novelty" -> ((spark, dir) => {
      val isTrain = substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 2) < "cd"
      val docs = Tables(spark, dir, "documents")
        .withColumn("bi",
          TextOps.shingleHashes(TextOps.tokens(col("text")), 2))
        .withColumn("is_train", isTrain)
      val vocab = docs.filter(col("is_train"))
        .select(explode(col("bi")).as("g")).distinct()
      val vald = docs.filter(!col("is_train")).select(col("doc_id"), col("bi"))
      val unseen = vald.select(col("doc_id"), explode(col("bi")).as("g"))
        .join(vocab, Seq("g"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      vald.select(col("doc_id"), size(col("bi")).cast("long").as("n_bigrams"))
        .join(unseen, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bigrams"),
          coalesce(col("n"), lit(0L)).as("n_unseen"),
          when(col("n_bigrams") > 0,
            coalesce(col("n"), lit(0L)).cast("double") /
              col("n_bigrams").cast("double"))
            .otherwise(lit(0.0)).as("novelty"))
        .orderBy("doc_id")
    }),

    // q111 [north star]: k-FOLD cross-validation assignment — every doc
    // gets a fold in 0..4 from its salted hash (16 hash bits mod 5: the
    // 65536/5 remainder skews fold sizes by < 0.01%, irrelevant against
    // the hash variance), plus its fold's total size for the
    // train-on-4/validate-on-1 bookkeeping. The hex→int parse is exact
    // on both engines (Spark conv(h,16,10), DuckDB ('0x'||h)::BIGINT) so
    // fold membership is the same EXACT set everywhere — q65's split
    // discipline generalized from 2 ways to k. Scale: the fold id is
    // per-row expression work fused into the scan; the size table is 5
    // rows, broadcast.
    "q111_kfold" -> ((spark, dir) => {
      val fold = (conv(substring(md5(concat(lit("fold:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long") % 5L).as("fold")
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), fold)
      val sizes = docs.groupBy(col("fold")).agg(count(lit(1)).as("n_fold"))
      docs.join(broadcast(sizes), "fold")
        .select(col("doc_id"), col("fold"), col("n_fold"))
        .orderBy("doc_id")
    }),

    // q112 [north star]: WEIGHTED (importance) sampling — inclusion
    // probability proportional to a per-doc weight (here: chars capped
    // at 1000, the "longer docs carry more signal, up to a point" rule),
    // decided by an exact integer cross-multiply: keep iff
    // u·max_w < w·2³², where u is 32 salted hash bits. No doubles, no
    // rand() — the kept set is exact on both engines, stable under
    // re-runs and repartitioning. Scale: the max-weight quota is a
    // one-row broadcast; the gate is per-row expression work fused into
    // the scan (products stay < 2⁴⁴ ≪ 2⁶³).
    "q112_weighted_sample" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          least(col("n_chars"), lit(1000L)).as("w"))
      val mw = docs.agg(max(col("w")).as("max_w"))
      val u = conv(substring(md5(concat(lit("wsample:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
      docs.crossJoin(broadcast(mw))
        .filter(u * col("max_w") < col("w") * lit(4294967296L))
        .select(col("doc_id"), col("w"), col("max_w"))
        .orderBy("doc_id")
    }),

    // q132 [north star]: deterministic GLOBAL SHUFFLE + shard assignment
    // — the reproducible reorder a training run needs before writing N
    // shard files (shuffle seed = the salt, so re-runs and resumptions
    // read the identical order). Shard = 8-way bucket of the doc's md5
    // key; position = rank of the key within its shard. Scale: ONE
    // shuffle keyed by shard (md5 keys are uniform, so shards are
    // balanced by construction and each shard's rank window is its own
    // partition — no global window, no single-reducer sort; writing
    // shard files from this frame is partitionBy("shard") with the
    // in-shard sort already done).
    "q132_shard_shuffle" -> ((spark, dir) => {
      val key = md5(concat(lit("shuffle:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard")).orderBy(col("key"), col("doc_id"))
      Tables(spark, dir, "documents")
        .select(col("doc_id"), key.as("key"))
        .withColumn("shard",
          pmod(conv(substring(col("key"), 1, 2), 16, 10).cast("long"), lit(8L)))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("doc_id")
    }),

    // q133 [north star]: per-source TOKEN-BUDGET selection — the data-
    // mixing primitive that caps each source at a token budget, keeping
    // the longest documents first (deterministic integer ordering,
    // doc_id tiebreak) until the running total crosses the cap. Scale:
    // one shuffle keyed by source; the per-source cumulative-sum window
    // never leaves its partition. A single mega-source makes that
    // partition hot — the scale variant is the same two-pass threshold
    // selection discipline as q93 (estimate the n_chars cutoff from
    // budget/avg, then fix the boundary exactly).
    "q133_token_budget" -> ((spark, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          TextOps.wsTokenCount(col("text")).as("ws_tokens"))
        .withColumn("cum_tokens", sum(col("ws_tokens")).over(w))
        .filter(col("cum_tokens") <= 800L)
        .select(col("doc_id"), col("source"), col("ws_tokens"),
          col("cum_tokens"))
        .orderBy("doc_id")
    }),

    // q134 [north star]: per-source EPOCH REPETITION PLAN — given a
    // target token count per source, how many epochs each source repeats
    // for and what fraction of it the final partial epoch keeps (the
    // mixture table a multi-corpus run is driven by; epochs > 1 =
    // upsampled small source, keep_bp < 10000 at epochs = 1 =
    // downsampled large source). Pure post-aggregation arithmetic on
    // BIGINTs (one exact double divide + floor/ceil, deterministic on
    // both engines); #sources rows, no second shuffle.
    "q134_epoch_plan" -> ((spark, dir) => {
      val target = 2000.0
      Tables(spark, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.wsTokenCount(col("text"))).as("n_tokens"))
        .withColumn("epochs",
          ceil(lit(target) / col("n_tokens").cast("double")).cast("long"))
        .withColumn("last_epoch_keep_bp",
          floor((lit(target) - (col("epochs") - 1L).cast("double") *
            col("n_tokens").cast("double")) * lit(10000.0) /
            col("n_tokens").cast("double")).cast("long"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("epochs"), col("last_epoch_keep_bp"))
        .orderBy("source")
    }),

    // q138 [north star]: per-source QUALITY-QUANTILE gate — the
    // model-free stand-in for classifier-filtered curation (DCLM /
    // FineWeb-Edu shape): within each source, keep the top 30% of
    // documents by a quality key, so a noisy crawl is cut harder than
    // a clean dump in absolute terms while every source keeps its best
    // tercile. Quality key = lexical diversity in basis points
    // (floor(distinct·10⁴/total tokens) — q51's signal as ONE exact
    // integer; in production the column would be a classifier score,
    // the gate is unchanged). The 30% cut is pure integer rank
    // arithmetic (10·rk ≤ 3·n — no percent_rank doubles), doc_id
    // tiebreak, so membership is exact on both engines. Scale: one
    // shuffle keyed by source; a mega-source makes that partition hot
    // — the scale variant is q93's two-pass threshold discipline
    // (estimate the score cutoff, then fix the boundary rank exactly).
    "q138_quality_gate" -> ((spark, dir) => {
      val bySrc = Window.partitionBy(col("source"))
      Tables(spark, dir, "documents")
        .withColumn("ws", TextOps.tokens(col("text")))
        .select(col("doc_id"), col("source"),
          // NULL text → NULL score (ws is NULL iff text is), matching the
          // oracle's len(NULL) instead of legacy size(NULL) = -1
          when(col("ws").isNull, lit(null).cast("long"))
            .otherwise(
              floor(size(array_distinct(col("ws"))).cast("double") * 10000d /
                size(col("ws")).cast("double")).cast("long"))
            .as("qscore_bp"))
        .withColumn("rk", row_number().over(bySrc
          .orderBy(col("qscore_bp").desc, col("doc_id"))).cast("long"))
        .withColumn("n_src", count(lit(1)).over(bySrc))
        .withColumn("kept",
          when(col("rk") * 10L <= col("n_src") * 3L, 1L).otherwise(0L))
        .select(col("doc_id"), col("source"), col("qscore_bp"),
          col("rk"), col("n_src"), col("kept"))
        .orderBy("doc_id")
    }),

    // q146 [north star, r8]: GLOBAL token-budget selection — q133's cap
    // with no per-source partition to hide in: keep the longest documents
    // corpus-WIDE (order = ws_tokens DESC, doc_id) until the budget is
    // spent. The naive plan is a single-partition window over the whole
    // corpus — the one shape this engine bans — so this query IS the
    // two-pass threshold discipline q93/q133's scale notes name:
    //   pass 1: per-distinct-length histogram (partial-aggregated;
    //           |histogram| ≤ max doc length in tokens, NEVER
    //           corpus-sized);
    //   threshold: one cumulative window over the histogram rows only →
    //           the boundary length w* and the budget spent strictly
    //           above it (≤1-row frame, broadcast);
    //   pass 2: per-row verdict — kept iff w > w*, or w == w* and the
    //           doc's in-class doc_id rank fits the remaining budget;
    //           the only corpus-sized window is per-length-class
    //           (q133's hot-class caveat applies to a degenerate
    //           all-same-length corpus and nothing else).
    // Membership equals the naive global-cumsum rule EXACTLY
    // (prior + i·w* ≤ B  ⟺  in-class rank i ≤ (B − prior) div w*),
    // which is what the DuckDB oracle computes directly.
    "q146_global_token_budget" -> ((spark, dir) => {
      val budget = 10000L
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          TextOps.wsTokenCount(col("text")).as("ws_tokens"))
      val hist = docs.groupBy(col("ws_tokens"))
        .agg(sum(col("ws_tokens")).as("tok"))
      val wh = Window.orderBy(col("ws_tokens").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // w* > 0 always: a zero/NULL-length class adds nothing to cum, so
      // the first violator is necessarily a positive-length class.
      val boundary = hist
        .withColumn("cum", sum(col("tok")).over(wh))
        .withColumn("prior", col("cum") - col("tok"))
        .filter(col("cum") > budget)
        .orderBy(col("ws_tokens").desc)
        .limit(1)
        .select(col("ws_tokens").as("wstar"),
          expr(s"($budget - prior) div ws_tokens").as("m"))
      val wcls = Window.partitionBy(col("ws_tokens")).orderBy(col("doc_id"))
      docs
        .withColumn("rk", row_number().over(wcls).cast("long"))
        .join(broadcast(boundary), lit(true), "left")
        .select(col("doc_id"), col("ws_tokens"),
          when(col("wstar").isNull, lit(1L)) // whole corpus fits
            .when(col("ws_tokens") > col("wstar"), lit(1L))
            .when(col("ws_tokens") === col("wstar") &&
              col("rk") <= col("m"), lit(1L))
            .otherwise(lit(0L)).as("kept"))
        .orderBy("doc_id")
    }),

    // q147 [north star, r8]: q133's per-source token budget with the
    // HOT-SOURCE-PROOF plan — the "q93 two-pass threshold discipline"
    // q133's own scale note promises, made a registered operator. q133's
    // per-source cumulative window puts one mega-source on one reducer;
    // here NO corpus-sized per-source window exists:
    //   pass 1: (source, n_chars) histogram, partial-aggregated;
    //   threshold: per-source cumulative + first-violator pick over the
    //     HISTOGRAM rows only → |sources| boundary rows, broadcast;
    //   pass 2: per-row verdict; classes above the boundary are kept
    //     outright, the boundary class resolves with an in-class
    //     (source, n_chars)-keyed inclusive cumsum (ws_tokens vary
    //     within a class, so the q146 rank·w* shortcut doesn't apply —
    //     the class window is bounded by the class size, not the
    //     source size).
    // Membership ≡ q133's naive rule exactly (prefix property: classes
    // after the boundary can only raise cum), reconciled against q133's
    // output in OperatorSpec; the oracle computes the naive rule with a
    // kept flag over ALL docs.
    "q147_source_budget_scalable" -> ((spark, dir) => {
      val budget = 800L
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          TextOps.wsTokenCount(col("text")).as("ws_tokens"))
      val hist = docs.groupBy(col("source"), col("n_chars"))
        .agg(sum(col("ws_tokens")).as("tok"))
      val wh = Window.partitionBy(col("source")).orderBy(col("n_chars").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bySrc = Window.partitionBy(col("source")).orderBy(col("n_chars").desc)
      val boundary = hist
        .withColumn("cum", sum(col("tok")).over(wh))
        .withColumn("prior", col("cum") - col("tok"))
        .filter(col("cum") > budget)
        .withColumn("brk", row_number().over(bySrc))
        .filter(col("brk") === 1)
        .select(col("source"), col("n_chars").as("b_chars"), col("prior"))
      val wcls = Window.partitionBy(col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs
        .withColumn("cls_cum", sum(col("ws_tokens")).over(wcls))
        .join(broadcast(boundary), Seq("source"), "left")
        .select(col("doc_id"), col("source"), col("ws_tokens"),
          when(col("b_chars").isNull, lit(1L)) // whole source fits
            .when(col("n_chars") > col("b_chars"), lit(1L))
            // coalesce: a NULL-text doc at the head of the boundary class
            // yields a NULL inclusive cumsum (SUM over only-NULL ws_tokens);
            // the naive rule's running cum for that doc equals `prior`
            // (NULL adds nothing), so the verdict must treat it as +0, not
            // poison the comparison to NULL→kept=0.
            .when(col("n_chars") === col("b_chars") &&
              col("prior") + coalesce(col("cls_cum"), lit(0L)) <= budget,
              lit(1L))
            .otherwise(lit(0L)).as("kept"))
        .orderBy("doc_id")
    }),

    // q148 [north star, r8]: q138's quality-quantile gate with the
    // hot-source-proof plan — the rank-cut sibling of q147's sum-budget
    // (together they close the "q93 two-pass discipline" promise for
    // both selection rules). q138 keeps each source's top-30% docs by
    // ranking INSIDE a source-keyed corpus window; here the rank cut
    // resolves on the score HISTOGRAM: qscore_bp is integer basis
    // points, so the per-source histogram has ≤ 10001 rows at ANY
    // corpus size.
    //   pass 1: per-(source, qscore_bp) counts + per-source totals,
    //     partial-aggregated;
    //   threshold: per-source cumulative count over the histogram
    //     (descending score) → the boundary score s*, the docs kept
    //     strictly above it, and the quota m = floor(3n/10) —
    //     |sources| boundary rows, broadcast;
    //   pass 2: per-row verdict; the boundary class admits its
    //     (m − kept_above) lowest doc_ids via an in-class rank window
    //     (bounded by the score-tie class, never the source).
    // Membership ≡ q138's 10·rk ≤ 3·n rule exactly: rank by
    // (qscore_bp DESC, doc_id) means every doc above s* has rk ≤
    // kept_above ≤ m, and the i-th boundary-class doc has
    // rk = kept_above + i ≤ m ⟺ i ≤ m − kept_above. Reconciled
    // against q138's kept flags in OperatorSpec.
    "q148_quality_gate_scalable" -> ((spark, dir) => {
      val scored = Tables(spark, dir, "documents")
        .withColumn("ws", TextOps.tokens(col("text")))
        .select(col("doc_id"), col("source"),
          when(col("ws").isNull, lit(null).cast("long"))
            .otherwise(
              floor(size(array_distinct(col("ws"))).cast("double") * 10000d /
                size(col("ws")).cast("double")).cast("long"))
            .as("qscore_bp"))
      val hist = scored.groupBy(col("source"), col("qscore_bp"))
        .agg(count(lit(1)).as("cnt"))
      val wh = Window.partitionBy(col("source"))
        .orderBy(col("qscore_bp").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bySrc = Window.partitionBy(col("source"))
        .orderBy(col("qscore_bp").desc)
      val totals = hist.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
      // m = floor(3n/10); boundary = first class where the cumulative
      // count crosses m (if none, the quota admits every class fully)
      val boundary = hist.join(totals, "source")
        .withColumn("cum", sum(col("cnt")).over(wh))
        .withColumn("prior", col("cum") - col("cnt"))
        .filter(col("cum") * 10L > col("n") * 3L)
        .withColumn("brk", row_number().over(bySrc))
        .filter(col("brk") === 1)
        .select(col("source"), col("qscore_bp").as("b_score"),
          expr("(n * 3) div 10 - prior").as("m_cls"),
          // sentinel: distinguishes "no boundary" (left-join miss) from a
          // boundary that legitimately sits on the NULL-score class (a
          // ≥70%-null corpus) — b_score alone can't tell them apart
          lit(true).as("has_b"))
      val wcls = Window.partitionBy(col("source"), col("qscore_bp"))
        .orderBy(col("doc_id"))
      scored
        .withColumn("cls_rk", row_number().over(wcls).cast("long"))
        .join(broadcast(boundary), Seq("source"), "left")
        .select(col("doc_id"), col("source"), col("qscore_bp"),
          when(col("has_b").isNull, lit(1L)) // quota covers the source
            .when(col("qscore_bp") <=> col("b_score"), // boundary class (null-safe)
              when(col("cls_rk") <= col("m_cls"), lit(1L)).otherwise(lit(0L)))
            // above the boundary: any score beats a NULL-class boundary,
            // otherwise compare scores (NULL score vs real boundary → 0)
            .when(col("b_score").isNull || col("qscore_bp") > col("b_score"),
              lit(1L))
            .otherwise(lit(0L)).as("kept"))
        .orderBy("doc_id")
    }),

    // q149 [north star, r8]: q93's temperature mix with the HASH-CUTOFF
    // two-pass — the third selection-rule family (hash-rank quotas)
    // under the same discipline as q147 (sum budgets) and q148 (rank
    // cuts). Hash ranks have no tie classes to histogram, so the scale
    // trick is different: the md5 key is uniform on [0, 16^8), so the
    // quota-th smallest hash sits near quota/n of the key space —
    // pre-filter to candidates h ≤ t_hi with t_hi = 8× that estimate
    // (capped at the space), then rank ONLY the candidate pool
    // (expected 8·quota = 32·√n rows per source vs n for q93 — the
    // same √n-factor reduction as the IVF K=√n policy). Exactness is
    // GUARDED, not assumed: if a source's candidate pool is smaller
    // than min(quota, n) the boundary might lie outside it, and the
    // query refuses loudly (q131's raise_error discipline; P(fire) ≈
    // e^{-quota} at 8× slack — mirrored in the oracle so both engines
    // fail identically). Membership ≡ q93 exactly when the guard
    // passes: the candidate pool is a prefix of the (h, doc_id) order.
    "q149_temperature_mix_scalable" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val quotas = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .select(col("source"), col("n_docs"),
          floor(sqrt(col("n_docs").cast("double")) * lit(4.0))
            .cast("long").as("quota"))
        // 8-hex-digit lowercase cutoff: fixed-width hex compares as the
        // number it encodes, so the candidate filter is a string range
        .withColumn("t_hi",
          lower(lpad(hex(least(lit(4294967295L),
            ceil(col("quota").cast("double") * 8.0 /
              col("n_docs").cast("double") * 4294967296.0).cast("long"))),
            8, "0")))
      val h = substring(md5(concat(lit("tmix:"),
        col("doc_id").cast("string"))), 1, 8)
      val cand = docs.select(col("doc_id"), col("source"), h.as("h"))
        .join(broadcast(quotas), "source")
        .filter(col("h") <= col("t_hi"))
      val counts = cand.groupBy(col("source"))
        .agg(count(lit(1)).as("cand_n"))
      cand
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("h"), col("doc_id"))).cast("long"))
        .join(broadcast(counts), "source")
        .filter(
          when(col("cand_n") < least(col("quota"), col("n_docs")),
            raise_error(lit("q149 candidate pool smaller than the quota " +
              "boundary — the 8x hash-cutoff estimate missed; widen the " +
              "slack for this source distribution")))
            .otherwise(col("rk") <= col("quota")))
        .select(col("doc_id"), col("source"), col("rk"))
        .orderBy("doc_id")
    }),

    // q151 [north star, r8]: q82's sequence packing via a DISTRIBUTED
    // PREFIX SCAN — the last two-pass family member. The budget/gate
    // variants (q147–q149) only need boundary MEMBERSHIP, so a histogram
    // suffices; packing needs every doc's exact running total, so the
    // discipline is the classic scan decomposition instead:
    //   1. range-partition by the scan key (source, doc_id) — partition
    //      p holds a contiguous key slice, so "everything before my
    //      partition" is well-defined;
    //   2. partition-LOCAL cumulative sums via a (pid, source)-keyed
    //      window — each window partition is ~n/P rows regardless of
    //      how big one source is (q82's window holds the whole source);
    //   3. per-(pid, source) totals → per-source offsets via a window
    //      over the P×|sources|-row totals frame (tiny, broadcast back);
    //   4. cum = offset + local cum. seq_id = floor((cum − w)/512),
    //      exactly q82's arithmetic.
    // Values are partition-count-INDEPENDENT (offsets absorb any range
    // boundary placement), so the result is deterministic under AQE
    // coalescing and any cluster size; reconciled against q82 in
    // OperatorSpec, oracle = q82's naive rule.
    "q151_pack_sequences_scalable" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.wsTokenCount(col("text")).as("n_tokens"))
      scanPack(docs, "n_tokens", 512)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("seq_id"))
        .orderBy("doc_id")
    }),

    // q227 [north star, r12]: FILL-IN-THE-MIDDLE transform (Bavarian et
    // al. 2022) — the data-side half of FIM training: with rate 1/2
    // (md5 gate), a doc splits at two deterministic points into
    // prefix|middle|suffix and ships re-ordered as PSM
    // (<PRE>p<SUF>s<MID>m), teaching infilling with zero model-side
    // changes. Split points are md5-derived (prefix ≥ 1 char; middle
    // may legitimately be EMPTY — the paper keeps such samples). The
    // character budget is conserved (Σ parts = len, pinned) and the
    // transform is invertible (spec reconstructs the original from the
    // sentinel layout and matches its md5). Map-only expression work;
    // docs under 2 chars can't split and pass through untransformed.
    "q227_fim_transform" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
        .filter(col("text").isNotNull)
      def h60(prefix: String) = graft.functions.Hashing.md5Long60(
        concat(lit(prefix), col("doc_id").cast("string")))
      val len = length(col("text")).cast("long")
      val applied = substring(md5(concat(lit("fim:"),
        col("doc_id").cast("string"))), 1, 1) < lit("8") && len >= 2L
      val a = lit(1L) + pmod(h60("fima:"), len - 1L) // prefix chars ∈ [1, len−1]
      val m = pmod(h60("fimb:"), len - a + 1L) // middle chars ∈ [0, len−a]
      val pre = substring(col("text"), lit(1), a.cast("int"))
      val mid = substring(col("text"), (a + 1L).cast("int"), m.cast("int"))
      val suf = substring(col("text"), (a + m + 1L).cast("int"),
        (len - a - m).cast("int"))
      docs.select(col("doc_id"), applied.as("fim_applied"),
          when(applied, a).otherwise(len).as("n_prefix"),
          when(applied, m).otherwise(0L).as("n_middle"),
          when(applied, len - a - m).otherwise(0L).as("n_suffix"),
          md5(when(applied, concat(lit("<PRE>"), pre, lit("<SUF>"), suf,
            lit("<MID>"), mid)).otherwise(col("text"))).as("out_md5"))
        .orderBy("doc_id")
    }),

    // q226 [north star, r12]: LENGTH-BUCKETED batch packing audit — the
    // padded-batch efficiency step every trainer runs between packing
    // and the GPU: grouping similar-length sequences into micro-batches
    // cuts the padding waste Σ(batch_size·max_len − Σlen) that naive
    // arrival-order batching pays. Both schemes are materialized and
    // audited per batch; the spec pins the theorem-in-practice (sorted
    // waste ≤ naive waste — equality only if all lengths are equal).
    // Scale: global rank via the scanRank decomposition (range
    // partition + local row_number + broadcast offsets — NO
    // corpus-sized window), then one batch-keyed rollup.
    "q226_batch_packing_audit" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), TextOps.wsTokenCount(col("text")).as("n_tokens"))
      def audit(ranked: DataFrame, scheme: String): DataFrame =
        ranked
          .withColumn("batch_id",
            floor((col("rank") - 1L).cast("double") / BatchDocs).cast("long"))
          .groupBy(col("batch_id"))
          .agg(count(lit(1)).as("n_docs"), max(col("n_tokens")).as("max_len"),
            sum(col("n_tokens")).as("sum_len"))
          .withColumn("waste", col("n_docs") * col("max_len") - col("sum_len"))
          .withColumn("scheme", lit(scheme))
      audit(scanRank(docs, Seq(col("doc_id"))), "naive")
        .unionByName(
          audit(scanRank(docs, Seq(col("n_tokens"), col("doc_id"))), "bucketed"))
        .select(col("scheme"), col("batch_id"), col("n_docs"),
          col("max_len"), col("sum_len"), col("waste"))
        .orderBy("scheme", "batch_id")
    }),

    // q221 [north star, r12]: RENDEZVOUS (HRW) reshard audit — the
    // minimal-movement ownership primitive behind every elastic
    // sharded system (Thaler & Ravishankar '96; the property the
    // reference's Kinesis resharding contract leans on): owner(key) =
    // argmax over shards of h(key, shard). Adding a shard moves a key
    // ONLY if the new shard wins its rendezvous — nothing else
    // changes, ~1/(S+1) of keys move, zero coordination. That theorem
    // is ENFORCED in-plan: a key observed moving to a non-new shard
    // raise_errors. Scale: owner is per-key expression work (S literal
    // hash terms — no shard table join); the audit rollup reduces to
    // S+1 rows.
    "q221_hrw_reshard" -> ((spark, dir) => {
      val keys = Tables(spark, dir, "documents").select(col("doc_id"))
      hrwAudit(keys
        .withColumn("before", hrwOwner(col("doc_id"), HrwBefore))
        .withColumn("after", hrwOwner(col("doc_id"), HrwBefore + 1)),
        HrwBefore)
    }),

    // q193 [north star, r12]: deterministic EPOCH SHUFFLE + trainer
    // shard assignment — the step between a packed corpus and the
    // GPUs, which every large training run needs and no ad-hoc
    // `ORDER BY rand()` can provide: the order must be (a) a fresh
    // pseudo-random permutation PER EPOCH, (b) bit-reproducible from
    // the seed alone (resume/debug/replication), (c) shardable so each
    // data-parallel worker reads a disjoint slice with no coordination.
    // Mechanism: rank key = md5(seed, epoch, doc_id) — a different
    // deterministic permutation per epoch; shard = rank-key prefix mod
    // S (workers need no directory, just their index); within-shard
    // position = one window ranked by the key. Scale: the only
    // corpus-sized work is the (epoch, shard)-partitioned window, each
    // partition |corpus|/S wide — and S grows with the corpus in
    // deployment (shards are fixed-size files, the q59 K∝n policy), so
    // per-reducer width is constant; no global sort, no driver state.
    // Every doc appears exactly once per epoch, permutations differ
    // across epochs, shards balance to the hash's binomial — all
    // pinned in OperatorSpec.
    "q193_epoch_shuffle" -> ((spark, dir) => {
      val epochs = 2
      val shards = 4
      val docs = Tables(spark, dir, "documents").select(col("doc_id"))
      val e = broadcast(
        spark.range(epochs).toDF("epoch"))
      docs.crossJoin(e)
        .withColumn("rk", md5(concat(lit("shuffle:"),
          col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
        .withColumn("shard",
          conv(substring(col("rk"), 1, 15), 16, 10).cast("long") % shards)
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("epoch"), col("shard"))
            .orderBy(col("rk"), col("doc_id"))).cast("long"))
        .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
        .orderBy("epoch", "shard", "pos")
    }),

    // q153 [north star, r9]: DSIR-style IMPORTANCE REWEIGHTING (Xie et
    // al., "Data Selection for Language Models via Importance
    // Resampling", NeurIPS'23 — the hashed-feature importance-weight
    // family): score every document by how much its hashed-unigram
    // profile looks like a TARGET distribution (here the corpus's
    // English subset — the "formal text" exemplar set) vs the RAW
    // corpus distribution. Exactness discipline: instead of the paper's
    // log-probability ratio (fp, engine-divergent), each token
    // contributes the cross-multiplied numerator
    //   cnt_target(bucket)·N_raw − cnt_raw(bucket)·N_target
    // — the exact-BIGINT sign-preserving surrogate of
    // p_t(bucket) − p_r(bucket) (the q83/q112 log-free stance); a doc's
    // score is the sum over its tokens, and selected = score > 0 (a
    // FIXED threshold — no global rank window to hot-spot; quota-based
    // selection composes with the q146/q148 histogram discipline).
    // Scale shape: one token explode + one 128-row bucket table
    // (broadcast) + per-doc partial agg; the only corpus-sized shuffle
    // keys on doc_id. BIGINT bound: |term| ≤ N_t·N_r and a doc sums ≤
    // its token count of them — raise_error past N_t·N_r·maxTok ≥ 2^62
    // (≈ N ≤ 3·10⁷ tokens at maxTok 10⁴; beyond that a deployment
    // switches to the double log-ratio, losing oracle-exactness).
    "q153_importance_reweight" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val toks = docs
        .select(col("doc_id"), (col("lang") === "en").as("is_target"),
          explode(TextOps.tokens(col("text"))).as("w"))
        .withColumn("bucket",
          pmod(conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"),
            lit(128L)))
      val stats = toks.groupBy(col("bucket"))
        .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("cnt_t"),
          count(lit(1)).as("cnt_r"))
      val totals = stats.agg(sum(col("cnt_t")).as("n_t"),
        sum(col("cnt_r")).as("n_r"))
      val guarded = stats.crossJoin(broadcast(totals))
        .withColumn("chk",
          when(col("n_t") * col("n_r") >= 461168601842738790L, // 2^62/10^4
            raise_error(lit("q153 importance numerators exceed the BIGINT " +
              "exactness bound; switch to the double log-ratio tier")))
            .otherwise(lit(null).cast("string")))
        .select(col("bucket"),
          (col("cnt_t") * col("n_r") - col("cnt_r") * col("n_t")).as("term"),
          col("chk"))
      val scores = toks
        .join(broadcast(guarded), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(sum(col("term")).as("score"))
      docs.select(col("doc_id"))
        .join(scores, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("score"), lit(0L)).as("score"),
          (coalesce(col("score"), lit(0L)) > 0L).cast("long").as("selected"))
        .orderBy("doc_id")
    }),

    // q158 [north star, r9]: SKETCH-TIER DECONTAMINATION — q81's answer
    // through the production Bloom geometry q155's scale note names.
    // q81's broadcast hit-join is the right plan while the holdout
    // shingle set fits a hashed relation; once the benchmark suite
    // grows past ~10⁶ distinct shingles the broadcast relation is GBs
    // and the join flips to a corpus-wide shuffle. This tier keeps the
    // corpus side MAP-ONLY at any holdout size:
    //  1. build: `stat.bloomFilter` tree-aggregates the holdout's
    //     distinct shingle hashes into an fpp=1% sketch (~10 bits/key —
    //     120 MB at 10⁸ keys, vs the multi-GB hashed relation), shipped
    //     once per executor as a BROADCAST of the serialized bits;
    //  2. probe: BloomAnyProbe gates whole DOCUMENTS on their
    //     shingle-hash ARRAY (first hit short-circuits) — a per-row
    //     scan expression, so the clean majority of the corpus never
    //     reaches an explode, join, or shuffle. No false negatives by
    //     sketch contract ⇒ the gated set is a superset of q81's;
    //  3. verify: only the flagged sliver explodes into q81's exact
    //     hit-join, killing the false positives — the result and the
    //     oracle are exactly q81's. Membership ≡ q81 and the
    //     no-false-negative property are pinned in OperatorSpec; the
    //     probe-below-explode plan shape in PlanSpec.
    "q158_decontaminate_bloom" -> ((spark, dir) => {
      val isVal = substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 2) >= "cd"
      // the shingle hashing over the whole corpus is the expensive part
      // and BOTH phases read it (holdout build + train probe/verify) —
      // cache it once, scope-released by the runner (r9 advice)
      val docs = graft.CachePool.track(
        Tables(spark, dir, "documents")
          .select(col("doc_id"), isVal.as("is_val"),
            TextOps.shingleHashes(TextOps.tokens(col("text")), 3).as("sh")))
      val holdout = graft.CachePool.track(
        docs.filter(col("is_val")).select(explode(col("sh")).as("g")).distinct())
      val bits = TextOps.bloomBits(holdout, "g")
      docs.filter(!col("is_val"))
        .filter(TextOps.bloomAnyContain(col("sh"), bits))
        .select(col("doc_id"), explode(col("sh")).as("g"))
        .join(holdout, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_contaminated"))
        .orderBy("doc_id")
    }),

    // q159 [north star, r9]: DUPLICATED-SPAN SCRUB — the REWRITE tier
    // of q90's Lee-et-al. substring-memorization measure (and the
    // span-level sibling of q97's chunk dedup): remove from every
    // document each token covered by a 5-gram that occurs more than
    // once CORPUS-WIDE (boilerplate headers, licence blocks, repeated
    // intros — the spans an LM memorizes verbatim). Production systems
    // do this with suffix arrays at 50-gram granularity; the fixed-n
    // positional-shingle formulation is the same semantics at the
    // fixture's scale of repetition, and — unlike a suffix array — it
    // is pure relational algebra: (1) positional 5-gram hashes per doc
    // (per-row expression); (2) global occurrence counts — ONE narrow
    // shuffle keyed on the gram hash, partial-aggregated map-side;
    // (3) dup grams (count>1, a small fraction — ~5% here) join back
    // to the positional explode (AQE broadcasts the dup set while it
    // fits, and it shrinks relative to the corpus as dedup upstream
    // improves); (4) per-doc dup-start lists (groupBy doc_id, bounded
    // by doc length) drive an index-aware filter over the token array —
    // token i survives iff no dup 5-gram starting in [i-4, i] covers
    // it. The rebuild is per-row expression work (short-circuit exists
    // per token; a deployment at book-length docs interval-merges the
    // starts first). Same gram-hash identity assumption as q46/q58/q90.
    "q159_dupspan_scrub" -> ((spark, dir) =>
      dupspanScrub(Tables(spark, dir, "documents"), 5)),

    // q161 [north star, r9]: GREEDY MAX-COVERAGE selection — the
    // SUBMODULAR-coverage member of the selection-objective triad
    // (budget: q146–q149; metric diversity: q154; coverage: here): pick
    // k=6 docs maximizing the union of distinct trigram shingles — the
    // classic (1−1/e)-approximate greedy for facility-location-style
    // data selection (pick the doc with the largest MARGINAL coverage,
    // repeat). Nemhauser et al.'78 guarantee; the shape instruction
    // tuning selections (coverage of skills/topics) actually run.
    // Scale = the q154/q91 stance: the covered set is MODEL STATE
    // (⋃ of k docs' shingles, bounded by k·doc-length, not the corpus),
    // embedded per round as an array literal; each round is ONE map-only
    // pass — marginal = |sh \ covered| per row (O(|sh|+|covered|)
    // per-row expression) — finished by a partial-aggregating max_by
    // (ties → lowest doc_id); no join, no window, no pair stage ever
    // forms. Already-picked docs are excluded so a zero-marginal tail
    // still selects fresh docs deterministically. The oracle unrolls
    // the same greedy as chained CTEs, bit-exact integer gains.
    "q161_maxcover_select" -> ((spark, dir) =>
      maxcoverSelect(Tables(spark, dir, "documents"), 6)),

    // q155 [north star, r9]: ERASURE-LIST SCRUB via a BLOOM-GATED
    // anti-join — the GDPR/opt-out propagation pass every production
    // corpus runs: given a list of erased subjects, drop every record
    // they own, corpus-wide. The 100 TB shape: an anti-join against the
    // list shuffles the WHOLE corpus if planned naively (the list is
    // too big to broadcast-join once it holds 10⁸ subjects). The fix is
    // the classic Bloom gate — the same trick Spark's own runtime
    // bloom-filter join injects, made explicit and oracle-checkable:
    //  1. build: the deny list tree-aggregates into a broadcast
    //     `spark.util.sketch.BloomFilter` at m ≈ 10·|deny| bits
    //     (fpp 1%) — `TextOps.bloomBits`, the SAME build q158 and the
    //     streaming ingest gate use (one Bloom code path engine-wide);
    //  2. probe: a MAP-ONLY `BloomAnyProbe` pass flags candidate rows.
    //     No false negatives by sketch contract, so the unflagged
    //     majority — (1 − |deny|/|keys| − fpp) of the corpus — passes
    //     through with ZERO shuffle;
    //  3. only the flagged sliver meets the exact anti-join, which
    //     kills the false positives, so the RESULT is exact and the
    //     DuckDB oracle is a plain hash-gate predicate.
    // NULL keys take the pass-through branch via a null-safe compare
    // (the probe NULL-propagates; the exact anti-join keeps NULL-keyed
    // rows, so the gate must too). The deny list is hash-gated (~10% of
    // users) for reproducibility; a real deployment reads its erasure
    // table instead.
    "q155_erasure_scrub" -> ((spark, dir) => {
      val tagged = erasureTagged(spark, dir)
      tagged.filter(col("might") <=> true)
        .join(erasureDenyList(spark, dir), Seq("user_id"), "left_anti")
        .unionByName(tagged.filter(!(col("might") <=> true)))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy("event_id")
    }),

    // q156 [north star, r9]: CONSISTENT PSEUDONYMIZATION — q70 masks
    // PII destructively (every number → "<NUM>"); this is the
    // join-preserving variant a training corpus actually ships with:
    // each identifier is replaced by a DETERMINISTIC token (keyed md5,
    // HMAC-shaped) so the same entity gets the same pseudonym in every
    // record — cross-record joins, dedup keys, and co-occurrence stats
    // survive the scrub, while the raw identifier never leaves the
    // expression. Per-match replacement with a match-dependent value is
    // not regexp_replace-expressible, so the rebuild interleaves the
    // split segments with the pseudonymized matches:
    //   split(props, ID)      → n+1 segments (trailing empties kept)
    //   regexp_extract_all    → n matches, in order
    //   zip_with(segs, toks)  → seg_i ++ pseudo(tok_i) (last tok NULL
    //                           → coalesce ''), array_join = the text.
    // Both engines agree on split-edge semantics (leading/trailing
    // empty segments — verified against DuckDB's regexp_split_to_array).
    // Scale: pure per-row expression work fused into the scan — zero
    // shuffles before the presentation sort.
    "q156_pseudonymize" -> ((spark, dir) => {
      val segs = split(col("props"), "[0-9]+", -1)
      val toks = regexp_extract_all(col("props"), lit("[0-9]+"), lit(0))
      val zipped = zip_with(segs, toks, (s, t) =>
        concat(s, coalesce(concat(lit("id_"),
          substring(md5(concat(lit("pseu:"), t)), 1, 8)), lit(""))))
      Tables(spark, dir, "events")
        .select(col("event_id"),
          array_join(zipped, "").as("scrubbed"),
          concat(lit("u_"), substring(md5(concat(lit("pseu:"),
            col("user_id").cast("string"))), 1, 8)).as("user_pseudo"),
          size(toks).cast("long").as("n_ids"))
        .orderBy("event_id")
    }),

    // q157 [north star, r9]: UNIMAX capped-epoch language allocation
    // (Chung et al., "UniMax: Fairer and More Effective Language
    // Sampling for Large-Scale Multilingual Pretraining", ICLR'23) —
    // the mixing rule that q93's temperature flattening approximates:
    // visit languages ASCENDING by size and give each
    //   alloc_l = min(cap·s_l, remaining_budget / remaining_langs)
    // so low-resource languages are capped at `cap` epochs (here 1.2,
    // as the exact integer 6·s//5) and the budget they can't absorb
    // redistributes to larger ones. The recurrence is genuinely
    // sequential (min of a running remainder — no closed window form),
    // but its state is |langs| rows: MODEL-STATE-SIZED, so the greedy
    // runs on the driver over the collected per-language totals (the
    // q91 stance; guarded), and everything corpus-sized stays in the
    // one partial-aggregating groupBy. All-BIGINT arithmetic (floor
    // division on both engines); the DuckDB oracle unrolls the same
    // greedy as a recursive CTE. Budget = one corpus pass; epochs_bp =
    // allocated epochs in basis points (alloc·10⁴/s, exact).
    "q157_unimax_mix" -> ((spark, dir) => {
      val perLang = Tables(spark, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(TextOps.wsTokenCount(col("text"))), lit(0L))
            .as("n_tokens"))
        .orderBy(col("n_tokens"), col("lang"))
        .collect()
      require(perLang.length <= 10000,
        s"q157: ${perLang.length} languages exceed the driver model-state " +
          "bound; shard the allocation by language family")
      val budget = perLang.map(_.getLong(2)).sum
      var rem = budget
      var left = perLang.length.toLong
      val rows = perLang.map { r =>
        val (lang, nDocs, s) = (r.getString(0), r.getLong(1), r.getLong(2))
        val alloc = math.min(6L * s / 5L, rem / left)
        rem -= alloc
        left -= 1L
        (lang, nDocs, s, alloc, if (s == 0L) 0L else alloc * 10000L / s)
      }
      import spark.implicits._
      rows.toSeq
        .toDF("lang", "n_docs", "n_tokens", "alloc_tokens", "epochs_bp")
        .orderBy("lang")
    }),
  )

  /** q161's greedy max-coverage selection over any `(doc_id, text)`
    * corpus — see the query comment for the scale/approximation story.
    * Each round is one map-only pass (marginal coverage against the
    * driver-held covered set) finished by a partial-aggregating max_by.
    * If the pool runs dry before k picks (corpus smaller than k, or
    * every remaining doc already picked), the greedy terminates with the
    * selected prefix — max_by over zero rows yields a NULL struct, which
    * previously NPE'd (r9 advice); the unrolled oracle's k-th CTE comes
    * back empty in exactly the same situation.
    */
  /** The q151 DISTRIBUTED PREFIX SCAN as a reusable packing kernel
    * (r12) — shared by q151 and the composed pipeline's hot-source-proof
    * variant (q185), so the scan decomposition is a library piece, not a
    * one-query demo:
    *   1. range-partition by (source, doc_id) — partition p holds a
    *      contiguous key slice;
    *   2. partition-LOCAL cumsums via a (pid, source)-keyed window —
    *      each window partition is ~n/P rows no matter how hot one
    *      source is (q82's window holds the whole source);
    *   3. per-(pid, source) totals → per-source offsets over the
    *      P×|sources|-row totals frame (tiny, broadcast back);
    *   4. cum = offset + local cum; seq_id = floor((cum − w)/seqLen).
    * Values are partition-count-independent (offsets absorb any range
    * boundary placement). Input needs (doc_id, source, wCol [+ any
    * passthrough columns]); output = input columns + seq_id.
    */
  /** q221's shard count before the reshard (the audit adds one). */
  private[graft] val HrwBefore = 8

  /** Rendezvous owner of a key among `shards` shards: argmax of the
    * house 60-bit hash over (key, shard) pairs — per-key EXPRESSION
    * work (the shard list rides as literal struct terms, never a join
    * side), ties broken toward the higher shard id (array_max on
    * struct compares h first, then shard — mirrored by the oracle's
    * ORDER BY h DESC, shard DESC).
    */
  private[graft] def hrwOwner(key: org.apache.spark.sql.Column,
      shards: Int): org.apache.spark.sql.Column =
    array_max(array((0 until shards).map { s =>
      struct(
        graft.functions.Hashing.md5Long60(concat(lit("hrw:"),
          key.cast("string"), lit(s":$s"))).as("h"),
        lit(s.toLong).as("shard"))
    }: _*)).getField("shard")

  /** The reshard audit over (key, before, after) assignments: per-shard
    * key counts under S and S+1 plus the moved-out count, with the HRW
    * minimal-disruption theorem enforced loudly — a key whose new owner
    * is neither its old one nor the ADDED shard means the hash
    * function or shard list drifted mid-flight, exactly the silent
    * reshuffle that corrupts sticky routing.
    */
  private[graft] def hrwAudit(assigned: DataFrame, before: Int): DataFrame =
    assigned
      .filter(when(col("before") =!= col("after") &&
          col("after") =!= lit(before.toLong),
        raise_error(lit("q221: HRW minimal-disruption violated — a key " +
          "moved to a shard other than the newly added one")))
        .otherwise(lit(true)))
      .select(explode(array(
        struct(col("before").as("shard"), lit(1L).as("b"), lit(0L).as("a"),
          when(col("before") =!= col("after"), 1L).otherwise(0L).as("m")),
        struct(col("after").as("shard"), lit(0L).as("b"), lit(1L).as("a"),
          lit(0L).as("m")))).as("g"))
      .select(col("g.*"))
      .groupBy(col("shard")).agg(
        sum(col("b")).as("n_before"),
        sum(col("a")).as("n_after"),
        sum(col("m")).as("moved_out"))
      .orderBy("shard")

  /** q226's training micro-batch width. */
  private[graft] val BatchDocs = 32

  /** Distributed GLOBAL rank under `order` with no corpus-sized window
    * — the q151 scan decomposition without the per-source key: range
    * partition on the order key, per-partition local row_number, then
    * broadcast partition-count offsets (the offsets window runs over
    * ≤ #partitions rows). Values are partition-count-independent.
    */
  private[graft] def scanRank(docs: DataFrame,
      order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val ranged = docs.repartitionByRange(order: _*)
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid")).orderBy(order: _*)
    val local = ranged
      .withColumn("lrank", row_number().over(wLocal).cast("long"))
    val offs = local.groupBy(col("pid")).agg(max(col("lrank")).as("pn"))
      .withColumn("off", coalesce(sum(col("pn")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("off"))
    local.join(broadcast(offs), Seq("pid"))
      .withColumn("rank", col("off") + col("lrank"))
      .drop("pid", "lrank", "off")
  }

  private[graft] def scanPack(docs: DataFrame, wCol: String,
      seqLen: Int): DataFrame = {
    val ranged = docs
      .repartitionByRange(col("source"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid"), col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("lcum", sum(col(wCol)).over(wLocal))
    // lcum is nondecreasing within the group, so max(lcum) is the
    // group total (NULL-weight rows add nothing on either engine)
    val offs = local.groupBy(col("pid"), col("source"))
      .agg(max(col("lcum")).as("ptot"))
      .withColumn("off", coalesce(sum(col("ptot")).over(
        Window.partitionBy(col("source")).orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("source"), col("off"))
    local.join(broadcast(offs), Seq("pid", "source"))
      .withColumn("seq_id",
        floor((col("off") + col("lcum") - col(wCol)).cast("double")
          / seqLen.toDouble).cast("long"))
      .drop("pid", "lcum", "off")
  }

  private[graft] def maxcoverSelect(
      corpus: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = corpus.sparkSession
    val docs = graft.CachePool.track(
      corpus
        .select(col("doc_id"),
          TextOps.shingleHashes(TextOps.tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0))
    var covered = Set.empty[Long]
    var picked = Vector.empty[Long]
    var picks = Vector.empty[(Long, Long, Long, Long)]
    var total = 0L
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val marg =
        if (covered.isEmpty) size(col("sh")).cast("long")
        else size(array_except(col("sh"),
          typedlit(covered.toSeq.sorted))).cast("long")
      val pool =
        if (picked.isEmpty) docs
        else docs.filter(!col("doc_id").isin(picked: _*))
      val w = pool
        .agg(max_by(struct(col("doc_id"), col("sh")),
          struct(marg.as("m"), (-col("doc_id")).as("t"))).as("w"))
        .select(col("w.doc_id"), col("w.sh")).head()
      if (w.isNullAt(0)) exhausted = true
      else {
        val sh = w.getSeq[Long](1)
        val gain = sh.count(h => !covered.contains(h)).toLong
        covered ++= sh
        total += gain
        picked :+= w.getLong(0)
        picks :+= ((r.toLong, w.getLong(0), gain, total))
        r += 1
      }
    }
    import spark.implicits._
    picks.toDF("sel_rank", "doc_id", "gain", "covered_total")
      .orderBy("sel_rank")
  }

  /** q155's hash-gated stand-in for the erasure table (~10% of users). */
  private[graft] def erasureDenyList(
      spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables(spark, dir, "events").select(col("user_id")).distinct()
      .filter(substring(md5(concat(lit("erase:"),
        col("user_id").cast("string"))), 1, 2) < "1a")

  /** q155's probe pass: every event tagged with `might` = the Bloom
    * verdict. Split out so OperatorSpec can assert the filter's two
    * load-bearing properties directly (no false negatives; pruning).
    *
    * One Bloom code path engine-wide (r10, closing the r9 verdict's
    * consistency ask): the sketch is the same broadcast
    * `spark.util.sketch.BloomFilter` + [[graft.expressions.BloomAnyProbe]]
    * pair q158 and the streaming ingest gate use — m ≈ 10·|deny| bits
    * (fpp 1%) actually executed, not a documented upgrade path. The
    * probe is NULL-propagating (NULL user_id → NULL verdict), so both
    * consumers below route NULL keys down the pass-through branch with a
    * null-safe comparison — matching the exact anti-join, which keeps
    * NULL-keyed rows (a NULL never equals a deny-list key).
    */
  private[graft] def erasureTagged(
      spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val bits = TextOps.bloomBits(erasureDenyList(spark, dir), "user_id")
    ev.withColumn("might", TextOps.bloomAnyContain(col("user_id"), bits))
  }

  /** q159's operator over any `(doc_id, text)`-shaped corpus — see the
    * query comment above for the scale analysis.
    */
  private[graft] def dupspanScrub(
      corpus: org.apache.spark.sql.DataFrame,
      n: Int): org.apache.spark.sql.DataFrame = {
    val docs = graft.CachePool.track(
      corpus
        .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("ws"))
        .withColumn("ph", TextOps.shingleHashesAll(col("ws"), n)))
    val dup = docs.select(explode(col("ph")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1L).select(col("g"))
    val spans0 = docs.select(col("doc_id"), posexplode(col("ph")))
      .join(dup, col("col") === col("g"))
      .groupBy(col("doc_id")).agg(collect_list(col("pos")).as("starts"))
    scrubRebuild(docs, spans0, n)
  }

  /** The dup-span REBUILD shared by q159 (positional-hash dup detection)
    * and q179 (suffix-doubling dup detection): interval-merge each doc's
    * dup-start list, then filter its token array index-aware and emit
    * the (n_tokens, n_removed, text_clean) contract. `docs` carries
    * (doc_id, text, ws); `starts` is (doc_id, starts: array<int>) for
    * the docs with ≥1 duplicated n-gram start.
    */
  private[operators] def scrubRebuild(
      docs: org.apache.spark.sql.DataFrame,
      startsDf: org.apache.spark.sql.DataFrame,
      n: Int): org.apache.spark.sql.DataFrame = {
    // INTERVAL-MERGE the dup-start list before the per-token filter (r9
    // verdict item 7): boilerplate runs produce long chains of
    // overlapping [p, p+n-1] spans, and the previous exists-over-starts
    // rebuild cost O(len·|starts|) per document — quadratic-ish on a
    // book-length doc whose every window is duplicated. Merged, a chain
    // collapses to one interval: sort the starts, mark run HEADS
    // (first, or a gap beyond contiguity: p > prev + n) and run ENDS
    // (last, or next > p + n), zip them into disjoint [head, end+n-1]
    // intervals. The per-token scan then costs O(|merged runs|), with
    // |merged| ≪ |starts| exactly when documents are boilerplate-heavy.
    // (Production at 50-gram granularity uses a suffix array; this
    // keeps the relational formulation honest at book length.)
    //
    // PLACEMENT IS LOAD-BEARING: the merge must evaluate once per DOC,
    // on the aggregation side of the join — an expression referenced
    // inside a HOF lambda re-evaluates PER ELEMENT (no CSE across
    // lambda invocations), and CollapseProject re-inlines a
    // same-side withColumn into its single consumer, so staging the
    // merge above the join put the whole sort+merge inside the
    // per-token lambda: O(len·starts log starts), measured 11× WORSE
    // at sf0.1. Below the join, the optimizer cannot pull the
    // expression across the Join node and the lambda reads a bound
    // attribute.
    val st = sort_array(col("starts"))
    val heads = filter(st, (p, i) =>
      i === lit(0) || p > element_at(st, i) + lit(n))
    val ends = filter(st, (p, i) =>
      i === size(st) - 1 ||
        coalesce(element_at(st, i + lit(2)) > p + lit(n), lit(true)))
    val merged = zip_with(heads, ends,
      (s, e) => struct(s.as("s"), (e + lit(n - 1)).as("e")))
    val spans = startsDf.select(col("doc_id"), merged.as("mg"))
    val mg = coalesce(col("mg"),
      array().cast("array<struct<s:int,e:int>>"))
    val kept = filter(col("ws"), (t, i) =>
      !exists(mg, iv => iv("s") <= i && i <= iv("e")))
    docs.join(spans, Seq("doc_id"), "left")
      .withColumn("kept", kept)
      .select(col("doc_id"),
        TextOps.wsTokenCount(col("text")).as("n_tokens"),
        (TextOps.wsTokenCount(col("text")) -
          when(col("text").isNull, lit(null).cast("long"))
            .otherwise(size(col("kept")).cast("long"))).as("n_removed"),
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(array_join(col("kept"), " ")).as("text_clean"))
      .orderBy("doc_id")
  }

  /** q97's operator over any `(doc_id, text)`-shaped corpus — see the
    * query comment above for the scale analysis.
    */
  private[graft] def chunkDedup(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val chunks = docs
      .select(col("doc_id"), col("text"),
        posexplode(when(length(col("text")) > 0,
            sequence(lit(1), length(col("text")), lit(200)))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        expr("substring(text, col, 200)").as("chunk"))
    val keyed = chunks.withColumn("h", sha2(col("chunk"), 256))
    val firsts = keyed.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("first"))
    val kept = keyed.join(firsts, "h")
      .filter(col("doc_id") === col("first.doc_id") &&
        col("chunk_id") === col("first.chunk_id"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
          t => t.getField("chunk")), "").as("text_clean"))
    val totals = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
    docs.select(col("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
      .orderBy("doc_id")
  }

  def oracles: Map[String, String] = Map(
    "q88_oov_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |b AS (SELECT doc_id,
        |  CASE WHEN len(ws) > 1
        |    THEN list_distinct(list_transform(range(1, len(ws)),
        |           i -> ws[i] || ' ' || ws[i+1]))
        |    ELSE CAST([] AS VARCHAR[]) END AS bi,
        |  substring(md5('split:' || CAST(doc_id AS VARCHAR)),1,2) < 'cd' AS is_train
        |  FROM w),
        |vocab AS (SELECT DISTINCT unnest(bi) AS g FROM b WHERE is_train),
        |v AS (SELECT doc_id, bi FROM b WHERE NOT is_train),
        |e AS (SELECT doc_id, unnest(bi) AS g FROM v),
        |u AS (SELECT e.doc_id, count(*) AS n
        |      FROM e LEFT JOIN vocab ON vocab.g = e.g
        |      WHERE vocab.g IS NULL GROUP BY e.doc_id)
        |SELECT v.doc_id, CAST(len(bi) AS BIGINT) AS n_bigrams,
        |  CAST(COALESCE(u.n, 0) AS BIGINT) AS n_unseen,
        |  CASE WHEN len(bi) > 0
        |    THEN CAST(COALESCE(u.n, 0) AS DOUBLE) / CAST(len(bi) AS DOUBLE)
        |    ELSE 0.0 END AS novelty
        |FROM v LEFT JOIN u ON u.doc_id = v.doc_id ORDER BY v.doc_id""".stripMargin,
    "q81_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws,
        |  substring(md5('split:' || CAST(doc_id AS VARCHAR)),1,2) >= 'cd' AS is_val
        |  FROM documents),
        |sh AS (SELECT doc_id, is_val,
        |  unnest(list_distinct(list_transform(range(1, greatest(len(ws)-2,0)+1),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g FROM w),
        |vs AS (SELECT DISTINCT g FROM sh WHERE is_val)
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
        |FROM sh s JOIN vs ON s.g = vs.g WHERE NOT s.is_val
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "q82_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 512.0) AS BIGINT) AS seq_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "q65_train_split" ->
      """SELECT doc_id, substring(md5('split:' || CAST(doc_id AS VARCHAR)),1,2) AS bucket,
        | CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)),1,2) < 'cd'
        |      THEN 'train' ELSE 'val' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q66_domain_mix" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang = 'en' OR substring(md5('mix:' || CAST(doc_id AS VARCHAR)),1,2) < '80'
        |ORDER BY doc_id""".stripMargin,
    "q93_temperature_mix" ->
      """WITH q AS (SELECT source,
        |        CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 4.0) AS BIGINT) AS quota
        |      FROM documents GROUP BY source),
        |r AS (SELECT doc_id, source,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY substring(md5('tmix:' || CAST(doc_id AS VARCHAR)), 1, 8),
        |            doc_id) AS BIGINT) AS rk
        |      FROM documents)
        |SELECT r.doc_id, r.source, r.rk FROM r JOIN q USING (source)
        |WHERE r.rk <= q.quota ORDER BY r.doc_id""".stripMargin,
    "q69_df_prune" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |tok AS (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS pos FROM w),
        |tok2 AS (SELECT doc_id, pos, ws[CAST(pos AS INT)] AS word FROM tok),
        |total AS (SELECT count(*) AS n FROM documents),
        |dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY word),
        |stop AS (SELECT word FROM dfreq, total WHERE CAST(df AS DOUBLE) > CAST(n AS DOUBLE) * 0.79),
        |kept AS (SELECT doc_id, pos, word FROM tok2 WHERE word NOT IN (SELECT word FROM stop)),
        |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS pruned_text,
        |               CAST(count(*) AS BIGINT) AS n_kept
        |        FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.pruned_text, '') AS pruned_text,
        |       COALESCE(a.n_kept, 0) AS n_kept
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q70_pii_scrub" ->
      """SELECT event_id, regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed,
        | CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS BIGINT) AS n_digits
        |FROM events ORDER BY event_id""".stripMargin,
    "q72_stratified_sample" ->
      """WITH r AS (SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY substring(md5('sample:' || CAST(doc_id AS VARCHAR)),1,8), doc_id) AS rk
        |  FROM documents)
        |SELECT lang, doc_id FROM r WHERE rk <= 50
        |ORDER BY lang, doc_id""".stripMargin,
    "q71_curation_pipeline" ->
      """WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
        |kept AS (SELECT d.doc_id, d.lang FROM documents d
        |         JOIN keep k ON d.doc_id = k.doc_id WHERE d.n_chars >= 150)
        |SELECT CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)),1,2) < 'cd'
        |            THEN 'train' ELSE 'val' END AS split,
        |       lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM kept GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "q97_chunk_dedup" ->
      """WITH c AS (SELECT doc_id, CAST((start - 1) / 200 AS BIGINT) AS chunk_id,
        |        substring(text, CAST(start AS INT), 200) AS chunk
        |      FROM (SELECT doc_id, text, unnest(range(1, length(text)+1, 200)) AS start
        |            FROM documents) t),
        |k AS (SELECT doc_id, chunk_id, chunk,
        |        row_number() OVER (PARTITION BY chunk
        |          ORDER BY doc_id, chunk_id) AS occ
        |      FROM c),
        |r AS (SELECT doc_id, count(*) AS n_kept,
        |        string_agg(chunk, '' ORDER BY chunk_id) AS text_clean
        |      FROM k WHERE occ = 1 GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM c GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(tot.n_chunks, 0) AS BIGINT) AS n_chunks,
        |  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(r.text_clean, '') AS text_clean
        |FROM documents d
        |LEFT JOIN tot ON tot.doc_id = d.doc_id
        |LEFT JOIN r ON r.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q111_kfold" ->
      """WITH d AS (SELECT doc_id,
        |        ('0x' || substring(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
        |          % 5 AS fold
        |      FROM documents),
        |s AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_fold FROM d GROUP BY fold)
        |SELECT d.doc_id, d.fold, s.n_fold
        |FROM d JOIN s USING (fold) ORDER BY d.doc_id""".stripMargin,
    "q112_weighted_sample" ->
      """WITH d AS (SELECT doc_id, least(n_chars, 1000) AS w FROM documents),
        |m AS (SELECT max(w) AS max_w FROM d)
        |SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(max_w AS BIGINT) AS max_w
        |FROM d, m
        |WHERE ('0x' || substring(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        * max_w < w * 4294967296
        |ORDER BY doc_id""".stripMargin,
    "q67_chunk" ->
      """SELECT doc_id, CAST((start - 1) / 150 AS BIGINT) AS chunk_id,
        | CAST(start AS BIGINT) AS start,
        | substring(text, CAST(start AS INT), 200) AS chunk,
        | CAST(length(substring(text, CAST(start AS INT), 200)) AS BIGINT) AS n_chunk_chars
        |FROM (SELECT doc_id, text, unnest(range(1, length(text)+1, 150)) AS start
        |      FROM documents) t
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q132_shard_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |             md5(concat('shuffle:', CAST(doc_id AS VARCHAR))) AS key
        |           FROM documents),
        |s AS (SELECT doc_id, key,
        |        CAST('0x' || substring(key, 1, 2) AS BIGINT) % 8 AS shard
        |      FROM k)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
        |    AS BIGINT) AS pos
        |FROM s ORDER BY doc_id""".stripMargin,
    "q133_token_budget" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, source, ws_tokens,
        |        SUM(ws_tokens) OVER (PARTITION BY source
        |          ORDER BY n_chars DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS cum_tokens
        |      FROM t)
        |SELECT doc_id, source, ws_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 800 ORDER BY doc_id""".stripMargin,
    "q134_epoch_plan" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY source),
        |e AS (SELECT source, n_docs, n_tokens,
        |        CAST(ceil(2000.0 / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS epochs
        |      FROM s)
        |SELECT source, n_docs, n_tokens, epochs,
        |  CAST(floor((2000.0 - CAST(epochs - 1 AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        |    * 10000.0 / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS last_epoch_keep_bp
        |FROM e ORDER BY source""".stripMargin,
    // q138: identical score expression (same op order — multiply before
    // divide — so the doubles match bit-for-bit) + integer rank gate.
    "q138_quality_gate" ->
      """WITH s AS (SELECT doc_id, source,
        |    CAST(floor(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
        |      * 10000 / CAST(len(string_split(text,' ')) AS DOUBLE)) AS BIGINT)
        |      AS qscore_bp
        |  FROM documents)
        |SELECT doc_id, source, qscore_bp, rk, n_src,
        |  CAST(CASE WHEN rk * 10 <= n_src * 3 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM (SELECT doc_id, source, qscore_bp,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY qscore_bp DESC, doc_id) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
        |  FROM s) t
        |ORDER BY doc_id""".stripMargin,
    // q146: the oracle computes the NAIVE global cumulative-sum rule —
    // one window over the whole corpus ordered (ws_tokens DESC, doc_id)
    // — which the Spark side's two-pass threshold construction must
    // reproduce membership-exactly (see the query comment for the
    // prior + i·w* ≤ B ⟺ rank ≤ (B − prior) div w* equivalence).
    "q146_global_token_budget" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, ws_tokens,
        |    SUM(ws_tokens) OVER (ORDER BY ws_tokens DESC NULLS LAST, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, ws_tokens,
        |  CAST(CASE WHEN cum <= 10000 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM c ORDER BY doc_id""".stripMargin,
    // q147: the naive q133 rule with a kept flag over ALL docs — the
    // scalable two-pass plan must reproduce it membership-exactly.
    "q147_source_budget_scalable" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, ws_tokens,
        |    SUM(ws_tokens) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, source, ws_tokens,
        |  CAST(CASE WHEN cum <= 800 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM c ORDER BY doc_id""".stripMargin,
    // q148: q138's naive rank rule (same score expression, same
    // multiply-before-divide op order) flagged over ALL docs — the
    // histogram rank-cut must reproduce it membership-exactly.
    "q148_quality_gate_scalable" ->
      """WITH s AS (SELECT doc_id, source,
        |    CAST(floor(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
        |      * 10000 / CAST(len(string_split(text,' ')) AS DOUBLE)) AS BIGINT)
        |      AS qscore_bp
        |  FROM documents)
        |SELECT doc_id, source, qscore_bp,
        |  CAST(CASE WHEN rk * 10 <= n_src * 3 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM (SELECT doc_id, source, qscore_bp,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY qscore_bp DESC NULLS LAST, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n_src
        |  FROM s) t
        |ORDER BY doc_id""".stripMargin,
    // q149: the same candidate-pool construction (identical double op
    // order for t_hi, identical fixed-width-hex compare) INCLUDING the
    // exactness guard — both engines refuse the same way if the 8x
    // estimate ever misses; otherwise the result is q93's kept rows.
    "q149_temperature_mix_scalable" ->
      """WITH q AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 4.0) AS BIGINT) AS quota
        |  FROM documents GROUP BY source),
        |t AS (SELECT source, n_docs, quota,
        |    lower(lpad(to_hex(least(4294967295,
        |      CAST(ceil(CAST(quota AS DOUBLE) * 8.0 / CAST(n_docs AS DOUBLE)
        |        * 4294967296.0) AS BIGINT))), 8, '0')) AS t_hi
        |  FROM q),
        |cand AS (SELECT d.doc_id, d.source,
        |    substring(md5('tmix:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS h,
        |    t.quota, t.n_docs, t.t_hi
        |  FROM documents d JOIN t ON d.source = t.source
        |  WHERE substring(md5('tmix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
        |    <= t.t_hi),
        |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS cand_n
        |  FROM cand GROUP BY source),
        |r AS (SELECT cand.doc_id, cand.source, cand.quota, cand.n_docs,
        |    cnt.cand_n,
        |    CAST(row_number() OVER (PARTITION BY cand.source
        |      ORDER BY cand.h, cand.doc_id) AS BIGINT) AS rk
        |  FROM cand JOIN cnt USING (source))
        |SELECT doc_id, source, rk FROM r
        |WHERE CASE WHEN cand_n < least(quota, n_docs)
        |    THEN error('q149 candidate pool smaller than the quota boundary')
        |    ELSE rk <= quota END
        |ORDER BY doc_id""".stripMargin,
    // q227: the same md5 gate, 60-bit split hashes, char-offset
    // substrings, and PSM sentinel layout in SQL.
    "q227_fim_transform" ->
      s"""WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
         |    substring(md5('fim:'||CAST(doc_id AS VARCHAR)),1,1) < '8'
         |      AND length(text) >= 2 AS applied,
         |    ('0x'||substring(md5('fima:'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h1,
         |    ('0x'||substring(md5('fimb:'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h2
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT doc_id, text, len, applied, h2,
         |        CASE WHEN len >= 2 THEN 1 + h1 % (len - 1) ELSE 1 END AS a
         |      FROM d),
         |t AS (SELECT doc_id, text, len, applied, a,
         |        CASE WHEN len >= 2 THEN h2 % (len - a + 1) ELSE 0 END AS m
         |      FROM s)
         |SELECT doc_id, applied AS fim_applied,
         |  CASE WHEN applied THEN a ELSE len END AS n_prefix,
         |  CASE WHEN applied THEN m ELSE 0 END AS n_middle,
         |  CASE WHEN applied THEN len - a - m ELSE 0 END AS n_suffix,
         |  md5(CASE WHEN applied THEN
         |        '<PRE>' || substring(text, 1, CAST(a AS INT))
         |        || '<SUF>' || substring(text, CAST(a + m + 1 AS INT),
         |             CAST(len - a - m AS INT))
         |        || '<MID>' || substring(text, CAST(a + 1 AS INT), CAST(m AS INT))
         |      ELSE text END) AS out_md5
         |FROM t ORDER BY doc_id""".stripMargin,
    // q226: both rank orders via ROW_NUMBER, the same batch arithmetic.
    "q226_batch_packing_audit" ->
      s"""WITH d AS (SELECT doc_id, len(string_split(text,' ')) AS n_tokens
         |           FROM documents WHERE text IS NOT NULL),
         |n AS (SELECT n_tokens,
         |        ROW_NUMBER() OVER (ORDER BY doc_id) AS rk FROM d),
         |s AS (SELECT n_tokens,
         |        ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS rk FROM d),
         |b AS (SELECT 'naive' AS scheme, (rk-1)//$BatchDocs AS batch_id,
         |        n_tokens FROM n
         |      UNION ALL
         |      SELECT 'bucketed', (rk-1)//$BatchDocs, n_tokens FROM s)
         |SELECT scheme, CAST(batch_id AS BIGINT) AS batch_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(MAX(n_tokens) AS BIGINT) AS max_len,
         |  CAST(SUM(n_tokens) AS BIGINT) AS sum_len,
         |  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS waste
         |FROM b GROUP BY scheme, batch_id ORDER BY scheme, batch_id""".stripMargin,
    // q221: both assignments re-derived as argmax via ROW_NUMBER over
    // the same 60-bit hash (ties toward the higher shard id), then the
    // identical role-explode rollup.
    "q221_hrw_reshard" ->
      s"""WITH k AS (SELECT doc_id FROM documents),
         |a8 AS (SELECT doc_id, shard FROM (
         |    SELECT k.doc_id, s.k AS shard,
         |      ROW_NUMBER() OVER (PARTITION BY k.doc_id ORDER BY
         |        ('0x'||substring(md5('hrw:'||CAST(k.doc_id AS VARCHAR)
         |          ||':'||CAST(s.k AS VARCHAR)),1,15))::BIGINT DESC,
         |        s.k DESC) AS rn
         |    FROM k, generate_series(0, ${HrwBefore - 1}) s(k))
         |  WHERE rn = 1),
         |a9 AS (SELECT doc_id, shard FROM (
         |    SELECT k.doc_id, s.k AS shard,
         |      ROW_NUMBER() OVER (PARTITION BY k.doc_id ORDER BY
         |        ('0x'||substring(md5('hrw:'||CAST(k.doc_id AS VARCHAR)
         |          ||':'||CAST(s.k AS VARCHAR)),1,15))::BIGINT DESC,
         |        s.k DESC) AS rn
         |    FROM k, generate_series(0, $HrwBefore) s(k))
         |  WHERE rn = 1),
         |j AS (SELECT a8.doc_id, a8.shard AS bef, a9.shard AS aft
         |      FROM a8 JOIN a9 USING (doc_id)),
         |e AS (SELECT bef AS shard, 1 AS b, 0 AS a,
         |        CASE WHEN bef <> aft THEN 1 ELSE 0 END AS m FROM j
         |      UNION ALL SELECT aft, 0, 1, 0 FROM j)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(SUM(b) AS BIGINT) AS n_before,
         |  CAST(SUM(a) AS BIGINT) AS n_after,
         |  CAST(SUM(m) AS BIGINT) AS moved_out
         |FROM e GROUP BY shard ORDER BY shard""".stripMargin,
    // q193: the identical seeded-permutation construction in SQL —
    // same rank key, same prefix-mod shard, same within-shard rank.
    "q193_epoch_shuffle" ->
      """WITH e AS (SELECT 0 AS epoch UNION ALL SELECT 1),
        |b AS (SELECT e.epoch, d.doc_id,
        |        md5('shuffle:' || CAST(e.epoch AS VARCHAR) || ':'
        |            || CAST(d.doc_id AS VARCHAR)) AS rk
        |      FROM documents d CROSS JOIN e),
        |s AS (SELECT epoch, doc_id, rk,
        |        CAST('0x' || substring(rk, 1, 15) AS BIGINT) % 4 AS shard
        |      FROM b)
        |SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, shard
        |         ORDER BY rk, doc_id) AS BIGINT) AS pos,
        |  doc_id
        |FROM s ORDER BY epoch, shard, pos""".stripMargin,
    // q151: q82's naive per-source prefix-sum rule — the distributed
    // scan must reproduce the exact same running totals.
    "q151_pack_sequences_scalable" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 512.0) AS BIGINT) AS seq_id
        |FROM c ORDER BY doc_id""".stripMargin,
    // q153: the same cross-multiplied importance numerators — md5-bucket
    // hashing, target = the English subset, raw = the whole corpus.
    "q153_importance_reweight" ->
      """WITH t AS (SELECT doc_id, lang = 'en' AS is_target,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |b AS (SELECT doc_id, is_target,
        |    CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % 128 AS bucket
        |  FROM t),
        |s AS (SELECT bucket,
        |    CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t,
        |    CAST(COUNT(*) AS BIGINT) AS cnt_r
        |  FROM b GROUP BY bucket),
        |tot AS (SELECT SUM(cnt_t) AS n_t, SUM(cnt_r) AS n_r FROM s),
        |g AS (SELECT bucket, cnt_t * n_r - cnt_r * n_t AS term FROM s, tot),
        |sc AS (SELECT b.doc_id, SUM(g.term) AS score
        |       FROM b JOIN g USING (bucket) GROUP BY b.doc_id)
        |SELECT d.doc_id, CAST(COALESCE(sc.score, 0) AS BIGINT) AS score,
        |  CAST(COALESCE(sc.score, 0) > 0 AS BIGINT) AS selected
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // q161: the same greedy unrolled as chained CTEs on gram STRINGS
    // (hash-identity mirror) — sN picks round N's winner over the docs
    // not yet picked, cN accumulates the covered union; ties break to
    // the lowest doc_id on both engines (ORDER BY gain DESC, doc_id).
    "q161_maxcover_select" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |d AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws)-2,0)+1),
        |        i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS sh
        |      FROM w WHERE len(ws) >= 3),
        |s1 AS (SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS gain FROM d
        |       ORDER BY gain DESC, doc_id LIMIT 1),
        |c1 AS (SELECT sh AS cov FROM s1),
        |s2 AS (SELECT d.doc_id, d.sh,
        |         CAST(len(list_filter(d.sh, g -> NOT list_contains(c1.cov, g))) AS BIGINT) AS gain
        |       FROM d, c1 WHERE d.doc_id NOT IN (SELECT doc_id FROM s1)
        |       ORDER BY gain DESC, d.doc_id LIMIT 1),
        |c2 AS (SELECT list_distinct(flatten([c1.cov, s2.sh])) AS cov FROM c1, s2),
        |s3 AS (SELECT d.doc_id, d.sh,
        |         CAST(len(list_filter(d.sh, g -> NOT list_contains(c2.cov, g))) AS BIGINT) AS gain
        |       FROM d, c2 WHERE d.doc_id NOT IN (
        |         SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2)
        |       ORDER BY gain DESC, d.doc_id LIMIT 1),
        |c3 AS (SELECT list_distinct(flatten([c2.cov, s3.sh])) AS cov FROM c2, s3),
        |s4 AS (SELECT d.doc_id, d.sh,
        |         CAST(len(list_filter(d.sh, g -> NOT list_contains(c3.cov, g))) AS BIGINT) AS gain
        |       FROM d, c3 WHERE d.doc_id NOT IN (
        |         SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
        |         UNION ALL SELECT doc_id FROM s3)
        |       ORDER BY gain DESC, d.doc_id LIMIT 1),
        |c4 AS (SELECT list_distinct(flatten([c3.cov, s4.sh])) AS cov FROM c3, s4),
        |s5 AS (SELECT d.doc_id, d.sh,
        |         CAST(len(list_filter(d.sh, g -> NOT list_contains(c4.cov, g))) AS BIGINT) AS gain
        |       FROM d, c4 WHERE d.doc_id NOT IN (
        |         SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
        |         UNION ALL SELECT doc_id FROM s3 UNION ALL SELECT doc_id FROM s4)
        |       ORDER BY gain DESC, d.doc_id LIMIT 1),
        |c5 AS (SELECT list_distinct(flatten([c4.cov, s5.sh])) AS cov FROM c4, s5),
        |s6 AS (SELECT d.doc_id, d.sh,
        |         CAST(len(list_filter(d.sh, g -> NOT list_contains(c5.cov, g))) AS BIGINT) AS gain
        |       FROM d, c5 WHERE d.doc_id NOT IN (
        |         SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
        |         UNION ALL SELECT doc_id FROM s3 UNION ALL SELECT doc_id FROM s4
        |         UNION ALL SELECT doc_id FROM s5)
        |       ORDER BY gain DESC, d.doc_id LIMIT 1),
        |u AS (SELECT 1 AS sel_rank, doc_id, gain FROM s1
        |      UNION ALL SELECT 2, doc_id, gain FROM s2
        |      UNION ALL SELECT 3, doc_id, gain FROM s3
        |      UNION ALL SELECT 4, doc_id, gain FROM s4
        |      UNION ALL SELECT 5, doc_id, gain FROM s5
        |      UNION ALL SELECT 6, doc_id, gain FROM s6)
        |SELECT CAST(sel_rank AS BIGINT) AS sel_rank, doc_id, gain,
        |  CAST(SUM(gain) OVER (ORDER BY sel_rank
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS covered_total
        |FROM u ORDER BY sel_rank""".stripMargin,
    // q159: same positional-gram df → dup-start lists → index-aware
    // token filter, on gram STRINGS (the usual hash-identity mirror).
    // DuckDB's list_filter lambda index is 1-based, hence the i-1.
    "q159_dupspan_scrub" ->
      """WITH w AS (SELECT doc_id, text, string_split(text,' ') AS ws FROM documents),
        |q0 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws)-4,0)+1),
        |  i -> {'pos': i-1, 'g': ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]})) AS u FROM w),
        |q AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM q0),
        |d AS (SELECT g FROM q GROUP BY g HAVING count(*) > 1),
        |s AS (SELECT q.doc_id, list(q.pos) AS starts FROM q JOIN d USING (g) GROUP BY q.doc_id),
        |k AS (SELECT w.doc_id, w.text, w.ws, COALESCE(s.starts, []) AS starts
        |      FROM w LEFT JOIN s USING (doc_id)),
        |r AS (SELECT doc_id, text, ws,
        |        list_filter(ws, (x, i) ->
        |          len(list_filter(starts, p -> p <= i-1 AND i-1 <= p+4)) = 0) AS kept
        |      FROM k)
        |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
        |  CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
        |  CASE WHEN text IS NULL THEN NULL
        |       ELSE COALESCE(array_to_string(kept, ' '), '') END AS text_clean
        |FROM r ORDER BY doc_id""".stripMargin,
    // q158: the sketch gate is a pure pre-filter (superset in, exact
    // verify out), so the oracle is exactly q81's — same holdout split,
    // same trigram membership, same counts.
    "q158_decontaminate_bloom" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws,
        |  substring(md5('split:' || CAST(doc_id AS VARCHAR)),1,2) >= 'cd' AS is_val
        |  FROM documents),
        |sh AS (SELECT doc_id, is_val,
        |  unnest(list_distinct(list_transform(range(1, greatest(len(ws)-2,0)+1),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g FROM w),
        |vs AS (SELECT DISTINCT g FROM sh WHERE is_val)
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
        |FROM sh s JOIN vs ON s.g = vs.g WHERE NOT s.is_val
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    // q155: the Bloom gate is a pure pre-filter (no false negatives by
    // construction, false positives killed by the exact anti-join), so
    // the oracle is the plain hash-gate survivor predicate.
    "q155_erasure_scrub" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE substring(md5('erase:' || CAST(user_id AS VARCHAR)), 1, 2) >= '1a'
        |ORDER BY event_id""".stripMargin,
    // q156: same interleave rebuild — n+1 split segments (index past the
    // match list → NULL → coalesce '') zipped with the pseudonymized
    // matches. DuckDB keeps leading/trailing empty segments like Java's
    // split(limit=-1), so the concatenation is lossless on both engines.
    "q156_pseudonymize" ->
      """SELECT event_id,
        |  array_to_string(list_transform(range(1, len(segs) + 1),
        |    i -> segs[i] ||
        |         coalesce('id_' || substring(md5('pseu:' || toks[i]), 1, 8), '')),
        |    '') AS scrubbed,
        |  'u_' || substring(md5('pseu:' || CAST(user_id AS VARCHAR)), 1, 8)
        |    AS user_pseudo,
        |  CAST(len(toks) AS BIGINT) AS n_ids
        |FROM (SELECT event_id, user_id,
        |        regexp_split_to_array(props, '[0-9]+') AS segs,
        |        regexp_extract_all(props, '[0-9]+') AS toks
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,
    // q157: the same ascending greedy unrolled as a recursive CTE —
    // cap = 6·s//5 (1.2 epochs, exact), budget = one corpus pass,
    // integer floor division throughout.
    "q157_unimax_mix" ->
      """WITH RECURSIVE s AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY lang),
        |r AS (SELECT lang, n_docs, n_tokens,
        |        CAST(row_number() OVER (ORDER BY n_tokens, lang) AS BIGINT) AS rk,
        |        CAST(count(*) OVER () AS BIGINT) AS n_langs,
        |        CAST((SELECT SUM(n_tokens) FROM s) AS BIGINT) AS budget
        |      FROM s),
        |rec(rk, lang, n_docs, n_tokens, alloc, rem) AS (
        |  SELECT r.rk, r.lang, r.n_docs, r.n_tokens,
        |         least(6 * r.n_tokens // 5, r.budget // r.n_langs),
        |         r.budget - least(6 * r.n_tokens // 5, r.budget // r.n_langs)
        |  FROM r WHERE r.rk = 1
        |  UNION ALL
        |  SELECT r.rk, r.lang, r.n_docs, r.n_tokens,
        |         least(6 * r.n_tokens // 5, p.rem // (r.n_langs - p.rk)),
        |         p.rem - least(6 * r.n_tokens // 5, p.rem // (r.n_langs - p.rk))
        |  FROM rec p JOIN r ON r.rk = p.rk + 1)
        |SELECT lang, n_docs, n_tokens, CAST(alloc AS BIGINT) AS alloc_tokens,
        |  CAST(CASE WHEN n_tokens = 0 THEN 0
        |            ELSE alloc * 10000 // n_tokens END AS BIGINT) AS epochs_bp
        |FROM rec ORDER BY lang""".stripMargin,
  )
}
