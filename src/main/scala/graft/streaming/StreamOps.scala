package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked streaming aggregations — the streaming twins of the batch
  * queries q39–q41 (identical grouping expressions; batch≡stream
  * unification is the point, SURVEY.md §2.9).
  *
  * Watermark semantics vs the reference: the reference has NO late-data
  * story — `LATEST` iterator simply never sees history (`app.py:18`).
  * Ours is the principled version: events later than the watermark delay
  * are dropped from aggregates, everything else is exact.
  */
object StreamOps {

  /** Tumbling 1-hour count/sum per event_type (q39's expression). */
  def tumblingCounts(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding 1h/15min count (q40's expression). */
  def slidingCounts(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** 30-minute-gap session windows per user (q41's expression). */
  def sessionCounts(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** State-backed exactly-once dedup by event id within the watermark
    * (the redelivery tolerance the reference gets from set-membership,
    * `tag.py:39-40`, made a stream operator).
    */
  def dedupWithinWatermark(events: DataFrame, idCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-STATIC incremental exact dedup — the streaming tier of
    * q103's exact tier, and the one §2.9 join kind the rest of the
    * streaming surface didn't yet exercise: the incoming doc stream
    * left_anti-joins a STATIC corpus hash set (Spark re-plans the
    * static side per micro-batch; with a compacted hash table it
    * broadcast-joins), so a doc already in the corpus never enters the
    * pipeline, then first-arrival dedup WITHIN the stream dedups the
    * batch against itself via stateful dropDuplicates. State and join
    * keys are 32-byte sha256 values — no document text is ever held.
    */
  def incrementalDedupStream(
      newDocs: DataFrame, corpus: DataFrame): DataFrame = {
    val corpusHashes = corpus.select(sha2(col("text"), 256).as("h")).distinct()
    newDocs.withColumn("h", sha2(col("text"), 256))
      .join(corpusHashes, Seq("h"), "left_anti")
      .dropDuplicates("h")
  }

  /** Streaming twin of q97's chunk-level exact dedup (Curation
    * .chunkDedup): incoming `(doc_id, text)` docs are split into the
    * same non-overlapping 200-char chunks and a chunk survives only on
    * its FIRST arrival — stateful dropDuplicates keyed on the chunk
    * sha256, so state carries 32-byte keys, never chunk text. Batch
    * q97's "first" is the global (doc_id, chunk_id) minimum; on a
    * stream ordered that way (the replay/backfill case) the two tiers
    * keep the identical chunk set (StreamingSpec pins this). Unbounded
    * key state by design: exact global dedup needs the full hash set —
    * the bounded variant is dropDuplicatesWithinWatermark when the
    * dedup horizon is a time window.
    */
  def chunkDedupStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
        posexplode(when(length(col("text")) > 0,
            sequence(lit(1), length(col("text")), lit(200)))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        expr("substring(text, col, 200)").as("chunk"))
      .withColumn("h", sha2(col("chunk"), 256))
      .dropDuplicates("h")

  /** Stream-stream interval join (q16's streaming twin; SURVEY.md §2.16
    * two-Kinesis-streams closure, e.g. stories × images
    * `README.md:254-257`): each left event pairs with same-key right
    * events at-or-before it within `lookback`. Both sides carry
    * watermarks + the time-range condition, so join state is BOUNDED —
    * Spark evicts right-side rows once the left watermark passes
    * `ts + lookback`, which is what makes this runnable forever at scale.
    * The equi-key (`user_id`) keys the shuffle; the range predicate only
    * evaluates within co-partitioned groups.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      lookback: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("e")
    val r = right.withWatermark("ts", watermarkDelay).alias("s")
    l.join(r,
      expr(s"""e.user_id = s.user_id AND
              |s.ts <= e.ts AND
              |s.ts >= e.ts - INTERVAL $lookback""".stripMargin))
  }

  /** Streaming twin of q139's semantic decontamination — the INGEST-time
    * gate: each arriving `(vec_id, embedding)` training vector is probed
    * against the STATIC benchmark with the identical BIGINT cosine rule
    * (quantize → dot > 0 ∧ 400·dot² ≥ 49·aa·bb), emitting one
    * `(vec_id, b_id)` row per benchmark collision. Stateless by
    * construction — the benchmark is fixed, so this is a stream-static
    * broadcast nested loop re-planned per micro-batch, append-mode pure
    * map work with no watermark or state store; the per-vector hit
    * count is a downstream aggregation (batch q139's groupBy), kept out
    * of the stream so the operator composes with any sink. Batch≡stream
    * on the same rows (StreamingSpec pins the equality against q139).
    */
  /** Streaming twin of q144's cross-dump near-dup gate — the crawl-
    * ingest shape: arriving `(doc_id, text)` docs are shingled,
    * MinHash-banded, and band-joined against the STATIC prior-corpus
    * band table (re-planned per micro-batch); candidates verify with
    * exact Jaccard over the full shingle sets and each verified
    * `(new_id, c_id)` pair is emitted ONCE across the stream's lifetime
    * (stateful dropDuplicates on the 16-byte pair key — the chunk-dedup
    * stance: exact global emission needs the full key set; use a
    * watermarked variant when the dedup horizon is temporal). The new
    * side's shingle set rides the band explode within the micro-batch,
    * so no stream-stream self-join ever forms; per-pair rollups are the
    * reader's aggregation (batch q144's groupBy), kept out of the
    * stream. Batch≡stream pinned in StreamingSpec.
    */
  def crossDumpNearDupStream(newDocs: DataFrame,
      corpus: DataFrame): DataFrame =
    crossDumpVerifiedPairs(newDocs, corpus, Nil)
      .dropDuplicates("new_id", "c_id")

  /** Watermarked variant of [[crossDumpNearDupStream]] — the BOUNDED-
    * STATE tier its exact sibling's comment promises: when the dedup
    * horizon is temporal (a re-crawl window, not all of time), the
    * per-pair state is evicted once the watermark passes the pair's
    * event time + `delay`, so state is O(pairs within the horizon)
    * instead of O(all pairs ever). The trade is explicit: a pair
    * re-arriving AFTER eviction re-emits (at-least-once per horizon),
    * and rows older than the watermark are dropped as late — both
    * pinned in StreamingSpec. `newDocs` must carry an event-time `ts`.
    */
  def crossDumpNearDupStreamWatermarked(newDocs: DataFrame,
      corpus: DataFrame, delay: String): DataFrame =
    // The watermark is declared at the source side. Caveat to know:
    // Catalyst pushes content predicates (the bloom gate, the Jaccard
    // verify's upstream filters) BELOW the EventTimeWatermark node, so
    // event-time stats — and therefore watermark advancement — come
    // from rows that SURVIVE filtering, exactly as in any filtered
    // Structured Streaming pipeline. A stream of only non-matching
    // docs keeps the watermark (and state eviction) parked; state
    // stays bounded as long as matches keep flowing, which is the
    // regime the operator exists for.
    crossDumpVerifiedPairs(newDocs.withWatermark("ts", delay),
        corpus, Seq("ts"))
      .dropDuplicatesWithinWatermark("new_id", "c_id")

  private def crossDumpVerifiedPairs(newDocs: DataFrame,
      corpus: DataFrame, carry: Seq[String]): DataFrame = {
    import graft.operators.Dedup
    val cs = Dedup.shingled(corpus).filter(size(col("sh")) > 0)
    val cBandsRaw = Dedup.minhashBandRows(Dedup.minhashSigs(cs))
    // the corpus-side bucket cap (batch q144's skew guard; the stream
    // side's occupancy is bounded by the micro-batch itself)
    val cBands = cBandsRaw
      .join(cBandsRaw.groupBy(col("band"), col("bh"))
        .agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= Dedup.MaxLshBucket)
        .select(col("band"), col("bh")),
        Seq("band", "bh"))
      .join(cs.select(col("doc_id"), col("sh").as("b_sh")), "doc_id")
      .select(col("doc_id").as("c_id"), col("band"), col("bh"),
        col("b_sh"))
    // r10: the same corpus-band-key Bloom gate batch q144 grew — built
    // ONCE at stream start from the static side, probed per arriving
    // doc as a map-only expression BEFORE its 32× band explode, so the
    // typical crawl-ingest majority that matches no prior dump stops at
    // the probe. Exact by the q144 argument (the probe key IS the
    // bucket key; the corpus cap is computed on the static side alone).
    val bits = graft.functions.TextOps.bloomBits(
      cBands.select(xxhash64(col("bh"), col("band")).as("k")), "k")
    // the arriving doc's shingle set (and any carried columns, e.g. the
    // watermarked tier's event time) rides the band explode (32× within
    // the micro-batch) — re-joining the stream to itself for them would
    // be a stream-stream join, which this stays free of
    val carryCols = carry.map(col)
    val nBands = Dedup.minhashSigs(
        Dedup.shingled(newDocs, carry).filter(size(col("sh")) > 0), carry)
      .filter(graft.functions.TextOps.bloomAnyContain(
        Dedup.bandKeyArray(col("sig")), bits))
      .select(col("doc_id") +: col("sh").as("a_sh") +: posexplode(
        org.apache.spark.sql.graftbridge.toColumn(
          graft.expressions.BandHashes(
            org.apache.spark.sql.graftbridge.toExpression(col("sig")),
            Dedup.NumBands, Dedup.RowsPerBand))) +: carryCols: _*)
      .select(col("doc_id") +: col("a_sh") +: col("pos").as("band") +:
        col("col").as("bh") +: carryCols: _*)
    nBands.join(cBands, Seq("band", "bh"))
      .filter(graft.functions.TextOps.jaccard(col("a_sh"), col("b_sh"))
        >= Dedup.JaccardTau)
      .select(col("doc_id").as("new_id") +: col("c_id") +: carryCols: _*)
  }

  /** Ingest-time erasure enforcement — q155/q158's Bloom discipline on
    * the stream: records owned by a deny-listed subject never enter the
    * corpus in the first place (the cheapest place to honor an opt-out;
    * the batch scrubs remain for retroactive erasure). The deny list is
    * a STATIC side: its Bloom bits are built once at stream start
    * (`stat.bloomFilter` tree-aggregate, broadcast once per executor)
    * and probed per record as a map-only expression — the bloom-negative
    * majority of each micro-batch passes through with no join at all;
    * only flagged records meet the stream-static LEFT ANTI join that
    * kills the sketch's false positives. No false negatives by sketch
    * contract ⇒ nothing deny-listed ever slips through the fast path.
    * (Deny-list CHANGES need a stream restart — the standard static-side
    * caveat, same as the corpus side of incrementalDedupStream.)
    */
  def erasureScrubStream(events: DataFrame, denyList: DataFrame): DataFrame = {
    val keys = denyList.select(col("user_id")).distinct()
    val bits = graft.functions.TextOps.bloomBits(keys, "user_id")
    val might = graft.functions.TextOps.bloomAnyContain(col("user_id"), bits)
    // null-safe split (r9 advice): the probe NULL-propagates on NULL
    // user_id, and a bare filter on each branch would drop such rows
    // from BOTH — while the exact anti-join (and batch q155) keeps them
    // (NULL never equals a deny-list key). Route NULL verdicts down the
    // pass-through branch.
    val verified = events.filter(might <=> true)
      .join(keys, Seq("user_id"), "left_anti")
    events.filter(!(might <=> true))
      .unionByName(verified.select(events.columns.map(col).toSeq: _*))
  }

  def deconStream(vectors: DataFrame, benchmark: DataFrame): DataFrame = {
    val bench = graft.operators.Similarity.deconStage(benchmark)
      .select(col("vec_id").as("b_id"), col("qvec").as("b_qvec"),
        col("n2").as("bb"))
    graft.operators.Similarity.deconStage(vectors)
      .select(col("vec_id"), col("qvec"), col("n2"))
      .join(broadcast(bench), lit(true))
      .select(col("vec_id"), col("b_id"), col("n2").as("aa"), col("bb"),
        graft.functions.VectorOps.dot(col("qvec"), col("b_qvec")).as("dot"))
      .filter(col("dot") > 0 &&
        lit(400L) * col("dot") * col("dot") >=
          lit(49L) * col("aa") * col("bb"))
      .select(col("vec_id"), col("b_id"))
  }

  /** Ingest-time BPE tokenization — q167's streaming twin. The merge
    * table is STATIC model state (trained offline by q166; a tokenizer
    * change is a redeploy, exactly as in production), so the stream side
    * is a stateless map-only projection: no state store, no watermark,
    * every micro-batch independent. Batch≡stream equality is STRUCTURAL
    * — both sides call the same `Tokenizer.tokenized` projection.
    */
  def bpeTokenizeStream(docs: DataFrame,
      merges: Seq[graft.operators.Tokenizer.Merge]): DataFrame =
    graft.operators.Tokenizer.tokenized(docs, merges)

  /** Ingest-time NFC normalization — q182's streaming twin, and the
    * place production actually runs it: text is normalized ONCE at the
    * door so every downstream hash-keyed stage (dedup, shingles, md5
    * gates) sees one canonical byte form; normalizing later means every
    * pre-normalization artifact (checkpoints, caches, dedup state) is
    * keyed on bytes that no longer exist. Stateless map-only over the
    * same codegen expression as batch — batch≡stream structural.
    */
  def nfcNormalizeStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextOps.nfc(col("text")).as("text"))

  /** Running corpus manifest — q183's streaming twin: the integrity
    * monitor a LIVE corpus keeps as docs arrive. A per-source stateful
    * aggregation in update mode: counts/octets accumulate, the content
    * checksum xor-folds — the same commutative combine q184 exploits,
    * which is exactly what makes it a valid STREAMING aggregate (merge
    * order is arbitrary across micro-batches). State is |sources| rows,
    * not the corpus.
    */
  def manifestStream(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
        sum(octet_length(col("text")).cast("long")).as("total_octets"),
        bit_xor(conv(substring(md5(col("text")), 1, 15), 16, 10)
          .cast("long")).as("content_xor"))

  /** Live count-min sketch — q199's streaming twin: the d×w cell
    * counters maintained as the token stream arrives (the monitor a
    * live ingest keeps so "what's suddenly hot?" is answerable without
    * a corpus pass). The rollup is `Aggregates.cmCellsOfTokens`
    * VERBATIM — cell counts form a commutative monoid, which is exactly
    * what makes the batch construction a valid streaming aggregate in
    * complete/update mode; state is ≤ d·w = 256 rows, constant in
    * stream length. Estimates probe the sink table map-only.
    */
  def countMinStream(toks: DataFrame): DataFrame =
    graft.operators.Aggregates.cmCellsOfTokens(toks)

  /** Live KMV synopsis — q203's streaming twin: the k smallest distinct
    * hashes maintained as rows arrive (a live distinct-cardinality /
    * overlap monitor). The builder is `Sketches.kmvSynopsis` VERBATIM —
    * min-k over a set is a commutative, associative, IDEMPOTENT monoid,
    * so re-delivered rows are free and the batch construction is a
    * valid complete-mode streaming aggregate with ≤ k longs of state.
    */
  def kmvStream(hashes: DataFrame): DataFrame =
    graft.operators.Sketches.kmvSynopsis(hashes)

  /** Live HLL registers — q207's streaming twin: per-bucket max(rho)
    * maintained as hashes arrive, via `Sketches.hllRegisters` VERBATIM.
    * Max is a commutative, associative, IDEMPOTENT monoid (the q203
    * stance), so the batch rollup is a valid complete-mode streaming
    * aggregate with ≤ m rows of state and re-delivered rows are free.
    */
  def hllStream(hashes: DataFrame): DataFrame =
    graft.operators.Sketches.hllRegisters(hashes)

  case class EwmaState(e: Long, a: Long, n: Long)

  /** Live EWMA spike/collapse monitor — q206's streaming twin: per-user
    * (ewma, anomalies, n) advanced as events arrive, the online form of
    * the batch fold (this is the deployment shape — EWMA exists to be
    * maintained on a stream, the batch query is its replay). Unlike the
    * monoid twins (q199 cells, q203 min-k) the fold is order-DEPENDENT,
    * so the contract is explicit: within a batch rows fold in
    * (us, event_id) order, and across batches correctness rides the
    * source's per-key ordering (the Kinesis per-shard contract with
    * user-keyed partitioning). Emits the user's current state on every
    * touch; convergence to the batch q206 fold is pinned in
    * StreamingSpec.
    */
  def ewmaStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .filter(col("cents").isNotNull)
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, (Long, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (u, rows, gs) =>
        var st = gs.getOption.getOrElse(EwmaState(0L, 0L, 0L))
        rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
          val v = r._4
          st =
            if (st.n == 0L) EwmaState(v, 0L, 1L)
            // floorDiv, not /: the batch fold floors (floor(x/8.0) ≡
            // DuckDB //), and Long./ truncates toward zero — on
            // negative EWMA state (refund-heavy users) the two diverge
            else EwmaState(Math.floorDiv(7L * st.e + v, 8L),
              st.a + (if (v > 3L * st.e || 3L * v < st.e) 1L else 0L),
              st.n + 1L)
        }
        gs.update(st)
        Iterator.single((u, st.n, st.e, st.a))
      }
      .toDF("user_id", "n_events", "ewma_cents", "anomalies")
  }

  /** Per-group state for the changelog maintainers
    * ([[dedupStateStream]], [[ivfStateStream]]): the group's id
    * multiset (net insert/retract counts) + a per-key version counter
    * so downstream consumers can order a key's updates.
    */
  case class DedupGroupState(members: Map[Long, Long], ver: Long)

  /** The ONE signed-multiset fold both changelog maintainers run:
    * apply (id, ±w) updates, dropping entries whose net count hits
    * zero (an insert and its retraction cancel exactly). Extracted so
    * a semantics fix can never apply to one maintainer and silently
    * miss the other.
    */
  private def applySigned(m: Map[Long, Long],
      rows: Iterator[(Long, Long)]): Map[Long, Long] =
    rows.foldLeft(m) { case (acc, (id, w)) =>
      val n = acc.getOrElse(id, 0L) + w
      if (n == 0L) acc - id else acc.updated(id, n)
    }

  /** Live exact-dedup survivor maintenance — q186's streaming twin: the
    * sha256→keeper table a LIVE corpus maintains as dump inserts (+1)
    * and retraction batches (−1) arrive as a changelog stream of
    * `(h, doc_id, w)` rows. Keyed on the content hash via
    * flatMapGroupsWithState; per-key state is the group's id multiset —
    * bounded by DUP-GROUP size, and id-level for the exact reason q186
    * proves: retracting the stored keeper must promote the
    * next-smallest surviving member, which (min, count) state cannot
    * answer. Emits the group's current (keeper, size) on every touch;
    * an emptied group emits a tombstone (keep_id −1, n_dups 0) — the
    * delete event a changelog consumer applies. Cross-batch convergence
    * to the q186 batch combine is pinned in StreamingSpec.
    * NULL-content docs carry no hash key to route by and stay out of
    * the stream tier (the batch tiers report them under the NULL group).
    */
  def dedupStateStream(updates: DataFrame): DataFrame = {
    val spark = updates.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    updates.select(col("h"), col("doc_id"), col("w"))
      // enforce the documented contract rather than assuming the
      // producer did: a NULL content hash (sha2 of NULL text) has no
      // key to route by and must not mint a null-keyed state group
      .filter(col("h").isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DedupGroupState, (String, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (h, rows, gs) =>
        val st = gs.getOption.getOrElse(DedupGroupState(Map.empty, 0L))
        val next = applySigned(st.members, rows.map(r => (r._2, r._3)))
        val live = next.filter(_._2 > 0L)
        val ver = st.ver + 1L
        gs.update(DedupGroupState(next, ver))
        if (live.isEmpty) Iterator.single((h, -1L, 0L, ver))
        else Iterator.single((h, live.keys.min, live.size.toLong, ver))
      }
      .toDF("h", "keep_id", "n_dups", "ver")
  }

  /** Live vocab-frequency maintenance — q188's streaming twin: per-token
    * corpus frequencies as dump inserts (+freq) and retractions (−freq)
    * arrive as a changelog of per-dump token partials. A plain stateful
    * aggregation in update/complete mode — counts add signed, which is
    * exactly what makes the q188 combine a valid streaming aggregate;
    * state is \|vocab\| rows. Convergence to the batch combine is pinned
    * in StreamingSpec.
    */
  def vocabFreqStream(updates: DataFrame): DataFrame =
    updates.groupBy(col("token"))
      .agg(sum(col("freq")).as("freq"))

  /** Live IVF index-inventory maintenance — q192's streaming twin: the
    * per-cell inventory as (cell, vec_id, ±1) assignment changelog rows
    * arrive. Per-cell keyed state via flatMapGroupsWithState holding
    * the cell's id multiset (bounded by CELL size — id-level for
    * q192's min_vec, the q186 reason) + a version counter; emits the
    * cell's current (n_vecs, min_vec, id_xor) on every touch and a
    * tombstone when a cell empties. Convergence pinned in StreamingSpec.
    */
  def ivfStateStream(updates: DataFrame): DataFrame = {
    val spark = updates.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    updates.select(col("cell"), col("vec_id"), col("w"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DedupGroupState, (Long, Long, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (cell, rows, gs) =>
        val st = gs.getOption.getOrElse(DedupGroupState(Map.empty, 0L))
        val next = applySigned(st.members, rows.map(r => (r._2, r._3)))
        val live = next.filter(_._2 > 0L).keys
        val ver = st.ver + 1L
        gs.update(DedupGroupState(next, ver))
        if (live.isEmpty) Iterator.single((cell, 0L, -1L, 0L, ver))
        else Iterator.single((cell, live.size.toLong, live.min,
          live.foldLeft(0L)(_ ^ _), ver))
      }
      .toDF("cell", "n_vecs", "min_vec", "id_xor", "ver")
  }

  /** Ingest-time PQ encoding — q170's streaming twin: arriving vectors
    * compress to their 4 subspace codes against STATIC codebooks
    * (trained offline by q170's loop; a codebook change is an index
    * rebuild, exactly as in FAISS deployments). Stateless map-only —
    * the same literal-centroid projection as batch, so batch≡stream is
    * structural. The input frame needs q84's `qvec` column
    * ([[graft.operators.Similarity.withQuantized]] upstream).
    */
  def pqEncodeStream(quantized: DataFrame,
      books: Seq[Seq[(Long, Array[Double])]]): DataFrame =
    graft.operators.Pq.encoded(quantized, books)

  /** Streaming WARC ingest — q169's twin for the arriving-dump shape:
    * crawl dumps land as FILES on a stream (Structured Streaming's file
    * source model — `readStream.format("binaryFile")` in deployment;
    * any (file_id, content binary) frame here), and each micro-batch
    * flatMaps file → parsed response records → extracted main content.
    * Stateless append: a WARC file is self-contained, so there is no
    * cross-batch state, and task retry is idempotent (same file → same
    * rows). Malformed files fail the task loudly, surfacing the bad
    * dump rather than silently skipping it.
    */
  def warcExtractStream(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("content")).as[Array[Byte]].flatMap { bytes =>
      graft.operators.Warc.responses(bytes).map { e =>
        (e.docId, e.contentLength,
          e.text.codePointCount(0, e.text.length).toLong, e.text)
      }
    }.toDF("doc_id", "content_length", "n_extracted_chars", "text")
  }

  /** One key's maintained MERGE state (q223's live form). `slots` is
    * the per-version payload digest ledger: version -> (md5 | "U" for a
    * null-text upsert | "D" for a delete), 33 bytes per version — the
    * same per-key footprint the q228 time-travel log already retains, so
    * keeping it in state adds no new unboundedness class.
    */
  case class MergeKeyState(version: Long, alive: Boolean, md5: String,
      slots: Map[Long, String])

  /** Live MERGE-state maintenance — q223's streaming twin: a CDC
    * changelog of (doc_id, version, op, txt) rows maintains the
    * latest-version-wins table as state. Three properties a CDC
    * consumer must have, all pinned in StreamingSpec:
    *  - OUT-OF-ORDER tolerance: version-max is order-independent, so a
    *    late v2 arriving after v3 changes nothing;
    *  - REPLAY idempotence: re-delivering a (key, version) with the
    *    same payload is a no-op;
    *  - WRITER-CONFLICT loudness: the same (key, version) with a
    *    DIFFERENT payload throws (q223's duplicate-slot refusal, live)
    *    — for ANY slot in the key's history, not just the latest
    *    version: the per-version digest ledger means a conflicting
    *    duplicate for a superseded version still raises, matching
    *    batch q223's any-slot guard exactly.
    * State carries (version, alive, md5, slots) — never document text.
    * Emits the key's current state each update batch.
    */
  def mergeStateStream(updates: DataFrame): DataFrame = {
    val spark = updates.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    updates.select(col("doc_id"), col("version"), col("op"), col("txt"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MergeKeyState, (Long, Long, Boolean, String)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (id, rows, gs) =>
        var st = gs.getOption.orNull
        rows.foreach { case (_, v, op, txt) =>
          val alive = op == "U"
          val md = if (alive && txt != null) {
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(txt.getBytes("UTF-8"))
            d.map("%02x".format(_)).mkString
          } else null
          val enc = if (!alive) "D" else if (md == null) "U" else md
          val slots0 = if (st == null) Map.empty[Long, String] else st.slots
          slots0.get(v) match {
            case Some(prev) =>
              // replay of an already-claimed slot — a no-op iff the
              // payload matches, a writer conflict otherwise, at ANY
              // version in history (parity with batch q223's guard)
              require(prev == enc,
                s"mergeStateStream: two writers claimed (key $id, version $v) " +
                  "with different payloads — refusing an arbitrary winner")
            case None => ()
          }
          val slots = slots0 + (v -> enc)
          if (st == null || v > st.version) st = MergeKeyState(v, alive, md, slots)
          else st = st.copy(slots = slots)
        }
        gs.update(st)
        Iterator.single((id, st.version, st.alive, st.md5))
      }
      .toDF("doc_id", "version", "alive", "text_md5")
  }

  /** Ingest-time boilerplate removal — q217's streaming twin, and the
    * place a crawl pipeline actually runs it: pages are extracted as
    * they land, BEFORE any hash-keyed stage sees them (extracting later
    * re-keys every dedup/decon artifact on text that no longer exists —
    * the nfcNormalizeStream argument, one stage earlier). Stateless
    * map-only over the SAME projection as batch q217
    * (`Multimodal.boilerplateProjected`) — batch≡stream structural.
    */
  def boilerplateExtractStream(pages: DataFrame): DataFrame =
    graft.operators.Multimodal.boilerplateProjected(pages)

  /** Ingest-time WordPiece segmentation — q215's streaming twin: the
    * two-sided vocab is STATIC model state (a tokenizer change is a
    * redeploy), so the stream side is a stateless map-only projection
    * shared verbatim with batch (`Tokenizer.wordpieceSegmented`).
    */
  def wordpieceStream(docs: DataFrame, initial: Seq[String],
      continuation: Seq[String]): DataFrame =
    graft.operators.Tokenizer.wordpieceSegmented(docs, initial, continuation)

  /** Ingest-time perceptual image dedup — q216's streaming gate: an
    * arriving image is decoded and dHashed partition-locally (the same
    * `Multimodal.perceptualHashes` codec path as batch), then only the
    * FIRST image per 64-bit hash survives — stateful dropDuplicates
    * keyed on the 8-byte hash, so state never holds pixels. This is
    * EXACT-hash dedup at the door (re-renders and brightness shifts
    * collapse because dHash maps them to the same 64 bits); the
    * near-dup (Hamming ≤ 3) tier is [[perceptualNearDupGateStream]] —
    * TTL-bounded band-bucket state over distinct signatures — and the
    * daily batch pass (q216/q235) remains the exhaustive tier.
    */
  def perceptualDedupStream(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => graft.operators.Multimodal.MediaRow(id, bytes) }
    graft.operators.Multimodal.perceptualHashes(spark, rows)
      .toDF().dropDuplicates("dhash")
  }

  /** CDC changelog → COMMITTED table versions: each micro-batch lands as
    * exactly one optimistic-protocol commit on the shared manifest
    * ([[graft.operators.TableLog.commitBatch]]) — the streaming half of
    * q236, giving the stream the SAME conflict guarantees as any batch
    * writer: a replayed batch is a version-preserving no-op (exactly-once
    * under restart re-delivery, keyed by (runNs, batchId) — the
    * TagPipeline marker discipline moved into the manifest itself), and a
    * concurrent writer touching the stream's keys gets the loud
    * LostUpdateException in whichever order the race lands.
    */
  def commitStream(updates: DataFrame, log: graft.operators.TableLog,
      runNs: String): org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    updates.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        log.commitBatch(runNs, id, b); ()
      }

  /** [[commitStream]] + CHANGE DATA FEED: each micro-batch commits
    * exactly once through the manifest, then the per-batch changelog —
    * q241's classification, diffing the pre-commit snapshot against the
    * committed version via the SHARED [[graft.operators.Txn.feedBetween]]
    * core (batch ≡ stream by shared code) — is handed to `emit` tagged
    * with its from-version. Replayed batches (restart re-delivery) are
    * version-preserving no-ops and emit NOTHING — a feed consumer sees
    * each version transition exactly once; empty batches likewise. The
    * CDC-consistency law (applying the emitted feed to the from-version
    * reproduces the to-version) is pinned in StreamingSpec.
    */
  def changeFeedStream(updates: DataFrame, log: graft.operators.TableLog,
      runNs: String)(emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    updates.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val pre = log.snapshotVersion
        val v = log.commitBatch(runNs, id, b)
        if (v > pre) emit(graft.operators.Txn.feedBetween(
          log.readAsOf(pre), log.readAsOf(v), pre))
        ()
      }

  /** The manifest a [[clusteredIngestStream]] maintains: the accumulated
    * unit files plus the (runNs, batchId) replay markers — the driver-
    * side stand-in for the q240 stats catalog a production table keeps.
    * Ingest is idempotent per (runNs, batchId), marker checked BEFORE
    * the write: a replayed batch (restart re-delivery) never rewrites
    * its directory (Spark part filenames are fresh UUIDs per write — an
    * overwrite would dangle the manifest's recorded paths, measured the
    * hard way) and appends nothing. A crash BETWEEN write and append
    * leaves no marker, so the retry rewrites the directory and appends
    * the fresh stats — the standard write-then-commit recovery.
    */
  final class ClusteredTable {
    @volatile private[graft] var units: Seq[graft.operators.Footer.UnitStats] =
      Seq.empty
    @volatile private[graft] var optimizeCount: Long = 0L
    private val seen = scala.collection.mutable.Set.empty[(String, Long)]
    private[graft] def alreadySeen(runNs: String, batchId: Long): Boolean =
      synchronized { seen.contains((runNs, batchId)) }
    private[graft] def append(runNs: String, batchId: Long,
        us: Seq[graft.operators.Footer.UnitStats]): Boolean = synchronized {
      if (!seen.add((runNs, batchId))) false
      else { units = units ++ us; true }
    }

    /** q261's units_read measure computed from the MANIFEST alone: the
      * average fraction of units the watch workload (the q261 range
      * predicates on the cluster key) would open under the current
      * geometry — zero footer or data reads; the number a layout
      * scheduler actually watches.
      */
    private[graft] def workloadReadFraction: Double = {
      val us = units
      if (us.isEmpty) 0.0
      else {
        val preds = graft.operators.Footer.OptimizePredicates
        preds.map { case (_, lo, hi) =>
          us.count(u => u.lo("n_chars") <= hi && u.hi("n_chars") >= lo)
            .toDouble / us.size
        }.sum / preds.size
      }
    }

    /** The OPTIMIZE half of the maintenance loop, wired to the trigger
      * q261 measures (its scaladoc deferred exactly this): when the
      * watch workload's read fraction regresses past `factor` — the
      * fully fragmented state is 1.0: every range predicate opens
      * every unit — rewrite the accumulated interleaved runs into ONE
      * globally clustered layout via the distributed [[
      * graft.operators.Footer.writeUnits]] (q263: range-partitioned,
      * many tasks), INSIDE the commit protocol: a replay marker keyed
      * (runNs+"__optimize", batchId) is claimed BEFORE the rewrite (the
      * same pre-write ordering the ingest uses — a crash between claim
      * and swap re-runs on retry with a fresh batch id; a re-delivered
      * trigger batch is a no-op), and the manifest swap is atomic
      * (volatile write). Old unit files are left in place — readers
      * holding the old manifest stay correct, the q250 vacuum tier owns
      * reclamation.
      */
    /** Test seam for the snapshot→swap race: invoked just before the
      * final manifest swap (production default is a no-op). A spec
      * appends a unit here and asserts the swap MERGES it (r15 ADVICE:
      * the unconditional `units = post` silently dropped units appended
      * between the snapshot and the swap).
      */
    private[graft] var preSwapHook: () => Unit = () => ()

    private[graft] def maybeOptimize(spark: org.apache.spark.sql.SparkSession,
        runNs: String, batchId: Long, factor: Double): Boolean = {
      val us = units
      if (us.size < 2 || workloadReadFraction < factor) return false
      synchronized {
        if (!seen.add((runNs + "__optimize", batchId))) return false
      }
      val all = spark.read.parquet(us.map(_.path): _*)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      val post = graft.operators.Footer.writeUnits(all,
        Seq(col("n_chars"), col("doc_id")),
        s"ingest_${runNs}_opt$batchId",
        graft.operators.Footer.adaptiveUnitRows(us.map(_.nRows).sum))
      preSwapHook()
      // The swap must account for manifest movement since the snapshot:
      // `append` only ever EXTENDS the sequence, so units appended after
      // the snapshot survive as a suffix to merge behind the rewrite; a
      // changed PREFIX means a concurrent rewrite already swapped — ours
      // is stale, abandon it (old unit files stay readable; the q250
      // vacuum tier owns reclamation either way).
      synchronized {
        val now = units
        if (now.take(us.size) == us) {
          units = post ++ now.drop(us.size)
          optimizeCount += 1L
          true
        } else false
      }
    }
  }

  /** STREAMING CLUSTERED INGEST — the streaming half of the pruned-scan
    * tier (q245/q260): each micro-batch is sorted on the cluster key
    * and materialized as adaptively-sized unit files (one footer-stats-
    * bearing row group per file, the q245 geometry), and the manifest
    * accumulates their stats — so the table is PRUNABLE mid-stream with
    * the exact same [[graft.operators.Footer.executePruned]] core and
    * xor proof the batch queries run.
    *
    * Scale honesty, stated rather than hidden: per-batch clustering
    * yields batch-LOCAL sort runs (each batch's units are tight on the
    * key; runs interleave across batches) — exactly a production
    * table's pre-OPTIMIZE state. Pruning stays SOUND regardless (unit
    * stats are per-unit truths; the overlap rule never false-skips);
    * its EFFECTIVENESS on a key degrades with the number of interleaved
    * runs until the q247/q250 compaction loop re-clusters — the division
    * of labor Delta/Iceberg ship.
    *
    * `house = true` (r16) swaps the unit emitter for the DISTRIBUTED
    * house kernel ([[graft.operators.Footer.writeUnitsHouse]]: per-task
    * snappy+doc_id-bloom house files at exact rank boundaries) — the
    * streaming half of the "no parquet-mr on the engine path" claim;
    * everything downstream (stats, manifest, pruning, OPTIMIZE) is
    * emitter-agnostic by construction and the StreamingSpec twin pins
    * result identity between the two emitters.
    */
  def clusteredIngestStream(rows: DataFrame, table: ClusteredTable,
      runNs: String, optimizeFactor: Double = 0.0, house: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    rows.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!table.alreadySeen(runNs, id)) {
          val n = b.count()
          if (n > 0L) {
            val batch = b.select(col("doc_id"), col("source"), col("lang"),
              col("n_chars"))
            val sortCols = Seq(col("n_chars"), col("doc_id"))
            val tag = s"ingest_${runNs}_b$id"
            val unitRows = graft.operators.Footer.adaptiveUnitRows(n)
            val us =
              if (house) graft.operators.Footer.writeUnitsHouse(
                batch, sortCols, tag, unitRows,
                graft.operators.HouseWriter.HouseSpec(snappy = true,
                  bloomCols = Set("doc_id")))._1
              else graft.operators.Footer.writeUnits(
                batch, sortCols, tag, unitRows)
            table.append(runNs, id, us)
            // the layout half of the maintenance loop: OPTIMIZE when
            // the q261 units_read measure regresses past the factor
            // (0.0 = never — the caller owns the schedule)
            if (optimizeFactor > 0.0)
              table.maybeOptimize(b.sparkSession, runNs, id, optimizeFactor)
          }
        }
        ()
      }

  /** Runs `body` (typically a `.start()` of a query whose
    * emitted-event-time safety argument is proven in its scaladoc, e.g.
    * [[perceptualNearDupGateStream]]) with the chained-stateful analyzer
    * check disabled, then RESTORES the previous session value — the
    * check is evaluated once when a streaming query starts, so the
    * started query keeps its exemption while every later query in the
    * session regains the safety check.
    */
  def allowChainedStateful[A](spark: org.apache.spark.sql.SparkSession)(
      body: => A): A = {
    val k = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = try Some(spark.conf.get(k)) catch { case _: Exception => None }
    spark.conf.set(k, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None    => spark.conf.unset(k)
    }
  }

  /** One exploded band row of an arriving image's dHash. */
  case class BandRow(band: Int, bv: Long, doc_id: Long, dhash: Long,
      ts: java.sql.Timestamp)

  /** TTL-bounded NEAR-dup gate at the door — the Hamming ≤ 3 tier
    * [[perceptualDedupStream]] deliberately left to batch, made
    * streamable by bounding state with the WATERMARK HORIZON (the r12
    * argument against it assumed no TTL):
    *
    *  - each arriving image is decoded and dHashed through the SAME
    *    per-row codec core as batch q216
    *    ([[graft.operators.Multimodal.dhashOfMedia]]);
    *  - the hash explodes into 4 x 16-bit band keys (the q216 bands), and
    *    per (band, value) bucket a flatMapGroupsWithState keeps the
    *    DISTINCT signatures seen within the horizon — 16 bytes per
    *    signature, never pixels, evicted by event-time timeout (the q235
    *    stance: state is signatures, not docs, so a hot cluster of
    *    re-renders costs ONE entry);
    *  - a doc is near-dup iff ANY of its band buckets holds a signature
    *    within Hamming ≤ 3 — checked against the FULL 64-bit hash, so
    *    the verdict is exact (complete by the q216 pigeonhole: a true
    *    ≤3 neighbor shares ≥1 band), not an LSH approximation;
    *  - the per-doc OR is the downstream (doc_id, ts) aggregation —
    *    append-mode agg after append-mode flatMapGroupsWithState, the
    *    supported chaining — emitting (doc_id, near_dup) once the
    *    watermark passes the doc's event time.
    *
    * Verdict scope: near-dup is judged against everything that ARRIVED
    * within the horizon (first-arrival wins), matching the greedy gate a
    * production door runs; the daily batch pass (q216/q235) remains the
    * exhaustive tier that also catches pairs farther apart in time.
    *
    * This plan trips Spark's chained-stateful-operator correctness check:
    * the analyzer pattern-matches any flatMapGroupsWithState feeding an
    * aggregation because fMGWS CAN emit event times older than the
    * watermark. This one cannot — every emitted row carries the event
    * time of a CURRENT-batch input row (state is only read, never
    * re-emitted), and late inputs were already dropped by the upstream
    * watermark, so downstream rows are never late. The check runs when
    * the query STARTS, so callers must wrap `.start()` in
    * [[allowChainedStateful]] — which restores the session conf
    * afterwards, so OTHER stateful queries in the same session keep the
    * analyzer safety net (a session-wide disable here leaked the
    * exemption to every later query).
    */
  def perceptualNearDupGateStream(media: DataFrame,
      horizonSec: Long = 600L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.operators.Multimodal
    val horizonMs = horizonSec * 1000L
    val bands = media.select(col("doc_id"), col("media"), col("ts"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .flatMap { case (id, bytes, ts) =>
        val h = Multimodal.dhashOfMedia(id, bytes)
        (0 until Multimodal.DhashBands).map(b =>
          BandRow(b, (h >>> (b * 16)) & 0xFFFFL, id, h, ts))
      }
      // the event-time tag must ride the POST-flatMap ts attribute — a
      // typed map rewrites attributes, so an upstream watermark is lost
      .withWatermark("ts", s"$horizonSec seconds")
    val verdicts = bands.groupByKey(r => (r.band, r.bv))
      .flatMapGroupsWithState[Map[Long, Long],
        (Long, java.sql.Timestamp, Boolean)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, gs) =>
          val wm = gs.getCurrentWatermarkMs()
          var st = gs.getOption.getOrElse(Map.empty[Long, Long])
            .filter(_._2 >= wm) // horizon eviction: wm = maxEventTime - TTL
          if (gs.hasTimedOut) {
            if (st.isEmpty) gs.remove()
            else {
              gs.update(st)
              gs.setTimeoutTimestamp(
                math.max(st.values.max + horizonMs, wm) + 1L)
            }
            Iterator.empty
          } else {
            // deterministic within-batch gating: arrival order is
            // (event time, doc_id); each row judges BEFORE inserting
            val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
              .map { r =>
                val matched = st.exists { case (h, _) =>
                  java.lang.Long.bitCount(h ^ r.dhash) <=
                    Multimodal.DhashMaxHamming
                }
                st = st.updated(r.dhash,
                  math.max(st.getOrElse(r.dhash, 0L), r.ts.getTime))
                (r.doc_id, r.ts, matched)
              }
            gs.update(st)
            gs.setTimeoutTimestamp(
              math.max(st.values.max + horizonMs, wm) + 1L)
            out.iterator
          }
      }
      .toDF("doc_id", "ts", "band_matched")
    verdicts
      .withWatermark("ts", s"$horizonSec seconds")
      .groupBy(col("doc_id"), col("ts"))
      .agg(max(col("band_matched")).as("near_dup"))
      .select(col("doc_id"), col("near_dup"))
  }
}
