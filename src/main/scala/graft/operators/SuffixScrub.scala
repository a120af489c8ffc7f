package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextOps

/** Suffix-array-style duplicated-span scrub at PRODUCTION granularity
  * (q179) — q159's scale sibling. Lee et al.'s deduplication pipeline
  * ("Deduplicating Training Data Makes Language Models Better",
  * ACL'22) removes every span covered by a ≥50-gram that repeats
  * anywhere in the corpus, found via a suffix array over the
  * CONCATENATED corpus. A literal suffix array is a single in-memory
  * structure; the distributed-native equivalent of its construction is
  * PREFIX DOUBLING (Manber–Myers) — O(log n) rounds, each round pure
  * relational algebra — which is exactly what this operator runs:
  *
  *  1. concatenated-corpus view: every token gets a global position
  *     `gpos = doc_id·Stride + pos` (docs are gap-separated, so no
  *     window ever silently spans a document boundary — the missing
  *     neighbor positions make boundary-crossing windows unique);
  *  2. depth-1 equivalence classes: `cls₁(i) = min gpos of i's token` —
  *     one token-keyed shuffle; every later round shuffles only
  *     (long, long, long) rows;
  *  3. doubling rounds: `cls₂d(i) = min gpos over (cls_d(i),
  *     cls_d(i+d))` — a shift self-join + partial-aggregating min +
  *     class join-back per round, ⌈log₂ L⌉ rounds total. A position
  *     whose suffix is shorter than the depth pairs with a unique
  *     sentinel, so short/boundary windows are singletons by
  *     construction;
  *  4. exact n-gram classes from TWO OVERLAPPING depth-L blocks
  *     (L = 2^⌊log₂ n⌋): `(cls_L(i), cls_L(i+n−L))` — equal iff the two
  *     n-grams are EQUAL (token-exact; unlike q159's gram-hash tier
  *     there is no hash-identity assumption to document);
  *  5. dup classes (count > 1) → per-doc start lists → q159's shared
  *     interval-merge rebuild (`Curation.scrubRebuild`), so the scrub
  *     semantics are structurally identical.
  *
  * Scale: the whole pipeline is ⌈log₂ L⌉ + 3 narrow shuffles of
  * fixed-width long rows — the published shape of distributed suffix
  * sorting (prefix doubling is how Spark/Flink terasort-style SA
  * builders work); nothing ever materializes a gram STRING (q159's
  * 5-gram strings are fine; 50-gram strings would be ~10× the corpus).
  * Membership ≡ `dupspanScrub(n=50)` is pinned in OperatorSpec on the
  * shared fixture.
  */
object SuffixScrub extends QueryGroup {

  /** Scrub granularity — the Lee-et-al. production value. */
  val N = 50
  /** Per-doc position stride; max doc token count is loudly required
    * below it so global positions cannot collide across docs.
    */
  val Stride = 65536L

  private[graft] def saDupspanScrub(corpus: DataFrame, n: Int): DataFrame = {
    require(n >= 2, s"scrub granularity must be >= 2, got $n")
    val L = Integer.highestOneBit(n) // largest power of two <= n; 2L > n
    // r17: deliberately NO Tables.spread here — the heavy work is the
    // shuffling self-joins DOWNSTREAM of this cache (already parallel),
    // and the extra exchange regressed q179 6.4s -> 8.9s at sf0.1.
    val docs = graft.CachePool.track(
      corpus.select(col("doc_id"), col("text"),
        TextOps.tokens(col("text")).as("ws")))
    val maxLen =
      docs.agg(coalesce(max(size(col("ws"))), lit(0))).head().getInt(0)
    // The guard must cover not just raw positions but every SHIFTED
    // lookup: doubling rounds read gpos+d (d ≤ L ≤ n) and the gram
    // pairing reads gpos+(n−L), so a doc of length in (Stride−n, Stride)
    // would have windows whose shifted neighbors wrap into the NEXT
    // doc's position range — forming cross-document equivalence classes
    // and a silently wrong scrub (r11 advisory). maxLen + n ≤ Stride
    // keeps every shift inside the per-doc gap.
    require(maxLen.toLong + n <= Stride,
      s"doc with $maxLen tokens leaves no $n-token gap below " +
        s"Stride=$Stride — shifted positions would collide across " +
        "documents; raise Stride for this corpus")
    val pos0 = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "tok")))
      .select((col("doc_id") * Stride + col("pos")).as("gpos"), col("tok"))
    // depth-1 classes: the ONLY token-keyed (string) shuffle
    val c1 = pos0.groupBy(col("tok")).agg(min(col("gpos")).as("cls"))
    // LINEAGE TRUNCATION IS LOAD-BEARING for the iterative rounds: each
    // round references its predecessor on BOTH sides of the self-join,
    // so the logical plan quadruples per round — by round 5 the mere
    // plan STRING OOMs the driver (measured: AQE's explainString blew
    // an 8g heap at sf0.001). localCheckpoint materializes the round
    // and cuts the plan back to a leaf — the standard discipline for
    // iterative dataflows (at cluster scale: checkpoint() to the
    // reliable store instead, same seam).
    var active = pos0.join(c1, "tok").select(col("gpos"), col("cls"))
      .localCheckpoint()
    // SINGLETON PRUNING (Manber–Myers's refinement, r12): a class of
    // size 1 is FINAL — its suffix is already distinguished from every
    // other, and because cls = min gpos of the class, a singleton's cls
    // equals its own gpos and never changes in any later round (its
    // (cls, cls2) group is always exactly itself). So after each round,
    // count-1 positions exit the active set into a finalized pool; in
    // real text most positions are unique after 2–3 rounds, so the
    // expensive later shuffles carry only the still-ambiguous residue.
    // Finalized positions still serve as SHIFT NEIGHBORS (cls_d(i+d)
    // for an active i), so the shifted side unions the pool back in —
    // a union of ≤⌈log₂L⌉ checkpointed leaves, constant per round.
    // Class values are unchanged vs the unpruned algorithm (singletons
    // never join a non-singleton's group either way), so membership —
    // and the q179 hash — is identical by construction.
    var finals = Seq.empty[DataFrame]
    var d = 1
    while (d < L) {
      val all = finals.foldLeft(active)(_ unionByName _)
      // cls of the suffix d tokens later; a missing neighbor (doc end /
      // doc gap) pairs with a per-position-unique NEGATIVE sentinel, so
      // by induction every too-short suffix stays a singleton class
      val shifted = all.select((col("gpos") - d).as("gpos"),
        col("cls").as("cls2"))
      val paired = active.join(shifted, Seq("gpos"), "left")
        .select(col("gpos"), col("cls"),
          coalesce(col("cls2"), -col("gpos") - 1).as("cls2"))
      val nc = paired.groupBy(col("cls"), col("cls2"))
        .agg(min(col("gpos")).as("ncls"), count(lit(1)).as("cnt"))
      val joined = paired.join(nc, Seq("cls", "cls2"))
        .select(col("gpos"), col("ncls").as("cls"), col("cnt"))
        .localCheckpoint()
      finals = finals :+ joined.filter(col("cnt") === 1L)
        .select(col("gpos"), col("cls"))
      active = joined.filter(col("cnt") > 1L)
        .select(col("gpos"), col("cls"))
      d *= 2
    }
    val p = finals.foldLeft(active)(_ unionByName _)
    // exact n-gram class: two overlapping depth-L blocks cover [i, i+n);
    // the inner join drops positions whose second block has no row
    // (window past the corpus tail — those cannot be dup-starts)
    val shiftedN = p.select((col("gpos") - (n - L)).as("gpos"),
      col("cls").as("cls2"))
    val gram = p.join(shiftedN, Seq("gpos"))
      .select(col("gpos"), struct(col("cls"), col("cls2")).as("gc"))
    val dupG = gram.groupBy(col("gc")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1L).select(col("gc"))
    val starts = gram.join(dupG, "gc")
      .select(expr(s"CAST(gpos DIV $Stride AS BIGINT)").as("doc_id"),
        pmod(col("gpos"), lit(Stride)).cast("int").as("pos"))
      .groupBy(col("doc_id")).agg(collect_list(col("pos")).as("starts"))
    Curation.scrubRebuild(docs, starts, n)
  }

  def queries: Map[String, Q] = Map(
    // q179 [north star, r11]: the production 50-gram scrub tier — see
    // the object scaladoc. Same output contract as q159; the oracle is
    // q159's formulation at n=50 with list-slice gram strings (DuckDB
    // can afford gram strings at fixture scale; the ENGINE never
    // builds them).
    "q179_dupspan_scrub_sa" -> ((spark, dir) =>
      saDupspanScrub(Tables(spark, dir, "documents"), N)))

  def oracles: Map[String, String] = Map(
    "q179_dupspan_scrub_sa" ->
      s"""WITH w AS (SELECT doc_id, text, string_split(text,' ') AS ws FROM documents),
         |q0 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws)-${N - 1},0)+1),
         |  i -> {'pos': i-1, 'g': array_to_string(ws[i:i+${N - 1}], ' ')})) AS u FROM w),
         |q AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM q0),
         |d AS (SELECT g FROM q GROUP BY g HAVING count(*) > 1),
         |s AS (SELECT q.doc_id, list(q.pos) AS starts FROM q JOIN d USING (g) GROUP BY q.doc_id),
         |k AS (SELECT w.doc_id, w.text, w.ws, COALESCE(s.starts, []) AS starts
         |      FROM w LEFT JOIN s USING (doc_id)),
         |r AS (SELECT doc_id, text, ws,
         |        list_filter(ws, (x, i) ->
         |          len(list_filter(starts, p -> p <= i-1 AND i-1 <= p+${N - 1})) = 0) AS kept
         |      FROM k)
         |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
         |  CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
         |  CASE WHEN text IS NULL THEN NULL
         |       ELSE COALESCE(array_to_string(kept, ' '), '') END AS text_clean
         |FROM r ORDER BY doc_id""".stripMargin)
}
