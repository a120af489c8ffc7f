package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

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

    // q67 [north star]: context-window chunking — fixed 200-char windows
    // at stride 150 (50-char overlap), tail partial kept, ordinal chunk
    // ids. The explode is narrow (no shuffle); at 100 TB chunking is a
    // map-only stage whose output partitioning follows the input's.
    "q67_chunk" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"),
          posexplode(sequence(lit(1), length(col("text")), lit(150))))
        .select(col("doc_id"),
          col("pos").cast("long").as("chunk_id"),
          col("col").cast("long").as("start"),
          expr("substring(text, col, 200)").as("chunk"))
        .withColumn("n_chunk_chars", length(col("chunk")).cast("long"))
        .orderBy("doc_id", "chunk_id")),
  )

  def oracles: Map[String, String] = Map(
    "q65_train_split" ->
      """SELECT doc_id, substring(md5('split:' || CAST(doc_id AS VARCHAR)),1,2) AS bucket,
        | CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)),1,2) < 'cd'
        |      THEN 'train' ELSE 'val' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q66_domain_mix" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang = 'en' OR substring(md5('mix:' || CAST(doc_id AS VARCHAR)),1,2) < '80'
        |ORDER BY doc_id""".stripMargin,
    "q67_chunk" ->
      """SELECT doc_id, CAST((start - 1) / 150 AS BIGINT) AS chunk_id,
        | CAST(start AS BIGINT) AS start,
        | substring(text, CAST(start AS INT), 200) AS chunk,
        | CAST(length(substring(text, CAST(start AS INT), 200)) AS BIGINT) AS n_chunk_chars
        |FROM (SELECT doc_id, text, unnest(range(1, length(text)+1, 150)) AS start
        |      FROM documents) t
        |ORDER BY doc_id, chunk_id""".stripMargin,
  )
}
