package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The whole training-data pipeline as ONE composed dataflow — the
  * "could a user run their pipeline on this library" demonstration:
  *
  *   crawl (WARC files, metadata in record headers)
  *     → streaming record parse + HTTP validation + main-content extract
  *     → language/length gate
  *     → exact dedup (content hash, keep-lowest)
  *     → BPE tokenizer TRAINED ON THE CURATED CORPUS
  *     → whole-corpus tokenization
  *     → 512-token sequence packing per source
  *
  * Each stage is the already-proven operator (q169 WARC loop, q42's
  * dedup discipline, q166/q167 BPE, q82's packing formula) — what q174
  * adds is the COMPOSITION: stage boundaries carry exactly the columns
  * the next stage needs (lang/source ride the WARC record headers, the
  * real crawl's metadata sidecar, instead of re-joining the corpus), and
  * the oracle is the same composition in SQL (gate + QUALIFY-style dedup
  * feeding the parameterized q166/q167 CTE builders, then the q82
  * window).
  *
  * Scale: the WARC pack is test scaffolding (production reads existing
  * dumps; parallelism = file count); the gate and tokenize are map-only;
  * dedup is one hash-keyed shuffle; BPE training is one word-frequency
  * shuffle + driver greedy; packing is one source-keyed window (the
  * q82-vs-q151 trade is documented there — at a hot-source 100 TB the
  * q151 scan decomposition replaces the window verbatim).
  */
object Pipeline extends QueryGroup {

  val MinChars = 200
  val Langs = Seq("en", "de")
  val SeqLen = 512

  def queries: Map[String, Q] = Map(
    "q174_crawl_to_training" -> ((spark, dir) => {
      import spark.implicits._
      // crawl scaffolding: pack into 16 WARC shards, metadata in headers
      // r11: every doc carries the non-ASCII probe suffix (the q169
      // stance) so the END-TO-END composition — WARC octets, gate,
      // md5 dedup, BPE train+apply, packing — is proven on the
      // multi-byte text a real crawl ships, not just ASCII.
      val files = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(Warc.NonAsciiProbe)).as("text"),
          col("lang"), col("source"))
        // metadata completeness is a PACK precondition: a NULL lang or
        // source would interpolate as the literal string "null" in the
        // WARC header and come back as a real string — diverging from
        // the oracle's SQL NULL (r10 review finding). Records missing
        // their sidecar are quarantined at the pack, mirrored in the
        // oracle's WHERE.
        .filter(col("text").isNotNull && col("lang").isNotNull &&
          col("source").isNotNull)
        .withColumn("shard", pmod(col("doc_id"), lit(16)))
        .as[(Long, String, String, String, Long)]
        .groupByKey(_._5)
        .mapGroups { (_, it) =>
          Warc.buildTagged(it.toArray.sortBy(_._1).map(t =>
            (t._1, t._2, Seq("WARC-Graft-Lang" -> t._3,
              "WARC-Graft-Source" -> t._4))).toSeq)
        }
      // ingest: parse records, validate HTTP, extract main content,
      // read the metadata sidecar off the record headers
      val parsed = files.flatMap { bytes =>
        Warc.responses(bytes).map { e =>
          (e.docId, e.text,
            e.headers.getOrElse("WARC-Graft-Lang", "?"),
            e.headers.getOrElse("WARC-Graft-Source", "?"))
        }
      }.toDF("doc_id", "text", "lang", "source")
      // curation gate
      val gated = parsed.filter(length(col("text")) >= MinChars &&
        col("lang").isin(Langs.map(l => l: Any): _*))
      // exact dedup: content hash, keep the lowest doc_id
      val dw = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val dd = graft.CachePool.track(
        gated.withColumn("rn", row_number().over(dw))
          .filter(col("rn") === 1).drop("rn"))
      // tokenizer trained on the CURATED corpus (what production does —
      // training the tokenizer on pre-curation text bakes boilerplate
      // into the vocab), then map-only tokenization
      val merges = Tokenizer.bpeTrain(Tokenizer.wordDictOf(dd))
      val toks = Tokenizer.tokenized(dd, merges)
        .select(col("doc_id"), col("n_bpe"))
      // 512-token sequence packing per source (q82's formula over BPE
      // counts instead of whitespace counts)
      val pw = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dd.select(col("doc_id"), col("source"), col("lang"))
        .join(toks, "doc_id")
        .withColumn("cum", sum(col("n_bpe")).over(pw))
        .select(col("doc_id"), col("source"), col("lang"), col("n_bpe"),
          floor((col("cum") - col("n_bpe")).cast("double") / SeqLen.toDouble)
            .cast("long").as("seq_id"))
        .orderBy("doc_id")
    }))

  def oracles: Map[String, String] = Map(
    // the same composition in SQL: gate → windowed dedup → the
    // parameterized q166 trainer chain and q167 apply chain over the
    // curated stage → the q82 packing window.
    "q174_crawl_to_training" ->
      s"""WITH RECURSIVE src AS MATERIALIZED (
         |  SELECT doc_id, text || '${Warc.NonAsciiProbe}' AS text, lang, source
         |  FROM documents
         |  WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL),
         |gated AS MATERIALIZED (
         |  SELECT doc_id, text, lang, source FROM src
         |  WHERE length(text) >= $MinChars
         |    AND lang IN (${Langs.map(l => s"'$l'").mkString(", ")})),
         |dd AS MATERIALIZED (
         |  SELECT doc_id, text, lang, source FROM (
         |    SELECT g.*, row_number() OVER (PARTITION BY md5(text)
         |      ORDER BY doc_id) AS rn FROM gated g) t
         |  WHERE rn = 1),
         |${Tokenizer.oracleMergeCtes("dd")},
         |${Tokenizer.oracleApplyCtes("dd")},
         |packed AS (
         |  SELECT d.doc_id, d.source, d.lang, p.n_bpe,
         |    SUM(p.n_bpe) OVER (PARTITION BY d.source ORDER BY d.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM dd d JOIN perdoc p USING (doc_id))
         |SELECT doc_id, source, lang, CAST(n_bpe AS BIGINT) AS n_bpe,
         |  CAST(floor(CAST(cum - n_bpe AS DOUBLE) / $SeqLen.0) AS BIGINT) AS seq_id
         |FROM packed ORDER BY doc_id""".stripMargin)
}
