package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing — north star: treat image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The decode step is STUBBED (this container ships no image/audio codecs)
  * with a deterministic fake derived from the bytes; everything around it —
  * the binary column, the typed `Dataset` schema, the `mapPartitions`
  * batch shape (one decoder instance per partition, the same shape a
  * Pandas-UDF/mapInPandas pipeline has per Arrow batch), the partition-
  * preserving execution — is real and oracle-checked.
  *
  * Reference anchor: the >1 MB payload S3-pointer side channel
  * (`app.py:43-46`) is the same pattern — a column that *refers to* a blob
  * handled by a later, partition-local fetch/decode stage.
  *
  * Scale: mapPartitions is narrow (no shuffle); decode parallelism ==
  * partition count, and `spark.sql.files.maxPartitionBytes` sizes the
  * per-task batch.
  */
object Multimodal extends QueryGroup {

  /** A media row: opaque bytes + id, as it would arrive from a manifest. */
  case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Extracted features. Width/height are the deterministic decode fake. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, fake_width: Long,
      fake_height: Long, content_md5: String)

  /** The stubbed decoder: in a real deployment this is the image/audio
    * library call; here it derives deterministic pseudo-metadata so the
    * pipeline is testable end-to-end.
    */
  private[graft] def decodeStub(r: MediaRow): MediaFeatures = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(r.media).map("%02x".format(_)).mkString
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = r.media.length.toLong,
      fake_width = r.media.length.toLong % 640,
      fake_height = r.media.length.toLong % 480,
      content_md5 = hex)
  }

  /** Binary-column pipeline: bytes in, typed features out, one decoder
    * instance per partition.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it => it.map(decodeStub) }
  }

  def queries: Map[String, Q] = Map(
    // q54 [north star]: binary media column + stubbed decode/feature stage.
    "q54_multimodal_stub" -> ((spark, dir) => {
      import spark.implicits._
      val media = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[MediaRow]
      extractFeatures(spark, media).toDF().orderBy("doc_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q54_multimodal_stub" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
        | CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height,
        | md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
