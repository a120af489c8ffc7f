package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source-format breadth: the engine's tables round-trip through every
  * built-in columnar/text format with identical content — parquet is the
  * fixture format, not a constraint.
  */
class FormatSpec extends SparkSpec {

  test("events round-trip identically through orc, json, and csv") {
    val base = Tables(spark, Sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"),
        // serialize ts explicitly: json/csv carry it as text
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
    val dir = Files.createTempDirectory("fmt-").toString
    base.write.orc(s"$dir/orc")
    base.write.json(s"$dir/json")
    base.write.option("header", true).csv(s"$dir/csv")

    val fromOrc = spark.read.orc(s"$dir/orc")
    val fromJson = spark.read.schema(base.schema).json(s"$dir/json")
    val fromCsv = spark.read.schema(base.schema)
      .option("header", true).csv(s"$dir/csv")

    val n = base.count()
    for ((df, fmt) <- Seq((fromOrc, "orc"), (fromJson, "json"), (fromCsv, "csv"))) {
      assert(df.count() == n, s"$fmt row count")
      assert(df.exceptAll(base).count() == 0, s"$fmt content drift")
      assert(base.exceptAll(df).count() == 0, s"$fmt content drift (reverse)")
    }
  }

  test("binaryFile source feeds the multimodal pipeline (media ingestion path)") {
    import graft.operators.Multimodal
    // stage some opaque "media" blobs on disk, as a real manifest would
    val dir = Files.createTempDirectory("media-")
    val blobs = (1 to 5).map(i => i.toLong -> Array.fill(10 * i)(i.toByte))
    blobs.foreach { case (i, b) =>
      Files.write(dir.resolve(s"clip-$i.bin"), b)
    }
    import spark.implicits._
    val media = spark.read.format("binaryFile").load(dir.toString)
      .select(
        regexp_extract(col("path"), "clip-(\\d+)\\.bin", 1).cast("long")
          .as("doc_id"),
        col("content").as("media"))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f.n_bytes).toMap
    assert(feats == blobs.map { case (i, b) => i -> b.length.toLong }.toMap)
  }
}
