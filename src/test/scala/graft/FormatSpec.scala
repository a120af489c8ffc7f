package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source-format breadth: the engine's tables round-trip through every
  * built-in columnar/text format with identical content — parquet is the
  * fixture format, not a constraint.
  */
class FormatSpec extends SparkSpec {

  test("q249 page decoder refuses corrupt pages, v2/compressed scope escapes, and truncation loudly") {
    import graft.operators.Footer
    // a fresh probe layout to corrupt (the registered query just wrote
    // these; re-write so the test owns its fixture)
    val out = System.getProperty("java.io.tmpdir") + "/graft_q249_corrupt"
    Tables(spark, Sf, "documents").select(col("doc_id"), col("source"))
      .repartition(1).sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").option("compression", "uncompressed")
      .parquet(out)
    val file = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.head
    // sanity: the intact file decodes
    val ok = Footer.decodeColumnChunk(file, "doc_id")
    assert(ok.longs.size.toLong == ok.nValues && ok.nValues > 0)
    // 1. corrupt the first data-page header byte -> the walk must throw,
    // never return wrong values
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
    val (leaves, chunks) = Footer.parseFooter(file)
    val di = leaves.indexWhere(_.name == "doc_id")
    val off = chunks(di).head.dataPageOffset.toInt
    val bad = bytes.clone(); bad(off) = 0x7f.toByte // invalid field header
    val badPath = out + "/corrupt.bin"
    java.nio.file.Files.write(java.nio.file.Paths.get(badPath), bad)
    intercept[Exception] { Footer.decodeColumnChunk(badPath, "doc_id") }
    // 2. truncated mid-page -> loud (readFully or bounds, never partial)
    val cut = java.util.Arrays.copyOfRange(bytes, 0, off + 8)
    val sfx = java.util.Arrays.copyOfRange(bytes, bytes.length - 2048, bytes.length)
    val truncPath = out + "/trunc.bin"
    java.nio.file.Files.write(java.nio.file.Paths.get(truncPath), cut ++ sfx)
    intercept[Exception] { Footer.decodeColumnChunk(truncPath, "doc_id") }
    // 3. scope escapes refuse with the q249 message: a SNAPPY chunk (the
    // stock testdata) is outside the audited uncompressed-v1 scope
    val e = intercept[Exception] {
      Footer.decodeColumnChunk(s"$Sf/documents.parquet", "doc_id")
    }
    assert(e.getMessage.contains("q249"),
      s"compressed-page refusal must cite its scope, got: ${e.getMessage}")
  }

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

  test("schema-drift guard: every fixture table loads and events.ts is session-UTC timestamp") {
    // The driver regenerates /root/testdata between rounds and has already
    // switched events.ts encodings once (TIMESTAMP(NANOS) → TIMESTAMP_MICROS
    // NTZ, round 7 — see VERDICT r7). This test makes the NEXT such drift
    // fail in one named assertion instead of 45 opaque query rows.
    import org.apache.spark.sql.types._
    for (t <- Tables.all) {
      val df = Tables(spark, Sf, t)
      assert(df.limit(1).count() == 1, s"table $t failed to load from $Sf")
    }
    assert(Tables(spark, Sf, "events").schema("ts").dataType == TimestampType,
      "events.ts must normalize to TimestampType — a new parquet encoding " +
        "appeared; extend Tables.normalizeEventsTs")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "session timezone must be pinned UTC for oracle-parity epoch arithmetic")
  }

  test("events.ts normalization handles every known fixture encoding") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // 2021-03-04T05:06:07.123456Z in epoch units
    val micros = 1614834367123456L

    // (a) legacy TIMESTAMP(NANOS) read via nanosAsLong → LongType nanos
    val fromNanos = Tables.normalizeEventsTs(
      Seq(micros * 1000L).toDF("ts"))
    // (b) TIMESTAMP_MICROS isAdjustedToUTC=0 → TimestampNTZType
    val fromNtz = Tables.normalizeEventsTs(
      Seq(micros).toDF("us").select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    // (c) already-UTC TimestampType passes through
    val fromUtc = Tables.normalizeEventsTs(
      Seq(micros).toDF("us").select(timestamp_micros(col("us")).as("ts")))

    for ((df, enc) <- Seq((fromNanos, "nanos"), (fromNtz, "ntz"), (fromUtc, "utc"))) {
      assert(df.schema("ts").dataType == TimestampType, s"$enc dtype")
      assert(df.select(unix_micros(col("ts"))).as[Long].head() == micros,
        s"$enc must land on the same UTC instant")
    }
    // (d) an unknown encoding fails loudly, not 45 queries deep
    val err = intercept[IllegalStateException] {
      Tables.normalizeEventsTs(Seq("2021-03-04").toDF("ts"))
    }
    assert(err.getMessage.contains("unsupported parquet dtype"))
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
