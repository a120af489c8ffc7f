package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Codec
import graft.streaming._
import graft.streaming.AnsModel._

/** Streaming-semantics tests (SURVEY.md §5 rule 4): MemoryStream-driven
  * micro-batches through the real StreamExecution engine — watermarks,
  * state-backed dedup, arbitrary state, and the end-to-end tag pipeline
  * with its idempotent upsert sink.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSpec._

  private def gz(s: String): Array[Byte] = Codec.gzipBytes(s.getBytes(UTF_8))
  private def t(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)
  private def ev(json: String, minute: Int, shard: String = "s0") =
    Wire(gz(json), shard, t(minute))
  private def story(id: String): String =
    s"""{"id":"$id","operation":"insert-story","published":true,
       |"body":{"headlines":{"basic":"h-$id"},"revision":1}}""".stripMargin

  test("tag pipeline end-to-end: filter + enrich + idempotent upsert across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Wire]
    val store = new InMemoryDocumentStore
    store.upsert(AnsDoc("A", Some(3L), Some(Taxonomy(Some(Seq(Tag("x", "x")))))))
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    // ProcessingTime(0): continuous micro-batches, so data added AFTER
    // start is reliably picked up (AvailableNow snapshots its offsets at
    // start — racing addData against it is flaky under load); prod
    // cadence is 3 s ≙ app.py:78.
    val q = TagPipeline.start(spark, ms.toDF(), store, ckpt,
      trigger = Trigger.ProcessingTime(0))

    // batch 1: A (already in store, has other tag), B (unknown → created),
    // an unpublished story and an update op (both filtered out).
    ms.addData(
      ev(story("A"), 0), ev(story("B"), 1),
      ev("""{"id":"C","operation":"insert-story","published":false}""", 2),
      ev("""{"id":"D","operation":"update-story","published":true}""", 3))
    q.processAllAvailable()

    // batch 2: A redelivered (dedup + idempotence ⇒ no double tag).
    ms.addData(ev(story("A"), 4))
    q.processAllAvailable()
    q.stop()

    val a = store.get("A").get
    assert(a.taxonomy.get.tags.get == Seq(Tag("x", "x"), AutoTag)) // appended once, order kept
    val b = store.get("B").get
    assert(b.taxonomy.get.tags.get == Seq(AutoTag)) // created from nothing
    assert(store.get("C").isEmpty && store.get("D").isEmpty) // filtered out
    assert(store.size == 2)
  }

  test("open-schema tag pipeline: raw store docs keep unknown fields BYTE-identical across streaming tag write-back") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Wire]
    val store = new graft.streaming.InMemoryRawDocumentStore
    // the stored doc carries fields this pipeline has never heard of —
    // including decoy structure inside string values
    val seeded = """{"_id":"A","unknown":{"deep":[1,{"s":"tax\"onomy ]}"}],"u":"π café"},""" +
      """"taxonomy":{"rev":9,"tags":[{"slug":"x","text":"x"}]},"later":null}"""
    store.upsert("A", seeded)
    val ckpt = Files.createTempDirectory("graft-raw-ckpt-").toString
    val q = TagPipeline.startRaw(spark, ms.toDF(), store, ckpt,
      trigger = Trigger.ProcessingTime(0), storeKey = "raw-test")
    ms.addData(ev(story("A"), 0), ev(story("B"), 1))
    q.processAllAvailable()
    // redelivery: dedup + splice idempotence ⇒ byte-stable
    ms.addData(ev(story("A"), 2))
    q.processAllAvailable()
    q.stop()
    // hand-written expected bytes (NOT derived via RawAns — a circular
    // check would pass on any splice bug): the tag lands before the
    // tags array's ']', every other byte identical
    val expectedA = """{"_id":"A","unknown":{"deep":[1,{"s":"tax\"onomy ]}"}],"u":"π café"},""" +
      """"taxonomy":{"rev":9,"tags":[{"slug":"x","text":"x"},""" +
      """{"slug":"kinesis-autotag","text":"kinesis autotag"}]},"later":null}"""
    assert(store.get("A").get == expectedA, "unknown fields not byte-preserved")
    assert(store.get("B").get ==
      """{"_id":"B","taxonomy":{"tags":[{"slug":"kinesis-autotag","text":"kinesis autotag"}]}}""")
    assert(store.size == 2)
  }

  test("kinesis contract: WireSource.kinesis end-to-end through TagPipeline (LATEST skip + per-shard fetch cap)") {
    val stream = "unit-tag-events"
    KinesisStubRegistry.clear(stream)
    // enqueued BEFORE query start: LATEST must never read it
    KinesisStubRegistry.put(stream, "shardId-000000000000",
      gz(story("PRE")), t(0))
    val store = new InMemoryDocumentStore
    val ckpt = Files.createTempDirectory("graft-kinesis-ckpt-").toString
    val wire = WireSource.kinesis(spark, stream, "us-east-1",
      maxFetchPerShard = 2)
    val q = TagPipeline.start(spark, wire, store, ckpt,
      trigger = Trigger.ProcessingTime(0), storeKey = "kinesis-test")
    try {
      // LATEST initial offset snapshots at stream start; enqueue after
      q.processAllAvailable()
      (1 to 5).foreach { i =>
        KinesisStubRegistry.put(stream, "shardId-000000000000",
          gz(story(s"K$i")), t(i))
      }
      KinesisStubRegistry.put(stream, "shardId-000000000001",
        gz(story("K6")), t(6))
      q.processAllAvailable()
      assert(store.get("PRE").isEmpty, "LATEST must skip pre-start records")
      (1 to 6).foreach { i =>
        assert(store.get(s"K$i").exists(_.taxonomy.get.tags.get == Seq(AutoTag)),
          s"K$i not tagged")
      }
      // the Limit governor (app.py:22): no micro-batch read more than
      // maxFetchPerShard records from any shard — 5 records on shard 0
      // under cap 2 force ≥ 3 batches, each ≤ cap × shards rows
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3,
        s"5 records under a per-shard cap of 2 need >= 3 fetches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 2 * 2),
        "a micro-batch exceeded maxFetchRecordsPerShard x shards")
    } finally {
      q.stop()
      KinesisStubRegistry.clear(stream)
    }
  }

  test("first-publish filter works unchanged on a stream (batch/stream unification)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Wire]
    def storyC(id: String, created: Boolean): String =
      s"""{"id":"$id","operation":"insert-story","published":true,"created":$created}"""
    ms.addData(
      ev(storyC("first", created = true), 0),
      ev(storyC("repub", created = false), 1),
      ev(story("nocreated"), 2))
    val out = EventDecoder.decode(ms.toDF())
      .filter(EventDecoder.firstPublishFilter(
        col("operation"), col("published"), col("created")))
    val q = out.writeStream.format("memory").queryName("first_pub")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("first_pub").collect().map(_.getAs[String]("id"))
    assert(ids.toSeq == Seq("first"))
  }

  test("dropDuplicatesWithinWatermark: redelivered ids collapse to one row") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val out = StreamOps.dedupWithinWatermark(ms.toDF(), "event_id")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    ms.addData(Ev(1, t(0), 10, "signup", 1.0), Ev(2, t(1), 11, "signup", 2.0))
    q.processAllAvailable()
    ms.addData(Ev(1, t(0), 10, "signup", 1.0)) // redelivery, same id
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("tumbling window with watermark: late event beyond watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val agg = StreamOps.tumblingCounts(ms.toDF(), watermarkDelay = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("tumble_out")
      .outputMode("append").start()
    // hour-0 events, then advance event time far enough that the
    // watermark (max ts - 10 min) passes the end of hour 0.
    ms.addData(Ev(1, t(5), 1, "view", 1.0), Ev(2, t(10), 1, "view", 1.0))
    q.processAllAvailable()
    ms.addData(Ev(3, t(80), 1, "view", 1.0)) // watermark → :70 > hour-0 end
    q.processAllAvailable()
    ms.addData(Ev(4, t(6), 1, "view", 99.0)) // LATE: inside closed hour 0
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumble_out")
      .select(col("window.start").cast("long").as("ws"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // hour-0 window emitted exactly once, with 2 rows — the late 4th never counted
    assert(rows.values.toSeq == Seq(2L))
  }

  test("session windows split on 30-minute gaps per user") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val agg = StreamOps.sessionCounts(ms.toDF(), watermarkDelay = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    ms.addData(
      Ev(1, t(0), 1, "view", 1.0), Ev(2, t(10), 1, "view", 1.0), // session 1
      Ev(3, t(60), 1, "view", 1.0),                              // session 2 (50-min gap)
      Ev(4, t(0), 2, "view", 1.0))                               // user 2
    q.processAllAvailable()
    ms.addData(Ev(5, t(200), 3, "view", 1.0)) // advance watermark, close sessions
    q.processAllAvailable()
    q.stop()
    val sess = spark.table("sess_out")
      .select(col("user_id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sess.contains((1L, 2L)) && sess.contains((1L, 1L)) && sess.contains((2L, 1L)))
  }

  test("TagHistory (flatMapGroupsWithState): emits only first application per (doc, slug)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TagHistory.TagEvent]
    val q = TagHistory.changes(spark, ms.toDS()).writeStream
      .format("memory").queryName("hist_out").outputMode("append").start()
    ms.addData(
      TagHistory.TagEvent("d1", "auto", "auto"),
      TagHistory.TagEvent("d1", "auto", "auto"), // duplicate within batch
      TagHistory.TagEvent("d1", "manual", "manual"),
      TagHistory.TagEvent("d2", "auto", "auto"))
    q.processAllAvailable()
    ms.addData(TagHistory.TagEvent("d1", "auto", "auto")) // duplicate across batches
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hist_out").as[TagHistory.TagChange].collect()
    assert(got.length == 3)
    assert(got.count(_.doc_id == "d1") == 2)
    val firstD1 = got.filter(_.doc_id == "d1").sortBy(_.n_tags_after).head
    assert(firstD1.first_application && firstD1.n_tags_after == 1)
  }

  test("stream-stream interval join: pairs same-user events within the lookback, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val msL = MemoryStream[Ev]
    val msR = MemoryStream[Ev]
    val joined = StreamOps.intervalJoin(
      msL.toDF().select(col("event_id").as("l_id"), col("user_id"), col("ts")),
      msR.toDF().select(col("event_id").as("r_id"),
        col("user_id").as("r_user"), col("ts").as("r_ts"))
        .withColumnRenamed("r_user", "user_id").withColumnRenamed("r_ts", "ts"),
      lookback = "5 minutes")
      .select(col("e.l_id"), col("s.r_id"))
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    msR.addData(Ev(100, t(0), 1, "purchase", 1.0), // 3 min before L1 → pairs
      Ev(101, t(20), 1, "purchase", 1.0),          // after L1 → no pair
      Ev(102, t(0), 2, "purchase", 1.0))           // other user → no pair
    msL.addData(Ev(1, t(3), 1, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ij_out").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L)))
  }

  test("checkpoint recovery: a restarted query resumes without re-tagging") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Wire]
    val store = new InMemoryDocumentStore
    val ckpt = Files.createTempDirectory("graft-recover-").toString

    // data added BEFORE start: AvailableNow snapshots available offsets
    // at query start, so adding afterwards races the snapshot
    ms.addData(ev(story("R1"), 0), ev(story("R2"), 1))
    val q1 = TagPipeline.start(spark, ms.toDF(), store, ckpt,
      trigger = Trigger.AvailableNow(), storeKey = "recover-test")
    q1.processAllAvailable()
    q1.stop()
    assert(store.size == 2)
    val r1Before = store.get("R1").get

    // restart from the same checkpoint; new data plus (simulated) source
    // replay of R1 — the state store must carry the dedup across restart
    ms.addData(ev(story("R1"), 2), ev(story("R3"), 3))
    val q2 = TagPipeline.start(spark, ms.toDF(), store, ckpt,
      trigger = Trigger.AvailableNow(), storeKey = "recover-test")
    q2.processAllAvailable()
    q2.stop()

    assert(store.size == 3) // R3 added
    assert(store.get("R1").get == r1Before) // replayed R1: no change at all
    assert(store.get("R1").get.taxonomy.get.tags.get.count(_ == AutoTag) == 1)
  }

  test("file-backed store: upserts survive a process-restart boundary, idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-docstore-").toString
    val ckpt = Files.createTempDirectory("graft-docstore-ckpt-").toString
    val ms = MemoryStream[Wire]
    ms.addData(ev(story("D1"), 0), ev(story("D2"), 1))
    val q1 = TagPipeline.start(spark, ms.toDF(), new FileDocumentStore(dir),
      ckpt, trigger = Trigger.AvailableNow(), storeKey = "file-store-test")
    q1.processAllAvailable(); q1.stop()

    // a FRESH store instance on the same root sees the documents — the
    // durability the in-memory store cannot provide
    val reopened = new FileDocumentStore(dir)
    assert(reopened.size == 2)
    val d1Before = reopened.get("D1").get
    assert(d1Before.taxonomy.get.tags.get == Seq(AutoTag))

    // redelivery after "restart": checkpoint + idempotent upsert → no
    // double tag, byte-identical doc
    ms.addData(ev(story("D1"), 2))
    val q2 = TagPipeline.start(spark, ms.toDF(), reopened, ckpt,
      trigger = Trigger.AvailableNow(), storeKey = "file-store-test")
    q2.processAllAvailable(); q2.stop()
    assert(new FileDocumentStore(dir).get("D1").get == d1Before)
  }

  test("tag pipeline under the RocksDB state store (the at-scale state backend)") {
    // The HDFS-backed default state store holds every in-watermark dedup
    // key on-heap — at 100 TB event volume that state must spill; RocksDB
    // is the production backend. Same pipeline, same assertions, state
    // provider swapped by config only.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val ms = MemoryStream[Wire]
      val store = new InMemoryDocumentStore
      val ckpt = Files.createTempDirectory("graft-rocksdb-").toString
      val q = TagPipeline.start(spark, ms.toDF(), store, ckpt,
        trigger = Trigger.ProcessingTime(0), storeKey = "rocksdb-test")
      ms.addData(ev(story("RD1"), 0), ev(story("RD2"), 1))
      q.processAllAvailable()
      ms.addData(ev(story("RD1"), 2)) // redelivery dedups via RocksDB state
      q.processAllAvailable()
      q.stop()
      assert(store.size == 2)
      assert(store.get("RD1").get.taxonomy.get.tags.get == Seq(AutoTag),
        "redelivered id must stay single-tagged under the RocksDB store")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("kinesis checkpoint recovery: killed mid-stream, the restart resumes the cursors — no loss, no re-tag") {
    // r8 verdict item 4. The reference documents the OPPOSITE behavior:
    // LATEST with no sequence-number persistence loses position on every
    // restart (app.py:18). Here the restarted query must restore the
    // checkpointed shard cursors: records that arrived while the consumer
    // was DOWN are delivered (LATEST must not re-snapshot), and nothing
    // already processed is double-tagged.
    val stream = "unit-recover-stream"
    KinesisStubRegistry.clear(stream)
    val store = new InMemoryDocumentStore
    val ckpt = Files.createTempDirectory("graft-kinesis-recover-").toString
    def startQuery() = TagPipeline.start(spark,
      WireSource.kinesis(spark, stream, "us-east-1", maxFetchPerShard = 2),
      store, ckpt, trigger = Trigger.ProcessingTime(0),
      storeKey = "kinesis-recover")
    val q1 = startQuery()
    try {
      q1.processAllAvailable() // LATEST snapshots the (empty) stream head
      (1 to 3).foreach(i => KinesisStubRegistry.put(stream,
        "shardId-000000000000", gz(story(s"R$i")), t(i)))
      q1.processAllAvailable()
      assert(store.size == 3, "pre-kill records must be tagged")
    } finally q1.stop() // the mid-stream kill
    // records arrive while the consumer is down — the reference would
    // lose these on restart
    (4 to 6).foreach(i => KinesisStubRegistry.put(stream,
      "shardId-000000000000", gz(story(s"R$i")), t(i)))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      (1 to 6).foreach { i =>
        assert(store.get(s"R$i").exists(
          _.taxonomy.get.tags.get == Seq(AutoTag)),
          s"R$i lost across the restart or double-tagged")
      }
      assert(store.size == 6)
    } finally {
      q2.stop()
      KinesisStubRegistry.clear(stream)
    }
  }

  test("watermarked cross-dump dedup: bounded state — in-horizon dups collapse, post-eviction re-arrivals re-emit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq((100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamOps.crossDumpNearDupStreamWatermarked(
        ms.toDF().toDF("doc_id", "text", "ts"), corpus, "10 minutes")
      .writeStream.format("memory").queryName("xdup_wm_out")
      .outputMode("append").start()
    // batch 1: doc 1 matches the corpus → pair emitted, state created
    ms.addData((1L, "the quick brown fox jumps over the lazy dog today", t(0)))
    q.processAllAvailable()
    // batch 2: the same pair re-arrives INSIDE the horizon → deduped; a
    // much-later MATCHING doc advances the watermark past t0 + 10min
    // (content filters sit below the watermark node, so only rows that
    // survive them feed event-time stats — the operator's documented
    // caveat; watermark-advancing traffic must itself match)
    ms.addData(
      (1L, "the quick brown fox jumps over the lazy dog today", t(1)),
      (2L, "the quick brown fox jumps over the lazy dog today", t(120)))
    q.processAllAvailable()
    // batch 3: another matching doc runs the eviction pass under the
    // advanced watermark (state removal happens at batch boundaries)
    ms.addData((3L, "the quick brown fox jumps over the lazy dog today", t(121)))
    q.processAllAvailable()
    // batch 4: pair (1,100) re-arrives AFTER its state was evicted
    // (event time fresh, beyond the old horizon) → re-emitted: the
    // documented bounded-state trade of the watermarked tier
    ms.addData((1L, "the quick brown fox jumps over the lazy dog today", t(125)))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("xdup_wm_out")
      .select(col("new_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // (1,100) exactly twice — once per horizon, the in-horizon
    // redelivery collapsed; docs 2 and 3 emit their own pairs once
    assert(pairs.count(_ == (1L, 100L)) == 2,
      s"expected the pair once per horizon, got ${pairs.toSeq}")
    assert(pairs.count(_ == (2L, 100L)) == 1 &&
      pairs.count(_ == (3L, 100L)) == 1 && pairs.length == 4,
      s"unexpected pair inventory: ${pairs.toSeq}")
  }

  test("ranged blob fetch: Range honored, ignored-Range degraded, 5xx absorbed, 404 loud") {
    import spark.implicits._
    val payload = "0123456789abcdef" * 8 // 128 ASCII bytes
    val stub = new graft.streaming.BlobApiStub(name =>
      if (name == "packed/shard-0.bin") Some(payload.getBytes("UTF-8")) else None)
    try {
      val fetcher = new graft.streaming.HttpBlobFetcher(
        stub.baseUrl, maxAttempts = 4, backoffMs = 5L)
      // 206 path: exactly the requested slice
      assert(new String(fetcher.fetchRange("/blobs/packed/shard-0.bin", 16, 16),
        "UTF-8") == payload.substring(16, 32))
      // failure injection: two 500s, then service — retry absorbs both
      stub.failNext.set(2)
      assert(new String(fetcher.fetchRange("/blobs/packed/shard-0.bin", 0, 4),
        "UTF-8") == "0123")
      // a server that ignores Range (RFC-legal): 200 + full body must
      // degrade to the identical slice client-side
      stub.honorRange = false
      assert(new String(fetcher.fetchRange("/blobs/packed/shard-0.bin", 16, 16),
        "UTF-8") == payload.substring(16, 32))
      stub.honorRange = true
      // a missing blob is an error, not a silent empty record
      intercept[java.io.IOException] {
        fetcher.fetchRange("/blobs/missing.bin", 0, 4)
      }
      // a manifest range past the blob end is LOUD on both server modes:
      // the honoring server caps the 206 at EOF (short slice) and the
      // ignoring server's degrade slices short — both must raise, and
      // identically (the r10 short-read guard)
      intercept[java.io.IOException] {
        fetcher.fetchRange("/blobs/packed/shard-0.bin", 120, 16)
      }
      stub.honorRange = false
      intercept[java.io.IOException] {
        fetcher.fetchRange("/blobs/packed/shard-0.bin", 120, 16)
      }
      intercept[java.io.IOException] { // fully out of range, degraded mode
        fetcher.fetchRange("/blobs/packed/shard-0.bin", 256, 8)
      }
      stub.honorRange = true
      // end-to-end through the Spark operator: distributed manifest,
      // pooled partition-local fetch, one mid-job 500 absorbed
      val manifest = Seq(
        graft.operators.Multimodal.RangedPointer(
          1L, "/blobs/packed/shard-0.bin", 0L, 16L),
        graft.operators.Multimodal.RangedPointer(
          2L, "/blobs/packed/shard-0.bin", 64L, 32L)).toDS()
      stub.failNext.set(1)
      val rows = graft.operators.Multimodal.derefRanged(spark, manifest,
          new graft.streaming.HttpBlobFetcher(stub.baseUrl, backoffMs = 5L))
        .collect().map(r => (r.doc_id, r.n_bytes, r.blob_md5)).sortBy(_._1)
      def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(rows.toSeq == Seq(
        (1L, 16L, md5(payload.substring(0, 16))),
        (2L, 32L, md5(payload.substring(64, 96)))))
    } finally stub.stop()
  }

  test("kinesis resharding: split + merge mid-stream lose nothing and duplicate nothing") {
    // r9 verdict item 3. The reference hard-codes exactly 2 shards
    // (app.py:92-93), so the first production reshard silently strands
    // records on the new children. Here a split and a merge land WHILE
    // the query runs — with an in-flight tail still unread on the split
    // parent — and the consumer must drain parent tails from their
    // cursors and pick every child up at cursor 0.
    val stream = "unit-reshard-stream"
    KinesisStubRegistry.clear(stream)
    val store = new InMemoryDocumentStore
    val ckpt = Files.createTempDirectory("graft-kinesis-reshard-").toString
    def startQuery() = TagPipeline.start(spark,
      WireSource.kinesis(spark, stream, "us-east-1", maxFetchPerShard = 2),
      store, ckpt, trigger = Trigger.ProcessingTime(0),
      storeKey = "kinesis-reshard")
    // two shards exist before start, like the reference's fixed pair
    KinesisStubRegistry.put(stream, "shard-a", gz(story("PRE")), t(0))
    KinesisStubRegistry.put(stream, "shard-b", gz(story("PRE2")), t(0))
    val q1 = startQuery()
    try {
      q1.processAllAvailable() // LATEST snapshot: PRE/PRE2 never read
      (1 to 3).foreach(i =>
        KinesisStubRegistry.put(stream, "shard-a", gz(story(s"A$i")), t(i)))
      KinesisStubRegistry.put(stream, "shard-b", gz(story("B1")), t(1))
      q1.processAllAvailable()
      // SPLIT with an in-flight tail: A4 lands on the parent, the split
      // closes it, then records land on the children — all must arrive
      KinesisStubRegistry.put(stream, "shard-a", gz(story("A4")), t(4))
      KinesisStubRegistry.splitShard(stream, "shard-a", "shard-a1", "shard-a2")
      intercept[IllegalArgumentException] {
        KinesisStubRegistry.put(stream, "shard-a", gz(story("DEAD")), t(5))
      }
      (1 to 3).foreach(i =>
        KinesisStubRegistry.put(stream, "shard-a1", gz(story(s"C$i")), t(5 + i)))
      KinesisStubRegistry.put(stream, "shard-a2", gz(story("D1")), t(9))
      q1.processAllAvailable()
      (Seq("A4", "D1") ++ (1 to 3).map(i => s"C$i")).foreach(id =>
        assert(store.get(id).exists(_.taxonomy.get.tags.get == Seq(AutoTag)),
          s"$id lost across the split"))
    } finally q1.stop()
    // MERGE while the consumer is DOWN, with unread tails on both
    // parents — the restart must drain both from the checkpoint and
    // find the merged child at cursor 0
    KinesisStubRegistry.put(stream, "shard-a1", gz(story("C4")), t(10))
    KinesisStubRegistry.put(stream, "shard-b", gz(story("B2")), t(10))
    KinesisStubRegistry.mergeShards(stream, "shard-a1", "shard-a2", "shard-m")
    (1 to 3).foreach(i =>
      KinesisStubRegistry.put(stream, "shard-m", gz(story(s"M$i")), t(10 + i)))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      (Seq("C4", "B2") ++ (1 to 3).map(i => s"M$i")).foreach(id =>
        assert(store.get(id).exists(_.taxonomy.get.tags.get == Seq(AutoTag)),
          s"$id lost across the merge/restart"))
      // exactly-once inventory: every post-start record tagged once,
      // neither pre-start record ever read
      assert(store.get("PRE").isEmpty && store.get("PRE2").isEmpty,
        "LATEST must not read pre-start records")
      assert(store.size == 14,
        s"expected 14 tagged docs (A1-3+B1 pre-split, A4+C1-3+D1 split-era, C4+B2+M1-3 merge-era), got ${store.size}")
    } finally {
      q2.stop()
      KinesisStubRegistry.clear(stream)
    }
  }

  test("exactly-once sink: a crash between sink write and engine commit never re-executes the batch") {
    // r10 verdict item 9: foreachBatch is at-least-once — kill the
    // query AFTER the sink writes but BEFORE the engine's checkpoint
    // commit (simulated by deleting the last commits/ entry, exactly
    // the on-disk state such a crash leaves) and the batch REPLAYS with
    // the same batchId. The batchId-keyed marker in the sink store must
    // swallow the replay: zero re-executed effects, not merely
    // idempotent ones.
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Wire]
    val updates = new java.util.concurrent.atomic.AtomicInteger(0)
    val store = new InMemoryDocumentStore {
      override def update(id: String)(f: Option[AnsDoc] => AnsDoc): AnsDoc = {
        updates.incrementAndGet(); super.update(id)(f)
      }
    }
    // the crash is simulated by checkpoint surgery (below), which leaves
    // the state store one version ahead of the commit log — exactly a
    // real crash's on-disk state, but 4.1's per-run commit COUNTER
    // validation (which only knows about commits it watched this run)
    // misreads the surgery; disable it for the restart under test
    val validationConf = "spark.sql.streaming.stateStore.commitValidation.enabled"
    val prevValidation = spark.conf.getOption(validationConf)
    spark.conf.set(validationConf, "false")
    val ckpt = Files.createTempDirectory("graft-exactly-once-").toString
    def startQuery() = TagPipeline.start(spark, ms.toDF(), store, ckpt,
      trigger = Trigger.ProcessingTime(0), storeKey = "exactly-once",
      exactlyOnce = true)
    val q1 = startQuery()
    ms.addData(ev(story("X"), 0), ev(story("Y"), 1))
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = updates.get()
    assert(afterFirst >= 2, s"expected the two docs tagged, got $afterFirst updates")
    assert(store.get(TagPipeline.commitMarkerId("exactly-once", 0L,
        TagPipeline.runNamespace(ckpt))).nonEmpty,
      "batch 0 commit marker missing")
    // crash window: sink writes landed, engine commit did not
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val last = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(commits)
      try s.iterator().asScala
        .filter(!_.getFileName.toString.startsWith("."))
        .toSeq.maxBy(_.getFileName.toString)
      finally s.close()
    }
    java.nio.file.Files.delete(last)
    // local FS keeps a ChecksumFileSystem sidecar; a stale .crc would
    // make the replay's re-commit look like a concurrent writer
    java.nio.file.Files.deleteIfExists(
      last.resolveSibling("." + last.getFileName.toString + ".crc"))
    val q2 = startQuery()
    q2.processAllAvailable() // replays the batch; the marker must gate it
    assert(updates.get() == afterFirst,
      s"replayed batch re-executed the sink: ${updates.get()} != $afterFirst updates")
    assert(store.get("X").exists(_.taxonomy.get.tags.get == Seq(AutoTag)))
    // fresh data after recovery still flows (a new batchId has no marker)
    ms.addData(ev(story("Z"), 2))
    q2.processAllAvailable()
    q2.stop()
    prevValidation match {
      case Some(v) => spark.conf.set(validationConf, v)
      case None    => spark.conf.unset(validationConf)
    }
    assert(store.get("Z").exists(_.taxonomy.get.tags.get == Seq(AutoTag)),
      "post-recovery batch lost")
    assert(updates.get() > afterFirst, "post-recovery batch never ran")
    // FRESH checkpoint dir against the SAME store: batchIds reset to 0,
    // so without the run-namespaced marker key the stale batch-0 marker
    // above would silently swallow the new run's first batch (r11
    // advisory). The checkpoint-path namespace keeps the ledgers apart.
    val beforeFresh = updates.get()
    val ckpt2 = Files.createTempDirectory("graft-exactly-once2-").toString
    val ms2 = MemoryStream[Wire]
    val q3 = TagPipeline.start(spark, ms2.toDF(), store, ckpt2,
      trigger = Trigger.ProcessingTime(0), storeKey = "exactly-once",
      exactlyOnce = true)
    ms2.addData(ev(story("W"), 3))
    q3.processAllAvailable()
    q3.stop()
    assert(store.get("W").exists(_.taxonomy.get.tags.get == Seq(AutoTag)),
      "fresh-checkpoint run's batch 0 swallowed by a stale marker")
    assert(updates.get() > beforeFresh, "fresh-checkpoint batch never ran")
  }

  test("KPL aggregation: wire-format round trip, digest loud, non-aggregated passthrough") {
    // the public format: magic + hand-rolled protobuf + md5 trailer
    val recs = Seq("pk-a" -> "alpha".getBytes(UTF_8),
      "pk-b" -> "beta".getBytes(UTF_8), "pk-a" -> "gamma".getBytes(UTF_8))
    val blob = Kpl.aggregate(recs)
    assert(Kpl.isAggregated(blob))
    val back = Kpl.deaggregate(blob, "ignored")
    assert(back.map(u => (u.partitionKey, new String(u.data, UTF_8))) ==
      recs.map { case (pk, d) => (pk, new String(d, UTF_8)) })
    // subsequence numbers are positional — the KCL checkpoint key
    assert(back.map(_.subSeq) == Seq(0L, 1L, 2L))
    // a flipped payload byte breaks the md5 trailer LOUDLY
    val corrupt = blob.clone()
    corrupt(blob.length - 20) = (corrupt(blob.length - 20) ^ 0x01).toByte
    intercept[IllegalArgumentException] { Kpl.deaggregate(corrupt, "x") }
    // magic-less blobs are plain records: one user record, subseq 0
    val plain = "not aggregated".getBytes(UTF_8)
    val p = Kpl.deaggregate(plain, "fallback-pk")
    assert(p.map(u => (u.partitionKey, new String(u.data, UTF_8), u.subSeq)) ==
      Seq(("fallback-pk", "not aggregated", 0L)))
  }

  test("KPL deaggregation through reshard + restart: every user record delivered exactly once") {
    // r10 verdict item 6: a real high-throughput stream ships KPL
    // aggregates; the consumer must deaggregate, honor subsequence
    // identity, and survive a split + checkpoint restart mid-flow with
    // no loss and no duplication — including MIXED traffic (aggregated
    // and plain records on the same shard).
    val stream = "unit-kpl-stream"
    KinesisStubRegistry.clear(stream)
    val store = new InMemoryDocumentStore
    val ckpt = Files.createTempDirectory("graft-kinesis-kpl-").toString
    def agg(ids: String*): Array[Byte] =
      Kpl.aggregate(ids.map(id => id -> gz(story(id))))
    def startQuery() = TagPipeline.start(spark,
      WireSource.kinesisKpl(spark, stream, "us-east-1", maxFetchPerShard = 2),
      store, ckpt, trigger = Trigger.ProcessingTime(0),
      storeKey = "kinesis-kpl")
    KinesisStubRegistry.put(stream, "shard-a", agg("PRE"), t(0))
    val q1 = startQuery()
    try {
      q1.processAllAvailable() // LATEST: the pre-start aggregate is skipped
      // aggregated + plain records interleaved on one shard
      KinesisStubRegistry.put(stream, "shard-a", agg("A1", "A2", "A3"), t(1))
      KinesisStubRegistry.put(stream, "shard-a", gz(story("P1")), t(2))
      KinesisStubRegistry.put(stream, "shard-b", agg("B1", "B2"), t(1))
      q1.processAllAvailable()
      // split with an in-flight aggregated tail on the parent
      KinesisStubRegistry.put(stream, "shard-a", agg("A4", "A5"), t(3))
      KinesisStubRegistry.splitShard(stream, "shard-a", "shard-a1", "shard-a2")
      KinesisStubRegistry.put(stream, "shard-a1", agg("C1", "C2"), t(4))
      q1.processAllAvailable()
      Seq("A1", "A2", "A3", "A4", "A5", "P1", "B1", "B2", "C1", "C2")
        .foreach(id => assert(store.get(id).nonEmpty, s"$id lost pre-restart"))
    } finally q1.stop()
    // consumer DOWN: an aggregate lands on the child and one parent-era
    // aggregate is re-shipped by a "producer retry" (same user records —
    // the idempotent tag sink + id dedup must absorb it)
    KinesisStubRegistry.put(stream, "shard-a2", agg("D1", "D2", "D3"), t(5))
    KinesisStubRegistry.put(stream, "shard-b", agg("B1", "B2"), t(6))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val all = Seq("A1", "A2", "A3", "A4", "A5", "P1", "B1", "B2",
        "C1", "C2", "D1", "D2", "D3")
      all.foreach(id =>
        assert(store.get(id).exists(_.taxonomy.get.tags.get == Seq(AutoTag)),
          s"$id lost or double-tagged across restart"))
      assert(store.get("PRE").isEmpty, "LATEST must not read the pre-start aggregate")
      assert(store.size == all.size,
        s"expected ${all.size} docs, got ${store.size}")
    } finally {
      q2.stop()
      KinesisStubRegistry.clear(stream)
    }
  }

  test("http-backed store: TagPipeline end-to-end, transient 5xx absorbed by retry, idempotent across redelivery") {
    // r8 verdict item 3: the tag.py:12-29 seam as a real pooled-client
    // HTTP store with If-Match optimistic concurrency, driven through
    // the same pipeline the file/in-memory stores pass. Two injected
    // 500s land mid-batch: the retry/backoff must absorb them without
    // failing the micro-batch (the error-continue stance of app.py:71-75,
    // minus the reference's silent record drop).
    implicit val sqlCtx = spark.sqlContext
    val stub = new DraftApiStub
    try {
      val store = new HttpDocumentStore(stub.baseUrl, backoffMs = 5L)
      store.upsert(AnsDoc("A", Some(3L),
        Some(Taxonomy(Some(Seq(Tag("x", "x")))))))
      val ms = MemoryStream[Wire]
      val ckpt = Files.createTempDirectory("graft-http-ckpt-").toString
      val q = TagPipeline.start(spark, ms.toDF(), store, ckpt,
        trigger = Trigger.ProcessingTime(0), storeKey = "http-test")
      stub.failNext.set(2)
      ms.addData(ev(story("A"), 0), ev(story("B"), 1))
      q.processAllAvailable()
      ms.addData(ev(story("A"), 2)) // redelivery
      q.processAllAvailable()
      q.stop()
      val a = store.get("A").get
      assert(a.taxonomy.get.tags.get == Seq(Tag("x", "x"), AutoTag),
        "existing tags preserved, auto tag appended exactly once")
      assert(a.revision.contains(3L), "untouched fields survive the round-trip")
      assert(store.get("B").get.taxonomy.get.tags.get == Seq(AutoTag))
      assert(store.size == 2)
      assert(stub.hits.get() > 2, "the injected failures must have been retried")
    } finally stub.stop()
  }

  test("http-backed store: a persistently dead endpoint surfaces after bounded retries") {
    val stub = new DraftApiStub
    val url = stub.baseUrl
    stub.stop() // nothing listening — every attempt is a connect error
    val store = new HttpDocumentStore(url, maxAttempts = 2, backoffMs = 5L)
    val e = intercept[java.io.IOException](store.get("X"))
    assert(e.getMessage.contains("2 attempts"),
      s"retries must be bounded and reported, got: ${e.getMessage}")
  }

  test("optimistic update: concurrent tagger and editor never drop either change") {
    val fileDir = Files.createTempDirectory("graft-cas-").toString
    val stub = new DraftApiStub
    try for (store <- Seq(new InMemoryDocumentStore,
        new FileDocumentStore(fileDir),
        new HttpDocumentStore(stub.baseUrl, backoffMs = 5L))) {
      store.upsert(AnsDoc("X", Some(0L), None))
      val tags = (1 to 40).map(i => Tag(s"t$i", s"text $i"))
      val tagger = new Thread(() =>
        tags.foreach(t => store.update("X")(c =>
          DocumentStore.modifyAns(c.get, t))))
      val editor = new Thread(() =>
        (1 to 40).foreach(_ => store.update("X")(c =>
          c.get.copy(revision = c.get.revision.map(_ + 1)))))
      tagger.start(); editor.start()
      tagger.join(60000); editor.join(60000)
      val fin = store.get("X").get
      // under raw last-writer-wins PUT, interleaved read-modify-writes
      // drop one side's changes; update() must keep every one of both
      assert(fin.revision.contains(40L),
        s"${store.getClass.getSimpleName}: edits dropped (rev ${fin.revision})")
      assert(fin.taxonomy.get.tags.get == tags,
        s"${store.getClass.getSimpleName}: tags dropped or reordered " +
          s"(${fin.taxonomy.get.tags.get.size}/40 kept)")
    } finally stub.stop()
  }

  test("orphaned lock file: a dead writer's stale lock is broken, not spun on forever") {
    val dir = Files.createTempDirectory("graft-lock-").toString
    val store = new FileDocumentStore(dir)
    store.upsert(AnsDoc("X", Some(0L), None))
    // fabricate the kill -9 orphan: the lock exists, its owner is gone,
    // and its mtime is past the stale bound
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest("X".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lock = java.nio.file.Paths.get(dir, hex + ".doc.lock")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000L))
    val t0 = System.nanoTime()
    val out = store.update("X")(c => c.get.copy(
      revision = c.get.revision.map(_ + 1)))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.revision.contains(1L))
    assert(secs < 8.0, s"stale lock should break immediately, took $secs s")
    assert(!Files.exists(lock), "broken/released lock must not persist")
  }

  test("stale-lock break under contention: two waiters never double-break into the critical section") {
    // Regression for the delete-in-place race: two waiters both judge the
    // orphan stale; the first deletes + creates its fresh lock; the second's
    // delete then removed that FRESH lock, letting a third writer in and
    // re-opening the lost-update window. The fix claims the stale lock by
    // ATOMIC rename, so at most one waiter breaks it. Drive many rounds of
    // (fabricated orphan) + (two racing updates) and require every update
    // to land.
    val dir = Files.createTempDirectory("graft-lockrace-").toString
    val store = new FileDocumentStore(dir, lockStaleMs = 20L)
    store.upsert(AnsDoc("X", Some(0L), None))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest("X".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lock = java.nio.file.Paths.get(dir, hex + ".doc.lock")
    val rounds = 50
    for (r <- 1 to rounds) {
      Files.createFile(lock)
      Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 60000L))
      val ts = (1 to 2).map(_ => new Thread(() =>
        store.update("X")(c => c.get.copy(
          revision = c.get.revision.map(_ + 1)))))
      ts.foreach(_.start()); ts.foreach(_.join(30000))
      assert(store.get("X").get.revision.contains(2L * r),
        s"round $r: an update was dropped after a stale-lock break")
    }
    assert(!Files.exists(lock), "no lock may outlive its round")
    val leftovers = Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      val claims = leftovers.iterator().asScala
        .filter(_.getFileName.toString.contains(".claim-")).toSeq
      assert(claims.isEmpty, s"orphaned claim files: $claims")
    } finally leftovers.close()
  }

  test("a holder whose lock was broken mid-section never deletes the successor's lock") {
    // ADVICE r8 regression: locks are self-identifying (owner UUID). If a
    // holder overstays staleMs (GC pause stand-in: a slow upsert) and a
    // waiter legitimately breaks its lock, the original holder's release
    // must leave the successor's FRESH lock in place — deleting it would
    // admit a third writer into the critical section.
    val dir = Files.createTempDirectory("graft-lockowner-").toString
    class SlowUpsertStore extends FileDocumentStore(dir, lockStaleMs = 100L) {
      val sleepMs = new java.util.concurrent.atomic.AtomicLong(0L)
      override def upsert(doc: AnsDoc): Unit = {
        val s = sleepMs.get(); if (s > 0) Thread.sleep(s)
        super.upsert(doc)
      }
    }
    val store = new SlowUpsertStore
    store.upsert(AnsDoc("X", Some(0L), None))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest("X".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lock = java.nio.file.Paths.get(dir, hex + ".doc.lock")

    store.sleepMs.set(1500L) // holder A overstays its 100 ms stale bound
    val a = new Thread(() => store.update("X")(c => c.get.copy(
      revision = c.get.revision.map(_ + 1))))
    a.start()
    Thread.sleep(400) // A is mid-upsert, its lock is already stale
    store.sleepMs.set(3000L) // successor B holds well past A's finish
    val b = new Thread(() => store.update("X")(c => c.get.copy(
      revision = c.get.revision.map(_ + 10))))
    b.start()
    Thread.sleep(400) // B has broken A's stale lock and is mid-upsert
    assert(Files.exists(lock), "successor must be holding a fresh lock")
    a.join(10000)
    assert(!a.isAlive, "holder A must have finished")
    assert(Files.exists(lock),
      "A's release deleted the successor's lock — ownership check broken")
    b.join(10000)
    assert(!b.isAlive, "successor B must have finished")
    assert(!Files.exists(lock), "B must release its own lock")
    // the key stays serviceable afterwards
    store.sleepMs.set(0L)
    val t0 = System.nanoTime()
    store.update("X")(c => c.get.copy(revision = c.get.revision.map(_ + 100)))
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "key left wedged")
  }

  test("kinesis offset json round-trips shard names containing quotes and backslashes") {
    val cur = Map("shard\"A" -> 3L, "shard\\B" -> 7L, "plain-0" -> 0L)
    val off = KinesisStubOffset(cur)
    assert(KinesisStubOffset.parse(off.json()).cursors == cur,
      s"corrupted round-trip through ${off.json()}")
  }

  test("event-log replay source drives the batch twin of the pipeline") {
    val store = new InMemoryDocumentStore
    // events.props is {"k": N} JSON — no insert-story events, so the
    // pipeline must decode everything and tag nothing.
    TagPipeline.runBatch(
      WireSource.eventLogReplay(spark, "/root/testdata/sf0.001"),
      store, storeKey = "replay-test")
    assert(store.size == 0)
    // and the decode stage itself sees every event as well-formed JSON
    val decoded = EventDecoder.decode(
      WireSource.eventLogReplay(spark, "/root/testdata/sf0.001"))
    assert(decoded.count() == 1000)
    assert(decoded.filter(col("decode_error")).count() == 0)
    assert(decoded.filter(col("url").isNotNull).count() == 0)
  }

  test("streaming file-source replay: full decode pipeline throughput ≫ the reference's ~13 rec/s ceiling") {
    // the file source tails a directory; stage the single fixture file
    val dir = Files.createTempDirectory("replay-events-")
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.01/events.parquet"),
      dir.resolve("events.parquet"))
    val wire = WireSource.eventLogReplayStream(spark, dir.toString)
    assert(wire.isStreaming)
    val decoded = EventDecoder.decode(wire)
    val t0 = System.nanoTime()
    val q = decoded.writeStream.format("memory").queryName("replay_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val n = spark.table("replay_out").count()
    assert(n == 10000) // sf0.01 events, all decoded, none dropped
    val rate = n / secs
    info(f"streamed $n events in $secs%.1f s = $rate%.0f rec/s (reference envelope: ~13 rec/s)")
    assert(rate > 100, f"unexpectedly slow: $rate%.0f rec/s")
  }

  test("streaming tumbling agg == batch q39 expression on the same bounded data") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0 until 100).map(i =>
      Ev(i.toLong, t(i * 3), i % 7L, if (i % 2 == 0) "view" else "click", i.toDouble))
    val ms = MemoryStream[Ev]
    val q = StreamOps.tumblingCounts(ms.toDF(), "0 seconds").writeStream
      .format("memory").queryName("unify_out").outputMode("append").start()
    ms.addData(data: _*)
    q.processAllAvailable()
    // one more far-future row so every earlier window is past the watermark
    ms.addData(Ev(999, t(100000), 0, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("unify_out")
      .select(col("window.start").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = data.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("stream-static incremental dedup: corpus members and re-arrivals never pass") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq((100L, "existing doc alpha"), (101L, "existing doc beta"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = StreamOps.incrementalDedupStream(
        ms.toDF().toDF("doc_id", "text"), corpus).writeStream
      .format("memory").queryName("incdedup_out")
      .outputMode("append").start()
    ms.addData((1L, "fresh doc one"), (2L, "existing doc alpha"))
    q.processAllAvailable()
    // second micro-batch: an in-stream re-arrival and another corpus hit
    ms.addData((3L, "fresh doc one"), (4L, "existing doc beta"),
      (5L, "fresh doc two"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("incdedup_out")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // 2/4 are corpus dups (stream-static anti join); 3 is an in-stream
    // re-arrival of 1 (stateful dedup across micro-batches)
    assert(kept == Set(1L, 5L))
  }

  test("ingest-time erasure gate: deny-listed subjects never enter, the rest pass") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val deny = Seq(7L, 9L).toDF("user_id")
    val ms = MemoryStream[(Long, Long, String)]
    val q = StreamOps.erasureScrubStream(
        ms.toDF().toDF("event_id", "user_id", "event_type"), deny).writeStream
      .format("memory").queryName("erasure_out")
      .outputMode("append").start()
    ms.addData((1L, 7L, "view"), (2L, 8L, "view"), (3L, 9L, "buy"))
    q.processAllAvailable()
    // second micro-batch: a denied re-arrival and a fresh subject
    ms.addData((4L, 7L, "buy"), (5L, 10L, "view"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("erasure_out")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    // 1/3/4 belong to deny-listed users 7 and 9 — gone on ingest; the
    // bloom fast path (no join) carried 2 and 5 through untouched
    assert(out == Set(2L, 5L))
  }

  test("ingest-time erasure gate keeps NULL-keyed rows (exact anti-join parity)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val deny = Seq(7L).toDF("user_id")
    val ms = MemoryStream[(Long, Option[Long], String)]
    val q = StreamOps.erasureScrubStream(
        ms.toDF().toDF("event_id", "user_id", "event_type"), deny).writeStream
      .format("memory").queryName("erasure_null_out")
      .outputMode("append").start()
    ms.addData((1L, Some(7L), "view"), (2L, None, "view"), (3L, Some(8L), "buy"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("erasure_null_out")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    // a NULL user_id never equals a deny key, so the exact anti-join
    // keeps row 2 — the bloom-gated split must route the probe's NULL
    // verdict down the pass-through branch, not drop it from both
    // branches (the r9 advice's latent divergence)
    assert(out == Set(2L, 3L))
  }

  test("streaming chunk dedup == batch q97 kept set on doc-ordered arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val boiler = ("x" * 199) + "y"
    val docs = Seq(
      (1L, boiler + "tail one"),
      (2L, boiler + "tail two"),
      (3L, "short original"),
      (4L, boiler + "tail one")) // doc 4 clones doc 1 entirely
    val ms = MemoryStream[(Long, String)]
    val q = StreamOps.chunkDedupStream(
        ms.toDF().toDF("doc_id", "text")).writeStream
      .format("memory").queryName("chunk_dedup_out")
      .outputMode("append").start()
    // one micro-batch per doc: arrival order == (doc_id, chunk_id) order,
    // the replay/backfill case where the tiers must agree exactly
    docs.foreach { d => ms.addData(d); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("chunk_dedup_out")
      .select(col("doc_id"), col("chunk_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 2 keeps only its tail chunk (chunk_id 1); doc 4 keeps nothing
    assert(streamed == Set((1L, 0L), (1L, 1L), (2L, 1L), (3L, 0L)))
    val kept = graft.operators.Curation.chunkDedup(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // per-doc survivor counts agree between the tiers
    assert(streamed.groupBy(_._1).view.mapValues(_.size.toLong).toMap ==
      kept.filter(_._2 > 0))
  }

  test("streaming sliding agg == batch q40 expression on the same bounded data") {
    implicit val sqlCtx = spark.sqlContext
    // every event lands in 4 overlapping 1h/15min windows, so the twin
    // checks the overlap fan-out, not just windowing arithmetic
    val data = (0 until 100).map(i =>
      Ev(i.toLong, t(i * 3), i % 7L, if (i % 2 == 0) "view" else "click", i.toDouble))
    val ms = MemoryStream[Ev]
    val q = StreamOps.slidingCounts(ms.toDF(), "0 seconds").writeStream
      .format("memory").queryName("slide_out").outputMode("append").start()
    ms.addData(data: _*)
    q.processAllAvailable()
    // one more far-future row so every earlier window is past the watermark
    ms.addData(Ev(999, t(100000), 0, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("slide_out")
      .select(col("window.start").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = data.toDF()
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming sessionizer tags every event exactly like batch q125") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Sessionizer
    val evs = Tables(spark, Sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[Sessionizer.Ev].collect().sortBy(e => (e.us, e.event_id))
    val ms = MemoryStream[Sessionizer.Ev]
    val q = Sessionizer.tag(spark, ms.toDS()).writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    val half = evs.length / 2
    ms.addData(evs.take(half).toSeq); q.processAllAvailable()
    // redelivered tail of batch 1: high-water guard must emit nothing
    ms.addData(evs.slice(half - 5, half).toSeq); q.processAllAvailable()
    val mid = spark.table("sess_out").count()
    assert(mid == half, s"redelivery leaked ${mid - half} rows")
    ms.addData(evs.drop(half).toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_out")
      .select(col("event_id"), col("session_seq"), col("session_start"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = SparkEntry.queries("q125_session_ids")(spark, Sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batch)
  }

  test("streaming funnel state machine converges to the batch q107 report") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Funnel
    val evs = Tables(spark, Sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[Funnel.Ev].collect().sortBy(e => (e.us, e.event_id))
    val ms = MemoryStream[Funnel.Ev]
    val q = Funnel.advances(spark, ms.toDS()).writeStream
      .format("memory").queryName("funnel_out").outputMode("append").start()
    val third = evs.length / 3
    Seq(evs.take(third), evs.slice(third, 2 * third), evs.drop(2 * third))
      .foreach { b => ms.addData(b.toSeq); q.processAllAvailable() }
    // redeliver the whole first batch: the monotone state machine must
    // absorb it without emitting a single new advance
    val before = spark.table("funnel_out").count()
    ms.addData(evs.take(third).toSeq); q.processAllAvailable()
    assert(spark.table("funnel_out").count() == before, "redelivery must be silent")
    q.stop()
    // final stage per user (last advance) must equal the batch report
    val streamed = spark.table("funnel_out")
      .groupBy(col("user_id"))
      .agg(max(struct(col("stage"), col("view_us"), col("click_us"),
        col("purch_us"))).as("s"))
      .select(col("user_id"), col("s.*"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val batch = SparkEntry.queries("q107_funnel")(spark, Sf)
      .filter(col("stage") > 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(streamed == batch)
  }

  test("streaming transition pairs == batch q115 counts; late events drop, state stays O(1)/user") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Transitions
    // real fixture data, split across two micro-batches mid-stream
    val evs = Tables(spark, Sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"))
      .as[Transitions.Ev].collect().sortBy(_.event_id)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[Transitions.Ev]
    val q = Transitions.pairs(spark, ms.toDS()).writeStream
      .format("memory").queryName("trans_out").outputMode("append").start()
    ms.addData(b1.toSeq); q.processAllAvailable()
    // redeliver an already-consumed event: crosses the state's high-water
    // event_id, must emit nothing
    ms.addData(b1.last); q.processAllAvailable()
    ms.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("trans_out")
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = SparkEntry.queries("q115_transitions")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("streaming cross-dump near-dup == batch q144 rollup on the same split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the registered q144 split: md5('xdup:'||id) >= 'b3' is the new
    // batch, the rest is the static prior corpus
    val md = java.security.MessageDigest.getInstance("MD5")
    def isNew(id: Long): Boolean =
      md.digest(s"xdup:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2) >= "b3"
    val all = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (newRows, corpusRows) = all.partition(t => isNew(t._1))
    val corpus = corpusRows.toSeq.toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.crossDumpNearDupStream(
        ms.toDF().toDF("doc_id", "text"), corpus).writeStream
      .format("memory").queryName("xdup_out")
      .outputMode("append").start()
    val (b1, b2) = newRows.splitAt(newRows.length / 2)
    ms.addData(b1.toSeq); q.processAllAvailable()
    // redeliver the first batch: the pair-key state must emit nothing new
    ms.addData(b1.toSeq); q.processAllAvailable()
    ms.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("xdup_out")
      .groupBy(col("new_id"))
      .agg(count(lit(1)).as("n"), min(col("c_id")).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = SparkEntry.queries("q144_cross_dump_neardup")(spark, Sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch,
      s"stream/batch drift: only-stream=${streamed.keySet -- batch.keySet} " +
        s"only-batch=${batch.keySet -- streamed.keySet}")
    assert(streamed.nonEmpty, "fixture must flag at least one new doc")
  }

  test("streaming decontamination == batch q139 hit counts on the same split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the registered q139 split: md5('decon:'||id) >= 'e6' is the
    // benchmark, the rest stream in as arriving training vectors
    val md = java.security.MessageDigest.getInstance("MD5")
    def benchGate(id: Long): Boolean =
      md.digest(s"decon:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2) >= "e6"
    val all = Tables(spark, Sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (benchRows, trainRows) = all.partition(t => benchGate(t._1))
    val benchmark = benchRows.toSeq.toDF("vec_id", "embedding")
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.StreamOps.deconStream(
        ms.toDF().toDF("vec_id", "embedding"), benchmark).writeStream
      .format("memory").queryName("decon_out")
      .outputMode("append").start()
    // two micro-batches — the gate is stateless, so the split is free
    val (b1, b2) = trainRows.splitAt(trainRows.length / 2)
    ms.addData(b1.toSeq); q.processAllAvailable()
    ms.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("decon_out")
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = SparkEntry.queries("q139_semantic_decon")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      s"stream/batch drift: only-stream=${streamed.keySet -- batch.keySet} " +
        s"only-batch=${batch.keySet -- streamed.keySet}")
    assert(streamed.nonEmpty, "fixture must produce at least one hit")
  }

  test("streaming merge state == batch q223; out-of-order + replay absorbed; writer conflict loud") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Relational
    val dumps = Relational.mergeDumps(spark, Sf).map(_.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq)
    val ms = MemoryStream[(Long, Long, String, String)]
    val q = graft.streaming.StreamOps.mergeStateStream(
        ms.toDF().toDF("doc_id", "version", "op", "txt")).writeStream
      .format("memory").queryName("ms_out")
      .outputMode("update").start()
    // OUT OF ORDER: deliver v3 dumps before the v2 delta, then REPLAY
    // the base dump — both must be absorbed
    ms.addData(dumps(0)); q.processAllAvailable() // base v1
    ms.addData(dumps(2)); q.processAllAvailable() // v3 updates
    ms.addData(dumps(3)); q.processAllAvailable() // v3 births
    ms.addData(dumps(1)); q.processAllAvailable() // v2 delta — LATE
    ms.addData(dumps(0)); q.processAllAvailable() // replayed base
    q.stop()
    // latest emitted state per key == the batch compaction
    val emitted = spark.table("ms_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    val last = emitted.zipWithIndex.groupBy(_._1._1)
      .map { case (k, g) => k -> g.maxBy(_._2)._1 }
    val batch = SparkEntry.queries("q223_merge_compaction")(spark, Sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    assert(last == batch,
      "streamed merge state drifted from the batch compaction")
    // WRITER CONFLICT: same (key, version), different payload → loud
    val ms2 = MemoryStream[(Long, Long, String, String)]
    val q2 = graft.streaming.StreamOps.mergeStateStream(
        ms2.toDF().toDF("doc_id", "version", "op", "txt")).writeStream
      .format("memory").queryName("ms_conflict")
      .outputMode("update").start()
    ms2.addData(Seq((1L, 1L, "U", "writer one")))
    q2.processAllAvailable()
    ms2.addData(Seq((1L, 1L, "U", "writer two")))
    val e = intercept[Exception] { q2.processAllAvailable() }
    assert(e.getMessage != null || e.getCause != null)
    q2.stop()
    // SUPERSEDED-SLOT CONFLICT: state has advanced to v2, then a
    // conflicting duplicate for the SUPERSEDED v1 arrives — batch q223
    // raises on any double-claimed slot anywhere in history, and the
    // per-version digest ledger gives the stream side the same guard
    // (a same-payload v1 replay, by contrast, stays absorbed — checked
    // by the replayed-base-dump leg above)
    val ms3 = MemoryStream[(Long, Long, String, String)]
    val q3 = graft.streaming.StreamOps.mergeStateStream(
        ms3.toDF().toDF("doc_id", "version", "op", "txt")).writeStream
      .format("memory").queryName("ms_conflict_superseded")
      .outputMode("update").start()
    ms3.addData(Seq((1L, 1L, "U", "writer one"), (1L, 2L, "U", "newer")))
    q3.processAllAvailable()
    ms3.addData(Seq((1L, 1L, "U", "writer two claims old slot")))
    val e3 = intercept[Exception] { q3.processAllAvailable() }
    assert(e3.getMessage != null || e3.getCause != null)
    q3.stop()
  }

  test("q236 commit protocol: adversarial two-writer races, vacuum refusals, exactly-one-winner") {
    import spark.implicits._
    import graft.operators.{LostUpdateException, TableLog}
    def dump(ids: Seq[Long], tag: String)(v: Long) =
      ids.map(id => (id, v, "U", s"$tag $id")).toDF("doc_id", "version", "op", "txt")
    // --- RACE 1: same key, two threads, both based on the same snapshot.
    // EXACTLY one must win; the loser must get a LOUD LostUpdateException
    // (which one wins is scheduling — the pin is the invariant).
    val log1 = new TableLog
    log1.commit("loader", 0L, None, dump(Seq(1L, 2L, 3L), "base"))
    val base = log1.snapshotVersion
    val results = new java.util.concurrent.ConcurrentHashMap[String, Any]()
    val ths = Seq("w1", "w2").map { w =>
      new Thread(() => {
        try results.put(w, log1.commit(w, base, Some(Set(2L)), dump(Seq(2L), w)))
        catch { case e: LostUpdateException => results.put(w, e) }
      })
    }
    ths.foreach(_.start()); ths.foreach(_.join())
    val wins = results.values.asScala.collect { case v: Long => v }.toSeq
    val losses = results.values.asScala
      .collect { case e: LostUpdateException => e }.toSeq
    assert(wins.size == 1 && losses.size == 1,
      s"exactly one writer must win the slot, got wins=$wins losses=$losses")
    assert(wins.head == base + 1)
    assert(log1.snapshotVersion == base + 1)
    // the loser re-bases on the fresh snapshot and retries: now it sees
    // the winner's commit in its history and can decide — here it
    // surrenders the stale edit by NOT re-writing key 2 (app policy),
    // and a re-based disjoint commit succeeds
    val retried = log1.commit("loser-rebased", log1.snapshotVersion,
      Some(Set(9L)), dump(Seq(9L), "rebased"))
    assert(retried == base + 2)
    // --- RACE 2: disjoint keys, two threads — BOTH must commit (the
    // staging race resolves by internal retry-with-re-validation, never
    // an exception), with distinct consecutive versions.
    val log2 = new TableLog
    log2.commit("loader", 0L, None, dump(Seq(1L, 2L), "base"))
    val b2 = log2.snapshotVersion
    val r2 = new java.util.concurrent.ConcurrentHashMap[String, Any]()
    val ths2 = Seq(("a", 1L), ("b", 2L)).map { case (w, k) =>
      new Thread(() => {
        try r2.put(w, log2.commit(w, b2, Some(Set(k)), dump(Seq(k), w)))
        catch { case e: Throwable => r2.put(w, e) }
      })
    }
    ths2.foreach(_.start()); ths2.foreach(_.join())
    val vs = Seq("a", "b").map(r2.get(_))
    assert(vs.forall(_.isInstanceOf[Long]),
      s"disjoint writers must both commit, got $vs")
    assert(vs.map(_.asInstanceOf[Long]).sorted == Seq(b2 + 1, b2 + 2))
    // --- VACUUM refusals (the q228 ask): a vacuumed version must REFUSE,
    // not return partial rows; a writer based below the horizon refuses.
    val log3 = new TableLog
    log3.commit("loader", 0L, None, dump(Seq(1L), "v1"))
    log3.commit("w", 1L, Some(Set(1L)), dump(Seq(1L), "v2"))
    log3.commit("w", 2L, Some(Set(1L)), dump(Seq(1L), "v3"))
    val preVacuum = log3.readAsOf(3L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getString(3)))
    log3.vacuum(2L)
    intercept[IllegalArgumentException] { log3.readAsOf(1L) }
    intercept[IllegalArgumentException] {
      log3.commit("stale", 1L, Some(Set(5L)), dump(Seq(5L), "stale"))
    }
    // vacuum transparency at the boundary and above: AS OF 2 (the
    // checkpoint itself) and AS OF 3 (checkpoint + delta) both answer
    val post3 = log3.readAsOf(3L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getString(3)))
    assert(post3.toSeq == preVacuum.toSeq,
      "a checkpointed read must equal the full-history read")
    assert(log3.readAsOf(2L).collect().map(_.getLong(1)).toSeq == Seq(2L))
  }

  test("streaming commit sink: exactly-once versions per micro-batch; replay no-op; cross-writer conflicts loud") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{LostUpdateException, TableLog}
    val log = new TableLog
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamOps.commitStream(
      ms.toDF().toDF("doc_id", "op", "txt"), log, "t1").start()
    ms.addData(Seq((1L, "U", "a"), (2L, "U", "b"))); q.processAllAvailable()
    ms.addData(Seq((2L, "U", "b2"), (3L, "U", "c"))); q.processAllAvailable()
    q.stop()
    assert(log.snapshotVersion == 2L,
      "two micro-batches must land as exactly two versions")
    val state = log.readAsOf(2L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getString(3)))
      .toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(state(1L) == ((1L, true, md5("a"))))
    assert(state(2L) == ((2L, true, md5("b2"))), "latest-wins across batches")
    assert(state(3L) == ((2L, true, md5("c"))))
    // REPLAY: re-delivering batch 0 (restart semantics) returns its
    // original version and burns nothing
    val replay = Seq((1L, "U", "a"), (2L, "U", "b")).toDF("doc_id", "op", "txt")
    assert(log.commitBatch("t1", 0L, replay) == 1L)
    assert(log.snapshotVersion == 2L, "a replayed batch must not re-commit")
    // cross-writer conflict: a batch writer based on v1 touching the
    // stream's key 3 (committed at v2) must get the loud refusal...
    intercept[LostUpdateException] {
      log.commit("batchwriter", 1L, Some(Set(3L)),
        v => Seq((3L, v, "U", "steal")).toDF("doc_id", "version", "op", "txt"))
    }
    // ...and a disjoint batch writer coexists with the stream
    assert(log.commit("batchwriter", 1L, Some(Set(9L)),
      v => Seq((9L, v, "U", "ok")).toDF("doc_id", "version", "op", "txt")) == 3L)
  }

  test("streaming change feed: per-batch CDC through the commit protocol; applying the feed reproduces the to-version; replay emits nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{TableLog, Txn}
    val log = new TableLog
    val feeds = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(Long, String, Option[String], Option[String])])]
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamOps.changeFeedStream(
        ms.toDF().toDF("doc_id", "op", "txt"), log, "cf1") { df =>
      val rows = df.collect().map(r => (r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4)))).toSeq
      feeds += ((df.select(col("from_v")).head().getLong(0), rows))
    }.start()
    ms.addData(Seq((1L, "U", "a"), (2L, "U", "b"), (3L, "U", "c")))
    q.processAllAvailable()
    ms.addData(Seq((2L, "U", "b2"), (3L, "D", null), (4L, "U", "d")))
    q.processAllAvailable()
    q.stop()
    assert(log.snapshotVersion == 2L)
    assert(feeds.map(_._1).toSeq == Seq(0L, 1L),
      "one feed per committed version transition, tagged with its from-version")
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // batch 0: three inserts from nothing
    assert(feeds(0)._2.toSet == Set(
      (1L, "insert", None, Some(md5("a"))),
      (2L, "insert", None, Some(md5("b"))),
      (3L, "insert", None, Some(md5("c")))))
    // batch 1: update / delete / insert all classified
    assert(feeds(1)._2.toSet == Set(
      (2L, "update", Some(md5("b")), Some(md5("b2"))),
      (3L, "delete", Some(md5("c")), None),
      (4L, "insert", None, Some(md5("d")))))
    // batch == stream: the emitted v1->v2 feed equals the shared core's
    // diff of the same manifest versions
    val direct = Txn.feedBetween(log.readAsOf(1L), log.readAsOf(2L), 1L)
      .collect().map(r => (r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4)))).toSet
    assert(direct == feeds(1)._2.toSet)
    // THE CDC-CONSISTENCY LAW: applying the streamed feed to the
    // from-version state reproduces the to-version exactly
    def stateAt(v: Long): Map[Long, Option[String]] =
      log.readAsOf(v).collect().map(r => r.getLong(0) ->
        (if (r.getBoolean(2)) Some(r.getString(3)) else None)).toMap
    val applied = feeds(1)._2.foldLeft(stateAt(1L)) {
      case (st, (id, "delete", _, _))       => st.updated(id, None)
      case (st, (id, _, _, post))           => st.updated(id, post)
    }
    assert(applied == stateAt(2L),
      "applying the streamed feed must reproduce the to-version state")
    // REPLAY through the STREAM path: a restarted query re-delivers
    // batch 0 under the same runNs — the marker makes it a
    // version-preserving no-op and the feed emits NOTHING
    val nFeeds = feeds.size
    val ms2 = MemoryStream[(Long, String, String)]
    val q2 = graft.streaming.StreamOps.changeFeedStream(
        ms2.toDF().toDF("doc_id", "op", "txt"), log, "cf1") { df =>
      feeds += ((-1L, Seq.empty))
    }.start()
    ms2.addData(Seq((1L, "U", "a"), (2L, "U", "b"), (3L, "U", "c")))
    q2.processAllAvailable()
    q2.stop()
    assert(log.snapshotVersion == 2L, "replay must not burn a version")
    assert(feeds.size == nFeeds, "a replayed batch must emit nothing")
  }

  test("streaming boilerplate extract == batch q217 on the same pages (shared projection)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Warc
    val pages = Tables(spark, Sf, "documents")
      .filter(col("text").isNotNull).select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        Warc.richPageFor(r.getLong(0), r.getString(1) + Warc.NonAsciiProbe)))
      .toSeq
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.boilerplateExtractStream(
        ms.toDF().toDF("doc_id", "html")).writeStream
      .format("memory").queryName("bp_out")
      .outputMode("append").start()
    val (b1, b2) = pages.splitAt(pages.length / 2)
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bp_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    val batch = SparkEntry.queries("q217_boilerplate_extract")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(streamed == batch, "streamed extraction drifted from batch q217")
    assert(streamed.nonEmpty)
  }

  test("streaming WordPiece == batch q215 on the same docs (static two-sided vocab)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Tokenizer
    val docsDf = Tables(spark, Sf, "documents")
    val merges = Tokenizer.bpeTrain(Tokenizer.wordDict(spark, Sf))
    val inv = Tokenizer.vocabTable(spark, docsDf, merges)
      .orderBy("token_id").collect().map(_.getString(0)).toSeq
    val docs = docsDf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.wordpieceStream(
        ms.toDF().toDF("doc_id", "text"), inv, inv).writeStream
      .format("memory").queryName("wp_out")
      .outputMode("append").start()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))).toMap
    val streamed = keyed(spark.table("wp_out").collect())
    val batch = keyed(SparkEntry.queries("q215_wordpiece")(spark, Sf).collect())
    assert(streamed == batch, "streamed WordPiece drifted from batch q215")
    assert(streamed.nonEmpty)
  }

  test("streaming perceptual dedup: first image per dHash survives; re-renders collapse across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Multimodal
    val docIds = Tables(spark, Sf, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    val media = docIds.map(id => (id, Multimodal.encodeBmpDhash(id)))
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamOps.perceptualDedupStream(
        ms.toDF().toDF("doc_id", "media")).writeStream
      .format("memory").queryName("pd_out")
      .outputMode("append").start()
    val (b1, b2) = media.splitAt(media.length / 2)
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    // a replayed first batch must add NOTHING (hash state holds)
    ms.addData(b1); q.processAllAvailable()
    q.stop()
    val survivors = spark.table("pd_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expectation: one survivor per DISTINCT hash, and it is the first
    // arrival (ascending ids here) — recompute hashes via the batch path
    val hashes = Multimodal.perceptualHashes(spark,
      spark.createDataset(docIds)
        .map(id => Multimodal.MediaRow(id, Multimodal.encodeBmpDhash(id))))
      .collect().map(h => h.doc_id -> h.dhash).toMap
    val firstPerHash = docIds.groupBy(hashes).map { case (h, ids) =>
      ids.min -> h
    }
    assert(survivors == firstPerHash,
      "streaming dedup must keep exactly the first arrival per hash")
    assert(survivors.size < docIds.size,
      "fixture must actually collapse re-renders")
  }

  test("streaming near-dup gate: exact Hamming verdicts == greedy batch reference; TTL evicts state; bounded by signatures") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Multimodal
    val docIds = Tables(spark, Sf, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    val base = 1700000000000L // fixed epoch — deterministic event times
    val horizon = 3600L
    val hMs = horizon * 1000L
    def ts(ms: Long) = new java.sql.Timestamp(base + ms)
    val media = docIds.zipWithIndex.map { case (id, i) =>
      (id, Multimodal.encodeBmpDhash(id), ts(i * 1000L))
    }
    val ms0 = MemoryStream[(Long, Array[Byte], java.sql.Timestamp)]
    // the chained-stateful analyzer exemption is scoped to THIS start —
    // later stateful queries in the session keep the safety check
    val q = graft.streaming.StreamOps.allowChainedStateful(spark) {
      graft.streaming.StreamOps.perceptualNearDupGateStream(
          ms0.toDF().toDF("doc_id", "media", "ts"), horizon).writeStream
        .format("memory").queryName("ndgate_out")
        .outputMode("append").start()
    }
    def gateStateRows(): Long =
      q.lastProgress.stateOperators
        .find(_.operatorName.contains("flatMapGroupsWithState"))
        .map(_.numRowsTotal).getOrElse(-1L)
    // phase 1: the fixture arrives in doc_id order, all within one horizon
    val (b1, b2) = media.splitAt(media.length / 2)
    ms0.addData(b1); q.processAllAvailable()
    ms0.addData(b2); q.processAllAvailable()
    val stateLive = gateStateRows()
    // flush dummies (group-1 imagery, ids filtered out below) advance the
    // watermark past phase 1 + horizon so verdicts emit and TTL expires
    val g1doc = docIds(1)
    ms0.addData(Seq((999999L, Multimodal.encodeBmpDhash(g1doc), ts(2 * hMs))))
    q.processAllAvailable()
    ms0.addData(Seq((999998L, Multimodal.encodeBmpDhash(g1doc), ts(3 * hMs))))
    q.processAllAvailable()
    // TTL arm: a re-render of group 0 arrives long past the horizon —
    // its originals are evicted, so it must SURVIVE; its own immediate
    // re-render (1 s later, same batch) must be gated
    val g0doc = docIds.head
    ms0.addData(Seq(
      (200001L, Multimodal.encodeBmpDhash(g0doc), ts(3 * hMs + 2000L)),
      (200002L, Multimodal.encodeBmpDhash(g0doc), ts(3 * hMs + 3000L))))
    q.processAllAvailable()
    ms0.addData(Seq((999997L, Multimodal.encodeBmpDhash(g1doc), ts(6 * hMs))))
    q.processAllAvailable()
    val stateAfter = gateStateRows()
    q.stop()
    val all = spark.table("ndgate_out").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got = all.filter { case (id, _) => id < 200000L }
    // greedy batch reference: ascending arrival, near-dup iff ANY earlier
    // doc sits within Hamming <= 3 (exact, over full 64-bit hashes)
    val hashes = Multimodal.perceptualHashes(spark,
      spark.createDataset(docIds)
        .map(id => Multimodal.MediaRow(id, Multimodal.encodeBmpDhash(id))))
      .collect().map(h => h.doc_id -> h.dhash).toMap
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ref = docIds.map { id =>
      val h = hashes(id)
      val dup = seen.exists(p =>
        java.lang.Long.bitCount(p ^ h) <= Multimodal.DhashMaxHamming)
      seen += h
      id -> dup
    }.toMap
    assert(got == ref, "gate verdicts drifted from the greedy batch reference")
    assert(got.values.exists(identity) && got.values.exists(!_),
      "fixture must exercise both verdicts")
    // TTL: the post-horizon re-render survives, its immediate twin is gated
    assert(all.get(200001L) == Some(false),
      "originals past the horizon must be evicted (TTL)")
    assert(all.get(200002L) == Some(true),
      "an in-horizon re-render must still be gated")
    // state bound: one state row per live (band, value) bucket, never docs
    val nSig = hashes.values.toSet.size
    assert(stateLive > 0 && stateLive <= 4L * nSig,
      s"gate state ($stateLive rows) must be bounded by 4 x $nSig signatures")
    assert(stateAfter < stateLive,
      s"TTL must evict expired buckets (live=$stateLive after=$stateAfter)")
  }

  test("streaming BPE tokenize == batch q167 on the same docs (static merge table)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Tokenizer
    val merges = Tokenizer.bpeTrain(Tokenizer.wordDict(spark, Sf))
    val docs = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.bpeTokenizeStream(
        ms.toDF().toDF("doc_id", "text"), merges).writeStream
      .format("memory").queryName("bpe_out")
      .outputMode("append").start()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bpe_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q167_bpe_tokenize")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, "streamed tokenize drifted from batch q167")
    assert(streamed.nonEmpty)
  }

  test("streaming PQ encode == batch q170 codes (static codebooks)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Pq, Similarity}
    val books = Pq.trainedBooks(spark, Sf)
    val rows = Similarity.withQuantized(Tables(spark, Sf, "embeddings"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val ms = MemoryStream[(Long, Seq[Long])]
    val q = graft.streaming.StreamOps.pqEncodeStream(
        ms.toDF().toDF("vec_id", "qvec"), books).writeStream
      .format("memory").queryName("pq_out")
      .outputMode("append").start()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    ms.addData(b1.toSeq); q.processAllAvailable()
    ms.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (1 to Pq.SubSpaces).map(r.getLong).toSeq).toMap
    val streamed = keyed(spark.table("pq_out"))
    val batch = keyed(SparkEntry.queries("q170_pq_encode")(spark, Sf))
    assert(streamed == batch, "streamed PQ codes drifted from batch q170")
    assert(streamed.nonEmpty)
  }

  test("streaming decon + PQ encode on the planted-cluster fixture: planted semantics hold at ingest") {
    // r11 verdict item 9: the streaming twins were only ever asserted on
    // the near-uniform driver fixture, inheriting its recall blind spot.
    // On AnnFixture's planted clusters the twins' SEMANTICS are
    // checkable, not just stream≡batch equality: decon must flag
    // exactly the benchmark's cluster (cos≈1 in-cluster, ≈0.1 across),
    // and PQ codes must be stable across twin jitter.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Pq, Similarity}
    val fix = AnnFixture.planted(spark)
    val qrows = Similarity.withQuantized(fix)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    // --- decon twin: benchmark = the EVEN members of cluster 0 ---
    val benchIds = qrows.map(_._1)
      .filter(id => AnnFixture.clusterOf(id) == 0 && id % 2 == 0).toSet
    val fixRows = fix.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (benchRows, trainRows) = fixRows.partition(t => benchIds(t._1))
    val benchmark = benchRows.toSeq.toDF("vec_id", "embedding")
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.StreamOps.deconStream(
        ms.toDF().toDF("vec_id", "embedding"), benchmark).writeStream
      .format("memory").queryName("decon_fix_out")
      .outputMode("append").start()
    val (b1, b2) = trainRows.splitAt(trainRows.length / 2)
    ms.addData(b1.toSeq); q.processAllAvailable()
    ms.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val flagged = spark.table("decon_fix_out")
      .select(col("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    // planted truth: every cluster-0 train vector sits at cos≈1 to some
    // benchmark vector; every other cluster at cos≈0.1 < the 0.35 gate
    val expect = trainRows.map(_._1)
      .filter(id => AnnFixture.clusterOf(id) == 0).toSet
    assert(flagged == expect,
      s"decon on planted clusters: missed=${(expect -- flagged).size} " +
        s"spurious=${(flagged -- expect).size}")
    assert(expect.nonEmpty)
    // --- PQ-encode twin: codes stable across twin jitter ---
    val base = graft.CachePool.track(Similarity.withQuantized(fix))
    val books = (0 until Pq.SubSpaces).map(m => Pq.trainSub(base, m))
    val ms2 = MemoryStream[(Long, Seq[Long])]
    val q2 = graft.streaming.StreamOps.pqEncodeStream(
        ms2.toDF().toDF("vec_id", "qvec"), books).writeStream
      .format("memory").queryName("pq_fix_out")
      .outputMode("append").start()
    val (c1, c2) = qrows.splitAt(qrows.length / 2)
    ms2.addData(c1.toSeq); q2.processAllAvailable()
    ms2.addData(c2.toSeq); q2.processAllAvailable()
    q2.stop()
    val codes = spark.table("pq_fix_out").collect()
      .map(r => r.getLong(0) -> (1 to Pq.SubSpaces).map(r.getLong).toSeq)
      .toMap
    assert(codes.size == AnnFixture.N)
    val stablePairs = (0 until AnnFixture.N by 2).count(i =>
      codes(i.toLong) == codes(AnnFixture.twinOf(i.toLong)))
    val stability = stablePairs.toDouble / (AnnFixture.N / 2)
    info(f"twin code stability $stability%.3f")
    // measured 0.971 on the seeded fixture: twin jitter (±2 raw, ≤ ±1
    // after int8 quantization) crosses a codeword boundary for ~3% of
    // pairs — the Voronoi-edge residue any quantizer has
    assert(stability >= 0.95,
      f"PQ codes unstable across twin jitter: $stability%.3f < 0.95")
  }

  test("streaming dedup state: dump/retract changelog converges to q186's batch combine; severed keeper promotes live") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Dedup
    val docs = Tables(spark, Sf, "documents").filter(col("text").isNotNull)
    def gate(prefix: String) = substring(org.apache.spark.sql.functions.md5(
      concat(lit(prefix), col("doc_id").cast("string"))), 1, 2)
    val old = docs.filter(gate("ddump:") < "cd")
    val removed = old.filter(gate("dretract:") < "10")
    val delta = docs.filter(gate("ddump:") >= "cd")
    def updates(df: org.apache.spark.sql.DataFrame, w: Long) =
      df.select(sha2(col("text"), 256).as("h"), col("doc_id"), lit(w).as("w"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ms = MemoryStream[(String, Long, Long)]
    val q = graft.streaming.StreamOps.dedupStateStream(
        ms.toDF().toDF("h", "doc_id", "w")).writeStream
      .format("memory").queryName("dstate_out")
      .outputMode("update").start()
    // the dump lands, the retraction batch lands, the new dump lands —
    // three separate micro-batches, exactly the release point fix
    ms.addData(updates(old, 1L)); q.processAllAvailable()
    ms.addData(updates(removed, -1L)); q.processAllAvailable()
    ms.addData(updates(delta, 1L)); q.processAllAvailable()
    q.stop()
    // changelog materialization: last update per key (max ver), deletes
    // (tombstones) dropped
    val streamed = spark.table("dstate_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (h, rows) =>
        val last = rows.maxBy(_._4)
        (h, last._2, last._3)
      }.filter(_._3 > 0L).toSet
    val batch = Dedup.combineDedupState(Seq(
      (Dedup.dedupState(old), 1L), (Dedup.dedupState(removed), -1L),
      (Dedup.dedupState(delta), 1L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      "streaming dedup-state changelog drifted from the q186 batch combine")
    assert(removed.count() > 0L, "fixture retracts nothing")
  }

  test("raw-sink exactly-once ledger: a committed batchId is skipped wholesale, marker written after the data") {
    import spark.implicits._
    val store = new graft.streaming.InMemoryRawDocumentStore
    graft.streaming.InMemoryRawDocumentStore.register("raw-eo", store)
    val batch = Seq("A", "B").toDF("id")
    TagPipeline.enrichAndUpsertRaw("raw-eo", AutoTag,
      exactlyOnce = true, runNs = "ns1")(batch, 7L)
    assert(store.get("A").nonEmpty && store.get("B").nonEmpty)
    assert(store.get(TagPipeline.commitMarkerId("raw-eo", 7L, "ns1")).nonEmpty,
      "commit marker missing after the batch")
    val sizeAfter = store.size
    // the replayed batch (same batchId, same run) is skipped WHOLESALE —
    // even a tag change (a non-idempotent stand-in) leaves no trace
    TagPipeline.enrichAndUpsertRaw("raw-eo", Tag("other", "other"),
      exactlyOnce = true, runNs = "ns1")(batch, 7L)
    assert(store.size == sizeAfter)
    assert(!store.get("A").get.contains("other"),
      "replayed committed batch re-executed its effects")
    // a FRESH run namespace (new checkpoint dir) is not swallowed by the
    // stale marker (the r11 advisory case, raw tier)
    TagPipeline.enrichAndUpsertRaw("raw-eo", Tag("other", "other"),
      exactlyOnce = true, runNs = "ns2")(batch, 7L)
    assert(store.get("A").get.contains("other"))
  }

  test("streaming vocab + IVF state: point-fix changelogs converge to the q188/q192 batch combines") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Pq, Similarity, Tokenizer}
    // --- vocab frequencies: three signed token-partial batches ---
    val merges = Tokenizer.bpeTrain(Tokenizer.wordDict(spark, Sf))
    val docs = Tables(spark, Sf, "documents")
    def gateD(prefix: String) = substring(org.apache.spark.sql.functions.md5(
      concat(lit(prefix), col("doc_id").cast("string"))), 1, 2)
    val oldD = docs.filter(gateD("vdump:") < "cd")
    val remD = oldD.filter(gateD("vretract:") < "10")
    val newD = docs.filter(gateD("vdump:") >= "cd")
    def parts(df: org.apache.spark.sql.DataFrame, w: Long) =
      Tokenizer.tokenFreqPartials(df, merges)
        .select(col("token"), (col("freq") * w).as("freq"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val msV = MemoryStream[(String, Long)]
    val qv = graft.streaming.StreamOps.vocabFreqStream(
        msV.toDF().toDF("token", "freq")).writeStream
      .format("memory").queryName("vfreq_out").outputMode("complete").start()
    msV.addData(parts(oldD, 1L)); qv.processAllAvailable()
    msV.addData(parts(remD, -1L)); qv.processAllAvailable()
    msV.addData(parts(newD, 1L)); qv.processAllAvailable()
    qv.stop()
    val streamedV = spark.table("vfreq_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchV = Tokenizer.combineTokenFreq(Seq(
      (Tokenizer.tokenFreqPartials(oldD, merges), 1L),
      (Tokenizer.tokenFreqPartials(remD, merges), -1L),
      (Tokenizer.tokenFreqPartials(newD, merges), 1L)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamedV == batchV, "streaming vocab freqs drifted from q188's combine")

    // --- IVF inventory: three signed assignment batches ---
    val base = graft.CachePool.track(
      Similarity.withQuantized(Tables(spark, Sf, "embeddings")))
    val coarse = Pq.trainSlice(base, 1, Pq.SubSpaces * Pq.SubDim, Pq.CoarseK)
    val assigned = Pq.ivfAssign(base, coarse)
    def gateV(prefix: String) = substring(org.apache.spark.sql.functions.md5(
      concat(lit(prefix), col("vec_id").cast("string"))), 1, 2)
    val oldA = assigned.filter(gateV("idump:") < "cd")
    val remA = oldA.filter(gateV("iretract:") < "10")
    val newA = assigned.filter(gateV("idump:") >= "cd")
    def arows(df: org.apache.spark.sql.DataFrame, w: Long) =
      df.select(col("cell"), col("vec_id"), lit(w).as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val msI = MemoryStream[(Long, Long, Long)]
    val qi = graft.streaming.StreamOps.ivfStateStream(
        msI.toDF().toDF("cell", "vec_id", "w")).writeStream
      .format("memory").queryName("ivfst_out").outputMode("update").start()
    msI.addData(arows(oldA, 1L)); qi.processAllAvailable()
    msI.addData(arows(remA, -1L)); qi.processAllAvailable()
    msI.addData(arows(newA, 1L)); qi.processAllAvailable()
    qi.stop()
    val streamedI = spark.table("ivfst_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(_._1).map { case (c, rows) =>
        val last = rows.maxBy(_._5)
        (c, last._2, last._3, last._4)
      }.filter(_._2 > 0L).toSet
    val batchI = Pq.combineIvfState(Seq(
      (oldA, 1L), (remA, -1L), (newA, 1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamedI == batchI, "streaming IVF inventory drifted from q192's combine")
  }

  test("streaming count-min: live sketch converges to the batch q199 cells across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables(spark, Sf, "documents")
    val toks = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .collect().map(_.getString(0))
    val ms = MemoryStream[String]
    val q = graft.streaming.StreamOps.countMinStream(
        ms.toDF().toDF("token")).writeStream
      .format("memory").queryName("cm_out").outputMode("complete").start()
    // three arrival waves — cell counts are a commutative monoid, so
    // the running sketch must land exactly on the batch construction
    val third = toks.length / 3
    ms.addData(toks.take(third).toSeq); q.processAllAvailable()
    ms.addData(toks.slice(third, 2 * third).toSeq); q.processAllAvailable()
    ms.addData(toks.drop(2 * third).toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cm_out")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.Aggregates.cmCells(docs)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, "live count-min sketch drifted from the batch cells")
    assert(batch.size <= 4 * 64, "sketch state exceeded d*w cells")
  }

  test("streaming KMV: live synopsis converges to the batch q203 sketch; re-delivery is free (idempotence)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Sketches
    val docs = Tables(spark, Sf, "documents")
    val hs = Sketches.tokenStream(docs)
      .select(Sketches.h60(col("token")).as("h"))
      .collect().map(_.getLong(0))
    val ms = MemoryStream[Long]
    val q = graft.streaming.StreamOps.kmvStream(
        ms.toDF().toDF("h")).writeStream
      .format("memory").queryName("kmv_out").outputMode("complete").start()
    val third = hs.length / 3
    ms.addData(hs.take(third).toSeq); q.processAllAvailable()
    ms.addData(hs.slice(third, 2 * third).toSeq); q.processAllAvailable()
    // re-deliver wave 2 wholesale: min-k over a SET is idempotent, so
    // the producer-retry case costs nothing and changes nothing
    ms.addData(hs.slice(third, 2 * third).toSeq); q.processAllAvailable()
    ms.addData(hs.drop(2 * third).toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kmv_out").collect()
      .map(_.getSeq[Long](0)).head
    val batch = Sketches.kmvSynopsis(
        Sketches.tokenStream(docs).select(Sketches.h60(col("token")).as("h")))
      .collect().map(_.getSeq[Long](0)).head
    assert(streamed == batch, "live KMV synopsis drifted from the batch sketch")
    assert(batch.length <= 128 && batch == batch.distinct.sorted,
      "synopsis must be the k smallest DISTINCT hashes, ascending")
  }

  test("streaming EWMA: live per-user monitor converges to the batch q206 fold across in-order waves") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Tables(spark, Sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._2, t._3)) // the per-key in-order arrival contract
    val ms = MemoryStream[(Long, Long, Long, Double)]
    val q = graft.streaming.StreamOps.ewmaStream(
        ms.toDF().toDF("user_id", "usl", "event_id", "value")
          .select(col("user_id"), timestamp_micros(col("usl")).as("ts"),
            col("event_id"), col("value"))).writeStream
      .format("memory").queryName("ewma_out").outputMode("update").start()
    val third = ev.length / 3
    ms.addData(ev.take(third).toSeq); q.processAllAvailable()
    ms.addData(ev.slice(third, 2 * third).toSeq); q.processAllAvailable()
    ms.addData(ev.drop(2 * third).toSeq); q.processAllAvailable()
    q.stop()
    // update mode: last row per user is the live state
    val streamed = spark.table("ewma_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
    val batch = SparkEntry.queries("q206_ewma_anomaly")(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(streamed.toMap == batch,
      "live EWMA state drifted from the batch fold")
  }

  test("streaming HLL: live registers converge to the batch q207 build; re-delivery is free") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Sketches
    val hs = Sketches.tokenStream(Tables(spark, Sf, "documents"))
      .select(Sketches.salted60("hll:", col("token")).as("h"))
      .collect().map(_.getLong(0))
    val ms = MemoryStream[Long]
    val q = graft.streaming.StreamOps.hllStream(
        ms.toDF().toDF("h")).writeStream
      .format("memory").queryName("hll_out").outputMode("complete").start()
    val half = hs.length / 2
    ms.addData(hs.take(half).toSeq); q.processAllAvailable()
    ms.addData(hs.take(half).toSeq); q.processAllAvailable() // idempotent
    ms.addData(hs.drop(half).toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Sketches.hllRegisters(
        Sketches.tokenStream(Tables(spark, Sf, "documents"))
          .select(Sketches.salted60("hll:", col("token")).as("h")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, "live HLL registers drifted from the batch build")
    assert(batch.size <= 256, "register state exceeded m")
  }

  test("streaming manifest: running per-source checksums converge to the batch q183 rollup") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)).orNull, r.getString(2)))
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamOps.manifestStream(
        ms.toDF().toDF("doc_id", "text", "source")).writeStream
      .format("memory").queryName("manifest_out")
      .outputMode("complete").start()
    val (b1, b2) = all.splitAt(all.length / 2)
    ms.addData(b1.toSeq); q.processAllAvailable()
    ms.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("manifest_out")
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    val batch = SparkEntry.queries("q183_corpus_manifest")(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(streamed == batch,
      "streaming running manifest drifted from batch q183")
  }

  test("streaming NFC normalization: ingest-time compose is batch-equal, stateless") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // decomposed forms arriving on the stream compose exactly as the
    // batch expression would — per-row equality incl. a mixed batch.
    // Inputs spelled with escapes (decomposed) so no editor can
    // silently re-normalize the source file.
    val rows = Seq((1L, "cafe\u0301 latte"), (2L, "plain ascii"),
      (3L, "nai\u0308ve mix cafe\u0301"))
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.nfcNormalizeStream(
        ms.toDF().toDF("doc_id", "text")).writeStream
      .format("memory").queryName("nfc_out")
      .outputMode("append").start()
    ms.addData(rows); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("nfc_out")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = rows.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextOps.nfc(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch, "stream/batch NFC drift")
    assert(streamed(1L) == "caf\u00e9 latte" &&
      streamed(3L) == "na\u00efve mix caf\u00e9",
      s"decomposed input did not compose: $streamed")
  }

  test("streaming WARC ingest: per-file parse is batch-equal, malformed dump fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Warc
    val fileA = Warc.build(Seq((1L, "alpha beta"), (2L, "gamma")))
    // fileB carries multi-byte UTF-8 (2- and 3-byte widths) — the
    // octet-counted format must round-trip it on the stream path too
    val fileB = Warc.build(Seq((5L, "delta epsilon zeta"),
      (6L, "naïve 東京 ✓ résumé")))
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamOps.warcExtractStream(
        ms.toDF().toDF("file_id", "content")).writeStream
      .format("memory").queryName("warc_out")
      .outputMode("append").start()
    ms.addData((10L, fileA)); q.processAllAvailable()
    ms.addData((11L, fileB)); q.processAllAvailable()
    q.stop()
    val rows = spark.table("warc_out")
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(rows == Map(1L -> "alpha beta", 2L -> "gamma",
      5L -> "delta epsilon zeta", 6L -> "naïve 東京 ✓ résumé"),
      s"extracted drift: $rows")
    // a truncated dump must surface as a query failure, not silence
    val ms2 = MemoryStream[(Long, Array[Byte])]
    val q2 = graft.streaming.StreamOps.warcExtractStream(
        ms2.toDF().toDF("file_id", "content")).writeStream
      .format("memory").queryName("warc_bad_out")
      .outputMode("append").start()
    ms2.addData((12L, java.util.Arrays.copyOfRange(fileA, 0, fileA.length - 5)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(e.getMessage != null)
  }

  test("streaming clustered ingest: prunable mid-stream with the batch core; batch == stream results; replay appends nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Footer
    // three micro-batches of documents rows (the stream's arrival order
    // deliberately interleaves the cluster key across batches)
    val all = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .as[(Long, String, String, Long)].collect().toSeq
    val batches = all.grouped((all.size + 2) / 3).toSeq
    val table = new StreamOps.ClusteredTable
    val ms = MemoryStream[(Long, String, String, Long)]
    val q = StreamOps.clusteredIngestStream(
      ms.toDF().toDF("doc_id", "source", "lang", "n_chars"),
      table, "ci1").start()
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    assert(table.units.nonEmpty)
    val preds = Seq(
      ("nchars_100_199",
        (u: Footer.UnitStats) => u.lo("n_chars") <= 199L && u.hi("n_chars") >= 100L,
        col("n_chars").between(100L, 199L)),
      ("docid_100_149",
        (u: Footer.UnitStats) => u.lo("doc_id") <= 149L && u.hi("doc_id") >= 100L,
        col("doc_id").between(100L, 149L)))
    val hashCols = Seq("doc_id", "source", "lang", "n_chars")
    // 1. the ACCUMULATED table prunes with the exact batch core — the
    // in-plan xor proof runs here, so a false skip would raise
    val streamed = Footer.executePruned(spark, "ingest", table.units,
      hashCols, preds).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // the cluster-key predicate skips units even on batch-local runs
    val (gTot, gRead, rowsRead, nMatch, _) = streamed("nchars_100_199")
    assert(gRead < gTot, s"mid-stream pruning must skip units ($gRead/$gTot)")
    assert(nMatch == all.count(r => r._4 >= 100L && r._4 <= 199L).toLong)
    assert(rowsRead < all.size.toLong, "rows_read must undercut a full scan")
    // 2. BATCH == STREAM on query RESULTS: the same rows ingested as one
    // batch give identical (n_match, match_xor) per predicate (unit
    // geometry differs — per-batch runs vs one global run — results must
    // not)
    val oneShot = Footer.writeUnits(
      all.toDF("doc_id", "source", "lang", "n_chars"),
      Seq(col("n_chars"), col("doc_id")), "ci1_oneshot",
      Footer.adaptiveUnitRows(all.size.toLong))
    val direct = Footer.executePruned(spark, "ingest", oneShot,
      hashCols, preds).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    for ((p, (_, _, _, nm, xr)) <- streamed)
      assert(direct(p) == ((nm, xr)), s"$p: stream results must equal batch")
    // 3. REPLAY: a restarted query re-delivers batch 0 under the same
    // runNs — the manifest must not grow and results must not change
    val before = table.units.size
    val ms2 = MemoryStream[(Long, String, String, Long)]
    val q2 = StreamOps.clusteredIngestStream(
      ms2.toDF().toDF("doc_id", "source", "lang", "n_chars"),
      table, "ci1").start()
    ms2.addData(batches.head); q2.processAllAvailable(); q2.stop()
    assert(table.units.size == before, "a replayed batch must append nothing")
    val replayed = Footer.executePruned(spark, "ingest", table.units,
      hashCols, preds).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    for ((p, (_, _, _, nm, xr)) <- streamed)
      assert(replayed(p) == ((nm, xr)), s"$p: replay must not change results")
  }

  test("clustered ingest OPTIMIZE trigger: fragmentation detected from the manifest alone, distributed rewrite inside the commit protocol, pruned-read improves, replay safe") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Footer
    // q261's exact fragmentation fixture as a STREAM: 8 batches keyed
    // doc_id mod 8, each one a single full-range sort run — every range
    // predicate opens every unit, the q261 units_read measure reads 1.0
    val all = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .as[(Long, String, String, Long)].collect().toSeq
    val batches = (0L until 8L).map(b => all.filter(_._1 % 8L == b))
    def ingest(runNs: String, factor: Double): StreamOps.ClusteredTable = {
      val table = new StreamOps.ClusteredTable
      val ms = MemoryStream[(Long, String, String, Long)]
      val q = StreamOps.clusteredIngestStream(
        ms.toDF().toDF("doc_id", "source", "lang", "n_chars"),
        table, runNs, optimizeFactor = factor).start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      table
    }
    // CONTROL: no trigger — the accumulated runs stay fully fragmented
    val control = ingest("opt_ctl", 0.0)
    assert(control.optimizeCount == 0L)
    assert(math.abs(control.workloadReadFraction - 1.0) < 1e-9,
      s"fixture premise: untreated ingest must read every unit " +
        s"(${control.workloadReadFraction})")
    // TRIGGERED: the q261 measure crosses 0.9 → OPTIMIZE fires inside
    // the commit protocol and the read fraction drops
    val table = ingest("opt_on", 0.9)
    assert(table.optimizeCount >= 1L,
      "the units_read regression must have triggered OPTIMIZE")
    assert(table.workloadReadFraction < control.workloadReadFraction - 1e-9,
      s"OPTIMIZE must improve the workload read fraction " +
        s"(${table.workloadReadFraction} vs ${control.workloadReadFraction})")
    // RESULTS unchanged by the rewrite: the optimized table's match
    // legs equal the control's under the xor-proven scan
    val preds = Footer.OptimizePredicates.map { case (name, lo, hi) =>
      (name,
        (u: Footer.UnitStats) => u.lo("n_chars") <= hi && u.hi("n_chars") >= lo,
        col("n_chars").between(lo, hi))
    }
    val hashCols = Seq("doc_id", "source", "lang", "n_chars")
    def legs(t: StreamOps.ClusteredTable) =
      Footer.executePruned(spark, "optstream", t.units, hashCols, preds)
        .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5)))
        .toMap
    assert(legs(table) == legs(control),
      "OPTIMIZE must not change query results")
    // REPLAY SAFETY across the rewrite: re-delivering an old batch
    // appends nothing and re-delivering the trigger batch re-optimizes
    // nothing (both marker-guarded)
    val unitsBefore = table.units
    val optBefore = table.optimizeCount
    val ms2 = MemoryStream[(Long, String, String, Long)]
    val q2 = StreamOps.clusteredIngestStream(
      ms2.toDF().toDF("doc_id", "source", "lang", "n_chars"),
      table, "opt_on", optimizeFactor = 0.9).start()
    ms2.addData(batches.head); q2.processAllAvailable(); q2.stop()
    assert(table.units == unitsBefore && table.optimizeCount == optBefore,
      "replay across the rewrite must be a complete no-op")
  }

  test("maybeOptimize merges units appended between snapshot and swap; a concurrent rewrite aborts it (r15 ADVICE)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Footer
    val docs = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    def unitsOf(tag: String, m: Long, r: Long) = {
      val df = docs.filter(col("doc_id") % m === r)
      Footer.writeUnits(df, Seq(col("n_chars"), col("doc_id")), tag,
        Footer.adaptiveUnitRows(df.count()))
    }
    // LOST-APPEND direction: a batch lands after the optimize snapshots
    // `units` but before it swaps — made deterministic via the test seam
    val t1 = new StreamOps.ClusteredTable
    assert(t1.append("race", 0L, unitsOf("race_b0", 2L, 0L)))
    assert(t1.append("race", 1L, unitsOf("race_b1", 2L, 1L)))
    val late = unitsOf("race_late", 97L, 0L)
    t1.preSwapHook = () => { t1.append("race", 2L, late); () }
    assert(t1.maybeOptimize(spark, "race", 2L, 0.1),
      "the optimize must land (prefix intact — only an append raced it)")
    t1.preSwapHook = () => ()
    assert(late.forall(t1.units.contains),
      "units appended between snapshot and swap were silently dropped")
    assert(t1.optimizeCount == 1L)
    assert(t1.units.takeRight(late.size) == late,
      "the raced append must survive as the manifest's suffix")
    // STALE-PREFIX direction: a concurrent REWRITE swapped the manifest
    // while ours ran — ours must abandon, not clobber the newer layout
    val t2 = new StreamOps.ClusteredTable
    assert(t2.append("race2", 0L, unitsOf("race2_b0", 2L, 0L)))
    assert(t2.append("race2", 1L, unitsOf("race2_b1", 2L, 1L)))
    val winner = unitsOf("race2_winner", 1L, 0L)
    t2.preSwapHook = () => { t2.units = winner }
    assert(!t2.maybeOptimize(spark, "race2", 2L, 0.1),
      "a stale optimize must report failure, not clobber the newer manifest")
    t2.preSwapHook = () => ()
    assert(t2.units == winner && t2.optimizeCount == 0L,
      "the concurrent rewrite's manifest must survive untouched")
  }

  test("house streaming ingest: per-batch units are house bytes (blooms + created_by); pruned results identical to the parquet-emitter twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Footer
    val all = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .as[(Long, String, String, Long)].collect().toSeq
    val batches = (0L until 4L).map(b => all.filter(_._1 % 4L == b))
    def ingest(runNs: String, house: Boolean): StreamOps.ClusteredTable = {
      val table = new StreamOps.ClusteredTable
      val ms = MemoryStream[(Long, String, String, Long)]
      val q = StreamOps.clusteredIngestStream(
        ms.toDF().toDF("doc_id", "source", "lang", "n_chars"),
        table, runNs, house = house).start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      table
    }
    val houseT = ingest("hstream", house = true)
    val parqT = ingest("pstream", house = false)
    assert(houseT.units.nonEmpty && houseT.units.size == parqT.units.size)
    // every streamed unit is a complete HOUSE file carrying a doc_id
    // bloom — no parquet-mr anywhere on the streaming engine path
    houseT.units.foreach { u =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(u.path))
      assert(new String(bytes, "ISO-8859-1").contains("graft-house"),
        s"${u.path} was not written by the house kernel")
      val (leaves, chunks) = Footer.parseFooter(u.path)
      val li = leaves.indexWhere(_.name == "doc_id")
      assert(chunks(li).forall(_.bloomOffset >= 0),
        s"${u.path} is missing its doc_id SBBF bloom")
    }
    // the pruned, xor-proven read is emitter-agnostic: identical match
    // legs across the house and parquet-mr streamed tables
    val preds = Footer.OptimizePredicates.map { case (name, lo, hi) =>
      (name,
        (u: Footer.UnitStats) => u.lo("n_chars") <= hi && u.hi("n_chars") >= lo,
        col("n_chars").between(lo, hi))
    }
    val hashCols = Seq("doc_id", "source", "lang", "n_chars")
    def legs(t: StreamOps.ClusteredTable) =
      Footer.executePruned(spark, "hstream", t.units, hashCols, preds)
        .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5)))
        .toMap
    assert(legs(houseT) == legs(parqT),
      "house and parquet streaming emitters must produce identical reads")
  }
}

object StreamingSpec {
  case class Wire(data: Array[Byte], shard: String, ts: Timestamp)
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
}
