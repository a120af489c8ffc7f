package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{Codec, TagOps}
import graft.streaming.{DocumentStore, EventDecoder}
import graft.streaming.AnsModel._

/** Pins the FIXED reference semantics (FIXTURES.md §B "required unit-fixture
  * cases"; SURVEY.md §5 rule 2). Each test cites the reference behavior it
  * preserves — or the reference bug it deliberately does not.
  */
class ReferenceSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def gz(s: String): Array[Byte] = Codec.gzipBytes(s.getBytes(UTF_8))

  private def wire(rows: (Array[Byte], String)*) =
    rows.zipWithIndex.map { case ((data, shard), i) =>
      (data, shard, new Timestamp(1700000000000L + i * 1000))
    }.toDF("data", "shard", "ts")

  val fullEvent: String =
    """{"id":"ABC","operation":"insert-story","created":true,"type":"story",
      |"published":true,"trigger":{"referent_update":true},
      |"body":{"headlines":{"basic":"hello"},"revision":7}}""".stripMargin

  test("1. null trigger → null projection, no error (app.py:64 guard)") {
    val noTrigger =
      """{"id":"X","operation":"insert-story","published":true,
        |"body":{"headlines":{"basic":"h"},"revision":1}}""".stripMargin
    val out = EventDecoder.decode(wire(gz(noTrigger) -> "s1")).collect().head
    assert(out.getAs[String]("id") == "X")
    assert(out.getAs[Any]("referent_update") == null)
    assert(out.getAs[String]("headline") == "h")
  }

  test("2. non-JSON payload → {url} fallback row (app.py:43-46)") {
    val s3url = "https://bucket.example/big-payload.json"
    val out = EventDecoder.decode(wire(gz(s3url) -> "s1")).collect().head
    assert(out.getAs[String]("url") == s3url)
    assert(out.getAs[String]("id") == null)
    assert(!out.getAs[Boolean]("decode_error"))
  }

  test("3. corrupt gzip → row preserved with decode_error marker (app.py:37-38)") {
    val out = EventDecoder.decode(
      wire("not gzip at all".getBytes(UTF_8) -> "s1", gz(fullEvent) -> "s2"))
      .orderBy("shard_origination").collect()
    assert(out.length == 2) // no row lost
    assert(out(0).getAs[Boolean]("decode_error"))
    assert(out(0).getAs[String]("id") == null)
    assert(!out(1).getAs[Boolean]("decode_error"))
    assert(out(1).getAs[String]("id") == "ABC")
  }

  test("4+5. missing taxonomy / missing tags initialize to [tag] (intent of tag.py:33-35,41-42, NOT the KeyError bug)") {
    val noTax = AnsDoc("d1", Some(1L), None)
    val noTags = AnsDoc("d2", Some(1L), Some(Taxonomy(None)))
    assert(DocumentStore.modifyAns(noTax, AutoTag)
      .taxonomy.get.tags.get == Seq(AutoTag))
    assert(DocumentStore.modifyAns(noTags, AutoTag)
      .taxonomy.get.tags.get == Seq(AutoTag))
  }

  test("6. tag already present → unchanged; apply-twice == apply-once (tag.py:39-40)") {
    val doc = AnsDoc("d", None, Some(Taxonomy(Some(Seq(Tag("other", "other"), AutoTag)))))
    assert(DocumentStore.modifyAns(doc, AutoTag) eq doc)
    val once = DocumentStore.modifyAns(AnsDoc("e", None, None), AutoTag)
    assert(DocumentStore.modifyAns(once, AutoTag) == once)
  }

  test("6b. column-level appendIfAbsent: idempotent, order-preserving, null-initializing") {
    val df = Seq(
      (1L, Seq("b", "a")),        // absent → appended at end, order kept
      (2L, Seq("x", "t", "x")),   // present → unchanged incl. duplicates
      (3L, null)                  // null → [tag]
    ).toDF("id", "tags")
    val once = df.select(col("id"), TagOps.appendIfAbsent(col("tags"), lit("t")).as("tags"))
    val twice = once.select(col("id"), TagOps.appendIfAbsent(col("tags"), lit("t")).as("tags"))
    val got = twice.orderBy("id").collect().map(_.getSeq[String](1))
    assert(got(0) == Seq("b", "a", "t"))
    assert(got(1) == Seq("x", "t", "x"))
    assert(got(2) == Seq("t"))
    assert(once.orderBy("id").collect().map(_.getSeq[String](1)).toSeq ==
      got.toSeq) // idempotence
  }

  test("7. filter keeps only operation='insert-story' AND published (README.md:230, not the app.py:56 debug id)") {
    val rows = Seq(
      """{"id":"keep","operation":"insert-story","published":true}""",
      """{"id":"unpub","operation":"insert-story","published":false}""",
      """{"id":"update","operation":"update-story","published":true}""",
      """{"id":"nofields"}""")
    val out = EventDecoder.decodeAndFilter(
      wire(rows.map(r => gz(r) -> "s"): _*)).collect()
    assert(out.map(_.getAs[String]("id")).toSeq == Seq("keep"))
  }

  test("7b. first-publish filter narrows to created==true; absent created drops, not errors (app.py:51-54)") {
    val rows = Seq(
      """{"id":"first","operation":"insert-story","published":true,"created":true}""",
      """{"id":"repub","operation":"insert-story","published":true,"created":false}""",
      """{"id":"nocreated","operation":"insert-story","published":true}""",
      """{"id":"unpub","operation":"insert-story","published":false,"created":true}""")
    val decoded = EventDecoder.decode(wire(rows.map(r => gz(r) -> "s"): _*))
    val kept = decoded.filter(EventDecoder.firstPublishFilter(
      col("operation"), col("published"), col("created"))).collect()
    assert(kept.map(_.getAs[String]("id")).toSeq == Seq("first"))
    // and it is a strict subset of the documented filter
    val documented = decoded.filter(EventDecoder.documentedFilter(
      col("operation"), col("published"))).collect()
    assert(documented.map(_.getAs[String]("id")).toSet ==
      Set("first", "repub", "nocreated"))
  }

  /** Asserts `after` is `before` with exactly ONE contiguous edit and
    * returns (removed, inserted) — the byte-level-preservation pin:
    * every byte outside the single edit region is identical. A pure
    * insertion removes ""; the only other removal the splice contract
    * permits is the understood "null" token.
    */
  private def singleSplice(before: String, after: String): (String, String) = {
    var p = 0
    while (p < before.length && p < after.length &&
      before.charAt(p) == after.charAt(p)) p += 1
    var s = 0
    while (s < before.length - p && s < after.length - p &&
      before.charAt(before.length - 1 - s) == after.charAt(after.length - 1 - s))
      s += 1
    val removed = before.substring(p, before.length - s)
    assert(removed.isEmpty || removed == "null",
      s"bytes outside the understood subtree changed: removed '$removed'")
    (removed, after.substring(p, after.length - s))
  }

  test("8. schema drift: unknown nested fields survive decode → tag-append → serialize BYTE-identical (tag.py:64)") {
    import graft.streaming.RawAns
    // the store document carries nested fields this library has never
    // heard of — including decoy braces/brackets and the word
    // "taxonomy" inside string values, and a non-ASCII subtree
    val stored =
      """{"_id":"ABC","weird":{"deep":[1,2,{"x":"tax\"onomy }]{"}],"u":"π café"},""" +
        """"taxonomy":{"version":7,"tags":[{"slug":"other","text":"o"}]},"later":null}"""
    // the full chain: wire event decodes (the READ side probes only
    // declared fields), its id addresses the stored doc, the WRITE side
    // splices the raw text
    val ev = EventDecoder.decode(wire(gz(fullEvent) -> "s1")).collect().head
    assert(ev.getAs[String]("id") == "ABC")
    val tagged = RawAns.appendTagIfAbsent(stored, AutoTag)
    val (rem, ins) = singleSplice(stored, tagged)
    assert(rem.isEmpty && ins == "," + RawAns.tagJson(AutoTag),
      s"insertion is not the canonical tag: $ins")
    // idempotent, and the second apply returns the SAME string object
    assert(RawAns.appendTagIfAbsent(tagged, AutoTag) eq tagged)
    // a slug spelled with \u escapes still counts as present (the
    // document's author may escape anything; comparison is unescaped)
    val escaped = "{\"_id\":\"E\",\"taxonomy\":{\"tags\":[" +
      "{\"slug\":\"kinesis-autota\\u0067\",\"text\":\"t\"}]}}"
    assert(RawAns.appendTagIfAbsent(escaped, AutoTag) eq escaped)
    // a "taxonomy" nested in another subtree is opaque bytes: the real
    // taxonomy is created at top level, body untouched
    val decoy = """{"_id":"D","body":{"taxonomy":{"tags":[]}},"n":1}"""
    val taggedDecoy = RawAns.appendTagIfAbsent(decoy, AutoTag)
    assert(singleSplice(decoy, taggedDecoy)._2 ==
      ",\"taxonomy\":{\"tags\":[" + RawAns.tagJson(AutoTag) + "]}")
    // all remaining splice arms stay single-edit byte-preserving
    for (doc <- Seq(
        """{"_id":"A"}""",                                // no taxonomy
        """{"_id":"A","taxonomy":{}}""",                  // empty taxonomy
        """{"_id":"A","taxonomy":{"v":1}}""",             // taxonomy, no tags
        """{"_id":"A","taxonomy":{"tags":[]}}""",         // empty tags
        """{"_id":"A","taxonomy":null}""",                // null taxonomy
        """{"_id":"A","taxonomy":{"tags":null}}""",       // null tags
        """{ "_id" : "A" , "taxonomy" : { "tags" : [ ] } }""")) { // whitespace
      val out = RawAns.appendTagIfAbsent(doc, AutoTag)
      val spliced = singleSplice(doc, out)._2
      assert(spliced.contains(AutoTag.slug), s"no tag spliced into $doc")
      assert(RawAns.appendTagIfAbsent(out, AutoTag) eq out,
        s"not idempotent on $doc")
    }
    // structure the tagger does not understand refuses loudly rather
    // than silently destroying it
    intercept[IllegalArgumentException] {
      RawAns.appendTagIfAbsent("""{"taxonomy":{"tags":"oops"}}""", AutoTag)
    }
    intercept[IllegalArgumentException] {
      RawAns.appendTagIfAbsent("""["not","an","object"]""", AutoTag)
    }
    intercept[IllegalArgumentException] {
      RawAns.appendTagIfAbsent("""{"unbalanced":{""", AutoTag)
    }
  }

  test("8b. schema-drift profile: unescaped keys, nested decoys one level only, loud on malformed (q197)") {
    import graft.streaming.RawAns
    // escape-spelled key unescapes; types from the value's first token;
    // nesting profiled exactly one level down (deeper stays opaque)
    val doc = "{\"_id\":\"A\",\"tax\\u006fnomy\":null," +
      "\"meta\":{\"deep\":{\"x\":1},\"arr\":[1],\"s\":\"v\",\"b\":true}," +
      "\"n\":-4.5}"
    val p = RawAns.profile(doc)
    assert(p == Seq(
      ("_id", "string"), ("taxonomy", "null"), ("meta", "object"),
      ("meta.deep", "object"), ("meta.arr", "array"), ("meta.s", "string"),
      ("meta.b", "boolean"), ("n", "number")), s"profile drift: $p")
    intercept[IllegalArgumentException] { RawAns.profile("[1,2]") }
    intercept[IllegalArgumentException] { RawAns.profile("{\"a\":1} x") }
    // SQL surface parity
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT json_schema_profile('{\"a\":{\"b\":[]}}')").collect().head
      .getSeq[String](0)
    assert(got == Seq("a\u0001object", "a.b\u0001array"))
  }

  test("decoder fuzz: arbitrary byte payloads never crash the stage, rows always survive") {
    val rnd = new scala.util.Random(7)
    val garbage: Seq[Array[Byte]] =
      (1 to 200).map(n => Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)) ++
        Seq(Array.emptyByteArray, Array[Byte](0x1f, 0x8b.toByte), // gzip magic, truncated
          Codec.gzipBytes(Array[Byte](0, 1, 2)))                  // valid gzip, binary junk
    val out = EventDecoder.decode(wire(garbage.map(b => b -> "s"): _*)).collect()
    assert(out.length == garbage.length) // every row survives (app.py:35-46)
    assert(out.forall(r => r.getAs[String]("id") == null))
  }

  test("gzip round-trip: gunzip(gzip(s)) == s; gunzip(garbage) == null") {
    val df = Seq("hello", "", "π unicode ✓").toDF("s")
    val rt = df.select(Codec.gunzip(Codec.gzip(col("s"))).as("r"))
      .collect().map(_.getString(0))
    assert(rt.toSeq == Seq("hello", "", "π unicode ✓"))
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(Codec.gunzip(col("b"))).collect().head
    assert(bad.isNullAt(0))
  }
}
