package graft

/** The SQL-surface twin of the DataFrame API: custom expressions callable
  * from `spark.sql` after registration.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("vec_dot / gunzip_to_string / shingle_hashes work from SQL") {
    GraftFunctions.register(spark)

    val dot = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 32.0)

    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gz = Seq("payload").toDF("s")
      .select(graft.functions.Codec.gzip(col("s")).as("z"))
    gz.createOrReplaceTempView("gz_t")
    val rt = spark.sql("SELECT gunzip_to_string(z) AS s FROM gz_t")
      .collect().head.getString(0)
    assert(rt == "payload")

    val sh = spark.sql(
      "SELECT size(shingle_hashes(array('a','b','c','d'), 3)) AS n")
      .collect().head.getInt(0)
    assert(sh == 2) // "a b c", "b c d"

    val js = spark.sql(
      "SELECT jaccard_sim(array(1L, 2L, 3L, 4L), array(2L, 3L, 4L, 5L)) AS j")
      .collect().head.getDouble(0)
    assert(js == 0.6) // |{2,3,4}| / |{1,2,3,4,5}|

    // parity with the DataFrame API expression
    val viaDf = Seq(("x")).toDF("s").select(
      graft.functions.TextOps.shingleHashes(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lit("a b c d"), " "), 3).as("h"))
      .collect().head.getSeq[Long](0)
    val viaSql = spark.sql(
      "SELECT shingle_hashes(split('a b c d', ' '), 3) AS h")
      .collect().head.getSeq[Long](0)
    assert(viaDf == viaSql)
  }

  test("simhash64 / fingerprint_hash callable from SQL, match the DataFrame API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_distinct, col, split}
    val viaDf = Seq("alpha beta gamma").toDF("t")
      .select(
        graft.functions.TextOps.simhash(array_distinct(split(col("t"), " "))).as("s"),
        graft.functions.TextOps.fingerprint(col("t")).as("f"))
      .collect().head
    val viaSql = spark.sql(
      """SELECT simhash64(array_distinct(split('alpha beta gamma', ' '))) AS s,
        |       fingerprint_hash('alpha beta gamma') AS f""".stripMargin)
      .collect().head
    assert(viaDf.getLong(0) == viaSql.getLong(0))
    assert(viaDf.getLong(1) == viaSql.getLong(1))
  }

  test("nfc_normalize callable from SQL: composes decomposed text, ASCII/NFC unchanged, NULL-safe") {
    GraftFunctions.register(spark)
    // decomposed 'cafe'+U+0301 in, composed U+00E9 expected — spelled
    // with escapes so no editor can silently re-normalize the source
    val r = spark.sql(
      "SELECT nfc_normalize('cafe\u0301'), nfc_normalize('plain ascii'), " +
        "nfc_normalize(CAST(NULL AS STRING)), " +
        "octet_length('cafe\u0301'), octet_length(nfc_normalize('cafe\u0301'))")
      .collect().head
    assert(r.getString(0) == "caf\u00e9", "decomposed input must compose")
    assert(r.getString(1) == "plain ascii")
    assert(r.isNullAt(2), "NULL must propagate")
    assert(r.getInt(3) == 6 && r.getInt(4) == 5,
      "NFC must shrink the 2-codepoint form to the composed byte length")
    // interpreted eval agrees with the generated code path, and the
    // already-NFC fast path returns the INPUT OBJECT (zero allocation)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val in = UTF8String.fromString("already caf\u00e9 NFC")
    val out = graft.expressions.NfcNormalize(Literal(in,
      org.apache.spark.sql.types.StringType)).eval(null)
    assert(out.asInstanceOf[AnyRef] eq in.asInstanceOf[AnyRef],
      "already-NFC input should pass through by reference")
  }

  test("json_tag_append callable from SQL: splices, idempotent, NULL-safe, literal-args enforced") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT json_tag_append('{"_id":"A","x":{"y":[1]}}', 'kinesis-autotag', 'kinesis autotag'),
        |  json_tag_append('{"_id":"A","taxonomy":{"tags":[{"slug":"kinesis-autotag","text":"kinesis autotag"}]}}',
        |                  'kinesis-autotag', 'kinesis autotag'),
        |  json_tag_append(CAST(NULL AS STRING), 'kinesis-autotag', 'kinesis autotag')""".stripMargin)
      .collect().head
    assert(r.getString(0) ==
      """{"_id":"A","x":{"y":[1]},"taxonomy":{"tags":[{"slug":"kinesis-autotag","text":"kinesis autotag"}]}}""")
    assert(r.getString(1) ==
      """{"_id":"A","taxonomy":{"tags":[{"slug":"kinesis-autotag","text":"kinesis autotag"}]}}""")
    assert(r.isNullAt(2), "NULL must propagate")
    // a non-literal slug is rejected clearly at analysis, not with an
    // opaque internal error at runtime
    val ex = intercept[Exception] {
      spark.sql("SELECT json_tag_append('{}', lower('X'), 't')").collect()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("|")
    assert(msgs(ex).contains("literal string"))
  }

  test("tag_set_agg callable from SQL, idempotent under duplicate rows") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      """SELECT tag_set_agg(slug, text) AS tags FROM VALUES
        |  ('a-b', 'A B'), ('c', 'C'), ('a-b', 'A B') AS t(slug, text)""".stripMargin)
      .collect().head.getString(0)
    assert(out == "a-b|A B,c|C")
  }

  test("shingle_hashes rejects a non-literal width with a clear message") {
    GraftFunctions.register(spark)
    val e = intercept[Throwable] {
      spark.sql("SELECT shingle_hashes(array('a','b'), id) FROM range(2)")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("literal int")),
      s"expected a clear 'literal int' error, got: ${messages(e).mkString(" | ")}")
  }
}
