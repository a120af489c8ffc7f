package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TagOps, TextOps}

/** Scalar function surface — SURVEY.md §2.8 (q32–q38).
  *
  * All codegen'd builtins (`org.apache.spark.sql.functions._`); nothing
  * here shuffles — pure per-row expressions fused into the scan stage by
  * whole-stage codegen. `pow`/libm functions are avoided in oracle-checked
  * outputs (not correctly-rounded, may differ across engines); +,-,*,/ and
  * sqrt are IEEE-exact on both engines.
  */
object Scalars extends QueryGroup {

  def queries: Map[String, Q] = Map(
    // q32 [REF tag.py:9,14,27]: string ops — the Draft API URL build.
    "q32_string_funcs" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          concat(lit("https://api.example.com/draft/v1/story/"),
            col("doc_id").cast("string"), lit("/revision/draft")).as("url"),
          upper(col("lang")).as("lang_upper"),
          substring(col("source"), 1, 3).as("src_prefix"),
          length(col("text")).cast("long").as("text_len"),
          when(col("text").like("%spark%"), lit(1L)).otherwise(lit(0L))
            .as("mentions_spark"))
        .orderBy("doc_id")),

    // q33 [REF tag.py:60-61]: slug derivation (kebab-case of text).
    "q33_slugify" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          TagOps.slugify(substring(col("text"), 1, 30)).as("slug"))
        .orderBy("doc_id")),

    // q34 [CLOSURE; poll clock app.py:29,78]: date/time functions. Dates
    // are emitted as ISO strings — a physical DATE column hashes
    // differently from DuckDB's (timestamp-backed) DATE in the compare.
    "q34_datetime" -> ((spark, dir) =>
      Tables(spark, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "yyyy-MM-dd").as("due_date"))
        .orderBy("o_orderkey")),

    // q35 [CLOSURE]: arithmetic + rounding (TPC-H price math). Per-row
    // money math truncates via floor(x*100)/100 rather than round(x,2):
    // 2dp×2dp inputs produce exact decimal ties at the rounding digit,
    // where Spark (shortest-repr HALF_UP) and DuckDB (binary rounding)
    // disagree; floor over the identical IEEE double is bit-deterministic.
    "q35_math" -> ((spark, dir) => {
      def cents2(c: org.apache.spark.sql.Column) = floor(c * 100) / 100
      def dp6(c: org.apache.spark.sql.Column) = floor(c * 1000000) / 1000000
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          cents2(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("disc_price"),
          cents2(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("charge"),
          floor(col("l_quantity")).cast("long").as("qty_floor"),
          abs(col("l_discount") - 0.05).as("disc_dev"),
          dp6(sqrt(col("l_quantity"))).as("qty_sqrt"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // q36 [REF tag.py:31-46]: array ops — the append-if-absent core.
    // Array results are comma-joined on output: the driver compare cannot
    // hash raw array cells, and the flat string is information-preserving.
    "q36_array_ops" -> ((spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          array_join(
            TagOps.appendIfAbsent(array(col("lang"), col("source")), lit("en")),
            ",").as("tagged"),
          TextOps.wsTokenCount(col("text")).as("n_tokens"),
          array_join(
            array_sort(array_distinct(split(substring(col("text"), 1, 50), " "))),
            ",").as("first_tokens"))
        .orderBy("doc_id")),

    // q37 [REF app.py:41,56]: JSON field extraction from a string column.
    "q37_json_extract" -> ((spark, dir) =>
      Tables(spark, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // q38 [REF app.py:64, tag.py:33-43]: null-handling chains.
    "q38_null_handling" -> ((spark, dir) => {
      val e = Tables(spark, dir, "events")
      val c = Tables(spark, dir, "customer")
      e.join(broadcast(c), e("user_id") === c("c_custkey"), "left")
        .select(col("event_id"),
          coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
          when(col("c_custkey").isNull, lit(1L)).otherwise(lit(0L))
            .as("is_missing"),
          coalesce(col("c_acctbal"), lit(0.0)).as("acctbal"))
        .orderBy("event_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q32_string_funcs" ->
      """SELECT doc_id,
        | 'https://api.example.com/draft/v1/story/' || CAST(doc_id AS VARCHAR) || '/revision/draft' AS url,
        | upper(lang) AS lang_upper, substring(source,1,3) AS src_prefix,
        | CAST(length(text) AS BIGINT) AS text_len,
        | CAST(CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS BIGINT) AS mentions_spark
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_slugify" ->
      "SELECT doc_id, regexp_replace(lower(substring(text,1,30)), ' ', '-', 'g') AS slug FROM documents ORDER BY doc_id",
    "q34_datetime" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        | CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
        | CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
        | CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q35_math" ->
      """SELECT l_orderkey, l_linenumber,
        | floor(l_extendedprice*(1-l_discount)*100)/100 AS disc_price,
        | floor(l_extendedprice*(1-l_discount)*(1+l_tax)*100)/100 AS charge,
        | CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        | abs(l_discount - 0.05) AS disc_dev,
        | floor(sqrt(l_quantity)*1000000)/1000000 AS qty_sqrt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q36_array_ops" ->
      """SELECT doc_id,
        | array_to_string(CASE WHEN list_contains([lang,source],'en') THEN [lang,source]
        |      ELSE list_append([lang,source],'en') END, ',') AS tagged,
        | CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        | array_to_string(list_sort(list_distinct(string_split(substring(text,1,50),' '))), ',') AS first_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q37_json_extract" ->
      "SELECT event_id, json_extract_string(props,'$.k') AS k_str, CAST(json_extract(props,'$.k') AS BIGINT) AS k FROM events ORDER BY event_id",
    "q38_null_handling" ->
      """SELECT e.event_id, COALESCE(c.c_mktsegment,'UNKNOWN') AS segment,
        | CAST(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_missing,
        | COALESCE(c.c_acctbal, 0.0) AS acctbal
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
  )
}
