package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Bucketed-layout guards: pre-bucketed joins and aggregations must plan
  * WITHOUT an Exchange on the bucketed key — the "shuffle once at layout
  * time, never again" property that carries the hot join path at 100 TB.
  */
class LayoutSpec extends SparkSpec {

  test("bucketed-bucketed join plans no Exchange; bucketed agg plans no Exchange") {
    val li = Tables(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, Sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    // clean any leftover managed-table locations from aborted runs
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Layout.bucketize(spark, li, "li_b", "l_orderkey", 8)
    Layout.bucketize(spark, o, "o_b", "l_orderkey", 8)
    // the fixture tables are broadcast-sized, which makes the planner
    // pick BHJ and bypass bucketed scans — disable broadcast so the test
    // exercises the shape bucketing exists for (both sides large)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    val joined = Layout.coLocatedJoin(spark, "li_b", "o_b", "l_orderkey")
    joined.collect()
    val jp = joined.queryExecution.executedPlan.toString
    assert(jp.contains("SortMergeJoin"))
    assert(!jp.contains("Exchange"), s"bucketed join still shuffles:\n$jp")

    val agg = spark.table("li_b").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
    agg.collect()
    val ap = agg.queryExecution.executedPlan.toString
    assert(!ap.contains("Exchange"), s"bucketed agg still shuffles:\n$ap")

    // row-count equivalence with the unbucketed join
    val expected = Tables(spark, Sf, "lineitem")
      .join(Tables(spark, Sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("partitioned corpus write: split filter prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part-").toString
    val bucket = substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 2)
    val curated = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"),
        when(bucket < "cd", lit("train")).otherwise(lit("val")).as("split"))
    Layout.partitionedWrite(curated, dir, "split", "lang")

    val train = spark.read.parquet(dir).filter(col("split") === "train")
    train.collect()
    val p = train.queryExecution.executedPlan.toString
    // the split predicate must land in PartitionFilters (directory-level
    // prune), NOT PushedFilters (row-level) — and never a post-scan Filter
    assert(p.contains("PartitionFilters"), s"no partition filters:\n$p")
    assert(p.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(split"),
      s"split filter did not reach the partition prune:\n$p")
    // correctness: pruned read == filtered full read
    val expected = curated.filter(col("split") === "train").count()
    assert(train.count() == expected && expected > 0)
  }
}
