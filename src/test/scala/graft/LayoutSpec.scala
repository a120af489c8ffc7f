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

  test("z-order chunks prune point predicates on BOTH dimensions; 1-D sorts on only one") {
    // The quantity data skipping actually reads: how many chunks' min/max
    // envelopes CONTAIN a point predicate's value. A 1-D sort prunes its
    // own column perfectly and the other not at all (every chunk spans the
    // other column's full range); Morton order splits both, so both
    // single-column predicates touch a strict subset of chunks. k is
    // left-shifted 3 to align its 7-bit range with event_id's 10 bits —
    // the bit-width normalization real z-ordering applies per column.
    val ev = Tables(spark, Sf, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    val buckets = 16
    def chunksContaining(key: org.apache.spark.sql.Column,
        dim: String, v: Long): Long =
      Layout.chunkEnvelopes(ev, key, col("event_id"), col("k"), buckets)
        .filter(col(s"${dim}0") <= v && col(s"${dim}1") >= v)
        .count()
    val zkey = Layout.zorderKey(col("event_id"), shiftleft(col("k"), 3),
      graft.operators.Relational.ZOrderBits)
    // k-point predicate: the x-sorted layout cannot prune it at all
    val zForK = chunksContaining(zkey, "y", 42L)
    val xForK = chunksContaining(col("event_id"), "y", 42L)
    // x-point predicate: the k-sorted layout cannot prune it at all
    val zForX = chunksContaining(zkey, "x", 500L)
    val kForX = chunksContaining(col("k"), "x", 500L)
    assert(xForK == buckets && kForX == buckets,
      "a 1-D sort must leave the other dimension unprunable (test premise)")
    assert(zForK * 2 <= buckets, s"z-order k-pruning too weak: $zForK/$buckets")
    assert(zForX * 2 <= buckets, s"z-order x-pruning too weak: $zForX/$buckets")
  }
}
