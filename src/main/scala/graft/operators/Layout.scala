package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tooling for repeated co-located joins (SURVEY.md §4 /
  * the 100 TB playbook): bucketing both sides of a hot join key writes
  * the shuffle ONCE at layout time; every subsequent join on that key
  * plans a SortMergeJoin with NO Exchange on either side.
  *
  * At 100 TB this is the difference between re-shuffling 100 TB per query
  * and never shuffling it again; `LayoutSpec` asserts the exchange-free
  * plan shape on real bucketed tables.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def bucketize(spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans exchange-
    * free when bucket counts match.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Write a curated corpus hive-partitioned by low-cardinality routing
    * columns (split, lang, date, ...): a reader filtering on them prunes
    * whole directories at PLANNING time — at 100 TB, the difference
    * between scanning the train split and scanning everything.
    * `LayoutSpec` asserts the pruned scan shape.
    */
  def partitionedWrite(df: DataFrame, path: String, cols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(cols: _*)
      .parquet(path)

  /** Z-ORDER key: interleave the low `bits` of two non-negative ints so
    * that sorting by the result clusters rows that are close in BOTH
    * dimensions (Morton order — the multi-dimensional layout technique
    * behind Delta/Iceberg Z-ordering). A corpus range-partitioned and
    * sorted by this key gives every file/row-group a TIGHT min/max
    * envelope on x AND y simultaneously, so parquet stats prune 2-D
    * range predicates; a 1-D sort prunes only its own column.
    * Pure built-in bit arithmetic (shift/and/or are codegen'd), no UDF;
    * `LayoutSpec` measures the envelope shrinkage, and q127 oracles the
    * key itself (bit-for-bit: the same shifts evaluate in DuckDB).
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The per-chunk (x, y) bounding boxes after range-bucketing `df` on
    * `key` into `buckets` chunks — the measurable quantity behind data
    * skipping: the SUM of per-chunk envelope areas is what a 2-D range
    * predicate must scan in expectation. LayoutSpec compares z-order
    * vs 1-D layouts with this.
    */
  def chunkEnvelopes(df: DataFrame, key: Column, x: Column, y: Column,
      buckets: Int): DataFrame =
    df.select(x.as("x"), y.as("y"), key.as("k"))
      .repartitionByRange(buckets, col("k"))
      .withColumn("chunk", spark_partition_id())
      .groupBy(col("chunk"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"),
        count(lit(1)).as("n"))
}
