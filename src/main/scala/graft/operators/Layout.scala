package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
