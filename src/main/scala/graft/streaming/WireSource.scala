package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source factories producing the pipeline's wire frame
  * `(data: binary, shard: string, ts: timestamp)`. Everything downstream
  * of the frame is source-agnostic — swapping Kinesis for a file replay
  * or a MemoryStream is a one-line change, which is the whole point
  * (SURVEY.md §2.1: the Kinesis source is connector config, not engine
  * logic).
  */
object WireSource {

  /** Kinesis (production): requires the spark-sql-kinesis connector on
    * the classpath (not shipped in this offline build — by design; the
    * reference's `aws.py` STS/role wiring maps to connector options, the
    * reference's governors map as commented). Untestable offline;
    * provided so a reference user sees the exact swap-in.
    */
  def kinesis(spark: SparkSession, streamName: String, region: String,
      maxFetchPerShard: Int = 20): DataFrame =
    spark.readStream
      .format("aws-kinesis")
      .option("kinesis.streamName", streamName)
      .option("kinesis.region", region)
      .option("kinesis.consumerType", "GetRecords")
      // ≙ the reference's ShardIteratorType LATEST (`app.py:18`)
      .option("kinesis.startingPosition", "LATEST")
      // ≙ get_records(Limit=20) (`app.py:22`)
      .option("kinesis.executor.maxFetchRecordsPerShard", maxFetchPerShard)
      .load()
      // connector schema: data, streamName, partitionKey, shardId,
      // sequenceNumber, approximateArrivalTimestamp
      .select(col("data"),
        col("shardId").as("shard"),
        col("approximateArrivalTimestamp").as("ts"))

  /** Bounded replay of an event-log parquet (batch ≡ stream): re-encodes
    * the events table as wire frames — the test/backfill source.
    */
  def eventLogReplay(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    Tables(spark, dir, "events")
      .select(
        graft.functions.Codec.gzip(col("props")).as("data"),
        spark_partition_id().cast("string").as("shard"),
        col("ts"))
  }

  /** Synthetic rate source shaped like the wire (throughput testing). */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        graft.functions.Codec.gzip(
          to_json(struct(col("value").cast("string").as("id"),
            lit("insert-story").as("operation"), lit(true).as("published"))))
          .as("data"),
        (col("value") % 2).cast("string").as("shard"),
        col("timestamp").as("ts"))
}
