package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Access to the driver-provided parquet tables (TESTDATA.md).
  *
  * All operators take a `sfDir` and read through here, so the same query
  * code runs at any scale factor. At cluster scale the parquet scans get
  * predicate pushdown + column pruning from Catalyst for free as long as
  * queries stay declarative (SURVEY.md §4).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Runtime confs, set here so any caller-provided session works:
    //  - events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    //    read natively; nanosAsLong surfaces it as LongType nanos.
    //  - hash-mixing arithmetic (MinHash permutations, SimHash bit votes)
    //    needs Java wraparound, not ANSI overflow errors.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // ns → µs is lossless in the fixtures (all ts sit on µs boundaries;
      // see TESTDATA.md); integer division keeps full precision.
      // `div` is integer division on longs — `/` would go through double
      // and lose precision above 2^53 (epoch-ns is ~1.7e18).
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
