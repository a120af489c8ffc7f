package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of driver-contract queries.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 (same key
  * ends up in `SparkEntry.queries`); `oracles` carries the DuckDB SQL the
  * driver runs over the same parquet tables. Queries without an oracle
  * (approx/streaming-only) get a rows-only check.
  *
  * Determinism rules (SURVEY.md §5, §7 "hard parts"):
  *  - every query ends in a full deterministic ORDER BY;
  *  - computed integers are cast to BIGINT on both sides;
  *  - aggregated doubles are rounded (sums: 2dp, avgs: 4dp); per-row double
  *    math is left raw (same IEEE ops on both engines);
  *  - raw nanosecond timestamps are never output — only epoch
  *    seconds/micros or dates (Spark truncates parquet ns to µs on read,
  *    DuckDB does not);
  *  - similarity scores are never output, only ids/ranks.
  */
trait QueryGroup {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
