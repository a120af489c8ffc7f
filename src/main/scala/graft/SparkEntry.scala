package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2's inventory is one entry in `queries`
  * (grouped by module under graft.operators); SQL-expressible ones carry a
  * DuckDB oracle in `oracleSql`. Column names are aliased identically on
  * both sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    Relational, Joins, Aggregates, Windows, Scalars,
    TextAnalysis, Dedup, Similarity, Multimodal, Curation, Retrieval,
    Behavior, Tokenizer, Pq, Pipeline, SuffixScrub, Privacy, Sketches,
    Graph, Fuzzy, Erasure, Txn, Footer)

  /** Flagship query (the reference's whole dataflow in batch form) on
    * sf=0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx/LSH/simhash) -> driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracles).toMap
}
