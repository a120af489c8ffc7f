package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.debug._

import graft.functions.TextOps

/** Scratch inspector: prints the whole-stage-generated code for the
  * q58-shaped Jaccard verification filter so the doubled
  * `array_intersect` in TextOps.jaccard can be checked for
  * subexpression elimination. Run with Test/runMain graft.CodegenDump.
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .appName("codegen-dump").getOrCreate()
    import spark.implicits._
    val docs = Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(2L, 3L, 4L))).toDF("a_id", "a_sh")
    val b = docs.select(col("a_id").as("b_id"), col("a_sh").as("b_sh"))
    val cands = Seq((1L, 2L)).toDF("a_id", "b_id")
    val joined = cands.join(docs, "a_id").join(b, "b_id")
      .filter(TextOps.jaccard(col("a_sh"), col("b_sh")) >= 0.5)
      .select("a_id", "b_id")
    joined.collect()
    val code = codegenString(joined.queryExecution.executedPlan)
    println("=== INTERSECT_CALLS " +
      "arrayIntersect-evals=" + raw"(?s)evalIntersect|ArrayIntersect".r
        .findAllIn(code).size)
    println(code)
    spark.stop()
  }
}
