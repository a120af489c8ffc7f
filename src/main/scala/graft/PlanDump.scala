package graft

/** r17 optimization-round tooling: dump `.explain("formatted")` for the
  * named queries to `plans/r17/<query>_<tag>.txt` — the judge-facing
  * before/after plan artifacts. Usage:
  *
  *   sbt "runMain graft.PlanDump <tag> <sfDir> q216_image_neardup,q233_..."
  *
  * Reads nothing the bench does not; never consumes the query (plans
  * only), so it is safe to run alongside nothing else.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val sfDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty(graft.operators.Footer.LayoutMemoProp, "true")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans", "r17")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"), txt)
      println(s"[plandump] wrote ${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
    sys.exit(0)
  }
}
