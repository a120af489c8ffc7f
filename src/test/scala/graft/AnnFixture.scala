package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic PLANTED-NEIGHBOR embedding fixture for ANN recall
  * measurement (r11 verdict item 1).
  *
  * Why it exists: the driver's synthetic `embeddings` table is
  * near-uniform — pairwise distances concentrate within ~2×, so no
  * quantizer can recall true neighbors on it and the ANN tier
  * (q49/q59/q68/q171/q173/q177) could only be verified against its own
  * definitions. This fixture plants unambiguous neighbor structure so
  * recall@k is a measurable contract:
  *
  *  - `Clusters` seeded centers in 64-dim, components in [-800, 800] —
  *    cross-cluster cosine ≈ 0 (random directions), so the cluster is
  *    the recallable NEIGHBORHOOD;
  *  - vectors come in TWIN PAIRS (2p, 2p+1): both = center(p % C) +
  *    a shared per-pair noise (±`PairNoise` per component) + a tiny
  *    per-member jitter (±`TwinJitter`). The twin is the planted TRUE
  *    nearest neighbor with a ~(PairNoise/TwinJitter)² squared-distance
  *    margin over every other cluster member — the ground truth a
  *    recall@1 assertion needs (verified against brute force in the
  *    test, not assumed);
  *  - everything integer-valued and seeded (the q98 Rademacher-trick
  *    stance): the same fixture bit-reproduces on every run/JVM, so
  *    pinned recall floors are deterministic contracts, not flaky
  *    statistics.
  */
object AnnFixture {

  val Dim = 64
  val Clusters = 8
  /** 2000 vectors = 1000 twin pairs, 125 pairs per cluster. */
  val N = 2000
  val PairNoise = 24
  val TwinJitter = 2

  def clusterOf(vecId: Long): Int = ((vecId / 2) % Clusters).toInt
  def twinOf(vecId: Long): Long = vecId ^ 1L

  /** The planted corpus as (vec_id, embedding float array) — the
    * `embeddings` table's shape, so every Similarity/Pq helper runs on
    * it unchanged.
    */
  def planted(spark: SparkSession): DataFrame = {
    val centers = {
      val r = new Random(911)
      Array.fill(Clusters)(Array.fill(Dim)((r.nextInt(201) - 100) * 8))
    }
    val rows = (0 until N).map { i =>
      val pair = i / 2
      val c = centers(clusterOf(i.toLong))
      val pr = new Random(1000003L * pair + 17)
      val jr = new Random(2000003L * i + 29)
      val emb = Array.tabulate(Dim) { d =>
        (c(d) + (pr.nextInt(2 * PairNoise + 1) - PairNoise)
          + (jr.nextInt(2 * TwinJitter + 1) - TwinJitter)).toFloat
      }
      (i.toLong, emb.toSeq)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
  }
}
