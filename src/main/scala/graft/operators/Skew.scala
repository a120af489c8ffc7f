package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4 / 100 TB playbook).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even
  * split partitions bottleneck a single reducer, or when AQE is off
  * (streaming micro-batches). Semantics-preserving: every (big, small)
  * key match appears exactly once because each big-side row lands in
  * exactly one salt bucket and the small side is replicated to all.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, spreading each hot key over
    * `salts` reducers. `saltBy` must be a big-side column that varies
    * within a key (a unique id) so rows spread evenly; the salt is a
    * deterministic hash, keeping the operator replayable.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: String): DataFrame = {
    require(salts > 0)
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(saltBy)), lit(salts.toLong)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
