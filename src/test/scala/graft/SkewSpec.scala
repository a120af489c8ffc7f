package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted-join semantics: exactly the plain equi-join's result, spread
  * over `salts` reducers per key.
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin == plain join, row for row") {
    val e = Tables(spark, Sf, "events")
    val c = Tables(spark, Sf, "customer")
      .withColumnRenamed("c_custkey", "user_id")
    val plain = e.join(c, Seq("user_id"))
      .select("event_id", "user_id", "c_name")
    val salted = Skew.saltedJoin(e, c, "user_id", salts = 7, saltBy = "event_id")
      .select("event_id", "user_id", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (42L, i.toLong)).toDF("k", "id")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col("id")), lit(8L)))
    val buckets = salted.groupBy("_salt").count().collect()
    assert(buckets.length == 8) // hot key now occupies every reducer bucket
    assert(buckets.map(_.getLong(1)).max < 1000)
  }
}
