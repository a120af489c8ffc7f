package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The house cross-engine integer hash: the first 15 md5 hex chars as a
  * BIGINT. 60 bits keeps the value strictly positive, so `%` ≡ `pmod`
  * on both engines and DuckDB mirrors it as `('0x'||substring(md5(x),
  * 1,15))::BIGINT` — the q111/q199/q203 idiom, kept in ONE place so
  * the hex width (the contract every oracle hard-codes) cannot drift
  * between operators.
  */
object Hashing {

  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
