package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.operators.{Footer, LostUpdateException}

/** r17 (r16 verdict #3): the DSv2 house write commit runs q236's
  * [[graft.operators.TableLog]] OCC protocol — base version at Write
  * construction, key re-validation at commit. The r16-judged
  * lost-update window (two concurrent appends each merging a
  * construction-time snapshot; last manifest write wins, the other's
  * units vanish) is exactly the conflict class the log refuses loudly.
  *
  * The spec drives the `private[sources]` write machinery directly so
  * the races are DETERMINISTIC: the hazard is snapshot staleness, not
  * wall-clock interleaving, so constructing two Writes against the same
  * base and committing them in order reproduces every schedule the
  * public `df.write` API could produce.
  */
class HouseOccSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("source", StringType, nullable = false)

  /** One complete manual DSv2 write: construct (snapshots the OCC
    * base), optionally delay, then task-write `rows` and driver-commit.
    */
  private def mkWrite(dir: String, truncate: Boolean): HouseWrite =
    new HouseWrite(dir, schema, rowsPerUnit = 1000L,
      bloomCols = Set.empty, truncate = truncate)

  private def runTasks(w: HouseWrite, rows: Seq[(Long, String)]) = {
    val dw = w.createBatchWriterFactory(null).createWriter(0, 0L)
    rows.foreach { case (id, s) =>
      dw.write(InternalRow(id, UTF8String.fromString(s)))
    }
    Array(dw.commit())
  }

  private def freshDir(tag: String): String = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_occ_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(d)
    d.getPath
  }

  test("two appends from the SAME base both land: UUID file keys are disjoint, each merge sees the other's committed units") {
    spark // force session init (UTF8String rows need no session, commit's dump does)
    val dir = freshDir("append_append")
    val w0 = mkWrite(dir, truncate = true)
    w0.commit(runTasks(w0, Seq(1L -> "base")))
    val gen0 = Footer.committedUnits(dir).get.map(_.path)
    // BOTH constructed now — each snapshots base = v1; under the r16
    // code whichever committed last would erase the other's units from
    // the manifest (last manifest write wins)
    val a = mkWrite(dir, truncate = false)
    val b = mkWrite(dir, truncate = false)
    val aMsgs = runTasks(a, Seq(2L -> "a"))
    val bMsgs = runTasks(b, Seq(3L -> "b"))
    a.commit(aMsgs)
    b.commit(bMsgs) // stale base, but keys disjoint -> must land too
    val units = Footer.committedUnits(dir).get.map(_.path)
    assert(units.size == 3 && gen0.forall(units.contains),
      s"both appends + the base generation must all be in the manifest: $units")
    val total = spark.read
      .format(classOf[HouseSource].getName).load(dir).count()
    assert(total == 3L, "all three generations' rows must read back")
  }

  test("a truncate racing an append throws LostUpdateException - in either commit order - and the loser changes nothing") {
    spark
    val dir = freshDir("truncate_append")
    val w0 = mkWrite(dir, truncate = true)
    w0.commit(runTasks(w0, Seq(1L -> "base")))
    // order 1: append commits first; the truncate (bulk rewrite,
    // keys = None) based on the pre-append snapshot must refuse
    val app = mkWrite(dir, truncate = false)
    val tru = mkWrite(dir, truncate = true)
    app.commit(runTasks(app, Seq(2L -> "a")))
    val afterAppend = Footer.committedUnits(dir).get.map(_.path).sorted
    val truMsgs = runTasks(tru, Seq(9L -> "t"))
    intercept[LostUpdateException](tru.commit(truMsgs))
    assert(Footer.committedUnits(dir).get.map(_.path).sorted == afterAppend,
      "a refused truncate must leave the committed manifest untouched")
    // order 2: truncate commits first; an append based on the
    // pre-truncate snapshot must refuse (its base units are gone)
    val app2 = mkWrite(dir, truncate = false)
    val tru2 = mkWrite(dir, truncate = true)
    tru2.commit(runTasks(tru2, Seq(10L -> "t2")))
    val afterTrunc = Footer.committedUnits(dir).get.map(_.path).sorted
    val app2Msgs = runTasks(app2, Seq(11L -> "late"))
    intercept[LostUpdateException](app2.commit(app2Msgs))
    assert(Footer.committedUnits(dir).get.map(_.path).sorted == afterTrunc,
      "a refused append must leave the committed manifest untouched")
  }
}
