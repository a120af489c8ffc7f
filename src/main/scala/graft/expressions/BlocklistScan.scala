package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist scan over one document — Aho-Corasick
  * (CACM'75), the one-pass automaton behind every production term
  * scrubber (FlashText is its trie-only simplification): all patterns
  * compile into a goto/fail automaton once (executor model state), and
  * a document of any length is scanned in O(len + hits) regardless of
  * pattern count — the property that makes a 10⁵-term blocklist the
  * same cost as ten terms.
  *
  * Returns struct(hits, patterns_hit: bigint): total occurrence count
  * across patterns and the number of DISTINCT patterns that occurred.
  * Occurrences are ALL-POSITIONS (the automaton's native semantics,
  * including overlaps BETWEEN patterns and patterns nested in longer
  * words). The oracle counts per-pattern occurrences by the greedy
  * replace formula, which agrees with all-positions exactly when no
  * pattern can overlap ITSELF — i.e. has no proper border (prefix =
  * suffix) — so the Model REFUSES bordered patterns loudly rather than
  * letting the two semantics drift on adversarial text.
  *
  * Codegen follows the UnigramViterbi pattern: a static call against a
  * reference-object model keeps whole-stage fusion with constant
  * generated-code size.
  */
case class BlocklistScan(child: Expression, patterns: Array[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "blocklist_scan: empty pattern set")

  override def dataType: DataType = StructType(Seq(
    StructField("hits", LongType, nullable = false),
    StructField("patterns_hit", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"blocklist_scan needs string, got ${dt.sql}")
    }

  @transient private lazy val model = new BlocklistScan.Model(patterns)

  override protected def nullSafeEval(input: Any): Any =
    BlocklistScan.scan(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("acModel", model,
        classOf[BlocklistScan.Model].getName)
      s"${ev.value} = graft.expressions.BlocklistScan.scan($c, $m);"
    })

  override protected def withNewChildInternal(c: Expression): BlocklistScan =
    copy(child = c)

  override def prettyName: String = "blocklist_scan"
}

object BlocklistScan {

  /** The compiled automaton: trie + BFS fail links + per-node merged
    * output pattern-id lists (outputs are aggregated through the fail
    * chain at build time, so the scan never walks it).
    */
  final class Model(patterns: Array[String]) extends Serializable {
    patterns.foreach { p =>
      require(p.nonEmpty, "blocklist_scan: empty pattern")
      val borders = (1 until p.length)
        .exists(k => p.substring(0, k) == p.substring(p.length - k))
      require(!borders,
        s"blocklist_scan: pattern '$p' has a proper border (prefix = " +
          "suffix) — self-overlapping occurrences would diverge from " +
          "the greedy replace-count semantics the oracle uses")
    }
    require(patterns.distinct.length == patterns.length,
      "blocklist_scan: duplicate patterns would double-count")

    @transient lazy val (next, fail, outs)
        : (Array[scala.collection.mutable.Map[Char, Int]], Array[Int],
           Array[Array[Int]]) = {
      val nx = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
      val rawOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      patterns.zipWithIndex.foreach { case (p, pid) =>
        var s = 0
        p.foreach { ch =>
          s = nx(s).getOrElseUpdate(ch, {
            nx += scala.collection.mutable.Map.empty[Char, Int]
            rawOut += Nil
            nx.length - 1
          })
        }
        rawOut(s) = pid :: rawOut(s)
      }
      val n = nx.length
      val fl = new Array[Int](n)
      val merged = new Array[List[Int]](n)
      (0 until n).foreach(i => merged(i) = rawOut(i))
      val queue = scala.collection.mutable.Queue.empty[Int]
      nx(0).values.foreach { s => fl(s) = 0; queue.enqueue(s) }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        nx(u).foreach { case (ch, v) =>
          var f = fl(u)
          while (f != 0 && !nx(f).contains(ch)) f = fl(f)
          fl(v) = if (nx(f).contains(ch) && nx(f)(ch) != v) nx(f)(ch) else 0
          merged(v) = merged(v) ++ merged(fl(v))
          queue.enqueue(v)
        }
      }
      (nx.toArray, fl, merged.map(_.toArray))
    }

    val nPatterns: Int = patterns.length
  }

  /** One automaton pass: O(len + hits). */
  def scan(text8: UTF8String, m: Model): GenericInternalRow = {
    val t = text8.toString
    val seen = new Array[Boolean](m.nPatterns)
    var hits = 0L
    var distinct = 0L
    var s = 0
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i)
      while (s != 0 && !m.next(s).contains(ch)) s = m.fail(s)
      s = m.next(s).getOrElse(ch, 0)
      val out = m.outs(s)
      var k = 0
      while (k < out.length) {
        hits += 1L
        if (!seen(out(k))) { seen(out(k)) = true; distinct += 1L }
        k += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](hits, distinct))
  }
}
