package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The E-step core of exact-integer unigram-LM VITERBI-EM training
  * (q237): for one word under a frozen integer cost table, the number of
  * times each vocab token is used across ALL min-cost segmentations —
  * hard-EM expected counts, exact under ties.
  *
  * Soft EM (Kudo ACL'18) weights every segmentation by its probability —
  * real-valued posteriors that cannot hash cross-engine (the q83/q153
  * log-free stance). Viterbi training (hard EM, the standard alternative
  * in the same literature) counts over the ARGMIN segmentation — but the
  * argmin is not unique under ties, so a naive implementation would need
  * tie-break rules. This expression removes the ambiguity the same way
  * q198's `ways` does: it counts over the FULL set of optimal paths.
  * For token t, `cnt(t) = Σ over edges (j, e) spelling t that lie on an
  * optimal path of fwdWays(j) · sufWays(e)` — forward path count to j
  * times suffix path count from e — a canonical DP quantity, uniquely
  * defined, pure BIGINT.
  *
  * Returns `array<struct<tid: int, cnt: bigint>>` sorted by tid (the
  * token's index in the model arrays), only tokens with cnt > 0.
  * Same [[UnigramViterbi.MaxWordLen]] cap and loud uncoverable-word
  * contract as inference; overflow crashes via addExact/multiplyExact
  * rather than wrapping.
  */
case class UnigramEdgeCounts(
    child: Expression,
    tokens: Array[String],
    costs: Array[Long])
    extends UnaryExpression {

  require(tokens.length == costs.length && tokens.nonEmpty,
    "unigram_edge_counts: tokens/costs must be parallel and non-empty")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tid", IntegerType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_edge_counts needs string, got ${dt.sql}")
    }

  @transient private lazy val model = new UnigramEdgeCounts.Model(tokens, costs)

  override protected def nullSafeEval(input: Any): Any =
    UnigramEdgeCounts.edgeCounts(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("uecModel", model,
        classOf[UnigramEdgeCounts.Model].getName)
      s"${ev.value} = graft.expressions.UnigramEdgeCounts.edgeCounts($c, $m);"
    })

  override protected def withNewChildInternal(c: Expression): UnigramEdgeCounts =
    copy(child = c)

  override def prettyName: String = "unigram_edge_counts"
}

object UnigramEdgeCounts {

  /** token → (tid, cost) lookup; same construction guards as
    * [[UnigramViterbi.Model]].
    */
  final class Model(val tokens: Array[String], val costs: Array[Long])
      extends Serializable {
    @transient lazy val tid: java.util.HashMap[String, java.lang.Integer] = {
      val m = new java.util.HashMap[String, java.lang.Integer](tokens.length * 2)
      var i = 0
      while (i < tokens.length) {
        require(m.put(tokens(i), java.lang.Integer.valueOf(i)) == null,
          s"unigram_edge_counts: duplicate vocab token '${tokens(i)}'")
        require(costs(i) >= 0L,
          s"unigram_edge_counts: negative cost for '${tokens(i)}'")
        i += 1
      }
      m
    }
    @transient lazy val maxTokLen: Int = tokens.map(_.length).max
  }

  /** Forward DP + suffix DP + one edge sweep. O(len · maxTokLen) time. */
  def edgeCounts(w: UTF8String, m: Model): GenericArrayData = {
    val s = w.toString
    val n = s.length
    require(n <= UnigramViterbi.MaxWordLen,
      s"unigram_edge_counts: word of $n chars exceeds MaxWordLen — " +
        "upstream whitespace splitting is broken")
    val MAX = Long.MaxValue
    // forward: best/ways to each position
    val fb = Array.fill(n + 1)(MAX); val fw = new Array[Long](n + 1)
    fb(0) = 0L; fw(0) = 1L
    var e = 1
    while (e <= n) {
      var j = math.max(0, e - m.maxTokLen)
      while (j < e) {
        if (fb(j) != MAX) {
          val t = m.tid.get(s.substring(j, e))
          if (t != null) {
            val tot = Math.addExact(fb(j), m.costs(t.intValue()))
            if (tot < fb(e)) { fb(e) = tot; fw(e) = fw(j) }
            else if (tot == fb(e)) fw(e) = Math.addExact(fw(e), fw(j))
          }
        }
        j += 1
      }
      e += 1
    }
    require(fb(n) != MAX,
      s"unigram_edge_counts: word '$s' is not coverable by the frozen vocab")
    // suffix: best/ways from each position to the end
    val sb = Array.fill(n + 1)(MAX); val sw = new Array[Long](n + 1)
    sb(n) = 0L; sw(n) = 1L
    var j = n - 1
    while (j >= 0) {
      var e2 = j + 1
      val lim = math.min(n, j + m.maxTokLen)
      while (e2 <= lim) {
        if (sb(e2) != MAX) {
          val t = m.tid.get(s.substring(j, e2))
          if (t != null) {
            val tot = Math.addExact(sb(e2), m.costs(t.intValue()))
            if (tot < sb(j)) { sb(j) = tot; sw(j) = sw(e2) }
            else if (tot == sb(j)) sw(j) = Math.addExact(sw(j), sw(e2))
          }
        }
        e2 += 1
      }
      j -= 1
    }
    assert(sb(0) == fb(n), "unigram_edge_counts: forward/suffix DP disagree")
    // edge sweep: (j, e) on an optimal path iff fb(j) + cost + sb(e) = opt
    val acc = new java.util.TreeMap[Integer, java.lang.Long]()
    j = 0
    while (j < n) {
      if (fb(j) != MAX) {
        var e2 = j + 1
        val lim = math.min(n, j + m.maxTokLen)
        while (e2 <= lim) {
          if (sb(e2) != MAX) {
            val t = m.tid.get(s.substring(j, e2))
            if (t != null &&
              Math.addExact(fb(j), Math.addExact(m.costs(t.intValue()), sb(e2)))
                == fb(n)) {
              val add = Math.multiplyExact(fw(j), sw(e2))
              val prev = acc.get(t)
              acc.put(t, java.lang.Long.valueOf(
                if (prev == null) add else Math.addExact(prev.longValue(), add)))
            }
          }
          e2 += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](acc.size())
    var i = 0
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](en.getKey.intValue(), en.getValue.longValue()))
      i += 1
    }
    new GenericArrayData(out)
  }
}
