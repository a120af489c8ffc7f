package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Min-cost unigram-LM segmentation of one word under a FROZEN integer
  * cost table — the Viterbi inference step of a SentencePiece-style
  * unigram tokenizer (Kudo, ACL'18): a word segments into the vocab
  * token sequence minimizing the summed token cost, and a production
  * tokenizer runs exactly this DP per word at apply time (training the
  * costs is a separate EM loop; here the costs are a shipped artifact).
  *
  * Returns `struct(cost: bigint, ways: bigint)`:
  *  - `cost` = the minimum total cost over ALL segmentations of the
  *    word into vocab tokens;
  *  - `ways` = the number of distinct segmentations achieving it.
  * Both are canonical DP outputs — uniquely defined regardless of cost
  * ties — so the operator needs NO tie-break rules at all to be
  * bit-deterministic cross-engine (the argmin token sequence would; see
  * Tokenizer.q198's scaladoc for why the surface pins these two).
  *
  * Exactness stance (the q83/q153 discipline): production unigram costs
  * are scaled −log p doubles; libm logs are not bit-portable, so the
  * frozen table here carries an exact-integer monotone surrogate
  * (frequency rank — see Tokenizer.unigramCosts) and the DP itself is
  * pure BIGINT addition, overflow-checked. The DP, the vocab lookup
  * structure, and the scale shape are identical to the float-cost form.
  *
  * Loudness: a word longer than [[UnigramViterbi.MaxWordLen]] chars or
  * not coverable by the vocab throws (task failure), never a silent
  * skip — an uncoverable word means the frozen vocab and the corpus
  * alphabet have drifted, exactly the divergence to surface.
  *
  * Codegen follows the NfcNormalize pattern: `doGenCode` emits a static
  * call against a reference-object model, keeping whole-stage fusion
  * with constant generated-code size (the DP is branchy scalar code a
  * JIT compiles well; inlining it as generated Java would grow the
  * method with no win).
  */
case class UnigramViterbi(
    child: Expression,
    tokens: Array[String],
    costs: Array[Long])
    extends UnaryExpression {

  require(tokens.length == costs.length && tokens.nonEmpty,
    "unigram_viterbi: tokens/costs must be parallel and non-empty")

  override def dataType: DataType = StructType(Seq(
    StructField("cost", LongType, nullable = false),
    StructField("ways", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_viterbi needs string, got ${dt.sql}")
    }

  @transient private lazy val model = new UnigramViterbi.Model(tokens, costs)

  override protected def nullSafeEval(input: Any): Any =
    UnigramViterbi.segment(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("uvModel", model,
        classOf[UnigramViterbi.Model].getName)
      s"${ev.value} = graft.expressions.UnigramViterbi.segment($c, $m);"
    })

  override protected def withNewChildInternal(c: Expression): UnigramViterbi =
    copy(child = c)

  override def prettyName: String = "unigram_viterbi"
}

object UnigramViterbi {

  /** Hard word-length cap: recursion-free DP arrays stay tiny and the
    * `ways` count provably fits a signed BIGINT — a word of len chars
    * has ≤ 2^(len−1) segmentations, and 2^62 < 2^63−1 only holds up to
    * len = 63 (at 64 an all-zero-cost pathological vocab overflows the
    * count; Math.addExact would crash instead of refusing). Real
    * corpora pre-split on whitespace never approach this; a longer
    * "word" means the upstream splitter broke, which must be loud.
    */
  val MaxWordLen = 63

  /** The frozen vocab as executor-resident model state: token → cost
    * lookup plus the max token length bounding the DP's inner loop.
    * Built once per (de)serialized expression instance.
    */
  final class Model(tokens: Array[String], costs: Array[Long])
      extends Serializable {
    // values boxed explicitly: a HashMap[String, scala.Long] would unbox
    // a missing key's null to 0L — a silent zero-cost token
    @transient lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](tokens.length * 2)
      var i = 0
      while (i < tokens.length) {
        require(m.put(tokens(i), java.lang.Long.valueOf(costs(i))) == null,
          s"unigram_viterbi: duplicate vocab token '${tokens(i)}'")
        require(costs(i) >= 0L,
          s"unigram_viterbi: negative cost for '${tokens(i)}' — min-cost " +
            "DP over negative edges is not shortest-path")
        i += 1
      }
      m
    }
    @transient lazy val maxTokLen: Int = tokens.map(_.length).max
  }

  /** Static DP entry shared by eval and generated code.
    * O(len · maxTokLen) time, O(len) space, pure integer arithmetic.
    */
  def segment(w: UTF8String, m: Model): GenericInternalRow = {
    val s = w.toString
    val n = s.length
    require(n <= MaxWordLen,
      s"unigram_viterbi: word of $n chars exceeds MaxWordLen=$MaxWordLen " +
        "— upstream whitespace splitting is broken")
    val best = new Array[Long](n + 1)
    val ways = new Array[Long](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    best(0) = 0L
    ways(0) = 1L
    var e = 1
    while (e <= n) {
      var j = math.max(0, e - m.maxTokLen)
      while (j < e) {
        if (best(j) != Long.MaxValue) {
          val c = m.lookup.get(s.substring(j, e))
          if (c != null) {
            val tot = Math.addExact(best(j), c.longValue())
            if (tot < best(e)) { best(e) = tot; ways(e) = ways(j) }
            else if (tot == best(e)) {
              ways(e) = Math.addExact(ways(e), ways(j))
            }
          }
        }
        j += 1
      }
      e += 1
    }
    require(best(n) != Long.MaxValue,
      s"unigram_viterbi: word '$s' is not coverable by the frozen vocab " +
        "— vocab/corpus alphabet drift")
    new GenericInternalRow(Array[Any](best(n), ways(n)))
  }
}
