package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first segmentation of one word against a FROZEN
  * two-sided vocab — the WordPiece inference step (Wu et al. 2016; the
  * published BERT `WordpieceTokenizer` algorithm): starting at the word
  * head, repeatedly emit the LONGEST vocab piece matching at the cursor
  * (word-initial pieces from one set, continuation pieces — the ones a
  * vocab file prints with the "##" prefix — from the other) and advance;
  * if NO piece matches at a reached cursor, the WHOLE word maps to [UNK]
  * (pieces already emitted are discarded — the published all-or-nothing
  * rule, not a partial fallback). Words longer than [[WordpieceGreedy
  * .MaxWordChars]] map to [UNK] without scanning, again per the
  * published algorithm (BERT's `max_input_chars_per_word`).
  *
  * Returns `struct(pieces: bigint, unk: bigint)`:
  *  - `pieces` = emitted piece count (1 for an [UNK] word);
  *  - `unk`    = 1 if the word mapped to [UNK], else 0.
  * Greedy's output is a single deterministic walk — no tie-break rules
  * needed (ties in match LENGTH are impossible: one longest match per
  * cursor position per side). This is deliberately NOT the min-piece
  * segmentation: greedy is the published algorithm, and its
  * suboptimality vs the q198 uniform-cost DP optimum is pinned in the
  * specs rather than papered over.
  *
  * Both vocab sides carry PLAIN strings (the "##" is a vocab-file
  * serialization convention, not part of the matched text).
  *
  * Codegen follows the UnigramViterbi pattern: `doGenCode` emits a
  * static call against a reference-object model, keeping whole-stage
  * fusion with constant generated-code size.
  */
case class WordpieceGreedy(
    child: Expression,
    initial: Array[String],
    continuation: Array[String])
    extends UnaryExpression {

  require(initial.nonEmpty,
    "wordpiece_greedy: the word-initial vocab side must be non-empty " +
      "(every word would be [UNK] — a configuration error, not a corpus)")

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", LongType, nullable = false),
    StructField("unk", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wordpiece_greedy needs string, got ${dt.sql}")
    }

  @transient private lazy val model =
    new WordpieceGreedy.Model(initial, continuation)

  override protected def nullSafeEval(input: Any): Any =
    WordpieceGreedy.segment(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("wpModel", model,
        classOf[WordpieceGreedy.Model].getName)
      s"${ev.value} = graft.expressions.WordpieceGreedy.segment($c, $m);"
    })

  override protected def withNewChildInternal(c: Expression): WordpieceGreedy =
    copy(child = c)

  override def prettyName: String = "wordpiece_greedy"
}

object WordpieceGreedy {

  /** BERT's published `max_input_chars_per_word`: longer words map to
    * [UNK] without scanning. Unlike UnigramViterbi's loud MaxWordLen
    * this is NOT a refusal — the published algorithm defines the
    * behavior, so the operator follows it (and reports it via `unk`).
    */
  val MaxWordChars = 200

  /** The frozen two-sided vocab as executor-resident model state. */
  final class Model(initial: Array[String], continuation: Array[String])
      extends Serializable {
    private def toSet(a: Array[String], side: String): java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](a.length * 2)
      a.foreach { t =>
        require(t.nonEmpty, s"wordpiece_greedy: empty $side vocab piece " +
          "— a zero-length match would never advance the cursor")
        require(s.add(t), s"wordpiece_greedy: duplicate $side piece '$t'")
      }
      s
    }
    @transient lazy val init: java.util.HashSet[String] = toSet(initial, "initial")
    @transient lazy val cont: java.util.HashSet[String] =
      toSet(continuation, "continuation")
    @transient lazy val maxTokLen: Int =
      (initial.iterator ++ continuation.iterator).map(_.length).max
  }

  /** Static greedy walk shared by eval and generated code.
    * O(len · maxTokLen) time, O(1) space, single deterministic pass.
    */
  def segment(w: UTF8String, m: Model): GenericInternalRow = {
    val s = w.toString
    val n = s.length
    if (n > MaxWordChars)
      return new GenericInternalRow(Array[Any](1L, 1L))
    var pos = 0
    var pieces = 0L
    while (pos < n) {
      val side = if (pos == 0) m.init else m.cont
      var e = math.min(n, pos + m.maxTokLen)
      var len = 0
      while (e > pos && len == 0) {
        if (side.contains(s.substring(pos, e))) len = e - pos
        e -= 1
      }
      if (len == 0)
        return new GenericInternalRow(Array[Any](1L, 1L)) // whole word [UNK]
      pieces += 1L
      pos += len
    }
    new GenericInternalRow(Array[Any](pieces, 0L))
  }
}
