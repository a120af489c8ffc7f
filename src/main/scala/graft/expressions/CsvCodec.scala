package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4180 CSV line codec as native codegen expressions — the wire
  * format the codec tier lacked (gzip q02, JSON q03/q04, WARC q169,
  * the media containers; CSV is still the lingua franca of tabular
  * interchange and the #1 ingest format real pipelines negotiate).
  *
  * Encoding (`CsvEncode`, array<string> → string): a field is emitted
  * raw unless it is empty or contains a comma, quote, CR or LF, in
  * which case it is quoted with inner quotes doubled (RFC 4180 §2.5–7).
  * NULL encodes as the empty UNQUOTED field and the empty string as
  * `""` — which makes the codec a BIJECTION on string-or-null field
  * arrays of arity ≥ 1. Arity 0 has no CSV representation at all (the
  * empty LINE is the one-NULL-field line), so a zero-field row is
  * refused loudly rather than silently aliased onto `[null]`.
  *
  * Decoding (`CsvSplit`, string → array<string>): a strict state
  * machine that REFUSES malformed input loudly (unbalanced quote, bare
  * quote inside an unquoted field, any character after a closing quote
  * other than the delimiter) — the house stance: a CSV reader that
  * "recovers" from a stray quote silently mis-shifts every following
  * column, the classic data-corruption bug this operator exists to
  * make impossible.
  *
  * Both directions follow the NfcNormalize pattern: `doGenCode` emits
  * a static call so whole-stage codegen stays fused.
  */
case class CsvEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"csv_encode needs array<string>, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CsvCodec.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CsvCodec.encode($c)")

  override protected def withNewChildInternal(c: Expression): CsvEncode =
    copy(child = c)

  override def prettyName: String = "csv_encode"
}

case class CsvSplit(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"csv_split needs string, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CsvCodec.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CsvCodec.split($c)")

  override protected def withNewChildInternal(c: Expression): CsvSplit =
    copy(child = c)

  override def prettyName: String = "csv_split"
}

object CsvCodec {

  private def needsQuoting(s: String): Boolean =
    s.isEmpty || s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r')

  /** Static entry shared by eval and generated code. */
  def encode(arr: ArrayData): UTF8String = {
    if (arr.numElements() == 0)
      throw new IllegalArgumentException(
        "csv_encode: zero-field row has no CSV representation " +
          "(the empty line is the one-NULL-field line)")
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < arr.numElements()) {
      if (i > 0) sb.append(',')
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        if (needsQuoting(s)) {
          sb.append('"')
          sb.append(s.replace("\"", "\"\""))
          sb.append('"')
        } else sb.append(s)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Strict RFC 4180 field split; throws on malformed input — never a
    * silent column shift.
    */
  def split(line: UTF8String): ArrayData = {
    val s = line.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val sb = new java.lang.StringBuilder
    var i = 0
    var inQuotes = false
    var fieldWasQuoted = false
    var fieldStarted = false
    def endField(): Unit = {
      out += (if (!fieldWasQuoted && sb.length == 0) null
              else UTF8String.fromString(sb.toString))
      sb.setLength(0); fieldWasQuoted = false; fieldStarted = false
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQuotes = false
        } else sb.append(c)
      } else if (c == '"') {
        if (fieldStarted)
          throw new IllegalArgumentException(
            s"csv_split: bare quote inside an unquoted field at offset $i")
        if (fieldWasQuoted)
          throw new IllegalArgumentException(
            s"csv_split: data after a closing quote at offset $i")
        inQuotes = true; fieldWasQuoted = true; fieldStarted = true
      } else if (c == ',') {
        endField()
      } else {
        if (fieldWasQuoted)
          throw new IllegalArgumentException(
            s"csv_split: data after a closing quote at offset $i")
        fieldStarted = true; sb.append(c)
      }
      i += 1
    }
    if (inQuotes)
      throw new IllegalArgumentException(
        "csv_split: unbalanced quote — line ends inside a quoted field")
    endField()
    new GenericArrayData(out.toArray[Any])
  }
}
