package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.AnsModel.Tag
import graft.streaming.RawAns

/** The open-schema tag append ([[graft.streaming.RawAns]] — `tag.py:64`'s
  * "modify only what you understand, preserve the rest") as a native
  * codegen expression, so the batch form of the write-back runs fused in
  * whole-stage codegen like every other scalar here (the q182 tier: a
  * Scala UDF would serialize a closure and break the pipeline). The tag
  * is a construction-time constant (the reference applies one fixed tag,
  * `tag.py:59-62`), carried into generated code as a referenced object.
  * Returns the input UTF8String OBJECT unchanged when the tag is already
  * present — zero allocation on the already-tagged path.
  */
case class JsonTagAppend(child: Expression, slug: String, text: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"json_tag_append needs string, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    JsonTagAppend.append(input.asInstanceOf[UTF8String], slug, text)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val slugRef = ctx.addReferenceObj("slug", slug, "java.lang.String")
    val textRef = ctx.addReferenceObj("text", text, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.JsonTagAppend.append($c, $slugRef, $textRef)")
  }

  override protected def withNewChildInternal(c: Expression): JsonTagAppend =
    copy(child = c)

  override def prettyName: String = "json_tag_append"
}

object JsonTagAppend {
  /** Static entry shared by eval and generated code. */
  def append(u: UTF8String, slug: String, text: String): UTF8String = {
    val s = u.toString
    val out = RawAns.appendTagIfAbsent(s, Tag(slug, text))
    if (out eq s) u else UTF8String.fromString(out)
  }
}
