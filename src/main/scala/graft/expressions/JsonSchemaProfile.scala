package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.RawAns

/** [[graft.streaming.RawAns.profile]] as a native codegen expression:
  * per document, the array of `path<U+0001>type` entries for every
  * top-level member and every member of an object-valued top-level
  * member. The schema-drift MEASUREMENT leg of the open-schema
  * discipline (declared read q03/q04, preserving write q189, this
  * profile q197) — the consumer's dashboard for an evolving producer.
  * Same (b)-tier stance as NfcNormalize/JsonTagAppend: a static-call
  * `doGenCode` keeps the scan fused; a malformed document raises (the
  * raise-don't-drift discipline — a profiler that silently skips bad
  * docs under-reports exactly the anomalies it exists to surface).
  */
case class JsonSchemaProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"json_schema_profile needs string, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    JsonSchemaProfile.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.JsonSchemaProfile.profile($c)")

  override protected def withNewChildInternal(c: Expression): JsonSchemaProfile =
    copy(child = c)

  override def prettyName: String = "json_schema_profile"
}

object JsonSchemaProfile {
  /** Static entry shared by eval and generated code. */
  def profile(u: UTF8String): ArrayData =
    new GenericArrayData(RawAns.profile(u.toString).map { case (p, t) =>
      UTF8String.fromString(p + "\u0001" + t)
    }.toArray[Any])
}
