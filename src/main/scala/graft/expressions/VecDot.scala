package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` / `array<double>` columns.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function fold in
  * the similarity hot path: HOFs evaluate one interpreted lambda call per
  * element and allocate the zipped intermediate array per row, which
  * dominated the all-pairs similarity queries (~80 s of a 119 s bench at
  * sf0.1). This expression whole-stage-codegens to a tight scalar loop.
  *
  * Determinism contract (same as the fold it replaces, see
  * VectorOps.scaladoc): elements are accumulated LEFT-TO-RIGHT into a
  * double accumulator, and each float is widened to double before the
  * multiply — bit-identical to DuckDB's `list_reduce(list_transform(...))`
  * oracle and to the previous HOF implementation, so oracle hashes are
  * unchanged.
  *
  * Nulls: null array → null result (standard binary-expression null
  * propagation). Array elements are assumed non-null (embedding vectors);
  * MISMATCHED LENGTHS yield null — the same visible outcome as the
  * zip_with fold this replaces (its null-padding poisons the sum), so a
  * malformed/truncated embedding surfaces as a null similarity instead
  * of a plausible-but-wrong value.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // may return null on mismatched lengths even for non-null inputs
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs array<float|double> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two VecDots inlined into one codegen function (e.g.
      // cosine's three dots) must not collide on local declarations
      val n = ctx.freshName("vdN")
      val acc = ctx.freshName("vdAcc")
      val i = ctx.freshName("vdI")
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $lGet * $rGet;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}
