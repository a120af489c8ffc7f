package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native dot product over two `array<float>` / `array<double>` columns,
  * or — the quantized path — two `array<bigint>` columns, where it
  * accumulates in a LONG and returns BIGINT: exact integer arithmetic
  * with no floating-point tie hazard (q85's ranking guarantee).
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

  // total on non-array children: dataType is consulted during analysis
  // before checkInputDataTypes rejects them, so don't cast blindly
  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case dt => dt
  }

  private def integerMode: Boolean =
    elemType(left) == LongType && elemType(right) == LongType

  override def dataType: DataType = if (integerMode) LongType else DoubleType

  // may return null on mismatched lengths even for non-null inputs
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = elemType(e) == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def fp(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    def lg(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    // both-floating (double accumulator) or both-long (exact BIGINT
    // accumulator); a mixed long/float pair is refused rather than
    // silently promoted so the caller picks the arithmetic explicitly
    if ((fp(left.dataType) && fp(right.dataType)) ||
        (lg(left.dataType) && lg(right.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs array<float|double> × array<float|double> or " +
          s"array<bigint> × array<bigint>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    if (integerMode) {
      var acc = 0L
      var i = 0
      while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
      acc
    } else {
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
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two VecDots inlined into one codegen function (e.g.
      // cosine's three dots) must not collide on local declarations
      val n = ctx.freshName("vdN")
      val acc = ctx.freshName("vdAcc")
      val i = ctx.freshName("vdI")
      val (accDecl, lGet, rGet) =
        if (integerMode)
          (s"long $acc = 0L;", s"$a.getLong($i)", s"$b.getLong($i)")
        else {
          val lg = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
                   else s"$a.getDouble($i)"
          val rg = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
                   else s"$b.getDouble($i)"
          (s"double $acc = 0.0;", lg, rg)
        }
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  $accDecl
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
