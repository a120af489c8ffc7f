package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity of two `array<long>` shingle-hash sets in ONE pass.
  *
  * Replaces `size(array_intersect(a,b)) / (size(a)+size(b)-size(
  * array_intersect(a,b)))`: that formula names `array_intersect` twice,
  * and in the q46/q58 verification path the predicate is pushed into the
  * join condition, where whole-stage codegen does NOT run subexpression
  * elimination (verified against the generated code — two
  * `array_intersect` call sites, each building its own hash set AND
  * materializing an intermediate array that only gets size-counted).
  * This expression computes the intersection cardinality once, with no
  * intermediate array, and derives union = |a| + |b| − |a∩b|.
  *
  * Exact parity with the formula it replaces (ExpressionParitySpec):
  *  - duplicate elements: `array_intersect` counts DISTINCT common
  *    elements, while the sizes in the denominator are RAW lengths —
  *    mirrored here (hash-set dedup on build, remove-on-match on probe).
  *  - both arrays empty: 0/0 division yields null under non-ANSI Spark —
  *    mirrored with an explicit null on zero union.
  *  - null array → null (standard binary-expression null propagation);
  *    array ELEMENTS are assumed non-null (shingle hashes).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null on null input or zero union (both arrays empty)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim needs array<bigint> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    val set = new java.util.HashSet[java.lang.Long](na * 2)
    var i = 0
    while (i < na) { set.add(x.getLong(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < nb) { if (set.remove(y.getLong(j))) inter += 1; j += 1 }
    val union = na + nb - inter
    if (union == 0) null else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("jsNa")
      val nb = ctx.freshName("jsNb")
      val set = ctx.freshName("jsSet")
      val inter = ctx.freshName("jsInter")
      val union = ctx.freshName("jsUnion")
      val i = ctx.freshName("jsI")
      val j = ctx.freshName("jsJ")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |java.util.HashSet<Long> $set = new java.util.HashSet<Long>($na * 2);
         |for (int $i = 0; $i < $na; $i++) {
         |  $set.add($a.getLong($i));
         |}
         |int $inter = 0;
         |for (int $j = 0; $j < $nb; $j++) {
         |  if ($set.remove($b.getLong($j))) $inter++;
         |}
         |int $union = $na + $nb - $inter;
         |if ($union == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (double) $inter / (double) $union;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sim"
}
