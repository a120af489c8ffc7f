package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature over a pre-hashed shingle set.
  *
  * Input: `array<long>` of per-shingle 64-bit hashes (from `xxhash64`).
  * Output: `array<long>` of `perms.length` signature slots, where slot i is
  * `min over shingles of (a_i * h + b_i)` in wraparound Z/2^64 arithmetic
  * (a_i odd ⇒ each permutation is a bijection).
  *
  * Replaces a 128-aggregate `groupBy(doc_id).agg(min(h*a0+b0), ...)` over
  * an exploded (doc, shingle) table: that shape pays one shuffle plus
  * 128 interpreted aggregate updates per shingle row. This is a narrow
  * per-row expression — the signature computes inside the scan stage with
  * whole-stage codegen, and nothing shuffles until the (much smaller)
  * band table. Same numbers, same LSH guarantees; the SURVEY §2.10 scale
  * analysis of band-bucket joins is unchanged.
  *
  * Empty input array → empty signature is wrong for LSH (it would bucket
  * all empty docs together on Long.MaxValue) — callers filter empty
  * shingle sets first, mirroring the previous groupBy shape which simply
  * had no rows to aggregate.
  */
case class MinHashSig(child: Expression, perms: Seq[(Long, Long)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<bigint>, got ${dt.sql}")
    }

  @transient private lazy val as: Array[Long] = perms.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = perms.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = as.length
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = as(j) * h + bs(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      // freshName so multiple instances inlined into one generated
      // function never collide on local declarations
      val n = ctx.freshName("mhN"); val k = ctx.freshName("mhK")
      val sig = ctx.freshName("mhSig"); val i = ctx.freshName("mhI")
      val h = ctx.freshName("mhH"); val j = ctx.freshName("mhJ")
      val v = ctx.freshName("mhV")
      s"""
         |int $n = $c.numElements();
         |int $k = $aRef.length;
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = $aRef[$j] * $h + $bRef[$j];
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)

  override def prettyName: String = "minhash_sig"
}
