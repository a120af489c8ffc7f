package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-Bloom membership probe — the map-only prune that makes
  * set-membership gates (decontamination, corpus-difference, blocklists)
  * scan-shaped instead of join-shaped.
  *
  * Input is either a single `bigint` key or an `array<bigint>` of keys
  * (the per-document shingle-hash array); output is `boolean`:
  *
  *  - `bigint`       → "might this key be in the set"
  *  - `array<bigint>`→ "might ANY element be in the set" (the document-
  *    level candidate gate: a doc needs exact verification iff at least
  *    one of its shingles could hit the reference set)
  *
  * `bits` is the `spark.util.sketch.BloomFilter` stream form (writeTo),
  * shipped as a BROADCAST — the filter rides the torrent broadcast path
  * once per executor instead of re-serializing into every task closure
  * (the geometry q155's scale note names: m ≈ 10·|keys| bits means a
  * 10⁸-key deny/benchmark set is ~120 MB — task-closure shipping would
  * resend it per task). The filter object itself is rebuilt lazily once
  * per deserialized expression instance, from the executor-local bits.
  *
  * Guarantee: NO FALSE NEGATIVES — a true member always probes true, so
  * a bloom-pruned candidate set is a SUPERSET of the exact answer and an
  * exact verify on the survivors reproduces the exact result. False
  * positives only cost verify work (rate set by the builder's fpp).
  *
  * Scale stance: the reference set for decontamination is
  * benchmark-sized (fixed as the corpus grows), but even when it is
  * large, the bloom bits are ~10 bits/key vs the ≥64 bits/key (plus
  * hash-relation overhead) a broadcast join would ship — and the probe
  * keeps the corpus side map-only: bloom-negative documents never reach
  * an explode, shuffle, or join. Null input → null (standard unary
  * propagation); null array elements are skipped (a null shingle cannot
  * be a member).
  *
  * CodegenFallback is deliberate (ShingleHashes/SimHash64 stance): one
  * virtual call per row with a native loop + sketch probe inside.
  */
case class BloomAnyProbe(child: Expression, bits: Broadcast[Array[Byte]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits.value))

  private lazy val isArray: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_any_probe needs bigint or array<bigint>, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    if (!isArray) filter.mightContainLong(input.asInstanceOf[Long])
    else {
      val xs = input.asInstanceOf[ArrayData]
      val n = xs.numElements()
      var i = 0
      var hit = false
      while (i < n && !hit) {
        if (!xs.isNullAt(i) && filter.mightContainLong(xs.getLong(i))) hit = true
        i += 1
      }
      hit
    }

  override protected def withNewChildInternal(c: Expression): BloomAnyProbe =
    copy(child = c)

  override def prettyName: String = "bloom_any_probe"
}
