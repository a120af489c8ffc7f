package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Footer

/** q266: the HOUSE DATASOURCE — q259/q260's "DataSource-v2 reader
  * without the ceremony", WITH the ceremony: a real `TableProvider` +
  * `Table` + `ScanBuilder` so a stock `spark.read.format(classOf[
  * HouseSource].getName).load(dir)` reaches the pure-JDK house decoder
  * and CATALYST owns the pushdown contract:
  *
  *  - `SupportsPushDownRequiredColumns` → the scan decodes ONLY the
  *    pruned schema's chunks (q260's column pruning, now driven by
  *    Catalyst's own required-columns analysis instead of a hand list);
  *  - `SupportsPushDownFilters` → comparison filters on INT64/string
  *    leaves are accepted and drive PLAN-TIME unit pruning from footer
  *    stats (+ bloom tightening on EqualTo where the chunk embeds one);
  *    every accepted filter is also RETURNED as a residual, so Spark
  *    still evaluates it row-level — the parquet stance: file skipping
  *    is advisory metadata pruning, row correctness never depends on it;
  *  - partition = unit file, task = decode (q259's geometry), reader
  *    emits InternalRows straight off the decoded columns.
  *
  * Planning telemetry (units total / stats-surviving / planned) lands
  * in [[HouseSource.lastPlan]] for the registered query's
  * oracle-checkable bound and the spec's bloom-tightening pin.
  *
  * Scope: INT64 + UTF8 BYTE_ARRAY flat columns — the house decoder's
  * audited scope; anything else refuses loudly at schema inference.
  */
class HouseSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HouseSource.schemaOf(HouseSource.filesOf(options.get("path")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new HouseTable(HouseSource.filesOf(properties.get("path")), schema)

  override def supportsExternalMetadata(): Boolean = false
}

object HouseSource {

  /** (units_total, units_surviving_stats, units_planned) of the most
    * recent `planInputPartitions` — single-session telemetry for the
    * registered query and the spec (bloom tightening must only shrink
    * the stats bound, never widen it).
    */
  @volatile var lastPlan: (Long, Long, Long) = (0L, 0L, 0L)

  private[sources] def filesOf(path: String): Seq[String] = {
    require(path != null && path.nonEmpty,
      "q266: the house source needs a path — spark.read.format(...).load(dir)")
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        f.listFiles()
          .filter(x => x.getName.startsWith("part-") &&
            x.getName.endsWith(".parquet") && x.length() > 0)
          .map(_.getPath).sorted.toSeq
      else Seq(f.getPath)
    require(files.nonEmpty, s"q266: no parquet files under $path")
    files
  }

  /** Schema scope (r16, closing the r15 verdict's DSv2 gap): flat
    * INT64/UTF8 leaves as before, PLUS the standard 3-level LIST shape
    * the house tier already writes (q271) and decodes (q258) — a
    * depth-3 BYTE_ARRAY `element` leaf surfaces as `array<string>`
    * named by its outer group. Anything else still refuses loudly at
    * schema inference.
    */
  private[sources] def schemaOf(files: Seq[String]): StructType = {
    val (leaves, _) = Footer.parseFooter(files.head)
    val fields = leaves.map { l =>
      if (l.depth == 1) {
        val dt = l.physical match {
          case 2 => LongType
          case 6 => StringType
          case p => throw new IllegalArgumentException(
            s"q266: column '${l.name}' has physical type $p — the house " +
              "source reads INT64/BYTE_ARRAY only; refusing")
        }
        org.apache.spark.sql.types.StructField(l.name, dt,
          nullable = l.repetition != 0)
      } else if (l.name == "element" && l.depth == 3 && l.physical == 6 &&
          l.maxRep == 1 && l.path.nonEmpty) {
        // q273: the audited 3-level list-of-UTF8 shape (q258/q271);
        // elements are non-null by the house scope's own refusal
        org.apache.spark.sql.types.StructField(l.path.head,
          org.apache.spark.sql.types.ArrayType(StringType,
            containsNull = false), nullable = true)
      } else throw new IllegalArgumentException(
        s"q266: nested column '${l.name}' (depth ${l.depth}) — only flat " +
          "INT64/UTF8 leaves and 3-level list<string> are in scope")
    }
    StructType(fields.toArray)
  }

  /** The 8-byte LE plain encoding parquet blooms hash for INT64. */
  private[sources] def plainLong(v: Long): Array[Byte] =
    Array.tabulate(8)(i => ((v >>> (8 * i)) & 0xff).toByte)

  /** Does `f`'s predicate possibly match a unit with stats `u`? The
    * sound overlap rule — unknown filter shapes keep the unit.
    *
    * String bounds compare as UTF-8 UNSIGNED BYTES, because that is the
    * order the stats were picked in (HouseWriter.statBytes / parquet's
    * BYTE_ARRAY stats contract). Java String `<=` compares UTF-16 code
    * units, which diverges on supplementary characters (U+1F600 is
    * F0 9F 98 80 in UTF-8 — ABOVE U+FFFF's EF BF BF — but its surrogate
    * pair D83D DE00 sorts BELOW in UTF-16): under the String order a
    * unit containing the queried value could be pruned at plan time,
    * and since pruning drops whole InputPartitions the residual row
    * filter cannot recover the rows (r15 ADVICE, pinned in PlanSpec).
    */
  private[graft] def statsKeep(u: Footer.UnitStats, f: Filter): Boolean = {
    def num(a: String): Option[(Long, Long)] =
      if (u.lo.contains(a)) Some((u.lo(a), u.hi(a))) else None
    def utf8Leq(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")) <= 0
    f match {
      case EqualTo(a, v: Number) =>
        num(a).forall { case (lo, hi) => lo <= v.longValue && hi >= v.longValue }
      case EqualTo(a, v: String) =>
        if (u.loS.contains(a)) utf8Leq(u.loS(a), v) && utf8Leq(v, u.hiS(a))
        else true
      case GreaterThan(a, v: Number) => num(a).forall(_._2 > v.longValue)
      case GreaterThanOrEqual(a, v: Number) =>
        num(a).forall(_._2 >= v.longValue)
      case LessThan(a, v: Number) => num(a).forall(_._1 < v.longValue)
      case LessThanOrEqual(a, v: Number) => num(a).forall(_._1 <= v.longValue)
      case _ => true
    }
  }

  /** Bloom tightening for INT64 EqualTo: probe the unit's embedded SBBF
    * when the chunk carries one (sound — no false negatives); units
    * without a bloom are kept.
    */
  private[sources] def bloomKeep(path: String, f: Filter): Boolean = f match {
    case EqualTo(a, v: Number) =>
      val (leaves, chunks) = Footer.parseFooter(path)
      val li = leaves.indexWhere(_.name == a)
      if (li < 0 || leaves(li).physical != 2) true
      else if (chunks(li).head.bloomOffset < 0) true
      else Footer.readBloom(path, a)
        .mightContain(Footer.xxh64(plainLong(v.longValue)))
    case _ => true
  }

  /** The filter shapes the source accepts for plan-time pruning. */
  private[sources] def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual => true
    case _ => false
  }
}

private[sources] class HouseTable(files: Seq[String], tschema: StructType)
    extends Table with SupportsRead {
  override def name(): String = "house"
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HouseScanBuilder(files, tschema)
}

private[sources] class HouseScanBuilder(files: Seq[String],
    fullSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(HouseSource.supported)
    filters // ALL residual: pruning is advisory, rows re-filtered by Spark
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new HouseScan(files, required, pushed)
}

private[sources] class HouseScan(files: Seq[String], required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"HouseScan PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val stats = files.map(p => p -> Footer.unitStatsOf(p))
    val bySt = stats.filter { case (_, u) =>
      pushed.forall(f => HouseSource.statsKeep(u, f))
    }
    val planned = bySt.map(_._1).filter { p =>
      pushed.forall(f => HouseSource.bloomKeep(p, f))
    }
    HouseSource.lastPlan =
      (files.size.toLong, bySt.size.toLong, planned.size.toLong)
    planned.map(p => HousePartition(p): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new HouseReaderFactory(required)
}

private[sources] case class HousePartition(path: String)
    extends InputPartition

private[sources] class HouseReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[HousePartition].path
    new PartitionReader[InternalRow] {
      // decode ONLY the required chunks — column pruning as real I/O;
      // list columns ride the q258 Dremel assembler (r16: the v2 and
      // delta shapes already flow here too — decodeColumnChunk resolves
      // the page generation and encoding per chunk)
      private val cols: Array[IndexedSeq[Any]] = required.fields.map { f =>
        val vs: IndexedSeq[Any] = f.dataType match {
          case LongType => Footer.decodeColumnChunk(path, f.name)
            .longs.toIndexedSeq
          case org.apache.spark.sql.types.ArrayType(StringType, _) =>
            Footer.decodeListStrChunk(path, f.name).toIndexedSeq.map { ws =>
              new org.apache.spark.sql.catalyst.util.GenericArrayData(
                ws.map(UTF8String.fromString).toArray[Any])
            }
          case _ => Footer.decodeColumnChunk(path, f.name)
            .strs.toIndexedSeq.map(UTF8String.fromString)
        }
        vs
      }
      private val n: Int =
        if (cols.nonEmpty) {
          require(cols.forall(_.size == cols.head.size),
            s"q266: ragged column lengths decoding $path — refusing to zip")
          cols.head.size
        } else { // COUNT(*)-style empty projection: row count from footer
          // a list chunk's num_values is its LEVEL count, not rows —
          // the row count must come from a FLAT leaf's chunk
          val (leaves, chunks) = Footer.parseFooter(path)
          val fi = leaves.indexWhere(_.depth == 1)
          require(fi >= 0,
            s"q266: no flat leaf to count rows from in $path; refusing")
          chunks(fi).map(_.numValues).sum.toInt
        }
      private var i = -1
      override def next(): Boolean = { i += 1; i < n }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toIndexedSeq.map(_(i)))
      override def close(): Unit = ()
    }
  }
}
