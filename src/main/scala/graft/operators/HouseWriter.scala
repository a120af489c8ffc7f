package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q262: the HOUSE PARQUET WRITER — the format tier's WRITE side,
  * closing the loop the read side opened (q239 walked footers, q249+
  * decoded pages; this EMITS them): a complete parquet file assembled
  * pure-JDK — thrift-compact footer (schema with logical types,
  * row-group/column-chunk metadata, min/max/null statistics), v1 PLAIN
  * data pages with RLE definition levels, PAR1 magics — with NOTHING
  * from parquet-mr anywhere in the path.
  *
  * The proof of correctness is INDEPENDENCE: the registered query reads
  * the house-written file back through SPARK'S OWN reader (parquet-mr —
  * a reader that shares no code with this writer) and aggregates to the
  * SQL truth the oracle recomputes from the raw table; the spec
  * additionally pins that the house DECODER and the q239 footer walker
  * read the same file (writer ≡ both readers), that the emitted
  * statistics are exactly the column extrema (so the q245 pruning
  * arithmetic works on house-written units verbatim), and that DuckDB-
  * class strictness holds (magic/length sanity).
  *
  * Scope, stated: INT64 + UTF8 BYTE_ARRAY columns, optional flat
  * fields, one row group, uncompressed PLAIN pages — the exact subset
  * the probe exercises, refused loudly outside it. Scale shape: a
  * production write is per-partition (each task emits its own file —
  * the q259 partition=file geometry in reverse); the writer here is the
  * per-task kernel of that.
  */
object HouseWriter {

  /** Thrift compact-protocol writer — the mirror of Footer's
    * CompactReader, implementing only what FileMetaData needs.
    */
  private final class CompactWriter {
    val out = new java.io.ByteArrayOutputStream()
    def u8(b: Int): Unit = out.write(b & 0xff)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { u8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      u8(v.toInt)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def bytes(b: Array[Byte]): Unit = { varint(b.length.toLong); out.write(b) }
    def str(s: String): Unit = bytes(s.getBytes("UTF-8"))
    /** field header: short form when the id delta fits a nibble. */
    def field(lastId: Int, id: Int, tpe: Int): Unit = {
      val d = id - lastId
      if (d > 0 && d <= 15) u8((d << 4) | tpe)
      else { u8(tpe); zigzag(id.toLong) }
    }
    def stop(): Unit = u8(0)
    def listHeader(elemType: Int, size: Int): Unit = {
      if (size < 15) u8((size << 4) | elemType)
      else { u8(0xf0 | elemType); varint(size.toLong) }
    }
    def toByteArray: Array[Byte] = out.toByteArray
  }

  /** One column of the bounded writer kernel. */
  sealed trait HCol {
    def name: String
    def size: Int
    def slice(from: Int, until: Int): HCol
  }
  final case class LongCol(name: String, values: Seq[Long]) extends HCol {
    def size: Int = values.size
    def slice(from: Int, until: Int): HCol =
      LongCol(name, values.slice(from, until))
  }
  final case class StrCol(name: String, values: Seq[String]) extends HCol {
    def size: Int = values.size
    def slice(from: Int, until: Int): HCol =
      StrCol(name, values.slice(from, until))
  }

  /** q264/q265: the writer's parity options. q264 tier: dictionary
    * encoding, snappy-compressed page bodies, multiple row groups with
    * per-group statistics. q265 tier: multiple data pages per chunk
    * (`rowsPerPage`), ColumnIndex/OffsetIndex emission (`pageIndex`),
    * and split-block bloom filters for the named INT64 columns
    * (`bloomCols`) — the structures q257's page pruning and q256's
    * bloom pruning consume, now producible as well as readable.
    */
  final case class HouseSpec(dictionary: Boolean = false,
      snappy: Boolean = false, rowsPerGroup: Long = Long.MaxValue,
      rowsPerPage: Long = Long.MaxValue, pageIndex: Boolean = false,
      bloomCols: Set[String] = Set.empty,
      // q269: SECOND-generation pages — DataPageHeaderV2 with
      // DELTA_BINARY_PACKED integers / DELTA_BYTE_ARRAY strings
      // (mutually exclusive with `dictionary`: v2 writes delta)
      v2: Boolean = false)

  /** The eight SBBF salt constants (parquet-format BloomFilter.md —
    * the same published table Footer's reader uses).
    */
  private val BloomSalt = Array(0x47b6137b, 0x44974d91, 0x8824ad5b,
    0xa2b7289d.toInt, 0x705495c7, 0x2df1424b, 0x9efc4947.toInt, 0x5c6bfb31)

  /** q265: build an SBBF bitset over the DISTINCT plain-encoded values:
    * sized ~11 bits/value rounded up to a power of two (min one 32-byte
    * block), each value setting one salt-derived bit per word of one
    * hash-selected block — the exact dual of Footer's `mightContain`.
    */
  private def buildBloom(encoded: Seq[Array[Byte]]): Array[Byte] = {
    var nBytes = 32
    while (nBytes * 8 < encoded.size * 11 && nBytes < (1 << 26)) nBytes <<= 1
    val bits = new Array[Byte](nBytes)
    val numBlocks = nBytes / 32
    encoded.foreach { b =>
      val h = Footer.xxh64(b)
      val block = (((h >>> 32) * numBlocks.toLong) >>> 32).toInt
      val key = h.toInt
      var i = 0
      while (i < 8) {
        val bit = (key * BloomSalt(i)) >>> 27
        val at = block * 32 + i * 4 + bit / 8
        bits(at) = (bits(at) | (1 << (bit % 8))).toByte
        i += 1
      }
    }
    bits
  }

  private def leInt4(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def leLong8(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  /** One RLE run of n ones at bit width 1 — the definition-level
    * payload for an all-present optional column.
    */
  private def rleOnesRun(n: Int): Array[Byte] = {
    val run = new java.io.ByteArrayOutputStream()
    var h = (n.toLong << 1)
    while ((h & ~0x7fL) != 0L) { run.write(((h & 0x7f) | 0x80).toInt); h >>>= 7 }
    run.write(h.toInt); run.write(1)
    run.toByteArray
  }

  /** v1 definition-level section: 4-byte length prefix + the RLE run
    * (v2 pages carry the run UNPREFIXED — q269).
    */
  private def defLevelSection(n: Int): Array[Byte] = {
    val defs = rleOnesRun(n)
    val out = new java.io.ByteArrayOutputStream()
    out.write(leInt4(defs.length)); out.write(defs)
    out.toByteArray
  }

  /** PLAIN-encoded values (INT64 LE / length-prefixed UTF-8). */
  private def plainValues(col: HCol): Array[Byte] = {
    val vals = new java.io.ByteArrayOutputStream()
    col match {
      case LongCol(_, vs) => vs.foreach(v => vals.write(leLong8(v)))
      case StrCol(_, vs) => vs.foreach { s =>
        val b = s.getBytes("UTF-8"); vals.write(leInt4(b.length)); vals.write(b)
      }
    }
    vals.toByteArray
  }

  /** q264: the column's dictionary (first-seen order — parquet-mr's own
    * insertion order) and per-row indices into it.
    */
  private def dictAndIndices(col: HCol): (HCol, Array[Int]) = col match {
    case LongCol(nm, vs) =>
      val order = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
      val idx = vs.map(v => order.getOrElseUpdate(v, order.size)).toArray
      (LongCol(nm, order.keys.toSeq), idx)
    case StrCol(nm, vs) =>
      val order = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      val idx = vs.map(v => order.getOrElseUpdate(v, order.size)).toArray
      (StrCol(nm, order.keys.toSeq), idx)
  }

  /** One RLE/bit-packed HYBRID run covering all of `vals` at width
    * `bw` (padded to a multiple of 8 with zeros), LSB-first — the run
    * shape shared by v1 dictionary indices (q264) and Dremel level
    * streams (q271).
    */
  private def bitPackedRun(vals: Seq[Int], bw: Int): Array[Byte] = {
    // materialize ONCE: a caller handing a linear Seq (ArrayBuffer.toSeq
    // is a List in 2.13) would otherwise make every `a(i)` and the
    // length check O(i) — measured as q271's level encode going
    // QUADRATIC and freezing the r16 bench at sf0.1 token counts
    val a = vals.toArray
    val groups = (a.length + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    var h = (groups.toLong << 1) | 1L
    while ((h & ~0x7fL) != 0L) { out.write(((h & 0x7f) | 0x80).toInt); h >>>= 7 }
    out.write(h.toInt)
    var acc = 0L; var nbits = 0; var i = 0
    val total = groups * 8
    while (i < total) {
      val v = if (i < a.length) a(i).toLong else 0L
      acc |= v << nbits; nbits += bw
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
      i += 1
    }
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** q264: the v1 dictionary-index section — [1-byte bit width] + one
    * hybrid bit-packed run over the indices.
    */
  private def packedIndices(idx: Array[Int], dictSize: Int): Array[Byte] = {
    val bw = math.max(1,
      32 - Integer.numberOfLeadingZeros(math.max(1, dictSize - 1)))
    val out = new java.io.ByteArrayOutputStream()
    out.write(bw)
    out.write(bitPackedRun(idx.toIndexedSeq, bw))
    out.toByteArray
  }

  /** q269: DELTA_BINARY_PACKED encoder — the exact dual of Footer's
    * reader: ULEB128 block header (blockSize=128, 4 miniblocks of 32),
    * total count, zigzag first value; per block a zigzag min-delta, ALL
    * four width bytes (unstarted miniblocks write width 0), then only
    * the STARTED miniblocks' bit-packed adjusted deltas (each written
    * in full — perMini·w/8 bytes, padding bits zero), LSB-first.
    */
  private[graft] def deltaBinaryPacked(vals0: Seq[Long]): Array[Byte] = {
    val vals = vals0.toIndexedSeq // same indexing hazard as bitPackedRun
    val blockSize = 128; val miniN = 4; val perMini = blockSize / miniN
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    varint(blockSize.toLong); varint(miniN.toLong); varint(vals.size.toLong)
    if (vals.isEmpty) return out.toByteArray
    zigzag(vals.head)
    var i = 1
    while (i < vals.size) {
      val blockCount = math.min(blockSize, vals.size - i)
      val deltas = Array.tabulate(blockCount)(j => vals(i + j) - vals(i + j - 1))
      val minDelta = deltas.min
      val adj = deltas.map(_ - minDelta) // each >= 0
      zigzag(minDelta)
      val started = (blockCount + perMini - 1) / perMini
      val widths = Array.tabulate(miniN) { m =>
        if (m >= started) 0
        else {
          val mx = adj.slice(m * perMini,
            math.min((m + 1) * perMini, blockCount)).max
          64 - java.lang.Long.numberOfLeadingZeros(mx)
        }
      }
      widths.foreach(out.write)
      var m = 0
      while (m < started) {
        val w = widths(m)
        if (w > 0) {
          val bytes = new Array[Byte](perMini * w / 8)
          var k = 0
          while (k < perMini) {
            val idx = m * perMini + k
            val v = if (idx < blockCount) adj(idx) else 0L
            var j = 0
            val bit = k * w
            while (j < w) {
              if (((v >>> j) & 1L) != 0L)
                bytes((bit + j) >> 3) =
                  (bytes((bit + j) >> 3) | (1 << ((bit + j) & 7))).toByte
              j += 1
            }
            k += 1
          }
          out.write(bytes)
        }
        m += 1
      }
      i += blockCount
    }
    out.toByteArray
  }

  /** q269: DELTA_LENGTH_BYTE_ARRAY — lengths as one DBP stream, then
    * the concatenated bytes.
    */
  private[graft] def deltaLengthByteArray(vals: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(deltaBinaryPacked(vals.map(_.length.toLong)))
    vals.foreach(out.write)
    out.toByteArray
  }

  /** q269: DELTA_BYTE_ARRAY — front coding: shared-prefix lengths vs
    * the previous value as a DBP stream, suffixes as DELTA_LENGTH.
    */
  private[graft] def deltaByteArray(vals: Seq[String]): Array[Byte] = {
    val enc = vals.map(_.getBytes("UTF-8"))
    var prev = Array.emptyByteArray
    val (prefixes, suffixes) = enc.map { b =>
      var p = 0
      val lim = math.min(prev.length, b.length)
      while (p < lim && prev(p) == b(p)) p += 1
      val r = (p.toLong, java.util.Arrays.copyOfRange(b, p, b.length))
      prev = b
      r
    }.unzip
    val out = new java.io.ByteArrayOutputStream()
    out.write(deltaBinaryPacked(prefixes))
    out.write(deltaLengthByteArray(suffixes))
    out.toByteArray
  }

  /** v1 page header: DATA_PAGE (ptype 0, DataPageHeader at field 5) or
    * DICTIONARY_PAGE (ptype 2, DictionaryPageHeader at field 7).
    */
  private def pageHeader(ptype: Int, ups: Int, cps: Int,
      nVals: Int, enc: Int): Array[Byte] = {
    val w = new CompactWriter
    w.field(0, 1, 5); w.zigzag(ptype.toLong)
    w.field(1, 2, 5); w.zigzag(ups.toLong)
    w.field(2, 3, 5); w.zigzag(cps.toLong)
    if (ptype == 0) {
      w.field(3, 5, 12)                     // DataPageHeader
      w.field(0, 1, 5); w.zigzag(nVals.toLong)
      w.field(1, 2, 5); w.zigzag(enc.toLong)
      w.field(2, 3, 5); w.zigzag(3L)        //   def levels RLE
      w.field(3, 4, 5); w.zigzag(3L)        //   rep levels RLE
      w.stop()
    } else {
      w.field(3, 7, 12)                     // DictionaryPageHeader
      w.field(0, 1, 5); w.zigzag(nVals.toLong)
      w.field(1, 2, 5); w.zigzag(enc.toLong)
      w.stop()
    }
    w.stop()
    w.toByteArray
  }

  /** q269: the second-generation page header — DataPageHeaderV2 at
    * field 8, levels UNCOMPRESSED and unprefixed at the body head,
    * is_compressed governing only the values section (a thrift bool
    * rides the field-header nibble: type 1 true, 2 false).
    */
  private def pageHeaderV2(ups: Int, cps: Int, nVals: Int, enc: Int,
      defLen: Int, compressed: Boolean): Array[Byte] = {
    val w = new CompactWriter
    w.field(0, 1, 5); w.zigzag(3L)             // type: DATA_PAGE_V2
    w.field(1, 2, 5); w.zigzag(ups.toLong)
    w.field(2, 3, 5); w.zigzag(cps.toLong)
    w.field(3, 8, 12)                          // DataPageHeaderV2
    w.field(0, 1, 5); w.zigzag(nVals.toLong)   //   num_values
    w.field(1, 2, 5); w.zigzag(0L)             //   num_nulls
    w.field(2, 3, 5); w.zigzag(nVals.toLong)   //   num_rows
    w.field(3, 4, 5); w.zigzag(enc.toLong)     //   encoding
    w.field(4, 5, 5); w.zigzag(defLen.toLong)  //   def_levels_byte_length
    w.field(5, 6, 5); w.zigzag(0L)             //   rep_levels_byte_length
    w.field(6, 7, if (compressed) 1 else 2)    //   is_compressed
    w.stop()
    w.stop()
    w.toByteArray
  }

  /** Plain-encoded statistics bytes for min/max. String extrema are
    * picked over the UTF-8 ENCODINGS under unsigned byte comparison —
    * the order parquet readers compare BYTE_ARRAY stats in (r14
    * ADVICE: Java String ordering compares UTF-16 code units, which
    * diverges from UTF-8 byte order on supplementary characters, and a
    * stats-trusting reader would then skip matching rows).
    */
  private def statBytes(col: HCol, max: Boolean): Array[Byte] = col match {
    case LongCol(_, vs) => leLong8(if (max) vs.max else vs.min)
    case StrCol(_, vs) =>
      val enc = vs.map(_.getBytes("UTF-8"))
      enc.reduce { (a, b) =>
        val c = java.util.Arrays.compareUnsigned(a, b)
        if ((max && c >= 0) || (!max && c <= 0)) a else b
      }
  }

  /** One written data page's bookkeeping (q265: OffsetIndex rows and
    * ColumnIndex stats come straight from these).
    */
  private final case class PageMeta(off: Long, size: Int, firstRow: Long,
      minB: Array[Byte], maxB: Array[Byte])

  /** One written chunk's bookkeeping for the footer. The index/bloom
    * locations are patched in after the data section (they live between
    * the data and the footer, like parquet-mr writes them).
    */
  private final class ChunkMeta(val col: HCol, val dictOff: Long,
      val dataOff: Long, val totalComp: Long, val totalUncomp: Long,
      val encs: Seq[Long], val nVals: Int, val pages: Seq[PageMeta]) {
    var bloomOff: Long = -1L; var bloomLen: Int = -1
    var oiOff: Long = -1L; var oiLen: Int = -1
    var ciOff: Long = -1L; var ciLen: Int = -1
  }

  /** Write `cols` (equal lengths, non-null) as one single-row-group
    * uncompressed PLAIN parquet file at `path` — the r14 scope,
    * unchanged. Returns the byte count.
    */
  def write(path: String, cols: Seq[HCol]): Long =
    write(path, cols, HouseSpec())

  /** q264: write `cols` under `spec` — dictionary-encoded pages,
    * snappy-compressed bodies, and/or multiple row groups with
    * per-group statistics. A dictionary chunk's encodings list is
    * exactly [PLAIN_DICTIONARY, RLE] (no PLAIN — the writer never falls
    * back mid-chunk, so q254's dictionary-completeness proof holds on
    * house files by construction). Returns the byte count.
    */
  def write(path: String, cols0: Seq[HCol], spec: HouseSpec): Long = {
    require(cols0.nonEmpty, "q262: no columns")
    // indexed views once at entry: group/page slicing and the delta
    // encoders index repeatedly, and a linear Seq (e.g. a List from
    // ArrayBuffer.toSeq) would turn the kernel quadratic (the q271
    // level-stream hazard, fixed at every indexing seam)
    val cols = cols0.map {
      case LongCol(nm, v) => LongCol(nm, v.toIndexedSeq)
      case StrCol(nm, v)  => StrCol(nm, v.toIndexedSeq)
    }
    val n = cols.head.size
    require(n > 0, "q262: empty table — nothing to write")
    cols.foreach(c => require(c.size == n, s"q262: ragged column ${c.name}"))
    val rpg = math.min(spec.rowsPerGroup, n.toLong).toInt
    require(rpg > 0, s"q264: rowsPerGroup must be positive, got $rpg")
    def deflate(b: Array[Byte]): Array[Byte] =
      if (spec.snappy) org.xerial.snappy.Snappy.compress(b) else b
    val codecId = if (spec.snappy) 1L else 0L
    val out = new java.io.ByteArrayOutputStream()
    out.write("PAR1".getBytes("US-ASCII"))
    val rpp = math.min(spec.rowsPerPage, rpg.toLong).toInt
    require(rpp > 0, s"q265: rowsPerPage must be positive, got $rpp")
    // data section: per row group, per column, one optional dict page
    // then one data page per `rowsPerPage` slice
    val groups: Seq[(Seq[ChunkMeta], Int)] =
      (0 until n by rpg).map { s =>
        val e = math.min(s + rpg, n)
        val gn = e - s
        val metas = cols.map { c0 =>
          val c = c0.slice(s, e)
          require(!(spec.dictionary && spec.v2),
            "q269: v2 pages write delta encodings — dictionary is the v1 tier")
          val dictIdx: Option[(HCol, Array[Int])] =
            if (spec.dictionary) Some(dictAndIndices(c)) else None
          var dictOff = -1L
          var totalComp = 0L; var totalUncomp = 0L
          dictIdx.foreach { case (dict, _) =>
            val dictBody = plainValues(dict)
            val dictComp = deflate(dictBody)
            val dictHdr =
              pageHeader(2, dictBody.length, dictComp.length, dict.size, 2)
            dictOff = out.size().toLong
            out.write(dictHdr); out.write(dictComp)
            totalComp += dictHdr.length + dictComp.length
            totalUncomp += dictHdr.length + dictBody.length
          }
          val pages = (0 until gn by rpp).map { ps =>
            val pe = math.min(ps + rpp, gn)
            val pn = pe - ps
            val pc = c.slice(ps, pe)
            val off = out.size().toLong
            val (hdr, wire, bodyLen) =
              if (spec.v2) {
                // q269: levels unprefixed + UNCOMPRESSED at the body
                // head; only the values section honors is_compressed
                val defs = rleOnesRun(pn)
                val values = pc match {
                  case LongCol(_, vs) => deltaBinaryPacked(vs)
                  case StrCol(_, vs)  => deltaByteArray(vs)
                }
                val enc = pc match { case _: LongCol => 5; case _: StrCol => 7 }
                val valComp = deflate(values)
                val ups = defs.length + values.length
                val cps = defs.length + valComp.length
                (pageHeaderV2(ups, cps, pn, enc, defs.length, spec.snappy),
                  defs ++ valComp, ups)
              } else {
                val body = dictIdx match {
                  case Some((dict, idx)) =>
                    defLevelSection(pn) ++
                      packedIndices(idx.slice(ps, pe), dict.size)
                  case None => defLevelSection(pn) ++ plainValues(pc)
                }
                val comp = deflate(body)
                val enc = if (dictIdx.isDefined) 2 else 0
                (pageHeader(0, body.length, comp.length, pn, enc),
                  comp, body.length)
              }
            out.write(hdr); out.write(wire)
            totalComp += hdr.length + wire.length
            totalUncomp += hdr.length + bodyLen
            PageMeta(off, hdr.length + wire.length, ps.toLong,
              statBytes(pc, max = false), statBytes(pc, max = true))
          }
          val chunkEncs =
            if (spec.v2) c match {
              case _: LongCol => Seq(5L, 3L)
              case _: StrCol  => Seq(7L, 3L)
            }
            else if (dictIdx.isDefined) Seq(2L, 3L)
            else Seq(0L, 3L)
          new ChunkMeta(c, dictOff, pages.head.off, totalComp, totalUncomp,
            chunkEncs, gn, pages)
        }
        (metas, gn)
      }
    // q265: blooms (distinct plain-encoded INT64 values; strings are
    // outside the audited probe scope and refuse loudly)
    groups.foreach { case (metas, _) =>
      metas.filter(m => spec.bloomCols.contains(m.col.name)).foreach { m =>
        val enc = m.col match {
          case LongCol(_, vs) => vs.distinct.map(leLong8)
          case _: StrCol => throw new IllegalArgumentException(
            s"q265: bloom scope is INT64 columns, '${m.col.name}' is a string")
        }
        val bits = buildBloom(enc)
        val w = new CompactWriter
        w.field(0, 1, 5); w.zigzag(bits.length.toLong) // numBytes
        w.field(1, 2, 12); w.field(0, 1, 12); w.stop(); w.stop() // BLOCK
        w.field(2, 3, 12); w.field(0, 1, 12); w.stop(); w.stop() // XXHASH
        w.field(3, 4, 12); w.field(0, 1, 12); w.stop(); w.stop() // UNCOMP
        w.stop()
        val hdr = w.toByteArray
        m.bloomOff = out.size().toLong
        m.bloomLen = hdr.length + bits.length
        out.write(hdr); out.write(bits)
      }
    }
    // q265: ColumnIndex + OffsetIndex per chunk (between data and
    // footer, the parquet-mr placement)
    if (spec.pageIndex) groups.foreach { case (metas, _) =>
      metas.foreach { m =>
        val ci = new CompactWriter
        ci.field(0, 1, 9) // null_pages: list<bool>, one byte each
        ci.listHeader(1, m.pages.size)
        m.pages.foreach(_ => ci.u8(2)) // false — no null pages written
        ci.field(1, 2, 9) // min_values
        ci.listHeader(8, m.pages.size)
        m.pages.foreach(p => ci.bytes(p.minB))
        ci.field(2, 3, 9) // max_values
        ci.listHeader(8, m.pages.size)
        m.pages.foreach(p => ci.bytes(p.maxB))
        // boundary_order from the page stats themselves
        def leq(a: Array[Byte], b: Array[Byte]): Boolean = m.col match {
          case _: LongCol =>
            java.nio.ByteBuffer.wrap(a)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong <=
              java.nio.ByteBuffer.wrap(b)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          case _: StrCol => java.util.Arrays.compareUnsigned(a, b) <= 0
        }
        val asc = m.pages.sliding(2).forall {
          case Seq(a, b) => leq(a.maxB, b.minB); case _ => true
        }
        val desc = m.pages.sliding(2).forall {
          case Seq(a, b) => leq(b.maxB, a.minB); case _ => true
        }
        val boundary = if (m.pages.size > 1 && asc) 1L
          else if (m.pages.size > 1 && desc) 2L else if (asc) 1L else 0L
        ci.field(3, 4, 5); ci.zigzag(boundary)
        ci.field(4, 5, 9) // null_counts: list<i64>
        ci.listHeader(6, m.pages.size)
        m.pages.foreach(_ => ci.zigzag(0L))
        ci.stop()
        val cib = ci.toByteArray
        m.ciOff = out.size().toLong; m.ciLen = cib.length
        out.write(cib)
        val oi = new CompactWriter
        oi.field(0, 1, 9) // page_locations: list<PageLocation>
        oi.listHeader(12, m.pages.size)
        m.pages.foreach { p =>
          oi.field(0, 1, 6); oi.zigzag(p.off)
          oi.field(1, 2, 5); oi.zigzag(p.size.toLong)
          oi.field(2, 3, 6); oi.zigzag(p.firstRow)
          oi.stop()
        }
        oi.stop()
        val oib = oi.toByteArray
        m.oiOff = out.size().toLong; m.oiLen = oib.length
        out.write(oib)
      }
    }
    // footer: FileMetaData
    val w = new CompactWriter
    w.field(0, 1, 5); w.zigzag(1L) // version
    w.field(1, 2, 9)               // schema
    w.listHeader(12, cols.size + 1)
    // root element
    w.field(0, 4, 8); w.str("house_schema")
    w.field(4, 5, 5); w.zigzag(cols.size.toLong)
    w.stop()
    cols.foreach { c =>
      var last = 0
      w.field(last, 1, 5); last = 1
      w.zigzag(c match { case _: LongCol => 2L; case _: StrCol => 6L })
      w.field(last, 3, 5); last = 3; w.zigzag(1L) // OPTIONAL
      w.field(last, 4, 8); last = 4; w.str(c.name)
      c match {
        case _: StrCol =>
          w.field(last, 6, 5); last = 6; w.zigzag(0L) // ConvertedType UTF8
          w.field(last, 10, 12); last = 10            // LogicalType union
          w.field(0, 1, 12)                           //   STRING member
          w.stop()                                    //   (empty struct)
          w.stop()
        case _ => ()
      }
      w.stop()
    }
    w.field(2, 3, 6); w.zigzag(n.toLong) // num_rows
    w.field(3, 4, 9)                     // row_groups
    w.listHeader(12, groups.size)
    groups.foreach { case (metas, gn) =>
      w.field(0, 1, 9) // columns
      w.listHeader(12, metas.size)
      metas.foreach { m =>
        val firstOff = if (m.dictOff >= 0) m.dictOff else m.dataOff
        w.field(0, 2, 6); w.zigzag(firstOff) // file_offset
        w.field(2, 3, 12)                    // meta_data: ColumnMetaData
        var l = 0
        w.field(l, 1, 5); l = 1
        w.zigzag(m.col match { case _: LongCol => 2L; case _: StrCol => 6L })
        w.field(l, 2, 9); l = 2 // encodings
        w.listHeader(5, m.encs.size); m.encs.foreach(w.zigzag)
        w.field(l, 3, 9); l = 3 // path_in_schema
        w.listHeader(8, 1); w.str(m.col.name)
        w.field(l, 4, 5); l = 4; w.zigzag(codecId)
        w.field(l, 5, 6); l = 5; w.zigzag(m.nVals.toLong) // num_values
        w.field(l, 6, 6); l = 6; w.zigzag(m.totalUncomp)
        w.field(l, 7, 6); l = 7; w.zigzag(m.totalComp)
        w.field(l, 9, 6); l = 9; w.zigzag(m.dataOff)     // data_page_offset
        if (m.dictOff >= 0) {
          w.field(l, 11, 6); l = 11; w.zigzag(m.dictOff) // dictionary_page_offset
        }
        w.field(l, 12, 12); l = 12                       // statistics
        var sl = 0
        w.field(sl, 3, 6); sl = 3; w.zigzag(0L)          //   null_count
        w.field(sl, 5, 8); sl = 5; w.bytes(statBytes(m.col, max = true))
        w.field(sl, 6, 8); sl = 6; w.bytes(statBytes(m.col, max = false))
        w.stop()
        if (m.bloomOff >= 0) {                           // q265: SBBF
          w.field(l, 14, 6); l = 14; w.zigzag(m.bloomOff)
          w.field(l, 15, 5); l = 15; w.zigzag(m.bloomLen.toLong)
        }
        w.stop() // ColumnMetaData
        if (m.oiOff >= 0) {                              // q265: indexes
          w.field(3, 4, 6); w.zigzag(m.oiOff)
          w.field(4, 5, 5); w.zigzag(m.oiLen.toLong)
          w.field(5, 6, 6); w.zigzag(m.ciOff)
          w.field(6, 7, 5); w.zigzag(m.ciLen.toLong)
        }
        w.stop() // ColumnChunk
      }
      w.field(1, 2, 6) // total_byte_size
      w.zigzag(metas.map(_.totalComp).sum)
      w.field(2, 3, 6); w.zigzag(gn.toLong) // row-group num_rows
      w.stop() // RowGroup
    }
    // created_by (field 6): an HONEST writer identity in the canonical
    // "<app> version <v> (build <b>)" shape — parquet-mr's PARQUET-246
    // guard parses it and, seeing a non-parquet-mr application, accepts
    // DELTA_BYTE_ARRAY pages; an absent or unparseable created_by is
    // conservatively treated as the corrupt 1.7 writer and REFUSED by
    // the row-based reader (q269, measured).
    w.field(4, 6, 8); w.str("graft-house version 1.0 (build r15)")
    w.stop() // FileMetaData
    val footer = w.toByteArray
    out.write(footer)
    out.write(leInt4(footer.length))
    out.write("PAR1".getBytes("US-ASCII"))
    val bytes = out.toByteArray
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    bytes.length.toLong
  }

  /** q262's probe: documents (doc_id, source) written BY HAND, read
    * back through SPARK'S reader (independent code), aggregated to the
    * SQL truth. The table is dimension-bounded driver state by the
    * probe's nature (the distributed form is per-task invocation of
    * this kernel — q259's geometry in reverse).
    */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
      .as[(Long, String)].collect()
    val path = System.getProperty("java.io.tmpdir") + "/graft_q262_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + ".parquet"
    write(path, Seq(LongCol("doc_id", rows.map(_._1).toSeq),
      StrCol("source", rows.map(_._2).toSeq)))
    val back = spark.read.parquet(path)
    val sep = lit("\u0001")
    val rowHash = conv(substring(md5(concat(
      sep, col("doc_id").cast("string"), sep, col("source"))),
      1, 15), 16, 10).cast("long")
    back.agg(
      count(lit(1)).as("n_rows"),
      sum(col("doc_id")).as("sum_ids"),
      countDistinct(col("source")).as("n_sources"),
      sum(length(col("source"))).as("sum_src_len"),
      bit_xor(rowHash).as("content_xor"))
  }

  /** q264's group size: the slicing `0 until n by rpg` yields
    * ceil(n/rpg) uniform-size groups, and ceil(n/ceil(n/3)) == 3 holds
    * for every n >= 3 EXCEPT n = 4 (2*ceil(4/3) = 4 is not < 4, so four
    * rows can only split 2+2 or 1+1+1+1 — r15 ADVICE: the old comment
    * claimed "exactly 3 for n >= 3" and the q264 oracle literal
    * n_groups = 3 would land red on a 4-row fixture). Derive, then
    * PROVE the implied count before writing — a wrong fixture size
    * refuses loudly instead of hash-mismatching downstream.
    */
  private[graft] def tier1Rpg(n: Int): Int = {
    require(n >= 3, s"q264: the 3-group fixture needs n >= 3 rows, got $n")
    val rpg = (n + 2) / 3
    val implied = (n + rpg - 1) / rpg
    require(implied == 3,
      s"q264: n = $n slices into $implied uniform groups, not 3 " +
        "(n = 4 is the one size >= 3 that cannot) — refusing")
    rpg
  }

  /** q264's probe: documents (doc_id, source) written with the TIER-1
    * spec — dictionary pages, snappy-compressed bodies, THREE row
    * groups — read back through SPARK'S reader (independent code) and
    * aggregated to the SQL truth, with the writer's format choices
    * surfaced as self-validating legs (the q243 discipline): n_groups
    * from the house footer walk, codec from the footer's declared
    * compression, enc_class from the house decoder's actual decode
    * path — each an oracle LITERAL, so a writer that silently wrote
    * one group, skipped compression, or fell back to PLAIN lands red.
    */
  def roundtripTier1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
      .as[(Long, String)].collect()
    val path = System.getProperty("java.io.tmpdir") + "/graft_q264_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + ".parquet"
    val rpg = tier1Rpg(rows.length)
    write(path, Seq(LongCol("doc_id", rows.map(_._1).toSeq),
      StrCol("source", rows.map(_._2).toSeq)),
      HouseSpec(dictionary = true, snappy = true, rowsPerGroup = rpg.toLong))
    val nGroups = Footer.parseFooter(path)._2.head.size.toLong
    val codec = Footer.readFooter("house", path).head.codec
    val encClass = Footer.decodeColumnChunk(path, "source").encClass
    val back = spark.read.parquet(path)
    val sep = lit("\u0001")
    val rowHash = conv(substring(md5(concat(
      sep, col("doc_id").cast("string"), sep, col("source"))),
      1, 15), 16, 10).cast("long")
    back.agg(
      count(lit(1)).as("n_rows"),
      sum(col("doc_id")).as("sum_ids"),
      countDistinct(col("source")).as("n_sources"),
      sum(length(col("source"))).as("sum_src_len"),
      bit_xor(rowHash).as("content_xor"))
      .withColumn("n_groups", lit(nGroups))
      .withColumn("codec", lit(codec))
      .withColumn("enc_class", lit(encClass))
  }

  /** q269's probe: the SECOND writer generation closed in the WRITE
    * direction — documents (doc_id, source) written as v2 pages
    * (DataPageHeaderV2, DELTA_BINARY_PACKED integers, DELTA_BYTE_ARRAY
    * front-coded strings, values-only snappy) across TWO row groups,
    * read back through SPARK'S OWN reader and aggregated to the SQL
    * truth; the writer's choices ride as self-validating literals
    * (n_groups from the footer walk, codec, and the house decoder's
    * ACTUAL decode classes for both columns — a writer that silently
    * fell back to plain or v1 lands red). Snappy is deliberate: the
    * bundled Spark's vectorized reader corrupts UNCOMPRESSED v2
    * DELTA_BYTE_ARRAY (the q255 ecosystem find), compressed v2 is the
    * interop-safe layout — the spec exercises the uncompressed shape
    * against the house decoder + row-based reader instead.
    */
  def roundtripV2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
      .as[(Long, String)].collect()
    val path = System.getProperty("java.io.tmpdir") + "/graft_q269_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + ".parquet"
    val rpg = (rows.length + 1) / 2 // exactly 2 groups for n >= 2
    write(path, Seq(LongCol("doc_id", rows.map(_._1).toSeq),
      StrCol("source", rows.map(_._2).toSeq)),
      HouseSpec(snappy = true, v2 = true, rowsPerGroup = rpg.toLong))
    val nGroups = Footer.parseFooter(path)._2.head.size.toLong
    val codec = Footer.readFooter("house", path).head.codec
    val encInts = Footer.decodeColumnChunk(path, "doc_id").encClass
    val encStrs = Footer.decodeColumnChunk(path, "source").encClass
    val back = spark.read.parquet(path)
    val sep = lit("\u0001")
    val rowHash = conv(substring(md5(concat(
      sep, col("doc_id").cast("string"), sep, col("source"))),
      1, 15), 16, 10).cast("long")
    back.agg(
      count(lit(1)).as("n_rows"),
      sum(col("doc_id")).as("sum_ids"),
      countDistinct(col("source")).as("n_sources"),
      sum(length(col("source"))).as("sum_src_len"),
      bit_xor(rowHash).as("content_xor"))
      .withColumn("n_groups", lit(nGroups))
      .withColumn("codec", lit(codec))
      .withColumn("enc_ints", lit(encInts))
      .withColumn("enc_strs", lit(encStrs))
  }

  /** q271: the DREMEL WRITE — the q258 reader's dual, closing the
    * writer's last scope gap against its own reader: a nested
    * LIST-of-UTF8 column emitted as the standard 3-level shape
    * (optional group annotated LIST > repeated `list` group > optional
    * `element`, maxDef 3 / maxRep 1), with REAL repetition/definition
    * level streams — rep 0 starts a record, def 3 carries an element,
    * def 1 (maxDef−2) marks an EMPTY list; levels ride 4-byte-length-
    * prefixed hybrid bit-packed runs, values PLAIN. Bounded kernel
    * scope (the q262 stance): one INT64 flat column + one list column,
    * v1 uncompressed, one row group; null lists/elements refuse —
    * exactly the reader's audited scope, emitted rather than consumed.
    */
  def writeListFile(path: String, idCol: LongCol, listName: String,
      lists: Seq[Seq[String]]): Long = {
    val n = idCol.values.size
    require(n > 0 && lists.size == n, s"q271: ragged input ($n ids, ${lists.size} lists)")
    require(lists.forall(l => l != null && l.forall(_ != null)),
      "q271: null lists/elements are outside the audited scope; refusing")
    val out = new java.io.ByteArrayOutputStream()
    out.write("PAR1".getBytes("US-ASCII"))
    // --- id chunk: the flat writer's v1 PLAIN page verbatim
    val idBody = defLevelSection(n) ++ plainValues(idCol)
    val idHdr = pageHeader(0, idBody.length, idBody.length, n, 0)
    val idOff = out.size().toLong
    out.write(idHdr); out.write(idBody)
    val idLen = (idHdr.length + idBody.length).toLong
    // --- list chunk: level streams + PLAIN elements
    val defs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val reps = scala.collection.mutable.ArrayBuffer.empty[Int]
    lists.foreach { ws =>
      if (ws.isEmpty) { defs += 1; reps += 0 }
      else ws.indices.foreach { i => defs += 3; reps += (if (i == 0) 0 else 1) }
    }
    val nLevels = defs.size
    def levelSection(vals: Seq[Int], bw: Int): Array[Byte] = {
      val body = bitPackedRun(vals, bw)
      leInt4(body.length) ++ body
    }
    val listBody = levelSection(reps.toSeq, 1) ++
      levelSection(defs.toSeq, 2) ++
      plainValues(StrCol(listName, lists.flatten))
    val listHdr = pageHeader(0, listBody.length, listBody.length, nLevels, 0)
    val listOff = out.size().toLong
    out.write(listHdr); out.write(listBody)
    val listLen = (listHdr.length + listBody.length).toLong
    // --- footer
    val w = new CompactWriter
    w.field(0, 1, 5); w.zigzag(1L) // version
    w.field(1, 2, 9)               // schema: 5 elements
    w.listHeader(12, 5)
    w.field(0, 4, 8); w.str("house_schema")          // root
    w.field(4, 5, 5); w.zigzag(2L)
    w.stop()
    w.field(0, 1, 5); w.zigzag(2L)                   // doc id leaf: INT64
    w.field(1, 3, 5); w.zigzag(1L)                   //   OPTIONAL
    w.field(3, 4, 8); w.str(idCol.name)
    w.stop()
    w.field(0, 3, 5); w.zigzag(1L)                   // list group: OPTIONAL
    w.field(3, 4, 8); w.str(listName)
    w.field(4, 5, 5); w.zigzag(1L)                   //   1 child
    w.field(5, 6, 5); w.zigzag(3L)                   //   ConvertedType LIST
    w.field(6, 10, 12)                               //   LogicalType union
    w.field(0, 3, 12); w.stop()                      //     LIST member
    w.stop()
    w.stop()
    w.field(0, 3, 5); w.zigzag(2L)                   // 'list': REPEATED
    w.field(3, 4, 8); w.str("list")
    w.field(4, 5, 5); w.zigzag(1L)
    w.stop()
    w.field(0, 1, 5); w.zigzag(6L)                   // 'element': BYTE_ARRAY
    w.field(1, 3, 5); w.zigzag(1L)                   //   OPTIONAL
    w.field(3, 4, 8); w.str("element")
    w.field(4, 6, 5); w.zigzag(0L)                   //   ConvertedType UTF8
    w.field(6, 10, 12)                               //   LogicalType union
    w.field(0, 1, 12); w.stop()                      //     STRING member
    w.stop()
    w.stop()
    w.field(2, 3, 6); w.zigzag(n.toLong) // num_rows
    w.field(3, 4, 9)                     // row_groups
    w.listHeader(12, 1)
    w.field(0, 1, 9) // columns
    w.listHeader(12, 2)
    // doc id chunk
    w.field(0, 2, 6); w.zigzag(idOff)
    w.field(2, 3, 12)
    w.field(0, 1, 5); w.zigzag(2L)
    w.field(1, 2, 9); w.listHeader(5, 2); w.zigzag(0L); w.zigzag(3L)
    w.field(2, 3, 9); w.listHeader(8, 1); w.str(idCol.name)
    w.field(3, 4, 5); w.zigzag(0L)          // UNCOMPRESSED
    w.field(4, 5, 6); w.zigzag(n.toLong)    // num_values
    w.field(5, 6, 6); w.zigzag(idLen)
    w.field(6, 7, 6); w.zigzag(idLen)
    w.field(7, 9, 6); w.zigzag(idOff)
    w.field(9, 12, 12)                      // statistics
    var sl = 0
    w.field(sl, 3, 6); sl = 3; w.zigzag(0L)
    w.field(sl, 5, 8); sl = 5; w.bytes(statBytes(idCol, max = true))
    w.field(sl, 6, 8); sl = 6; w.bytes(statBytes(idCol, max = false))
    w.stop()
    w.stop() // ColumnMetaData
    w.stop() // ColumnChunk
    // list chunk — num_values is the LEVEL count; no statistics
    w.field(0, 2, 6); w.zigzag(listOff)
    w.field(2, 3, 12)
    w.field(0, 1, 5); w.zigzag(6L)
    w.field(1, 2, 9); w.listHeader(5, 2); w.zigzag(0L); w.zigzag(3L)
    w.field(2, 3, 9); w.listHeader(8, 3)
    w.str(listName); w.str("list"); w.str("element")
    w.field(3, 4, 5); w.zigzag(0L)
    w.field(4, 5, 6); w.zigzag(nLevels.toLong)
    w.field(5, 6, 6); w.zigzag(listLen)
    w.field(6, 7, 6); w.zigzag(listLen)
    w.field(7, 9, 6); w.zigzag(listOff)
    w.stop() // ColumnMetaData
    w.stop() // ColumnChunk
    w.field(1, 2, 6); w.zigzag(idLen + listLen) // total_byte_size
    w.field(2, 3, 6); w.zigzag(n.toLong)        // row-group num_rows
    w.stop() // RowGroup (the single list element; lists need no stop)
    // created_by — the PARQUET-246 writer identity (q269)
    w.field(4, 6, 8); w.str("graft-house version 1.0 (build r15)")
    w.stop() // FileMetaData
    val footer = w.toByteArray
    out.write(footer)
    out.write(leInt4(footer.length))
    out.write("PAR1".getBytes("US-ASCII"))
    val bytes = out.toByteArray
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    bytes.length.toLong
  }

  /** q271's probe: documents' (doc_id, split(text) words) written BY
    * the house Dremel writer, read back through SPARK'S OWN reader as
    * a real `array<string>` column, and proven TOKEN-EXACT per row —
    * the output shape and oracle are q258's verbatim (n_words + the
    * sentinel-joined md5 that must equal md5(replace(text,' ',chr(1)))
    * straight off the raw text); the house list READER additionally
    * re-reads the file in-code (writer ≡ reader across the house's own
    * two halves).
    */
  def roundtripList(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String)].collect()
    val lists = rows.map(_._2.split(" ").toSeq).toSeq
    val path = System.getProperty("java.io.tmpdir") + "/graft_q271_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + ".parquet"
    writeListFile(path, LongCol("doc_id", rows.map(_._1).toSeq),
      "words", lists)
    val back = Footer.decodeListStrChunk(path, "words")
    require(back == lists,
      "q271: the house list reader disagrees with the house list writer")
    spark.read.parquet(path)
      .select(col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        conv(substring(md5(array_join(col("words"), "\u0001")), 1, 15),
          16, 10).cast("long").as("words_md5"))
      .orderBy("doc_id")
  }

  /** q273: the LIST column through the STOCK API — closing the r15
    * verdict's DSv2 scope gap (the source read only flat INT64/UTF8, so
    * the very shapes the writer and decoder already handled could not
    * be LOADED): the q271 house-written list file goes through
    * `spark.read.format(HouseSource)`, whose schema inference now maps
    * the audited 3-level list-of-UTF8 shape to a real `array<string>`
    * and whose reader rides the q258 Dremel assembler. Catalyst still
    * owns pushdown on the flat doc_id (point + range counts proven ≡
    * Spark's own parquet read of the same file), and the output is
    * q271's token-exact shape computed FROM THE DSv2 READ — q271's
    * oracle verbatim grades every assembled list against the raw text.
    */
  def listScanDsv2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String)].collect()
    val path = System.getProperty("java.io.tmpdir") + "/graft_q273_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + ".parquet"
    writeListFile(path, LongCol("doc_id", rows.map(_._1).toSeq),
      "words", rows.map(_._2.split(" ").toSeq).toSeq)
    val house = spark.read
      .format(classOf[graft.sources.HouseSource].getName).load(path)
    val sparkRead = spark.read.parquet(path)
    // pushdown legs: point + range on the flat key must agree with
    // Spark's own reader (the q270 discipline, now beside a list chunk)
    Seq(col("doc_id") === 250L, col("doc_id").between(100L, 199L))
      .foreach { pred =>
        val h = house.filter(pred).count()
        val s = sparkRead.filter(pred).count()
        require(h == s,
          s"q273: the house DSv2 read diverged from Spark's ($h/$s) " +
            "under doc_id pushdown beside a list chunk")
      }
    house.select(col("doc_id"),
      size(col("words")).cast("long").as("n_words"),
      conv(substring(md5(array_join(col("words"), "\u0001")), 1, 15),
        16, 10).cast("long").as("words_md5"))
      .orderBy("doc_id")
  }

  /** q276: THE STOCK WRITE API — `df.write.format(HouseSource)
    * .mode(...).save(dir)` reaches the house kernel through a real DSv2
    * `SupportsWrite` (the r15 verdict's alternative form for the
    * distributed write, now shipped ALONGSIDE q272's rank-clustered
    * form): Spark owns task scheduling/retry/commit, every task cuts
    * complete snappy+bloom house files at `rowsPerUnit` boundaries, the
    * commit messages carry footer stats only, and the driver's one
    * write is the manifest. The probe proves BOTH modes: overwrite
    * (TRUNCATE drops the previous generation) then append with DISJOINT
    * shifted-id rows (the manifest merges the pre-write stats
    * zero-open) — and every content leg reads identically through the
    * house DSv2 source and Spark's own parquet reader. Output is the
    * 5-column content aggregate (rows, id sum, distinct sources,
    * source length sum, row-hash xor) off the DSv2 read of the final
    * two-generation table, which the oracle recomputes as documents
    * UNION ALL its shifted twin.
    */
  def dsv2WriteRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    val n = docs.count()
    val unitRows = Footer.adaptiveUnitRows(n)
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_q276_" + dir.replaceAll("[^A-Za-z0-9]", "_")).getPath
    val src = classOf[graft.sources.HouseSource].getName
    def write(df: DataFrame, mode: String): (Int, Seq[String]) = {
      df.repartition(4, col("doc_id"))
        .write.format(src)
        .option("rowsPerUnit", unitRows.toString)
        .option("bloomCols", "doc_id")
        .mode(mode).save(out)
      graft.sources.HouseSource.lastWrite
    }
    // generation 1: OVERWRITE — clears anything a prior run left
    val (t1, f1) = write(docs, "overwrite")
    require(t1 > 1 && f1.nonEmpty,
      s"q276: the DSv2 overwrite ran on $t1 task(s) — not distributed")
    // generation 2: APPEND — DISJOINT rows (shifted ids: identical rows
    // would cancel the xor leg to a vacuous 0), manifest must merge
    val (t2, f2) = write(
      docs.withColumn("doc_id", col("doc_id") + lit(10000000L)), "append")
    require(t2 > 1 && f2.nonEmpty && f2.intersect(f1).isEmpty,
      "q276: append must add fresh files, never rewrite generation 1")
    val manifest = Footer.readManifest(out).getOrElse(
      throw new IllegalStateException("q276: no valid manifest after append"))
    require(manifest.map(_.path).sorted == (f1 ++ f2).sorted,
      "q276: the merged manifest must name exactly both generations")
    val house = spark.read.format(src).load(out)
    val sparkRead = spark.read.parquet((f1 ++ f2): _*)
    val sep = lit("\u0001")
    val rowHash = conv(substring(md5(concat(
      Seq("doc_id", "source", "lang", "n_chars")
        .flatMap(c => Seq(sep, col(c).cast("string"))): _*)),
      1, 15), 16, 10).cast("long")
    def agg(df: DataFrame) = df.agg(
      count(lit(1)).as("n_rows"),
      sum(col("doc_id")).as("sum_ids"),
      countDistinct(col("source")).as("n_sources"),
      sum(length(col("source"))).as("sum_src_len"),
      bit_xor(rowHash).as("content_xor"))
    require(agg(house).collect().toSeq == agg(sparkRead).collect().toSeq,
      "q276: the house read diverged from Spark's read of the DSv2-written files")
    agg(house)
  }

  /** q279 (r17): HOUSE SNAPSHOT READS — time travel on DISK, the q228
    * log-side contract made a table property. Every DSv2 commit lands
    * an immutable `_graft_manifest.v<N>.tsv` beside the latest pointer
    * (N monotonic from the directory listing, so the sequence survives
    * process restarts; the per-JVM OCC log arbitrates concurrency, the
    * disk carries the history). `spark.read.format("house")
    * .option("version", N)` resolves file membership from snapshot N:
    * an overwrite + two disjoint appends leave three named versions,
    * and reading each must reproduce exactly the table as committed
    * then — verified here by aggregate identity per version, with the
    * latest-pointer read proven ≡ the newest snapshot. A version that
    * never existed refuses with the on-disk version list; a version
    * dangling after a truncate's history reset refuses loudly
    * (spec-pinned) — never a silently partial table, q228's
    * pre-horizon stance. Oracle: the three generations recomputed from
    * documents and its shifted twins, one row per snapshot.
    */
  def houseSnapshotRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val n = docs.count()
    val unitRows = Footer.adaptiveUnitRows(n)
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_q279_" + dir.replaceAll("[^A-Za-z0-9]", "_")).getPath
    val src = "house"
    def write(df: DataFrame, mode: String): Unit = df
      .repartition(2, col("doc_id"))
      .write.format(src).option("rowsPerUnit", unitRows.toString)
      .mode(mode).save(out)
    write(docs, "overwrite")                                        // v1
    write(docs.withColumn("doc_id", col("doc_id") + lit(10000000L)),
      "append")                                                     // v2
    write(docs.withColumn("doc_id", col("doc_id") + lit(20000000L)),
      "append")                                                     // v3
    val versions = Footer.manifestVersions(out)
    require(versions == Seq(1L, 2L, 3L),
      s"q279: overwrite + 2 appends must leave snapshots v1..v3, got $versions")
    val sep = lit("\u0001")
    def agg(df: DataFrame, tag: String): DataFrame = df.agg(
      count(lit(1)).as("n_rows"),
      sum(col("doc_id")).as("sum_ids"),
      bit_xor(conv(substring(md5(concat(sep, col("doc_id").cast("string"),
        sep, col("source"))), 1, 15), 16, 10).cast("long"))
        .as("content_xor"))
      .select(lit(tag).as("as_of"), col("n_rows"), col("sum_ids"),
        col("content_xor"))
    def asOf(v: Long): DataFrame = spark.read.format(src)
      .option("version", v.toString).load(out)
    // the latest pointer and the newest snapshot are the same table
    require(agg(spark.read.format(src).load(out), "x").collect().toSeq ==
        agg(asOf(3L), "x").collect().toSeq,
      "q279: the latest-pointer read must equal the newest snapshot")
    agg(asOf(1L), "v1").unionByName(agg(asOf(2L), "v2"))
      .unionByName(agg(asOf(3L), "v3")).orderBy("as_of")
  }

  /** q278 (r17, r16 verdict #6): THE STOCK WRITE API AT FULL KERNEL
    * SCOPE — the write-side twin of q273's read-scope closure. Two legs:
    *
    *  1. LIST: `df.write.format("house")` with an `array<string>`
    *     column routes each task to q271's Dremel kernel
    *     ([[writeListFile]] — real repetition/definition level streams)
    *     cutting one complete list file per `rowsPerUnit` rows; the
    *     write must run distributed (>1 task), the commit manifest
    *     must name every unit, and the DSv2 read of the table must be
    *     TOKEN-EXACT against Spark's own parquet read of the same
    *     files (in-code require) and against the raw text (the oracle
    *     — q271's verbatim);
    *  2. V2 GENERATION: `option("generation", "v2")` routes the flat
    *     kernel to q269's DataPageHeaderV2 DELTA pages (snappy — the
    *     vectorized-reader-safe shape); the decode classes are proven
    *     delta on both columns (no silent v1 fallback) and the house
    *     read must equal Spark's read of the same files (require).
    *
    * Output is leg 1's token-exact shape off the DSv2 read; a wrong
    * level stream, a lost unit, or a corrupt delta page all land as
    * red rows or loud requires.
    */
  def dsv2ListWriteRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    val n = docs.count()
    val unitRows = Footer.adaptiveUnitRows(n)
    // --- leg 1: LIST through df.write.format("house"), distributed
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_q278_" + tag).getPath
    docs.repartition(4, col("doc_id"))
      .write.format("house").option("rowsPerUnit", unitRows.toString)
      .mode("overwrite").save(out)
    val (t1, f1) = graft.sources.HouseSource.lastWrite
    require(t1 > 1 && f1.nonEmpty,
      s"q278: the list write ran on $t1 task(s) — not distributed")
    require(Footer.committedUnits(out).exists(
      _.map(_.path).sorted == f1.sorted),
      "q278: the commit manifest must name exactly the written units")
    val house = spark.read.format("house").load(out)
    require(house.schema("words").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false),
      "q278: the round-tripped schema must be the audited list shape")
    def tokenShape(df: DataFrame): DataFrame = df.select(col("doc_id"),
      size(col("words")).cast("long").as("n_words"),
      conv(substring(md5(array_join(col("words"), "\u0001")), 1, 15),
        16, 10).cast("long").as("words_md5"))
    val viaHouse = tokenShape(house).as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val viaSpark = tokenShape(spark.read.parquet(f1: _*))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    require(viaHouse == viaSpark && viaHouse.size == n,
      "q278: the house DSv2 read must be token-exact against Spark's " +
        "read of the same stock-API-written list files")
    // --- leg 2: V2 GENERATION through the stock API
    val outV2 = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_q278v2_" + tag).getPath
    val flat = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    flat.repartition(2, col("doc_id"))
      .write.format("house").option("generation", "v2")
      .option("rowsPerUnit", unitRows.toString)
      .mode("overwrite").save(outV2)
    val f2 = graft.sources.HouseSource.lastWrite._2
    require(f2.nonEmpty, "q278: the v2 write produced no files")
    f2.foreach { p =>
      require(Footer.decodeColumnChunk(p, "doc_id").encClass == "delta_binpack",
        s"q278: $p doc_id is not DELTA_BINARY_PACKED — silent v1 fallback")
      require(Footer.decodeColumnChunk(p, "source").encClass == "delta_byte_array",
        s"q278: $p source is not DELTA_BYTE_ARRAY — silent v1 fallback")
    }
    val hv = spark.read.format("house").load(outV2)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val sv = spark.read.parquet(f2: _*)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    require(hv == sv && hv.size == n,
      "q278: the house read of the stock-API v2 generation diverged " +
        "from Spark's read of the same files")
    tokenShape(house).orderBy("doc_id")
  }

  /** q270: THE FULL HOUSE LOOP — the engine reads what it WROTE through
    * the STOCK API. A clustered unit layout whose every byte is
    * house-emitted (per-unit q264-tier snappy files with doc_id SBBF
    * blooms, unit boundaries at exact rank multiples of the adaptive
    * size, the q268 manifest beside them) is loaded via
    * `spark.read.format(HouseSource)`: Catalyst pushes the filters,
    * the source plans unit pruning from the HOUSE footers and HOUSE
    * blooms, the executors decode with the HOUSE decoder — and every
    * leg is proven lossless against Spark's own parquet read of the
    * same files (which itself works on house files — the q264 interop
    * pin). q260's three predicate classes, q266's oracle arithmetic
    * verbatim: writer → footer/bloom metadata → DSv2 planning →
    * decode, no parquet-mr anywhere on the engine path.
    */
  def fullHouseRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy(col("n_chars"), col("doc_id"))
      .as[(Long, String, String, Long)].collect()
    val unitRows = Footer.adaptiveUnitRows(rows.length.toLong).toInt
    val layoutDir = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_q270_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    if (layoutDir.exists()) layoutDir.listFiles().foreach(_.delete())
    layoutDir.mkdirs()
    rows.grouped(unitRows).zipWithIndex.foreach { case (slice, i) =>
      write(new java.io.File(layoutDir, f"part-$i%05d-house.parquet").getPath,
        Seq(LongCol("doc_id", slice.map(_._1).toSeq),
          StrCol("source", slice.map(_._2).toSeq),
          StrCol("lang", slice.map(_._3).toSeq),
          LongCol("n_chars", slice.map(_._4).toSeq)),
        HouseSpec(snappy = true, bloomCols = Set("doc_id")))
    }
    val files = layoutDir.listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq
    Footer.writeManifest(layoutDir.getPath, files.map(Footer.unitStatsOf))
    val house = spark.read
      .format(classOf[graft.sources.HouseSource].getName)
      .load(layoutDir.getPath)
    val cases = Seq(
      ("nchars_100_199", Seq("doc_id", "n_chars"),
        col("n_chars").between(100L, 199L)),
      ("docid_eq_250", Seq("doc_id", "source"), col("doc_id") === 250L),
      ("conj", Seq("doc_id", "n_chars"),
        col("n_chars").between(100L, 199L) && col("doc_id") === 250L))
    val sep = lit("\u0001")
    val out = cases.map { case (name, cols0, cond) =>
      val rowHash = conv(substring(md5(concat(
        cols0.flatMap(c => Seq(sep, col(c).cast("string"))): _*)),
        1, 15), 16, 10).cast("long")
      def agg(df: DataFrame) = df
        .select(cols0.map(col): _*).filter(cond)
        .agg(count(lit(1)).as("n"),
          coalesce(bit_xor(rowHash), lit(0L)).as("x"))
        .as[(Long, Long)].head()
      val (nM, xM) = agg(house)
      val (total, statsBound, planned) = graft.sources.HouseSource.lastPlan
      require(planned <= statsBound && statsBound <= total,
        s"q270: bloom tightening widened the plan on $name")
      val (fN, fX) = agg(spark.read.parquet(files: _*))
      require(nM == fN && xM == fX,
        s"q270: the all-house read diverged from Spark's read on '$name' " +
          s"($nM/$fN) — a house-written byte or a house plan is wrong")
      (name, total, statsBound, nM, xM)
    }
    out.toDF("predicate", "units_total", "units_stats_bound",
      "n_match", "match_xor")
      .orderBy("predicate")
  }

  /** q265: the q257 PAGE-PRUNED SCAN core executed against a
    * HOUSE-WRITTEN file — closing the read/write asymmetry where the
    * engine could consume pruning structures it could not produce: the
    * ColumnIndex/OffsetIndex driving the skips, the snappy 64-row pages
    * being skipped, and the SBBF bloom the file also carries are ALL
    * house-emitted, read back by the house index readers + targeted
    * page decode, with the same in-plan pruned≡full lossless proof.
    * The bloom stays out of the SQL contract (q256's FP stance) and is
    * pinned in the spec instead.
    */
  def pageIndexScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = graft.Tables(spark, dir, "documents")
      .select(col("doc_id")).orderBy("doc_id").as[Long].collect()
    val path = System.getProperty("java.io.tmpdir") + "/graft_q265_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + ".parquet"
    write(path, Seq(LongCol("doc_id", ids.toSeq)),
      HouseSpec(snappy = true, rowsPerPage = Footer.PageRows,
        pageIndex = true, bloomCols = Set("doc_id")))
    val cs = Footer.parseFooter(path)._2.head.head
    val locs = Footer.readOffsetIndex(path, "doc_id")
    val (nullPages, mins, maxs, boundary) =
      Footer.readColumnIndex(path, "doc_id")
    require(locs.size == mins.size,
      s"q265: OffsetIndex (${locs.size}) and ColumnIndex (${mins.size}) disagree")
    require(locs.size > 1,
      "q265: the fixture must produce multiple pages or pruning is vacuous")
    require(boundary == 1, // ASCENDING — sorted on doc_id
      s"q265: expected ASCENDING boundary order on the sorted key, got $boundary")
    val pageRowsOf: Seq[Long] = locs.zipWithIndex.map { case (l, i) =>
      (if (i + 1 < locs.size) locs(i + 1).firstRow else cs.numValues) -
        l.firstRow
    }
    val full = Footer.decodeColumnChunk(path, "doc_id").longs
    val rows = Footer.PagePredicates.map { case (name, lo, hi) =>
      val keep = locs.indices.filter(i =>
        !nullPages(i) && maxs(i) >= lo && mins(i) <= hi)
      val vals =
        keep.flatMap(i => Footer.decodeLongPage(path, locs(i), cs.codec, 1))
      val matches = vals.filter(v => v >= lo && v <= hi).sorted
      val fullMatches = full.filter(v => v >= lo && v <= hi).sorted
      require(matches == fullMatches,
        s"q265: page-pruned scan diverged from the full chunk on '$name' " +
          "— an unsound house-index skip dropped matching rows; refusing")
      val xor = matches.map(v => Footer.md5Fold60(v.toString))
        .foldLeft(0L)(_ ^ _)
      (name, locs.size.toLong, keep.size.toLong,
        keep.map(pageRowsOf).sum, matches.size.toLong, xor)
    }
    rows.toDF("predicate", "pages_total", "pages_read", "rows_read",
      "n_match", "match_xor")
      .orderBy("predicate")
  }
}
