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
  sealed trait HCol { def name: String }
  final case class LongCol(name: String, values: Seq[Long]) extends HCol
  final case class StrCol(name: String, values: Seq[String]) extends HCol

  private def leInt4(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def leLong8(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  /** The v1 data page for one column: header (thrift) + RLE def levels
    * (all-present, max def 1) + PLAIN values. Returns the page bytes.
    */
  private def dataPage(col: HCol, n: Int): Array[Byte] = {
    val vals = new java.io.ByteArrayOutputStream()
    // def levels: one RLE run of n ones, bit width 1 -> 1 value byte
    val run = new java.io.ByteArrayOutputStream()
    var h = (n.toLong << 1)
    while ((h & ~0x7fL) != 0L) { run.write(((h & 0x7f) | 0x80).toInt); h >>>= 7 }
    run.write(h.toInt); run.write(1)
    val defs = run.toByteArray
    vals.write(leInt4(defs.length)); vals.write(defs)
    col match {
      case LongCol(_, vs) => vs.foreach(v => vals.write(leLong8(v)))
      case StrCol(_, vs) => vs.foreach { s =>
        val b = s.getBytes("UTF-8"); vals.write(leInt4(b.length)); vals.write(b)
      }
    }
    val body = vals.toByteArray
    val w = new CompactWriter
    w.field(0, 1, 5); w.zigzag(0L)                  // type: DATA_PAGE
    w.field(1, 2, 5); w.zigzag(body.length.toLong)  // uncompressed size
    w.field(2, 3, 5); w.zigzag(body.length.toLong)  // compressed size
    w.field(3, 5, 12)                               // DataPageHeader
    w.field(0, 1, 5); w.zigzag(n.toLong)            //   num_values
    w.field(1, 2, 5); w.zigzag(0L)                  //   encoding PLAIN
    w.field(2, 3, 5); w.zigzag(3L)                  //   def levels RLE
    w.field(3, 4, 5); w.zigzag(3L)                  //   rep levels RLE
    w.stop()
    w.stop()
    w.toByteArray ++ body
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

  /** Write `cols` (equal lengths, non-null) as one single-row-group
    * uncompressed parquet file at `path`. Returns the byte count.
    */
  def write(path: String, cols: Seq[HCol]): Long = {
    require(cols.nonEmpty, "q262: no columns")
    val n = cols.head match {
      case LongCol(_, v) => v.size
      case StrCol(_, v)  => v.size
    }
    require(n > 0, "q262: empty table — nothing to write")
    cols.foreach {
      case LongCol(nm, v) => require(v.size == n, s"q262: ragged column $nm")
      case StrCol(nm, v)  => require(v.size == n, s"q262: ragged column $nm")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("PAR1".getBytes("US-ASCII"))
    // pages, recording each chunk's offset/length
    val chunks = cols.map { c =>
      val off = out.size().toLong
      val page = dataPage(c, n)
      out.write(page)
      (c, off, page.length.toLong)
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
    w.listHeader(12, 1)
    w.field(0, 1, 9) // columns
    w.listHeader(12, cols.size)
    chunks.foreach { case (c, off, len) =>
      w.field(0, 2, 6); w.zigzag(off) // file_offset
      w.field(2, 3, 12)               // meta_data: ColumnMetaData
      var l = 0
      w.field(l, 1, 5); l = 1
      w.zigzag(c match { case _: LongCol => 2L; case _: StrCol => 6L })
      w.field(l, 2, 9); l = 2 // encodings
      w.listHeader(5, 2); w.zigzag(0L); w.zigzag(3L) // PLAIN, RLE
      w.field(l, 3, 9); l = 3 // path_in_schema
      w.listHeader(8, 1); w.str(c.name)
      w.field(l, 4, 5); l = 4; w.zigzag(0L)          // UNCOMPRESSED
      w.field(l, 5, 6); l = 5; w.zigzag(n.toLong)    // num_values
      w.field(l, 6, 6); l = 6; w.zigzag(len)         // total_uncompressed
      w.field(l, 7, 6); l = 7; w.zigzag(len)         // total_compressed
      w.field(l, 9, 6); l = 9; w.zigzag(off)         // data_page_offset
      w.field(l, 12, 12); l = 12                     // statistics
      var sl = 0
      w.field(sl, 3, 6); sl = 3; w.zigzag(0L)        //   null_count
      w.field(sl, 5, 8); sl = 5; w.bytes(statBytes(c, max = true))
      w.field(sl, 6, 8); sl = 6; w.bytes(statBytes(c, max = false))
      w.stop()
      w.stop() // ColumnMetaData
      w.stop() // ColumnChunk
    }
    w.field(1, 2, 6) // total_byte_size
    w.zigzag(chunks.map(_._3).sum)
    w.field(2, 3, 6); w.zigzag(n.toLong) // row-group num_rows
    w.stop() // RowGroup
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
}
