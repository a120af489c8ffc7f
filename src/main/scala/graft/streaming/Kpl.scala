package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** The PUBLIC KPL aggregated-record format (amazon-kinesis-producer's
  * `aggregation-format.md`): a high-throughput producer packs many user
  * records into one Kinesis record as
  *
  *   `0xF3 0x89 0x9A 0xC2` magic ‖ protobuf(AggregatedRecord) ‖ md5(protobuf)
  *
  * with
  * {{{
  * message AggregatedRecord {
  *   repeated string partition_key_table    = 1;
  *   repeated string explicit_hash_key_table = 2;
  *   repeated Record records                = 3;
  * }
  * message Record {
  *   required uint64 partition_key_index    = 1;
  *   optional uint64 explicit_hash_key_index = 2;
  *   required bytes  data                   = 3;
  * }
  * }}}
  *
  * The wire encoding here is the real protobuf wire format, hand-rolled
  * (varints + length-delimited fields — ~40 lines; no codegen
  * dependency): the bytes this writes are what the KCL deaggregator
  * parses, and this parser accepts what the KPL writes (unknown fields
  * are skipped by wire type, per proto semantics). The md5 trailer is
  * verified LOUDLY — a corrupt aggregate refuses rather than yielding
  * garbage user records; a blob without the magic passes through as a
  * single non-aggregated user record (the deaggregation contract).
  *
  * Each user record carries its SUBSEQUENCE number (position within the
  * aggregate) — the KCL checkpoints (sequence, subsequence) so a
  * restart inside a half-processed aggregate does not re-deliver; the
  * Spark-native equivalent is [[WireSource.kinesisKpl]]'s
  * watermark-bounded dedup on (shard, sequence, subsequence).
  */
private[graft] object Kpl {

  val Magic: Array[Byte] =
    Array(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte)

  final case class UserRecord(partitionKey: String, data: Array[Byte],
      subSeq: Long)

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7fL) | 0x80L).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Pack user records into one KPL aggregated record. */
  def aggregate(records: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(records.nonEmpty, "cannot aggregate zero user records")
    val pks = records.map(_._1).distinct
    val pkIdx = pks.zipWithIndex.toMap
    val body = new ByteArrayOutputStream()
    pks.foreach { pk =>
      body.write(0x0a) // partition_key_table, field 1, length-delimited
      val b = pk.getBytes(UTF_8)
      writeVarint(body, b.length.toLong); body.write(b)
    }
    records.foreach { case (pk, data) =>
      val rec = new ByteArrayOutputStream()
      rec.write(0x08); writeVarint(rec, pkIdx(pk).toLong) // pk_index
      rec.write(0x1a); writeVarint(rec, data.length.toLong); rec.write(data)
      body.write(0x1a) // records, field 3, length-delimited
      val rb = rec.toByteArray
      writeVarint(body, rb.length.toLong); body.write(rb)
    }
    val b = body.toByteArray
    val md = MessageDigest.getInstance("MD5")
    Magic ++ b ++ md.digest(b)
  }

  def isAggregated(blob: Array[Byte]): Boolean =
    blob.length > Magic.length + 16 &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(blob, 0, Magic.length), Magic)

  private final class Reader(b: Array[Byte], var p: Int, val end: Int) {
    def hasMore: Boolean = p < end
    def varint(): Long = {
      var v = 0L; var shift = 0
      while ({
        require(p < end, s"truncated varint at $p")
        val x = b(p); p += 1
        v |= (x & 0x7fL) << shift; shift += 7
        (x & 0x80) != 0
      }) require(shift <= 63, s"varint overflow at $p")
      v
    }
    def bytes(): Array[Byte] = {
      val n = varint().toInt
      require(n >= 0 && p + n <= end, s"truncated length-delimited field at $p")
      val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => require(p + 8 <= end, "truncated fixed64"); p += 8
      case 2 => bytes()
      case 5 => require(p + 4 <= end, "truncated fixed32"); p += 4
      case w => sys.error(s"unsupported protobuf wire type $w at $p")
    }
  }

  /** Unpack one Kinesis record's data into its user records. A blob
    * without the KPL magic is a plain (non-aggregated) record: one user
    * record at subsequence 0 carrying `fallbackPk`.
    */
  def deaggregate(blob: Array[Byte], fallbackPk: String): Seq[UserRecord] = {
    if (!isAggregated(blob)) return Seq(UserRecord(fallbackPk, blob, 0L))
    val bodyEnd = blob.length - 16
    val md = MessageDigest.getInstance("MD5")
    md.update(blob, Magic.length, bodyEnd - Magic.length)
    require(java.util.Arrays.equals(md.digest(),
      java.util.Arrays.copyOfRange(blob, bodyEnd, blob.length)),
      "KPL aggregate md5 digest mismatch — corrupt record, refusing to deaggregate")
    val r = new Reader(blob, Magic.length, bodyEnd)
    val pkTable = Seq.newBuilder[String]
    val recs = Seq.newBuilder[(Long, Array[Byte])]
    while (r.hasMore) {
      val tag = r.varint()
      (tag >> 3, (tag & 7).toInt) match {
        case (1L, 2) => pkTable += new String(r.bytes(), UTF_8)
        case (3L, 2) =>
          val rb = r.bytes()
          val rr = new Reader(rb, 0, rb.length)
          var pkIndex = -1L
          var data: Array[Byte] = null
          while (rr.hasMore) {
            val rtag = rr.varint()
            (rtag >> 3, (rtag & 7).toInt) match {
              case (1L, 0) => pkIndex = rr.varint()
              case (3L, 2) => data = rr.bytes()
              case (_, w)  => rr.skip(w) // ehk_index, tags, unknowns
            }
          }
          require(pkIndex >= 0 && data != null,
            "KPL record missing required partition_key_index/data")
          recs += ((pkIndex, data))
        case (_, w) => r.skip(w) // explicit_hash_key_table, unknowns
      }
    }
    val pks = pkTable.result()
    recs.result().zipWithIndex.map { case ((pki, data), i) =>
      require(pki < pks.length,
        s"KPL partition_key_index $pki outside table of ${pks.length}")
      UserRecord(pks(pki.toInt), data, i.toLong)
    }
  }
}
