package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Erasure-coded DURABILITY for the release surface — the storage leg
  * beside the integrity manifest (q183/q184): a corpus shipped as K
  * data shards grows P=2 parity shards so ANY TWO lost shards
  * reconstruct bit-exactly. The code is the classic RAID-6 / HDFS-EC
  * P+Q pair — a Reed-Solomon RS(K+2, K) over GF(256) with the AES
  * polynomial 0x11B and generator g=2:
  *
  *   P = ⊕ dᵢ        Q = ⊕ gⁱ·dᵢ        (byte-position-wise)
  *
  * Double-erasure recovery of shards (i, j): with P' = P ⊕ Σ survivors
  * and Q' = Q ⊕ Σ gᵏ·dᵏ survivors,
  *   dᵢ = (Q' ⊕ gʲ·P') / (gⁱ ⊕ gʲ),   dⱼ = P' ⊕ dᵢ.
  *
  * Scale shape (the HDFS-EC striping layout): each shard's byte stream
  * splits into fixed [[BlockSize]] blocks; parity and recovery are
  * BLOCK-PARALLEL — one (block_idx)-keyed shuffle brings the K aligned
  * shard blocks together, every GF operation happens inside that
  * bounded group, and no task ever holds a whole shard. Shards pad
  * with zero blocks to a common length (XOR-neutral, so parity is
  * unaffected by the padding convention).
  *
  * Verification is the q168/q177 self-validating discipline, total
  * rather than sampled: for EVERY block and EVERY adjacent erasure
  * pair (i, i+1 mod K) the engine erases both shards, reruns the
  * recovery algebra against P+Q, and compares bytes — a mismatch
  * `raise_error`s (a release must never ship parity it cannot prove
  * restores), so the emitted `recon_ok` is a proven verdict and the
  * oracle pins it TRUE alongside the arithmetic shard facts.
  */
object Erasure extends QueryGroup {

  /** Data shard count (parities are 2 more). */
  private[graft] val DataShards = 8

  /** EC striping cell: one block of one shard. */
  private[graft] val BlockSize = 4096

  /** GF(256) multiply, AES polynomial 0x11B (Russian peasant). */
  private[graft] def gfMul(a0: Int, b0: Int): Int = {
    var a = a0 & 0xff
    var b = b0 & 0xff
    var r = 0
    while (b != 0) {
      if ((b & 1) != 0) r ^= a
      a <<= 1
      if ((a & 0x100) != 0) a ^= 0x11b
      b >>= 1
    }
    r & 0xff
  }

  /** g^i for g = 2. */
  private[graft] def gfPow2(i: Int): Int = {
    var r = 1
    var k = 0
    while (k < i) { r = gfMul(r, 2); k += 1 }
    r
  }

  /** Multiplicative inverse via x^254 (Fermat in GF(2^8)). */
  private[graft] def gfInv(x: Int): Int = {
    require((x & 0xff) != 0, "GF(256) zero has no inverse")
    var r = 1
    var k = 0
    while (k < 254) { r = gfMul(r, x); k += 1 }
    r
  }

  /** P and Q parity blocks over the K aligned shard blocks. */
  private[graft] def parity(blocks: Array[Array[Byte]])
      : (Array[Byte], Array[Byte]) = {
    val n = blocks.head.length
    val p = new Array[Byte](n)
    val q = new Array[Byte](n)
    var i = 0
    while (i < blocks.length) {
      val gi = gfPow2(i)
      val d = blocks(i)
      var j = 0
      while (j < n) {
        p(j) = (p(j) ^ d(j)).toByte
        q(j) = (q(j) ^ gfMul(gi, d(j) & 0xff)).toByte
        j += 1
      }
      i += 1
    }
    (p, q)
  }

  /** Rebuild shards (i, j) of one block group from the survivors and
    * (P, Q) — the RAID-6 double-erasure algebra.
    */
  private[graft] def recover(blocks: Array[Array[Byte]], i: Int, j: Int,
      p: Array[Byte], q: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val n = p.length
    val pp = p.clone()
    val qq = q.clone()
    var k = 0
    while (k < blocks.length) {
      if (k != i && k != j) {
        val gk = gfPow2(k)
        val d = blocks(k)
        var b = 0
        while (b < n) {
          pp(b) = (pp(b) ^ d(b)).toByte
          qq(b) = (qq(b) ^ gfMul(gk, d(b) & 0xff)).toByte
          b += 1
        }
      }
      k += 1
    }
    val denomInv = gfInv(gfPow2(i) ^ gfPow2(j))
    val gj = gfPow2(j)
    val di = new Array[Byte](n)
    val dj = new Array[Byte](n)
    var b = 0
    while (b < n) {
      di(b) = gfMul(denomInv,
        (qq(b) & 0xff) ^ gfMul(gj, pp(b) & 0xff)).toByte
      dj(b) = (pp(b) ^ di(b)).toByte
      b += 1
    }
    (di, dj)
  }

  /** The shard facts + total recovery verdict. Blocks are built
    * iterator-to-iterator from the shard's doc stream (q169's pack
    * discipline — no whole-shard buffering); every block group then
    * proves all [[DataShards]] adjacent double erasures recover.
    */
  private[graft] def parityAudit(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    val payload = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        concat(col("text"), lit(Warc.NonAsciiProbe)).as("text"),
        pmod(col("doc_id"), lit(DataShards)).as("shard"))
    val stats = payload.groupBy(col("shard")).agg(
      count(lit(1)).as("n_docs"),
      sum(octet_length(col("text"))).as("data_octets"))
    val statRows = stats.collect() // DataShards rows — bounded model state
    require(statRows.length == DataShards,
      s"q225: expected $DataShards populated shards, got ${statRows.length}")
    val maxOctets = statRows.map(_.getLong(2)).max
    val nBlocks = ((maxOctets + BlockSize - 1) / BlockSize).toInt
    val blocks = payload
      .repartition(DataShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        val buf = it.buffered
        // iterator-to-iterator striping: per fill() pass, emit at most
        // one doc's worth of full blocks (or one pad block) — no
        // whole-shard buffering, bounded queue
        new Iterator[(Long, Long, Array[Byte])] {
          private val out =
            scala.collection.mutable.Queue.empty[(Long, Long, Array[Byte])]
          private var shard = -1L
          private var blockIdx = 0L
          private var tailFlushed = false
          private val acc = new java.io.ByteArrayOutputStream()
          private def fill(): Unit = {
            while (out.isEmpty) {
              if (shard < 0) {
                if (!buf.hasNext) return
                shard = buf.head._3
                blockIdx = 0L
                tailFlushed = false
                acc.reset()
              }
              if (buf.hasNext && buf.head._3 == shard) {
                acc.write(buf.next()._2.getBytes("UTF-8"))
                if (acc.size() >= BlockSize) {
                  val all = acc.toByteArray
                  var off = 0
                  while (off + BlockSize <= all.length) {
                    out.enqueue((shard, blockIdx, java.util.Arrays
                      .copyOfRange(all, off, off + BlockSize)))
                    blockIdx += 1
                    off += BlockSize
                  }
                  acc.reset()
                  acc.write(all, off, all.length - off)
                }
              } else {
                // shard exhausted: one padded tail block (only if a
                // slot remains — an exact-multiple max shard has none),
                // then lazy zero blocks up to the common length
                if (!tailFlushed) {
                  if (acc.size() > 0 || blockIdx < nBlocks) {
                    out.enqueue((shard, blockIdx, java.util.Arrays
                      .copyOf(acc.toByteArray, BlockSize)))
                    blockIdx += 1
                  }
                  tailFlushed = true
                } else if (blockIdx < nBlocks) {
                  out.enqueue((shard, blockIdx, new Array[Byte](BlockSize)))
                  blockIdx += 1
                } else {
                  shard = -1L
                }
              }
            }
          }
          def hasNext: Boolean = { fill(); out.nonEmpty }
          def next(): (Long, Long, Array[Byte]) = { fill(); out.dequeue() }
        }
      }
    val verdicts = blocks.groupByKey(_._2).mapGroups { (blockIdx, rows) =>
      val byShard = rows.toSeq.sortBy(_._1).map(_._3).toArray
      require(byShard.length == DataShards,
        s"q225: block $blockIdx has ${byShard.length} shard cells, " +
          s"wanted $DataShards — striping drifted")
      val (p, q) = parity(byShard)
      val ok = (0 until DataShards).map { i =>
        val j = (i + 1) % DataShards
        val (lo, hi) = (math.min(i, j), math.max(i, j))
        val (ri, rj) = recover(byShard, lo, hi, p, q)
        java.util.Arrays.equals(ri, byShard(lo)) &&
          java.util.Arrays.equals(rj, byShard(hi))
      }.toArray
      (blockIdx, ok)
    }
    val perShard = verdicts.flatMap { case (_, ok) =>
      ok.zipWithIndex.map { case (o, s) => (s.toLong, o) }
    }.toDF("shard", "ok")
      .groupBy(col("shard")).agg(min(col("ok")).as("recon_ok"))
    stats.join(perShard, Seq("shard"))
      .filter(when(!col("recon_ok"),
        raise_error(lit("q225: a double-erasure recovery failed to " +
          "restore a shard byte-exactly — refusing to ship unprovable parity")))
        .otherwise(lit(true)))
      .select(col("shard"), col("n_docs"), col("data_octets"),
        col("recon_ok"))
      .orderBy("shard")
  }

  def queries: Map[String, Q] = Map(
    // q225 [north star, r12]: RAID-6 / RS(K+2, K) erasure parity over
    // the release's data shards — block-parallel GF(256) P+Q with a
    // TOTAL recovery proof (every block, every adjacent double
    // erasure), loud on any mismatch. The emitted verdict is proven
    // in-plan; the oracle pins it TRUE beside the arithmetic shard
    // facts (the q168/q177 self-validating discipline).
    // memoized per sf-dir (CachePool.memo): shared with the q229 card.
    "q225_erasure_parity" -> ((spark, dir) =>
      graft.CachePool.memo("q225_erasure_parity", dir)(
        parityAudit(spark, Tables(spark, dir, "documents")))))

  def oracles: Map[String, String] = Map(
    "q225_erasure_parity" ->
      s"""SELECT CAST(doc_id % $DataShards AS BIGINT) AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(strlen(text || '${Warc.NonAsciiProbe}')) AS BIGINT)
         |    AS data_octets,
         |  TRUE AS recon_ok
         |FROM documents WHERE text IS NOT NULL
         |GROUP BY doc_id % $DataShards ORDER BY shard""".stripMargin)
}
