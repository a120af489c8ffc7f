package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing — north star: treat image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The q54/q56/q63 tier STUBS the codec call with a deterministic fake
  * derived from the bytes; everything around it — the binary column, the
  * typed `Dataset` schema, the `mapPartitions` batch shape (one decoder
  * instance per partition, the same shape a Pandas-UDF/mapInPandas
  * pipeline has per Arrow batch), the partition-preserving execution —
  * is real and oracle-checked. The REAL-CODEC tier below runs actual
  * JDK codecs end-to-end: BMP (q152) and PNG (q162) via ImageIO, WAV
  * PCM (q164) via javax.sound.sampled — only VIDEO decode remains a
  * stub (the JDK ships no video codec; a deployment wires ffmpeg/JavaCV
  * into the same mapPartitions seam).
  *
  * Reference anchor: the >1 MB payload S3-pointer side channel
  * (`app.py:43-46`) is the same pattern — a column that *refers to* a blob
  * handled by a later, partition-local fetch/decode stage.
  *
  * Scale: mapPartitions is narrow (no shuffle); decode parallelism ==
  * partition count, and `spark.sql.files.maxPartitionBytes` sizes the
  * per-task batch.
  */
object Multimodal extends QueryGroup {

  // ImageIO defaults to FILE-backed stream caching: every decode/encode
  // through the registry creates (and deletes) a temp file. All media in
  // this tier moves as in-memory byte arrays, so the memory-cached
  // stream is strictly cheaper and semantically identical (r17, guide
  // §1.2 "per-task work"). JVM-global; runs once per executor JVM when a
  // task first touches this object.
  javax.imageio.ImageIO.setUseCache(false)

  /** A media row: opaque bytes + id, as it would arrive from a manifest. */
  case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Extracted features. Width/height are the deterministic decode fake. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, fake_width: Long,
      fake_height: Long, content_md5: String)

  /** The stubbed decoder: in a real deployment this is the image/audio
    * library call; here it derives deterministic pseudo-metadata so the
    * pipeline is testable end-to-end. `md` is the partition-scoped codec
    * instance (decoders are expensive to construct; one per row is the
    * classic mapPartitions anti-pattern).
    */
  private[graft] def decodeStub(md: MessageDigest)(r: MediaRow): MediaFeatures = {
    md.reset()
    val hex = md.digest(r.media).map("%02x".format(_)).mkString
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = r.media.length.toLong,
      fake_width = r.media.length.toLong % 640,
      fake_height = r.media.length.toLong % 480,
      content_md5 = hex)
  }

  /** Binary-column pipeline: bytes in, typed features out, one decoder
    * instance per partition.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map(decodeStub(md))
    }
  }

  /** A media manifest row: id + blob pointer (the >1 MB side channel). */
  case class ManifestRow(doc_id: Long, url: String)

  /** Dereferenced blob metadata. `blob_md5` is derived from the stubbed
    * fetch payload (deterministic function of the url — the fetch itself
    * is the stub; everything else is real plumbing).
    */
  case class Dereffed(doc_id: Long, url: String, n_bytes: Long, blob_md5: String)

  /** The stubbed blob fetch: a real deployment holds a pooled S3/HTTP
    * client per partition (`md` stands in for that partition-scoped
    * resource); here the payload is the url bytes themselves.
    */
  private[graft] def fetchStub(md: MessageDigest)(r: ManifestRow): Dereffed = {
    val payload = r.url.getBytes("UTF-8")
    md.reset()
    Dereffed(r.doc_id, r.url, payload.length.toLong,
      md.digest(payload).map("%02x".format(_)).mkString)
  }

  /** Side-channel deref stage (SURVEY.md §2.1 "S3 pointer deref",
    * `app.py:43-46`): filter pointer rows, fetch partition-locally.
    * Narrow — fetch parallelism == partition count.
    */
  def derefPointers(spark: SparkSession, manifest: Dataset[ManifestRow]): Dataset[Dereffed] = {
    import spark.implicits._
    manifest.filter(_.url != null).mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map(fetchStub(md))
    }
  }

  /** Resized media metadata. Integer-only math so any engine mirrors it
    * exactly: fit the fake dimensions into `TargetDim`² preserving aspect.
    */
  case class Resized(doc_id: Long, in_w: Long, in_h: Long, out_w: Long, out_h: Long)
  val TargetDim = 224L

  /** Resize stage stub: real codecs scale pixels; the shape here is the
    * metadata contract (aspect-preserving fit) and the partition-local map.
    */
  def resize(spark: SparkSession, media: Dataset[MediaRow]): Dataset[Resized] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { r =>
        val f = decodeStub(md)(r)
        val (w, h) = (f.fake_width, f.fake_height)
        if (w <= 0 || h <= 0) Resized(r.doc_id, w, h, 0L, 0L)
        else {
          val m = math.max(w, h)
          Resized(r.doc_id, w, h, w * TargetDim / m, h * TargetDim / m)
        }
      }
    }
  }

  /** One sampled frame: every `FrameStep`-th `FrameSize`-byte chunk. */
  case class Frame(doc_id: Long, frame_idx: Long, n_bytes: Long, frame_md5: String)
  val FrameSize = 64
  val FrameStep = 4
  /** Hard cap on frames per document. This is a SEMANTIC bound, not a
    * convenience: q150's fkey packing (doc_id·MaxFrames + frame_idx) is
    * bijective only if frame_idx < MaxFrames, and the q56/q150 oracles
    * enumerate exactly generate_series(0, 63). A keyframe sampler that
    * emits unbounded frames per asset is also the wrong shape at 100 TB —
    * one long video would dominate its task; real samplers cap or stride
    * adaptively.
    */
  val MaxFrames = 64

  /** Frame-sampling stage: media bytes → every 4th 64-byte chunk, capped at
    * `MaxFrames` frames, with per-frame metadata — the video-keyframe
    * extraction shape (the codec call is the stub; the flatMap fan-out,
    * typed schema, and partition-local batch iteration are the real
    * pipeline).
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow]): Dataset[Frame] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // one codec instance per partition
      it.flatMap { r =>
        val n = r.media.length
        (0 until n by FrameSize * FrameStep).iterator.take(MaxFrames)
          .zipWithIndex.map {
          case (off, idx) =>
            val chunk = r.media.slice(off, math.min(off + FrameSize, n))
            md.reset()
            Frame(r.doc_id, idx.toLong, chunk.length.toLong,
              md.digest(chunk).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** ---- real-codec tier (r9) ----------------------------------------
    *
    * Everything above models media as opaque bytes with a FAKE decode;
    * this tier runs a REAL image codec end-to-end: a minimal 24-bit BMP
    * encoder (the one raster format writable in ~30 lines with no
    * libraries) feeds `javax.imageio.ImageIO` — the JDK's actual BMP
    * decoder — partition-locally. Pixel values are a deterministic
    * integer function of (doc_id, x, y), so the DuckDB oracle can
    * recompute the decoded width/height/pixel-sum as pure arithmetic:
    * the oracle checks digest/dimension INTEGERS while the Spark path
    * exercises genuine binary encode→decode. Closes SURVEY §2.10's
    * "decode is simulated" caveat.
    */

  /** Minimal 24-bit bottom-up BMP: 54-byte header + BGR rows padded to
    * 4 bytes. Channel formulas (mod 256): blue = 7x+13y+doc_id,
    * green = 3x+5y, red = x+y.
    */
  private[graft] def encodeBmp(docId: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // BMP stores rows bottom-up
      var x = 0
      while (x < w) {
        buf.put(((x * 7 + y * 13 + docId) % 256).toByte)
        buf.put(((x * 3 + y * 5) % 256).toByte)
        buf.put(((x + y) % 256).toByte)
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fileRow += 1
    }
    buf.array()
  }

  /** PNG sibling of [[encodeBmp]] (r10, the r9 verdict's #5 ask): the
    * same deterministic channel formulas rendered into a BufferedImage
    * and compressed by the JDK's own PNG writer — so the decode side
    * exercises a COMPRESSED codec (zlib inflate + CRC validation), not
    * just BMP's raw raster walk. PNG is lossless, so the q152 integer
    * oracle discipline carries over unchanged: decoded pixels ==
    * formula pixels, bit-exactly.
    */
  private[graft] def encodePng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x + y) % 256
        val g = (x * 3 + y * 5) % 256
        val b = ((x * 7 + y * 13 + docId) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Minimal PCM WAV (RIFF): 44-byte canonical header + little-endian
    * 16-bit mono samples, s_i = ((doc_id·31 + i·7) mod 4096) − 2048 —
    * integer-deterministic, so the decode oracle is pure arithmetic.
    * This is the AUDIO sibling of [[encodeBmp]]/[[encodePng]]: the JDK
    * ships a real WAV codec (`javax.sound.sampled`), which closes the
    * "audio decode is a stub" caveat the same way q152 closed raster.
    */
  private[graft] def encodeWav(docId: Long, nSamples: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    val dataSize = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      buf.putShort((((docId * 31 + i.toLong * 7) % 4096) - 2048).toShort)
      i += 1
    }
    buf.array()
  }

  /** Real audio decode output: format fields as the CODEC reports them
    * plus exact BIGINT sample count and sample sum.
    */
  case class DecodedAudio(doc_id: Long, sample_rate: Long, channels: Long,
      n_samples: Long, sample_sum: Long)

  /** The real-codec audio decode stage: `javax.sound.sampled` parses the
    * RIFF container and streams PCM frames, partition-locally. Undecodable
    * payloads raise (the q152 raise-don't-drift stance).
    */
  def decodeAudio(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.media))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"unexpected WAV format for doc ${r.doc_id}: $fmt")
        val bytes = in.readAllBytes()
        in.close()
        var sum = 0L
        var i = 0
        while (i + 1 < bytes.length) {
          // little-endian int16 per the codec-reported format
          sum += ((bytes(i) & 0xff) | (bytes(i + 1).toInt << 8)).toShort.toLong
          i += 2
        }
        DecodedAudio(r.doc_id, fmt.getSampleRate.toLong,
          fmt.getChannels.toLong, bytes.length.toLong / 2, sum)
      }
    }
  }

  /** Multi-frame ANIMATED GIF via the JDK's real GIF codec — the
    * closest thing the JDK ships to a video codec: LZW-compressed
    * frames behind a container the READER must demux (getNumImages +
    * per-frame read), i.e. the frame-sampling shape q56 stubs, run
    * against an actual temporal codec. Frames are TYPE_BYTE_GRAY
    * (gray ⊆ the GIF 256-entry palette ⇒ LOSSLESS round trip), pixel
    * g = (x·7 + y·13 + f·31 + doc_id) mod 256 — integer-deterministic
    * for the oracle.
    */
  private[graft] def encodeGif(docId: Long, w: Int, h: Int,
      nFrames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0,
            ((x * 7 + y * 13 + f * 31 + docId) % 256).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Frame-demuxed decode output: codec-reported frame inventory plus
    * exact per-document pixel sum across all frames (one gray channel).
    */
  case class DecodedFrames(doc_id: Long, n_frames: Long, frame_w: Long,
      frame_h: Long, px_sum: Long)

  /** The temporal-codec decode stage: the JDK GIF READER demuxes the
    * frame sequence (getNumImages forces a full container scan) and
    * decodes each LZW frame; partition-local, one reader per row.
    */
  def decodeGifFrames(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedFrames] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // ONE reader per partition (the registry lookup + allocation per
      // row was waste; setInput resets the reader's state per document),
      // streams closed in finally so a bad row can't leak them; the
      // reader is disposed on TASK COMPLETION — not iterator exhaustion,
      // which a limit()/take() consumer may never reach (r10 review
      // finding).
      val reader = javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => reader.dispose()))
      it.map { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.media))
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          require(n > 0, s"undecodable GIF for doc ${r.doc_id}")
          var sum = 0L
          var w = 0L
          var h = 0L
          var f = 0
          while (f < n) {
            val img = reader.read(f)
            w = img.getWidth.toLong
            h = img.getHeight.toLong
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += img.getRaster.getSample(x, y, 0).toLong
                x += 1
              }
              y += 1
            }
            f += 1
          }
          DecodedFrames(r.doc_id, n.toLong, w, h, sum)
        } finally iis.close()
      }
    }
  }

  /** q168's expected-pixel formula: a TRIANGLE wave (period 510, slopes
    * ±{3,5,17}) — continuous everywhere, so the JDK's LOSSY JPEG codec
    * sees smooth gradients and its reconstruction error stays small and
    * bounded; a modulo wrap here would put a 255→0 cliff through every
    * block and blow the tolerance with ringing.
    */
  private[graft] def mjpegExpected(docId: Long, x: Int, y: Int, f: Int): Int = {
    val v = ((x * 3 + y * 5 + f * 17 + docId) % 510).toInt
    math.abs(v - 255)
  }

  /** Per-doc MJPEG-AVI: `nf` gray frames JPEG-encoded by the JDK codec
    * and muxed by [[Avi.mux]].
    */
  private[graft] def encodeMjpegAvi(docId: Long, w: Int, h: Int,
      nf: Int): Array[Byte] = {
    val frames = (0 until nf).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, mjpegExpected(docId, x, y, f))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    Avi.mux(frames, w, h, fps = 5)
  }

  /** MJPEG decode output: container-reported inventory plus the
    * self-validating fidelity verdict (the q19 discipline — the lossy
    * codec's raw pixels can never hash-match a SQL oracle, so what
    * hashes is the exact container facts plus a tolerance check the
    * engine computes from its own decode; the oracle emits literal
    * TRUE and the row goes red the day demux or decode breaks).
    */
  case class DecodedVideo(doc_id: Long, n_frames: Long, frame_w: Long,
      frame_h: Long, within_tol: Boolean)

  /** Demux the AVI container ([[Avi.demux]] — generic RIFF walk), decode
    * every '00dc' frame with the JDK JPEG codec, and check mean absolute
    * reconstruction error ≤ 4 gray levels against the source formula.
    * Header/stream frame-count consistency is enforced in-line.
    */
  def decodeMjpegVideos(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedVideo] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val frames = Avi.demux(r.media)
        require(frames.nonEmpty, s"no frames in AVI for doc ${r.doc_id}")
        require(Avi.headerTotalFrames(r.media) == frames.size,
          s"avih.dwTotalFrames != movi frame count for doc ${r.doc_id}")
        var w = 0; var h = 0
        var absErr = 0L; var nPx = 0L
        frames.zipWithIndex.foreach { case (jpeg, f) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(jpeg))
          require(img != null, s"undecodable JPEG frame $f, doc ${r.doc_id}")
          w = img.getWidth; h = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              absErr += math.abs(img.getRaster.getSample(x, y, 0) -
                mjpegExpected(r.doc_id, x, y, f)).toLong
              nPx += 1
              x += 1
            }
            y += 1
          }
        }
        DecodedVideo(r.doc_id, frames.size.toLong, w.toLong, h.toLong,
          within_tol = absErr <= 4L * nPx)
      }
    }
  }

  /** ---- temporal-prediction video tier (r11, q176) ------------------
    *
    * The source signal for the GVC fixture: base spatial gradient
    * bounded to [0,199] plus a small time-varying term bounded to
    * [0,48] — every sample stays in 8-bit range AND every frame-to-
    * frame delta stays within [-48,48] ⊂ [-128,127], so the P-frame
    * residual encoding is exact by construction (enforced loudly at
    * encode). Pure integer arithmetic → the DuckDB oracle recomputes
    * both the reconstructed pixel sum and the residual-magnitude sum.
    */
  private[graft] def gvcExpected(docId: Long, x: Int, y: Int, f: Int): Int =
    ((x * 3 + y * 7 + docId) % 200).toInt +
      ((x + y + f * 11 + docId) % 7).toInt * 8

  /** Per-doc GVC-AVI: `nf` gray frames — frame 0 intra, the rest
    * prediction residuals — muxed with fourcc 'GVC1' and an idx1 whose
    * AVIIF_KEYFRAME flags mark ONLY the intra frame (the seek contract
    * a predictive stream's container must honor).
    */
  private[graft] def encodeGvcAvi(docId: Long, w: Int, h: Int,
      nf: Int): Array[Byte] = {
    val rasters = (0 until nf).map { f =>
      val a = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { a(y * w + x) = gvcExpected(docId, x, y, f); x += 1 }
        y += 1
      }
      a
    }
    Avi.mux(Gvc.encodeFrames(rasters, w, h), w, h, fps = 5,
      codec = "GVC1", keyframes = Some(0 until nf map (_ == 0)))
  }

  /** Per-doc quantized-residual GVC-AVI (q187): the same source rasters
    * as [[encodeGvcAvi]], but P-frames carry QUANTIZED residuals run
    * through the canonical-Huffman entropy coder — fourcc 'GVQ1'.
    */
  private[graft] def encodeGvqAvi(docId: Long, w: Int, h: Int,
      nf: Int): Array[Byte] = {
    val rasters = (0 until nf).map { f =>
      val a = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { a(y * w + x) = gvcExpected(docId, x, y, f); x += 1 }
        y += 1
      }
      a
    }
    Avi.mux(Gvc.encodeQuantFrames(rasters, w, h), w, h, fps = 5,
      codec = "GVQ1", keyframes = Some(0 until nf map (_ == 0)))
  }

  /** ---- motion-compensated tier fixture (r12, q191) -----------------
    *
    * A scrolling world: an APERIODIC texture (the u·v cross term defeats
    * any translational self-similarity, so no wrong displacement can
    * match it) plus q176's small time-varying term, displaced per frame
    * by a bounded per-frame motion vector with toroidal wraparound.
    * Every sample stays in [0, 247] and the motion-compensated residual
    * is exactly the temporal term's difference — bounded ±48, formula-
    * computable, which is what makes the oracle's search-optimality pin
    * exact (see the Gvc motion-tier scaladoc).
    */
  private[graft] def gvmMv(docId: Long, f: Int): (Int, Int) =
    (((docId + f) % 5).toInt - 2, ((docId * 3 + f) % 5).toInt - 2)

  /** World content at world coords (u, v), frame f. The texture
    * multipliers are primes ≫ 200 (mod-200 steps of 119/129/107 per
    * unit displacement), so any wrong displacement's per-pixel texture
    * mismatch sweeps the residue ring — mean |mismatch| ≈ 50/pixel vs
    * the temporal term's ≈ 27/pixel at the aligned displacement, a
    * ~16 σ search margin (unit coefficients measured ambiguous: a
    * wrong vector's mismatch was a slow ramp that beat the aligned
    * SAD on half the docs).
    */
  private[graft] def gvmExpected(docId: Long, u: Int, v: Int, f: Int): Int =
    ((u.toLong * 7919 + v.toLong * 104729 + u.toLong * v * 7907 +
      docId * 31) % 200).toInt +
      ((u + v + f * 11 + docId) % 7).toInt * 8

  /** The scrolling-world raster sequence (shared by q191 and q196). */
  private[graft] def gvmRasters(docId: Long, w: Int, h: Int,
      nf: Int): Seq[Array[Int]] = {
    var sx = 0
    var sy = 0
    (0 until nf).map { f =>
      if (f > 0) {
        val (mx, my) = gvmMv(docId, f)
        sx = ((sx + mx) % w + w) % w
        sy = ((sy + my) % h + h) % h
      }
      val a = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          a(y * w + x) = gvmExpected(docId, (x + sx) % w, (y + sy) % h, f)
          x += 1
        }
        y += 1
      }
      a
    }
  }

  /** Per-doc motion GVC-AVI: frames show the world at cumulative
    * displacement Σ mv (toroidal), muxed with fourcc 'GVM1'; the
    * encoder SEARCHES for the displacement — it is never told it.
    */
  private[graft] def encodeGvmAvi(docId: Long, w: Int, h: Int,
      nf: Int): Array[Byte] =
    Avi.mux(Gvc.encodeMotionFrames(gvmRasters(docId, w, h, nf), w, h),
      w, h, fps = 5, codec = "GVM1", keyframes = Some(0 until nf map (_ == 0)))

  /** Per-doc FULL-P-frame AVI (q196, fourcc 'GVV1'): the same scrolling
    * world, encoded with motion + closed-loop quantization + entropy
    * coding composed.
    */
  private[graft] def encodeGvvAvi(docId: Long, w: Int, h: Int,
      nf: Int): Array[Byte] =
    Avi.mux(Gvc.encodeFullFrames(gvmRasters(docId, w, h, nf), w, h),
      w, h, fps = 5, codec = "GVV1", keyframes = Some(0 until nf map (_ == 0)))

  /** Demux 'GVV1' and run the composed decode ([[Gvc.decodeFullFrames]]);
    * q187's output shape ([[DecodedQuantVideo]]) over the motion
    * fixture — the oracle replays the world-point closed-loop
    * recurrence and the rate verdict is engine-measured.
    */
  def decodeFullVideos(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedQuantVideo] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (payloads, w, h, flags) = demuxChecked(r.media, r.doc_id)
        val frames = Gvc.decodeFullFrames(payloads, w, h)
        checkKeyFlags(r.doc_id, frames.map(_.isKey), flags)
        // the per-frame expected source: the scrolling world at the
        // cumulative displacement (the q168 comparison discipline)
        val src = gvmRasters(r.doc_id, w, h, payloads.size)
        var pxSum = 0L
        var errSum = 0L
        var maxErr = 0L
        var qAbs = 0L
        var codedP = 0L
        frames.zipWithIndex.foreach { case (fr, f) =>
          var i = 0
          while (i < fr.raster.length) {
            val e = math.abs(fr.raster(i) - src(f)(i)).toLong
            pxSum += fr.raster(i)
            errSum += e
            if (e > maxErr) maxErr = e
            i += 1
          }
          qAbs += fr.qAbsSum
          if (!fr.isKey) codedP += fr.payloadBytes
        }
        val rawP = (payloads.size - 1).toLong * (w.toLong * h + 1)
        DecodedQuantVideo(r.doc_id, payloads.size.toLong, w.toLong, h.toLong,
          frames.count(_.isKey).toLong, pxSum, errSum, maxErr, qAbs,
          coded_lt_raw = codedP < rawP)
      }
    }
  }

  /** Demux 'GVM1', cross-check the keyframe index, run the motion-
    * compensated decode ([[Gvc.decodeMotionFrames]]) and report exact
    * reconstruction facts — same output shape as q176 ([[DecodedPframe]]):
    * px_sum pins reconstruction, resid_abs_sum pins SEARCH OPTIMALITY
    * (the encoder minimizes it; the oracle computes it at the
    * texture-aligned displacement).
    */
  def decodeMotionVideos(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedPframe] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (payloads, w, h, flags) = demuxChecked(r.media, r.doc_id)
        val frames = Gvc.decodeMotionFrames(payloads, w, h)
        checkKeyFlags(r.doc_id, frames.map(_.isKey), flags)
        var pxSum = 0L
        var residAbs = 0L
        frames.foreach { fr =>
          var i = 0
          while (i < fr.raster.length) { pxSum += fr.raster(i); i += 1 }
          residAbs += fr.residAbsSum
        }
        DecodedPframe(r.doc_id, payloads.size.toLong, w.toLong, h.toLong,
          frames.count(_.isKey).toLong, pxSum, residAbs)
      }
    }
  }

  /** ---- per-block motion fixture (r12, q194) ------------------------
    *
    * Two horizontal bands scrolling at DIFFERENT velocities — the
    * content a single frame-wide vector cannot compensate, which is
    * exactly why codecs search per block. Bands are block-aligned
    * ([[Gvc.BlockRows]]-row blocks; h is a multiple of 4 by
    * construction and the band split h1 = 4·⌊h/8⌋), each scrolls
    * horizontally only (rows never change band), textures carry the
    * q191 prime-multiplier aperiodicity plus a band term, and the
    * temporal term rides the world coordinates — so per-block residuals
    * at the band-true velocities are exactly the temporal difference,
    * the same oracle identity as q191.
    */
  private[graft] def gvbBandVel(docId: Long, band: Int, f: Int): Int =
    if (band == 0) ((docId + f) % 5).toInt - 2
    else ((3 * docId + 2 * f) % 5).toInt - 2

  /** World content at world-x `u`, row `y`, band `band`, frame f. */
  private[graft] def gvbExpected(docId: Long, u: Int, y: Int, band: Int,
      f: Int): Int =
    ((u.toLong * 7919 + y.toLong * 104729 + u.toLong * y * 7907 +
      docId * 31 + band * 4999L) % 200).toInt +
      ((u + y + f * 11 + docId) % 7).toInt * 8

  /** Per-doc block-motion GVC-AVI (fourcc 'GVB1'): two bands, two
    * independent scroll velocities; the encoder searches each block's
    * vector — it is never told either velocity.
    */
  private[graft] def encodeGvbAvi(docId: Long, w: Int, h: Int,
      nf: Int): Array[Byte] = {
    val h1 = (h / 8) * 4
    var sx0 = 0
    var sx1 = 0
    val rasters = (0 until nf).map { f =>
      if (f > 0) {
        sx0 = ((sx0 + gvbBandVel(docId, 0, f)) % w + w) % w
        sx1 = ((sx1 + gvbBandVel(docId, 1, f)) % w + w) % w
      }
      val a = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val band = if (y < h1) 0 else 1
        val sx = if (band == 0) sx0 else sx1
        var x = 0
        while (x < w) {
          a(y * w + x) = gvbExpected(docId, (x + sx) % w, y, band, f)
          x += 1
        }
        y += 1
      }
      a
    }
    Avi.mux(Gvc.encodeBlockMotionFrames(rasters, w, h), w, h, fps = 5,
      codec = "GVB1", keyframes = Some(0 until nf map (_ == 0)))
  }

  /** Demux 'GVB1', cross-check the keyframe index, run the per-block
    * motion decode and report exact reconstruction facts (q191's
    * output shape; resid_abs_sum pins EVERY block's search at once).
    */
  def decodeBlockVideos(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedPframe] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (payloads, w, h, flags) = demuxChecked(r.media, r.doc_id)
        val frames = Gvc.decodeBlockMotionFrames(payloads, w, h)
        checkKeyFlags(r.doc_id, frames.map(_.isKey), flags)
        var pxSum = 0L
        var residAbs = 0L
        frames.foreach { fr =>
          var i = 0
          while (i < fr.raster.length) { pxSum += fr.raster(i); i += 1 }
          residAbs += fr.residAbsSum
        }
        DecodedPframe(r.doc_id, payloads.size.toLong, w.toLong, h.toLong,
          frames.count(_.isKey).toLong, pxSum, residAbs)
      }
    }
  }

  /** q187 decode output: container inventory + EXACT closed-loop
    * reconstruction facts (px_sum / error sums / quantized-residual
    * magnitude — all BIGINT, recomputed by the oracle's unrolled
    * recurrence) plus the rate verdict `coded_lt_raw` (entropy-coded
    * P-frame bytes strictly below raw — the one column only the engine
    * can measure, the q168 self-validating discipline).
    */
  case class DecodedQuantVideo(doc_id: Long, n_frames: Long, frame_w: Long,
      frame_h: Long, n_key: Long, px_sum: Long, err_abs_sum: Long,
      max_abs_err: Long, qresid_abs_sum: Long, coded_lt_raw: Boolean)

  /** Demux 'GVQ1', cross-check the keyframe index, run the quantized
    * decode loop ([[Gvc.decodeQuantFrames]] — entropy decode →
    * dequantize → closed-loop reconstruction), and report exact
    * distortion facts against the synthesized source ([[gvcExpected]],
    * the q168 comparison discipline) plus the measured rate.
    */
  def decodeQuantVideos(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedQuantVideo] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (payloads, w, h, flags) = demuxChecked(r.media, r.doc_id)
        val frames = Gvc.decodeQuantFrames(payloads, w, h)
        checkKeyFlags(r.doc_id, frames.map(_.isKey), flags)
        var pxSum = 0L
        var errSum = 0L
        var maxErr = 0L
        var qAbs = 0L
        var codedP = 0L
        frames.zipWithIndex.foreach { case (fr, f) =>
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = fr.raster(y * w + x)
              val e = math.abs(v - gvcExpected(r.doc_id, x, y, f)).toLong
              pxSum += v
              errSum += e
              if (e > maxErr) maxErr = e
              x += 1
            }
            y += 1
          }
          qAbs += fr.qAbsSum
          if (!fr.isKey) codedP += fr.payloadBytes
        }
        val rawP = (payloads.size - 1).toLong * (w.toLong * h + 1)
        DecodedQuantVideo(r.doc_id, payloads.size.toLong, w.toLong, h.toLong,
          frames.count(_.isKey).toLong, pxSum, errSum, maxErr, qAbs,
          coded_lt_raw = codedP < rawP)
      }
    }
  }

  /** q176 decode output: container inventory + intra-frame count + the
    * EXACT reconstructed pixel sum and stored-residual magnitude sum
    * (all BIGINT — the oracle recomputes every column arithmetically;
    * unlike lossy q168 there is no tolerance verdict to hide behind).
    */
  case class DecodedPframe(doc_id: Long, n_frames: Long, frame_w: Long,
      frame_h: Long, n_key: Long, px_sum: Long, resid_abs_sum: Long)

  /** Shared container preamble for every video tier: demux, cross-check
    * the avih frame count, dims, and idx1 entry count. One copy (r12 —
    * five decoders had drifted-wording duplicates of this block; a
    * future container invariant lands here once).
    */
  private def demuxChecked(media: Array[Byte], docId: Long)
      : (Seq[Array[Byte]], Int, Int, Seq[Int]) = {
    val payloads = Avi.demux(media)
    require(payloads.nonEmpty, s"no frames in AVI for doc $docId")
    require(Avi.headerTotalFrames(media) == payloads.size,
      s"avih.dwTotalFrames != movi frame count for doc $docId")
    val (w, h) = Avi.headerDims(media)
    val flags = Avi.idx1Flags(media)
    require(flags.size == payloads.size,
      s"idx1 entry count != frame count for doc $docId")
    (payloads, w, h, flags)
  }

  /** The keyframe-index cross-check every tier runs after decode: a
    * player seeking to a flagged frame would otherwise decode garbage.
    */
  private def checkKeyFlags(docId: Long, isKey: Seq[Boolean],
      flags: Seq[Int]): Unit =
    isKey.zip(flags).zipWithIndex.foreach { case ((k, fl), i) =>
      require(k == ((fl & 0x10) != 0),
        s"doc $docId frame $i: idx1 keyframe flag disagrees with the " +
          "stream's own frame magic")
    }

  /** Demux the 'GVC1' AVI, cross-check the container's keyframe index
    * against the payloads' own intra/predicted magic, then run the
    * stateful prediction-threading decode ([[Gvc.decodeFrames]]) and
    * report exact reconstruction facts. Partition-local like every
    * decoder here.
    */
  def decodeGvcVideos(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedPframe] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (payloads, w, h, flags) = demuxChecked(r.media, r.doc_id)
        val frames = Gvc.decodeFrames(payloads, w, h)
        // the container index must agree with the stream: a player
        // seeking to a flagged frame would otherwise decode garbage
        checkKeyFlags(r.doc_id, frames.map(_.isKey), flags)
        var pxSum = 0L
        var residAbs = 0L
        frames.foreach { fr =>
          var i = 0
          while (i < fr.raster.length) { pxSum += fr.raster(i); i += 1 }
          residAbs += fr.residAbsSum
        }
        DecodedPframe(r.doc_id, payloads.size.toLong, w.toLong, h.toLong,
          frames.count(_.isKey).toLong, pxSum, residAbs)
      }
    }
  }

  /** Real decode output: dimensions the CODEC reports plus an exact
    * all-channel pixel sum (BIGINT — max 64·48·3·255 per image, far
    * inside range).
    */
  case class DecodedImage(doc_id: Long, img_w: Long, img_h: Long, px_sum: Long)

  /** The real-codec decode stage: ImageIO (JDK BMP plugin) per row,
    * partition-local like every decoder here. An undecodable payload
    * raises — silent nulls would hide corruption (the q131/q149
    * raise-don't-drift discipline).
    */
  def decodeImages(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media))
        require(img != null, s"undecodable media for doc ${r.doc_id}")
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        DecodedImage(r.doc_id, img.getWidth.toLong, img.getHeight.toLong, sum)
      }
    }
  }

  /** q217's extraction projection over (doc_id, html) pages — shared
    * verbatim by batch q217 and the streaming ingest twin
    * (`StreamOps.boilerplateExtractStream`), so batch≡stream equality
    * is structural (the Tokenizer.tokenized stance).
    */
  private[graft] def boilerplateProjected(pages: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    pages
      .select(col("doc_id"), toColumn(graft.expressions.BoilerplateExtract(
        toExpression(col("html")))).as("b"))
      .select(col("doc_id"), col("b.n_blocks"), col("b.n_content"),
        col("b.content_words"), md5(col("b.content")).as("content_md5"))
  }

  /** ---- audio fingerprint near-dup tier (r12, q219) -------------------
    *
    * The AUDIO sibling of q216: a multimodal corpus holds re-encoded,
    * re-leveled, end-trimmed copies of the same recording. The
    * fingerprint is the Haitsma–Kalker sign-of-delta shape (ISMIR'02 —
    * bits are SIGNS of energy differences, chosen exactly because
    * energy SCALING cancels in the comparison) applied to time-domain
    * frame energies: E(j) = Σ|sample| over frame j, bit j = E(j) >
    * E(j+1). Volume changes multiply every E(j) by the same factor —
    * the hash is invariant (pinned), the exact analogue of dHash's
    * brightness invariance. (The published system takes band energies
    * off an FFT; libm FFTs are not bit-portable cross-engine, so the
    * envelope variant keeps the house exactness stance with the same
    * comparison structure.)
    *
    * Fixture: 5 groups with period-7 sawtooth envelopes (step gid+2 —
    * never ≡ 0 mod 7, so every neighbor margin is ≥ 400·64 against ≤
    * ±128 of per-member noise; min cross-group signature distance 9);
    * members re-level ×1/×2 (hash-identical) and member%3==1 docs carry
    * a fade-out edit (last frame → level 7000, flipping exactly bit 63
    * in every group — the true near-dup). Near-dup join: the SAME
    * banded-Hamming join as q216 ([[dhashNearDupPairs]]), pigeonhole-
    * complete for distance ≤ 3.
    */

  private[graft] val AfpFrames = 65 // 64 comparison bits
  private[graft] val AfpFrameLen = 64 // samples per frame
  private[graft] val AfpGroups = 5L

  private[graft] def afpLevel(gid: Long, member: Long, j: Int): Int =
    if (j == AfpFrames - 1 && member % 3 == 1) 7000
    else 8000 + 400 * ((j.toLong * (gid + 2)) % 7).toInt

  /** One PCM sample: ±(mult·level + noise) with alternating sign (the
    * abs-energy is what the fingerprint reads; signs make it a
    * waveform, not a DC offset).
    */
  private[graft] def afpSample(docId: Long, gi: Int): Int = {
    val gid = docId % AfpGroups
    val member = docId / AfpGroups
    val mult = 1 + (member % 2).toInt
    val mag = mult * afpLevel(gid, member, gi / AfpFrameLen) +
      (((gi.toLong + member) % 3) - 1).toInt
    if (gi % 2 == 0) mag else -mag
  }

  /** 16-bit mono PCM WAV of the fingerprint fixture (max |sample|
    * 2·10400 + 1 — inside int16).
    */
  private[graft] def encodeWavAfp(docId: Long): Array[Byte] = {
    val n = AfpFrames * AfpFrameLen
    val dataSize = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) { buf.putShort(afpSample(docId, i).toShort); i += 1 }
    buf.array()
  }

  /** Real-codec fingerprinting: javax.sound.sampled decode
    * (partition-local), exact |sample| frame energies, sign-of-delta
    * bit packing — output shape shared with [[perceptualHashes]] so the
    * banded join is literally the same operator.
    */
  def audioFingerprints(spark: SparkSession,
      media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.media))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"unexpected WAV format for doc ${r.doc_id}: $fmt")
        val bytes = in.readAllBytes()
        in.close()
        val n = bytes.length / 2
        require(n == AfpFrames * AfpFrameLen,
          s"doc ${r.doc_id}: fingerprint fixture must hold " +
            s"${AfpFrames * AfpFrameLen} samples, got $n")
        val en = new Array[Long](AfpFrames)
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1).toInt << 8))
            .toShort.toInt
          en(i / AfpFrameLen) += math.abs(s).toLong
          i += 1
        }
        var hsh = 0L
        var j = 0
        while (j < AfpFrames - 1) {
          if (en(j) > en(j + 1)) hsh |= 1L << j
          j += 1
        }
        (r.doc_id, hsh)
      }
    }.toDF("doc_id", "dhash")
  }

  /** ---- scene-cut detection tier (r12, q218) --------------------------
    *
    * Temporal SEGMENTATION — the stage between video decode and frame
    * sampling in a multimodal training pipeline: q56/q150 sample frames
    * blindly; a real pipeline samples PER SHOT, which needs the shot
    * boundaries first. The published baseline detector: adjacent-frame
    * SAD (sum of absolute pixel differences), cut where the mean
    * per-pixel difference clears a bar. All integers: cut iff
    * SAD > [[SceneCutMeanSad]]·w·h.
    *
    * Fixture margins are ANALYTIC, not searched (the q191 lesson, one
    * better): within a scene only the mod-7 temporal term moves —
    * adjacent frames differ per-pixel by |(v+4)%7 − v|·8 ∈ {24, 32}, so
    * mean ≤ 32 < 40; across a cut the scene texture offset is
    * 7919·31·Δs ≡ 89 (mod 200), so per-pixel texture distance is 89 or
    * 111, minus the ≤ 32 temporal swing ⇒ mean ≥ 57 > 40. Both bounds
    * asserted on every measured SAD in the spec.
    */

  /** Mean per-pixel SAD bar: cut iff SAD > bar·w·h (exact integers). */
  private[graft] val SceneCutMeanSad = 40L

  /** Frames per scene / scene count of the fixture. */
  private[graft] def sceneFp(docId: Long): Int = (2 + docId % 2).toInt
  private[graft] def sceneCount(docId: Long): Int = (2 + docId % 3).toInt

  /** Scene-structured raster: q176's temporal term over a texture whose
    * phase jumps by 89 (mod 200) at every scene boundary.
    */
  private[graft] def sceneExpected(docId: Long, x: Int, y: Int, f: Int): Int = {
    val s = f / sceneFp(docId)
    ((x * 3 + y * 7 + (docId + s * 7919L) * 31) % 200).toInt +
      ((x + y + f * 11 + docId) % 7).toInt * 8
  }

  /** Scene fixture muxed through the real interframe codec (GVC1),
    * with keyframes AT THE SCENE CUTS — the real encoder shape (a
    * cross-scene prediction residual blows the signed-byte range; an
    * encoder inserts an I-frame exactly there), so cut detection runs
    * on RECONSTRUCTED frames and the detected cuts can be
    * cross-checked against the container's own keyframe index (spec).
    */
  private[graft] def encodeSceneAvi(docId: Long, w: Int, h: Int,
      nf: Int): Array[Byte] = {
    val fp = sceneFp(docId)
    val rasters = (0 until nf).map { f =>
      val a = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { a(y * w + x) = sceneExpected(docId, x, y, f); x += 1 }
        y += 1
      }
      a
    }
    Avi.mux(Gvc.encodeFramesAt(rasters, w, h, _ % fp == 0), w, h, fps = 5,
      codec = "GVC1", keyframes = Some(0 until nf map (_ % fp == 0)))
  }

  case class SceneCuts(doc_id: Long, n_frames: Long, n_cuts: Long,
      cut_pos_sum: Long, longest_shot: Long)

  /** Demux + stateful GVC decode, then the SAD walk over reconstructed
    * rasters: cut at frame f iff SAD(f−1, f) > bar·w·h; shots are the
    * segments between cuts ([0, c₁), …, [c_k, nf)). Partition-local.
    */
  def detectSceneCuts(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[SceneCuts] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (payloads, w, h, flags) = demuxChecked(r.media, r.doc_id)
        val frames = Gvc.decodeFrames(payloads, w, h)
        checkKeyFlags(r.doc_id, frames.map(_.isKey), flags)
        val rasters = frames.map(_.raster)
        var nCuts = 0L
        var cutPosSum = 0L
        var longest = 0L
        var shotStart = 0
        var f = 1
        while (f < rasters.length) {
          var sad = 0L
          val a = rasters(f - 1)
          val b = rasters(f)
          var i = 0
          while (i < a.length) { sad += math.abs(a(i) - b(i)); i += 1 }
          if (sad > SceneCutMeanSad * w * h) {
            nCuts += 1L
            cutPosSum += f.toLong
            longest = math.max(longest, (f - shotStart).toLong)
            shotStart = f
          }
          f += 1
        }
        longest = math.max(longest, (rasters.length - shotStart).toLong)
        SceneCuts(r.doc_id, rasters.length.toLong, nCuts, cutPosSum, longest)
      }
    }
  }

  /** ---- perceptual-hash image near-dup tier (r12) --------------------
    *
    * The IMAGE sibling of the text near-dup family (q46 MinHash, q47
    * SimHash): a multimodal training corpus is full of re-encoded,
    * re-brightened, lightly-edited copies of the same image, and
    * byte-level dedup (q42) sees none of them. dHash (difference hash —
    * the published average/difference perceptual-hash family): downscale
    * to a (W+1)×H grid of cell luma sums, emit one bit per horizontally
    * adjacent cell pair (left > right), Hamming distance ≈ visual
    * difference. Uniform brightness shifts cancel in the comparison —
    * the invariance that makes the hash PERCEPTUAL, pinned in the spec.
    *
    * Exactness: cells here are exact integer block sums (the fixture's
    * image dims are grid multiples, so no fractional resampling enters),
    * and comparing SUMS of equal-size blocks is comparing means — every
    * bit is integer-derived on both engines.
    *
    * Scale shape (100 TB): hashing is partition-local decode work (the
    * mapPartitions seam above); the near-dup join NEVER goes all-pairs —
    * the 64-bit hash splits into [[DhashBands]] 16-bit bands and
    * candidates come from the banded equi-join (one hash-keyed shuffle).
    * By pigeonhole this is EXACT-complete, not probabilistic: distance ≤
    * [[DhashMaxHamming]] < DhashBands flips can't touch all 4 bands, so
    * every qualifying pair shares at least one band verbatim (pinned
    * against brute force in the spec).
    */

  /** dHash grid geometry: 9×8 comparison grid of 4×4-pixel cells. */
  private[graft] val DhashGridW = 9
  private[graft] val DhashGridH = 8
  private[graft] val DhashCell = 4
  private[graft] val DhashImgW = DhashGridW * DhashCell // 36
  private[graft] val DhashImgH = DhashGridH * DhashCell // 32

  /** Fixture group count (near-dup cluster = doc_id mod this). */
  private[graft] val DhashGroups = 11L

  /** Near-dup threshold; with [[DhashBands]] > this, banding is exact. */
  private[graft] val DhashMaxHamming = 3L
  private[graft] val DhashBands = 4

  /** The group-signature bit behind the fixture's cell-level walk: a
    * Knuth-multiplicative scramble chosen (searched, not guessed) so
    * every pair of the 11 group signatures differs in ≥ 25 of 64 bits —
    * cross-group Hamming stays ≫ the threshold even after the ≤ 2
    * member flips below. Max operand ~1.2e3 · 2654435761 ≈ 3.2e12:
    * exact in BIGINT on both engines.
    */
  private[graft] def dhashGroupBit(gid: Long, gx: Int, gy: Int): Boolean =
    (gid * 13 + gx * 11 + gy * 5 + gx * gx * gy + gy * gy * gid) *
      2654435761L / 268435456L % 2 == 1

  /** Cell luma level: a ±12 walk across grid columns driven by the
    * group bits — every horizontal neighbor differs by exactly 12/px
    * (block-sum margin 192), so the ±1 per-pixel member noise (≤ ±16
    * per block) can never flip a bit, while the +30 column-8 boost
    * (+480) deterministically flips exactly the bits it targets.
    * Levels stay in [32, 224]; pixels in [31, 255] — clip-free.
    */
  private[graft] def dhashLevel(gid: Long, gx: Int, gy: Int): Int = {
    var lvl = 128
    var j = 0
    while (j < gx) {
      lvl += (if (dhashGroupBit(gid, j, gy)) -12 else 12)
      j += 1
    }
    lvl
  }

  /** The fixture pixel: group walk level + per-member sub-margin noise
    * (a distinct re-render per doc that must NOT move the hash) + the
    * member%3==1 column-8 boost (a visible edit that flips ≤ 2 bits —
    * the true NEAR-dup, nonzero distance, still under threshold).
    */
  private[graft] def dhashPixel(docId: Long, x: Int, y: Int): Int = {
    val gid = docId % DhashGroups
    val member = docId / DhashGroups
    val gx = x / DhashCell
    val gy = y / DhashCell
    val boost =
      if (gx == DhashGridW - 1 && member % 3 == 1 && (gy + gid) % 4 == 0) 30
      else 0
    dhashLevel(gid, gx, gy) +
      (((x.toLong * y + member) % 3) - 1).toInt + boost
  }

  /** Grayscale BMP fixture (r = g = b = pixel level, so the decoder's
    * integer luma (299r+587g+114b)/1000 returns the level exactly).
    */
  private[graft] def encodeBmpDhash(docId: Long): Array[Byte] = {
    val w = DhashImgW
    val h = DhashImgH
    val rowSize = (w * 3 + 3) / 4 * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // BMP stores rows bottom-up
      var x = 0
      while (x < w) {
        val v = dhashPixel(docId, x, y).toByte
        buf.put(v).put(v).put(v)
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fileRow += 1
    }
    buf.array()
  }

  /** Pack the 64 comparison bits (bit gy·8+gx set iff cell (gx,gy)
    * outweighs its right neighbor) — shared by the decode path and the
    * spec's formula-side third implementation.
    */
  private[graft] def dhash64(cellSums: Array[Array[Long]]): Long = {
    var h = 0L
    var gy = 0
    while (gy < DhashGridH) {
      var gx = 0
      while (gx < DhashGridW - 1) {
        if (cellSums(gy)(gx) > cellSums(gy)(gx + 1))
          h |= 1L << (gy * (DhashGridW - 1) + gx)
        gx += 1
      }
      gy += 1
    }
    h
  }

  case class ImageHash(doc_id: Long, dhash: Long)

  /** Downsample factor of the real-resize tier (q230). */
  private[graft] val ResizeFactor = 4

  case class ResizedImage(doc_id: Long, in_w: Long, in_h: Long,
      out_w: Long, out_h: Long, px_sum: Long)

  /** REAL image downsampling — the upgrade of q63's stub (which only
    * computes target DIMS): integer-factor AREA AVERAGING (OpenCV's
    * INTER_AREA for integer ratios — the published alias-free
    * downsample; each output pixel is the exact mean of its
    * [[ResizeFactor]]² source block, floor division documented). The
    * fixture dims are factor multiples, so no fractional-footprint
    * blending enters and every output pixel is integer-derived on both
    * engines. Partition-local decode like every tier here; wrong
    * geometry refuses.
    */
  def resizeImages(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[ResizedImage] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media))
        require(img != null, s"undecodable media for doc ${r.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        require(w % ResizeFactor == 0 && h % ResizeFactor == 0,
          s"doc ${r.doc_id}: ${w}x$h is not a multiple of $ResizeFactor — " +
            "integer-area downsampling needs whole blocks")
        val ow = w / ResizeFactor
        val oh = h / ResizeFactor
        val sums = Array.ofDim[Long](oh, ow)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = (299L * ((rgb >> 16) & 0xff) +
              587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)) / 1000L
            sums(y / ResizeFactor)(x / ResizeFactor) += luma
            x += 1
          }
          y += 1
        }
        var px = 0L
        val area = ResizeFactor.toLong * ResizeFactor
        var gy = 0
        while (gy < oh) {
          var gx = 0
          while (gx < ow) { px += sums(gy)(gx) / area; gx += 1 }
          gy += 1
        }
        ResizedImage(r.doc_id, w.toLong, h.toLong, ow.toLong, oh.toLong, px)
      }
    }
  }

  /** Real-codec perceptual hashing: ImageIO decode (partition-local),
    * exact integer luma block sums, [[dhash64]]. Wrong-geometry or
    * undecodable payloads raise (the q152 raise-don't-drift stance).
    */
  def perceptualHashes(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(r => ImageHash(r.doc_id, dhashOfMedia(r.doc_id, r.media)))
    }
  }

  /** One image's dHash through the real codec — the per-row core of
    * [[perceptualHashes]], shared by the streaming near-dup gate so the
    * door and the daily batch pass cannot hash differently.
    */
  private[graft] def dhashOfMedia(docId: Long, media: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(media))
    require(img != null, s"undecodable media for doc $docId")
    require(img.getWidth == DhashImgW && img.getHeight == DhashImgH,
      s"doc $docId: dHash fixture must be ${DhashImgW}x$DhashImgH, " +
        s"got ${img.getWidth}x${img.getHeight}")
    val sums = Array.ofDim[Long](DhashGridH, DhashGridW)
    var y = 0
    while (y < DhashImgH) {
      var x = 0
      while (x < DhashImgW) {
        val rgb = img.getRGB(x, y)
        val luma = (299L * ((rgb >> 16) & 0xff) +
          587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)) / 1000L
        sums(y / DhashCell)(x / DhashCell) += luma
        x += 1
      }
      y += 1
    }
    dhash64(sums)
  }

  /** The banded near-dup join over (doc_id, dhash): explode into
    * [[DhashBands]] 16-bit bands, equi-join on (band, value), exact
    * Hamming verify on the survivors. Complete for distance ≤
    * [[DhashMaxHamming]] by pigeonhole.
    *
    * r17 (guide §2.3/§2.4 — shuffle fewer bytes, remove the dedup
    * shuffle): the banded join runs over DISTINCT SIGNATURES, not docs.
    * The doc-level form generated every qualifying pair once per shared
    * band (≤ [[DhashBands]]×) and paid a full `distinct()` over that
    * stream — on a corpus of hash-identical re-render clusters (this
    * tier's whole point) the candidate stream is bands × Σ|cluster|²
    * rows. Signature-level banding carries the pigeonhole argument
    * unchanged (hamming ≤ 3 < 4 bands ⇒ some band is shared verbatim),
    * and the doc pairs are then EXPANDED from the verified signature
    * pairs: same-signature pairs are the per-signature member self-join
    * (hamming 0 by definition), cross-signature pairs the member
    * cross-product of each verified (sa < sb) pair — each unordered doc
    * pair materializes exactly ONCE, so no distinct() is ever paid.
    * Output set, columns, and types are IDENTICAL to the doc-level form
    * (pairs (a < b) with hamming(h(a), h(b)) ≤ threshold; oracle
    * hash-pinned at both SFs, brute-force-pinned in the spec).
    */
  def dhashNearDupPairs(hashes: DataFrame): DataFrame = {
    val members = hashes.select(col("doc_id"), col("dhash"))
    val sigs = members.select(col("dhash")).distinct()
    val sigBands = sigs.select(col("dhash"),
      explode(array((0 until DhashBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xFFFFL))
            .as("bv"))): _*)).as("g"))
      .select(col("dhash"), col("g.band"), col("g.bv"))
    val sa = sigBands.select(col("dhash").as("sa"), col("band"), col("bv"))
    val sb = sigBands.select(col("dhash").as("sb"), col("band"), col("bv"))
    // verified signature pairs, canonical order sa < sb; distinct() here
    // runs over signature pairs (≪ doc pairs), deduping the ≤4-band fanout
    val sigPairs = sa.join(sb, Seq("band", "bv"))
      .filter(col("sa") < col("sb"))
      .select(col("sa"), col("sb"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= DhashMaxHamming)
    val samePairs = members.select(col("dhash"), col("doc_id").as("doc_a"))
      .join(members.select(col("dhash"), col("doc_id").as("doc_b")), "dhash")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(0L).as("hamming"))
    val crossPairs = sigPairs
      .join(members.select(col("dhash").as("sa"), col("doc_id").as("ida")), "sa")
      .join(members.select(col("dhash").as("sb"), col("doc_id").as("idb")), "sb")
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("hamming"))
    samePairs.unionByName(crossPairs).orderBy("doc_a", "doc_b")
  }

  /** Bounded-edge cluster collapse over (doc_id, dhash) — the scale form
    * of q233's pairs→components composition, via DISTINCT-SIGNATURE
    * SPARSIFICATION:
    *
    *  1. collapse hash-identical docs onto a signature head (min doc_id
    *     per distinct dhash): one groupBy, and one (head, member) edge
    *     per doc — O(n) edges at Hamming distance 0, no verify needed;
    *  2. run the SAME banded Hamming join as q216 ([[dhashNearDupPairs]])
    *     over the DISTINCT-hash table only — candidate fan-out is
    *     governed by distinct signatures per band bucket, not docs;
    *  3. feed (member edges) ∪ (verified head pairs) to the shared q76
    *     star contraction.
    *
    * THEOREM (components preserved exactly): for any true pair (a, b)
    * with hamming ≤ 3, hamming(head(a), head(b)) = hamming(a, b) because
    * hash-identical docs share a signature — so a — head(a) — head(b) — b
    * is a path in the sparsified graph; conversely every sparsified edge
    * is a true ≤3 pair (member edges are distance 0, head pairs are
    * verified). Components therefore EQUAL q233's, pinned in OperatorSpec.
    *
    * Why not the tempting per-band bucket-head star (edge member →
    * bucket-min, Hamming-verified)? It is NOT connectivity-preserving:
    * two members of a bucket can each sit > 3 bits from the bucket head
    * yet ≤ 3 bits from each other (band equality pins 16 bits, the other
    * 48 are free), so verifying only member↔head edges drops true pairs.
    * Distinct-signature sparsification needs no such compromise: the
    * quadratic content of a hot cluster (logo / template re-renders) is
    * hash-identical mass, which step 1 removes; the residual banded join
    * runs over signatures, the same linear-in-candidates shape q216
    * itself has. On the planted fixture the 10x blow-up multiplies docs
    * per group but NOT distinct signatures, so the edge list stays
    * linear where q233's pair stream densified quadratically (the
    * measured contraction OOM this operator retires).
    */
  def dhashClusterCollapseSparse(hashes: DataFrame): DataFrame =
    Dedup.connectedComponents(sparseClusterEdges(hashes))

  /** The sparsified edge list [[dhashClusterCollapseSparse]] contracts:
    * (signature-head, member) distance-0 edges plus the banded verified
    * join over DISTINCT signatures. Factored out so PlanSpec can pin the
    * structural contract — both sides of the banded join sit ABOVE the
    * distinct-signature aggregate, never the doc-level hash table —
    * before the contraction's localCheckpoints truncate the lineage.
    */
  def sparseClusterEdges(hashes: DataFrame): DataFrame = {
    val heads = hashes.groupBy(col("dhash"))
      .agg(min(col("doc_id")).as("head_id"))
    val memberEdges = hashes.join(heads, Seq("dhash"))
      .filter(col("doc_id") =!= col("head_id"))
      .select(col("head_id").as("a_id"), col("doc_id").as("b_id"))
    // r17: heads are ALREADY one doc per distinct signature, so the
    // public [[dhashNearDupPairs]]'s signature-level rewrite would only
    // re-distinct a distinct set and pay three mapping joins to expand
    // signature pairs back to the very same rows. Band the heads
    // DIRECTLY (doc ids carried through the band join — the pre-r17
    // body): identical output on distinct-signature input, three fewer
    // joins (A/B at sf0.1: q246 6.3s -> 2.7s). Both band-join sides
    // still sit above the groupBy(dhash) aggregate (PlanSpec contract).
    val headBands = heads.select(col("head_id"), col("dhash"),
      explode(array((0 until DhashBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xFFFFL))
            .as("bv"))): _*)).as("g"))
      .select(col("head_id"), col("dhash"), col("g.band"), col("g.bv"))
    val ha = headBands.select(col("head_id").as("a_id"),
      col("dhash").as("ha"), col("band"), col("bv"))
    val hb = headBands.select(col("head_id").as("b_id"),
      col("dhash").as("hb"), col("band"), col("bv"))
    val headPairs = ha.join(hb, Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= DhashMaxHamming)
      .select(col("a_id"), col("b_id"))
    memberEdges.unionAll(headPairs)
  }

  /** ---- ranged wire fetch tier (r10) --------------------------------
    *
    * q55 derefs synthetic pointers; this tier fetches REAL bytes over
    * HTTP with `Range` headers through the pooled retry/backoff client
    * the document store uses ([[graft.streaming.HttpBlobFetcher]]) —
    * the packed-blob layout (WARC/shard files addressed by (path,
    * offset, length)) every 100 TB crawl corpus stores media in, where
    * whole-object GETs would multiply egress by the pack factor.
    */

  /** A packed-blob manifest row: (path, offset, length) into a blob. */
  case class RangedPointer(doc_id: Long, path: String, offset: Long, length: Long)

  /** Ranged-fetch result: exactly the requested slice, digested. */
  case class RangedBlob(doc_id: Long, n_bytes: Long, blob_md5: String)

  /** Ranged deref stage: one pooled HTTP client per executor (the
    * fetcher serializes as config only), one MD5 instance per
    * partition; fetch parallelism == partition count, no shuffle.
    */
  def derefRanged(spark: SparkSession,
      manifest: Dataset[RangedPointer],
      fetcher: graft.streaming.HttpBlobFetcher): Dataset[RangedBlob] = {
    import spark.implicits._
    manifest.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { p =>
        val bytes = fetcher.fetchRange(p.path, p.offset, p.length)
        md.reset()
        RangedBlob(p.doc_id, bytes.length.toLong,
          md.digest(bytes).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Deterministic packed-blob payload for the in-process blob store:
    * `doc/{id}.bin` is the decimal id + ';' repeated, truncated to
    * 128 + id % 128 bytes — ASCII, so the DuckDB oracle rebuilds the
    * identical bytes with repeat/substring and md5s them.
    */
  private val BlobName = "doc/(\\d+)\\.bin".r
  private[graft] def blobPayload(name: String): Option[Array[Byte]] =
    name match {
      case BlobName(idStr) =>
        val id = idStr.toLong
        val len = (128 + id % 128).toInt
        val unit = s"$id;"
        val sb = new StringBuilder
        while (sb.length < len) sb.append(unit)
        Some(sb.substring(0, len).getBytes("UTF-8"))
      case _ => None
    }

  /** Session-lifetime in-process blob endpoint (the S3 test double the
    * sandbox substitutes for real object storage). Lazily started on
    * first use; lives until JVM exit — the NearDupCache stance: session
    * state, not a leak.
    */
  private[graft] lazy val blobServer: graft.streaming.BlobApiStub =
    new graft.streaming.BlobApiStub(blobPayload)

  def queries: Map[String, Q] = Map(
    // q162 [north star, r10]: real COMPRESSED-codec decode — q152's
    // encode→ImageIO round trip through the JDK PNG pipeline (zlib
    // inflate + CRC), with swapped dimension formulas so the two codec
    // queries cannot mask each other. Oracle: same pure-integer
    // arithmetic (PNG is lossless).
    "q162_png_decode" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodePng(id, (1 + nc % 48).toInt, (1 + id % 64).toInt))
        }
      decodeImages(spark, media).toDF().orderBy("doc_id")
    }),

    // q216 [north star, r12]: perceptual-hash IMAGE near-dup — dHash
    // over real BMP decode, then the banded Hamming join (exact-complete
    // by pigeonhole for distance ≤ 3 with 4 bands). The fixture plants
    // 11 near-dup groups: same-group docs are distinct re-renders
    // (sub-margin pixel noise — hash-identical) or visible edits (the
    // column-8 boost — ≤ 2 flipped bits), cross-group signatures differ
    // in ≥ 25 bits. Oracle: the same integer cell sums, bits, and
    // all-pairs Hamming, straight from the pixel formula in SQL.
    "q216_image_neardup" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"))).as[Long]
        .map(id => MediaRow(id, encodeBmpDhash(id)))
      dhashNearDupPairs(perceptualHashes(spark, media).toDF())
    }),

    // q165 [north star, r10]: real TEMPORAL-codec frame demux — q56's
    // frame-sampling shape against the JDK's actual GIF codec: animated
    // GIFs (2-5 frames, LZW-compressed gray frames) encoded in-engine,
    // then the READER demuxes the container (getNumImages) and decodes
    // every frame; output = codec-reported frame inventory + exact
    // pixel sum, oracle pure integer arithmetic (gray palette ⇒
    // lossless). This narrows the video caveat to: true interframe
    // codecs (H.264 etc.) still need ffmpeg/JavaCV wired into this
    // exact mapPartitions seam.
    // q169 [north star, r10; r11 UTF-8]: WARC crawl ingest — the format
    // a 100 TB web corpus actually arrives in (CommonCrawl ships WARC).
    // Docs are packed ~30/file into spec-shaped WARC files (warcinfo +
    // response records, HTTP/1.1 payloads, CRLF discipline), then each
    // file is byte-level stream-parsed (Content-Length-driven, never
    // regex over the file), the HTTP message validated (status +
    // Content-Length cross-check), and <main> content extracted with
    // boilerplate (nav/footer/head) dropped. Parallelism unit = the
    // FILE, the real CommonCrawl processing model; the pack stage here
    // is test scaffolding (production reads existing WARCs off the
    // store). r11: the whole format runs on OCTETS (the WARC/HTTP spec
    // unit) and every document carries a non-ASCII probe suffix
    // (em-dash, Latin-1, CJK, a dingbat — multi-byte UTF-8 of 2/3
    // widths), so the hash match proves REAL-crawl text round-trips:
    // octet_length on both engines where lengths are bytes, code-point
    // length where they are characters, md5 over the UTF-8 bytes.
    "q169_warc_extract" -> ((spark, dir) => {
      import spark.implicits._
      val files = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(Warc.NonAsciiProbe)).as("text"))
        .filter(col("text").isNotNull)
        .withColumn("shard", pmod(col("doc_id"), lit(16)))
        // iterator-to-iterator pack (r12, the q174 discipline): shuffle
        // clusters + orders (spillable external sort); the task streams
        // contiguous equal-shard runs into the record writer with no
        // whole-shard buffering
        .repartition(16, col("shard"))
        .sortWithinPartitions(col("shard"), col("doc_id"))
        .as[(Long, String, Long)]
        .mapPartitions { it =>
          val buf = it.buffered
          new Iterator[Array[Byte]] {
            def hasNext: Boolean = buf.hasNext
            def next(): Array[Byte] = {
              val shard = buf.head._3
              val run = new Iterator[(Long, String, Seq[(String, String)])] {
                def hasNext: Boolean = buf.hasNext && buf.head._3 == shard
                def next(): (Long, String, Seq[(String, String)]) = {
                  val t = buf.next(); (t._1, t._2, Nil)
                }
              }
              Warc.buildTagged(run)
            }
          }
        }
      files.mapPartitions { it =>
        // one digest instance per partition (provider lookup per record
        // was hot-loop waste — the derefRanged reset() pattern)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { bytes =>
          Warc.responses(bytes).map { e =>
            md.reset()
            val md5 = md.digest(e.text.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            (e.docId, e.contentLength, Warc.octets(e.html).toLong,
              e.text.codePointCount(0, e.text.length).toLong, md5)
          }
        }
      }.toDF("doc_id", "content_length", "html_octets", "n_extracted_chars",
        "text_md5")
        .orderBy("doc_id")
    }),

    // q217 [north star, r12]: densitometric BOILERPLATE REMOVAL — the
    // extraction stage between fetch and text processing the crawl tier
    // lacked (q169's <main>-scoped extractor is the structured
    // shortcut; real pages have no <main> contract). Boilerpipe-style
    // shallow features (Kohlschütter WSDM'10): block-split at
    // block-level tags, keep blocks with ≥ 10 words and link density
    // ≤ 1/3 (exact rational), drop nav/chrome/rails/footers. The page
    // fixture plants classifiable chrome around probe-suffixed
    // paragraph content; the corpus pass is map-only through the
    // BoilerplateExtract codegen expression.
    "q217_boilerplate_extract" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
      val pages = graft.Tables.spread(Tables(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          concat(col("text"), lit(Warc.NonAsciiProbe)).as("text")))
        .as[(Long, String)]
        .map { case (id, t) => (id, Warc.richPageFor(id, t)) }
        .toDF("doc_id", "html")
      boilerplateProjected(pages).orderBy("doc_id")
    }),

    // q218 [north star, r12]: SCENE-CUT detection — temporal
    // segmentation between decode and frame sampling (q56/q150 sample
    // blindly; a pipeline samples per SHOT). Adjacent-frame SAD over
    // frames reconstructed by the real interframe codec, cut where the
    // mean per-pixel difference clears the bar. Fixture margins are
    // analytic: within-scene ≤ 32/px < 40 < 57/px ≤ cross-scene.
    "q218_scene_cuts" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeSceneAvi(id, (16 + nc % 16).toInt,
            (8 + (id % 3) * 4).toInt, sceneCount(id) * sceneFp(id)))
        }
      detectSceneCuts(spark, media).toDF().orderBy("doc_id")
    }),

    // q230 [north star, r12]: REAL image resize — integer-factor area
    // averaging through the actual codec, upgrading q63's stub (which
    // computes target dims over a decode fake). Runs on the q216
    // fixture (dims are factor multiples by construction) so the
    // oracle reuses the same pixel arithmetic: output pixel =
    // block_sum // 16.
    "q230_image_resize" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"))).as[Long]
        .map(id => MediaRow(id, encodeBmpDhash(id)))
      resizeImages(spark, media).toDF().orderBy("doc_id")
    }),

    // q233 [north star, r12]: image CLUSTER COLLAPSE — the composition
    // the q216/q219 BASELINE notes promise: at real-corpus scale you
    // never materialize every intra-cluster pair downstream; the pair
    // stream feeds the q76 star contraction (O(log n) rounds, shared
    // code) and each image resolves to its cluster representative
    // (min doc_id). Every doc is reported (pairless docs keep their
    // own id — the singleton passthrough). On the planted fixture each
    // group is a full clique, so cluster_id closes to doc_id % 11
    // (pinned); the oracle runs the honest reachability closure.
    "q233_image_cluster_collapse" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"))).as[Long]
        .map(id => MediaRow(id, encodeBmpDhash(id)))
      val pairs = dhashNearDupPairs(perceptualHashes(spark, media).toDF())
        .select(col("doc_a").as("a_id"), col("doc_b").as("b_id"))
      val comps = Dedup.connectedComponents(pairs)
      Tables(spark, dir, "documents").select(col("doc_id"))
        .join(comps.withColumnRenamed("component_id", "cid"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cid"), col("doc_id")).as("cluster_id"),
          col("cid").isNotNull.as("in_cluster"))
        .orderBy("doc_id")
    }),

    // q235 [north star, r13]: BOUNDED-EDGE image cluster collapse — the
    // scale tier of q233 (the r12 verdict's one perf-weak mark): instead
    // of materializing every verified intra-cluster pair, collapse
    // hash-identical docs onto signature heads (O(n) distance-0 edges),
    // run the banded verified join over DISTINCT signatures only, and
    // contract the sparsified graph. Components provably equal q233's
    // (see [[dhashClusterCollapseSparse]]); the oracle is q233's
    // reachability closure VERBATIM, and OperatorSpec pins q235 == q233
    // row-for-row plus the edge-list linearity that restores the 10x
    // ScalingBench row q233 had to exclude.
    "q235_image_cluster_sparse" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"))).as[Long]
        .map(id => MediaRow(id, encodeBmpDhash(id)))
      val comps = dhashClusterCollapseSparse(
        perceptualHashes(spark, media).toDF())
      Tables(spark, dir, "documents").select(col("doc_id"))
        .join(comps.withColumnRenamed("component_id", "cid"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cid"), col("doc_id")).as("cluster_id"),
          col("cid").isNotNull.as("in_cluster"))
        .orderBy("doc_id")
    }),

    // q219 [north star, r12]: AUDIO fingerprint near-dup — the
    // Haitsma–Kalker sign-of-delta fingerprint over time-domain frame
    // energies, through the real WAV codec, then the SAME banded
    // Hamming join as q216. Re-leveled copies hash identically (energy
    // scaling cancels in the sign); fade-out edits flip exactly one
    // bit; cross-group envelopes differ in ≥ 9 bits.
    "q219_audio_neardup" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"))).as[Long]
        .map(id => MediaRow(id, encodeWavAfp(id)))
      dhashNearDupPairs(audioFingerprints(spark, media))
    }),

    // q246 [north star, r14]: AUDIO cluster collapse — retires the r13
    // verdict's one perf-weak mark (q219's pair-list output is quadratic
    // in cluster size: a hot ring/jingle's re-encodes all land in one
    // group and pairs grow as members²). The audio fingerprint is the
    // same 64-bit signature shape as the image dHash, so q235's
    // DISTINCT-SIGNATURE sparsification applies verbatim: re-leveled
    // copies are hash-IDENTICAL (the scaling-cancels invariance) and
    // collapse onto signature heads as O(n) distance-0 edges; the banded
    // verified join runs over distinct signatures only (2 per planted
    // group — constant under the 10x blow-up that made q219's pair list
    // read 13x); the shared q76 star contraction closes components. The
    // components provably equal the q219-pair-derived ones (the
    // [[dhashClusterCollapseSparse]] theorem — identical signatures share
    // heads, head pairs are verified), pinned in OperatorSpec; the
    // oracle is q219's energy closed form + the honest reachability
    // closure (the q233/q235 oracle discipline), with every doc reported
    // (singleton passthrough).
    "q246_audio_cluster_collapse" -> ((spark, dir) => {
      import spark.implicits._
      // r17: NO spread — the fingerprint pass is cheap relative to the
      // contraction downstream, and the exchange regressed the query
      // (A/B: 2.66s fused vs 6.27s spread at sf0.1).
      val media = Tables(spark, dir, "documents")
        .select(col("doc_id")).as[Long]
        .map(id => MediaRow(id, encodeWavAfp(id)))
      val comps = dhashClusterCollapseSparse(
        audioFingerprints(spark, media))
      Tables(spark, dir, "documents").select(col("doc_id"))
        .join(comps.withColumnRenamed("component_id", "cid"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cid"), col("doc_id")).as("cluster_id"),
          col("cid").isNotNull.as("in_cluster"))
        .orderBy("doc_id")
    }),

    // q220 [north star, r12]: WEBDATASET tar shards — THE multimodal
    // training-shard container (a .tar per shard, one sample = members
    // sharing a basename, read SEQUENTIALLY — no per-file seeks). Pack
    // with the q169 iterator-to-iterator discipline (shard-keyed
    // shuffle + external sort, no whole-shard buffering), parse back
    // through the checksum-verifying USTAR reader, and report per
    // sample: the .txt member's byte offset in its shard (what a
    // resume index needs), payload octets, the header's OWN integrity
    // checksum (byte-level format proof, closed-form in the oracle),
    // and the round-tripped text md5.
    "q220_webdataset_tar" -> ((spark, dir) => {
      import spark.implicits._
      val shards = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(Warc.NonAsciiProbe)).as("text"))
        .filter(col("text").isNotNull)
        .withColumn("shard", pmod(col("doc_id"), lit(16)))
        .repartition(16, col("shard"))
        .sortWithinPartitions(col("shard"), col("doc_id"))
        .as[(Long, String, Long)]
        .mapPartitions { it =>
          val buf = it.buffered
          new Iterator[(Long, Array[Byte])] {
            def hasNext: Boolean = buf.hasNext
            def next(): (Long, Array[Byte]) = {
              val shard = buf.head._3
              val members = new Iterator[(String, Array[Byte])] {
                private var pending: List[(String, Array[Byte])] = Nil
                def hasNext: Boolean =
                  pending.nonEmpty || (buf.hasNext && buf.head._3 == shard)
                def next(): (String, Array[Byte]) = pending match {
                  case hd :: tl => pending = tl; hd
                  case Nil =>
                    val t = buf.next()
                    val ms = Tar.sampleMembers(t._1, t._2)
                    pending = ms.tail.toList
                    ms.head
                }
              }
              (shard, Tar.write(members))
            }
          }
        }
      shards.flatMap { case (shard, bytes) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        Tar.read(bytes).grouped(2).map { pair =>
          val Seq(txt, js) = pair
          require(txt.name.endsWith(".txt") && js.name.endsWith(".json"),
            s"sample member order drifted: ${txt.name}, ${js.name}")
          val id = txt.name.stripSuffix(".txt").toLong
          require(js.name.stripSuffix(".json").toLong == id,
            s"sample split across basenames: ${txt.name} vs ${js.name}")
          md.reset()
          val m = md.digest(txt.payload).map("%02x".format(_)).mkString
          (id, shard, txt.offset, txt.payload.length.toLong,
            js.payload.length.toLong, txt.headerChecksum, m)
        }
      }.toDF("doc_id", "shard", "txt_offset", "txt_octets", "json_octets",
        "txt_hdr_chksum", "text_md5")
        .orderBy("doc_id")
    }),

    // q168 [north star, r10]: Motion-JPEG VIDEO — a published container
    // (RIFF/AVI, muxed in-engine to spec: hdrl/strl headers, movi frame
    // chunks, idx1 index) demuxed by a generic RIFF walker, each frame
    // decoded by the JDK's real LOSSY JPEG codec. Inventory columns are
    // exact; fidelity is the self-validating within_tol verdict (mean
    // abs err ≤ 4 gray levels vs the triangle-wave source). With
    // q152/q162/q164/q165 the remaining video caveat is interframe
    // PREDICTION (H.264 etc.) — a codec the JDK does not ship; the
    // mapPartitions seam is where ffmpeg/JavaCV plugs in.
    "q168_mjpeg_video" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeMjpegAvi(id, (16 + nc % 17).toInt,
            (16 + id % 13).toInt, (2 + id % 3).toInt))
        }
      decodeMjpegVideos(spark, media).toDF().orderBy("doc_id")
    }),

    // q176 [north star, r11]: interframe-PREDICTION video — the one
    // codec capability q168 left stubbed. Per-doc 'GVC1' AVI streams
    // (intra keyframe + P-frames carrying ±residuals vs the previous
    // RECONSTRUCTED frame) are muxed with a spec-honest idx1 keyframe
    // index, then decoded by threading reconstruction state across the
    // stream — the stateful loop every H.264-class decoder runs, with
    // the container index cross-checked against the stream's own
    // intra/predicted magic. Residuals are unquantized, so the oracle
    // recomputes the reconstructed pixel sum AND the stored residual
    // magnitude sum as pure integer arithmetic — exact, not a
    // tolerance verdict. H.264 proper = this decoder loop + quantized
    // transforms + motion search; ffmpeg/JavaCV swaps in at this exact
    // mapPartitions seam.
    "q176_pframe_video" -> ((spark, dir) => {
      import spark.implicits._
      // r17: NO spread — the delta-only P-frame codec is cheap enough
      // that the exchange is a net loss (A/B: 0.35s vs 0.37s at sf0.1).
      val media = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeGvcAvi(id, (16 + nc % 16).toInt,
            (12 + id % 11).toInt, (3 + id % 3).toInt))
        }
      decodeGvcVideos(spark, media).toDF().orderBy("doc_id")
    }),

    // q196 [north star, r12]: the FULL P-frame pipeline — motion +
    // closed-loop quantization + entropy coding COMPOSED, which is
    // what a real codec's P-frame actually is (q187 quantizes with a
    // zero motion field; q191 moves losslessly). The composition's
    // subtlety: the search runs against the decoder's QUANTIZED
    // reconstruction and residuals are taken against the SHIFTED
    // reconstruction — closed loop end to end, so error stays ≤
    // QStep/2 with zero drift even while the content scrolls. Exact
    // oracle via the world-coordinate identity: aligned motion
    // compensation makes the closed-loop recurrence per-WORLD-point —
    // q187's unrolled replay with q191's content formula — so px_sum /
    // err_abs_sum / max_abs_err / qresid_abs_sum all hash exactly AND
    // pin every frame's search (a wrong vector breaks the alignment
    // and every column diverges). Rate stays the engine-measured
    // verdict. H.264 = this with DCT blocks, CABAC, sub-pel.
    "q196_full_pframe_video" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeGvvAvi(id, (16 + nc % 16).toInt,
            (12 + id % 11).toInt, (3 + id % 3).toInt))
        }
      decodeFullVideos(spark, media).toDF().orderBy("doc_id")
    }),

    // q194 [north star, r12]: PER-BLOCK motion compensation — the
    // macroblock machinery: two bands of the frame scroll at DIFFERENT
    // velocities, so no frame-wide vector can compensate both; the
    // encoder searches a vector per 4-row block and transmits all of
    // them. Same lossless-residual oracle identity as q191, now pinning
    // EVERY block's search at once: any block whose search missed its
    // band's true velocity would inflate resid_abs_sum above the
    // formula value (per-block residuals at the band-true displacement
    // are exactly the temporal difference). OperatorSpec additionally
    // pins each block's decoded vector against its band's velocity.
    "q194_block_motion_video" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeGvbAvi(id, (16 + nc % 16).toInt,
            (4 * (3 + id % 6)).toInt, (3 + id % 3).toInt))
        }
      decodeBlockVideos(spark, media).toDF().orderBy("doc_id")
    }),

    // q191 [north star, r12]: MOTION-COMPENSATED video — the encoder-
    // side machinery q176/q187 left out (their motion field is zero):
    // per P-frame an exhaustive SAD search over the ±3 window finds the
    // displacement of the previous reconstruction that minimizes the
    // residual; the stream carries (mv, residual-vs-shifted-prediction).
    // The fixture is a scrolling aperiodic texture, so the oracle can
    // pin the SEARCH itself: residuals at the texture-aligned
    // displacement are exactly the temporal term's difference (formula-
    // computable), the encoder MINIMIZES the residual sum, and
    // reconstruction is exact for any vector — so resid_abs_sum hashes
    // iff the search found a displacement at least as good as the true
    // one. OperatorSpec additionally pins the decoded vectors against
    // the true per-frame shifts. H.264 = this loop per macroblock with
    // sub-pel refinement + rate-distortion weighting; same seam.
    "q191_motion_video" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeGvmAvi(id, (16 + nc % 16).toInt,
            (12 + id % 11).toInt, (3 + id % 3).toInt))
        }
      decodeMotionVideos(spark, media).toDF().orderBy("doc_id")
    }),

    // q187 [north star, r12]: QUANTIZED-residual video — the
    // rate-distortion step q176 deliberately left out, completing the
    // honest temporal-codec story: P-frame residuals are uniformly
    // quantized with CLOSED-LOOP prediction (encoder predicts against
    // the decoder's own reconstruction, so error stays ≤ QStep/2 per
    // pixel at every frame — no drift down the chain) and entropy-coded
    // with a real canonical-Huffman coder (losslessly inverted by the
    // decoder, loudly). Distortion columns are EXACT: the quantizer is
    // integer floor-division arithmetic, so the oracle replays the whole
    // closed-loop recurrence (unrolled per frame) and recomputes px_sum
    // / err_abs_sum / max_abs_err / qresid_abs_sum to the bit. Rate is
    // the one engine-measured column: coded_lt_raw pins entropy-coded
    // P-frame bytes strictly below raw (q168's self-validating
    // discipline). H.264 = this loop with quantized DCT blocks + CABAC;
    // same mapPartitions seam, same container.
    "q187_quantized_video" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeGvqAvi(id, (16 + nc % 16).toInt,
            (12 + id % 11).toInt, (3 + id % 3).toInt))
        }
      decodeQuantVideos(spark, media).toDF().orderBy("doc_id")
    }),

    "q165_gif_frames" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeGif(id, (8 + nc % 16).toInt, (6 + id % 10).toInt,
            (2 + id % 4).toInt))
        }
      decodeGifFrames(spark, media).toDF().orderBy("doc_id")
    }),

    // q164 [north star, r10]: real AUDIO-codec decode — per-document
    // PCM WAVs (sample count from n_chars, values integer-deterministic)
    // encoded in-engine and decoded by the JDK's actual WAV codec
    // (javax.sound.sampled RIFF parser), partition-locally; output is
    // the codec-REPORTED format plus exact sample count/sum, all BIGINT.
    // With q152/q162 this leaves only video decode stubbed (no JDK
    // video codec exists; the deployment note stands).
    "q164_wav_decode" -> ((spark, dir) => {
      import spark.implicits._
      // r17: NO spread here — WAV encode/decode is header arithmetic +
      // an array copy, far too cheap to amortize the exchange (A/B:
      // 0.49s fused vs 1.16s spread at sf0.1).
      val media = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeWav(id, (64 + nc % 512).toInt))
        }
      decodeAudio(spark, media).toDF().orderBy("doc_id")
    }),

    // q163 [REF app.py:43-46, r10]: RANGED blob fetch over the wire —
    // the manifest addresses (path, offset, length) slices of packed
    // blobs; bytes are served by the in-process Range-capable endpoint
    // and fetched partition-locally through the pooled retry/backoff
    // client. The oracle reconstructs each slice arithmetically
    // (ASCII payloads) and md5s it, so green proves the Range
    // plumbing end-to-end, not just the stub hash of q55.
    "q163_ranged_blob_fetch" -> ((spark, dir) => {
      import spark.implicits._
      val fetcher = new graft.streaming.HttpBlobFetcher(blobServer.baseUrl)
      // the production shape fetches the NEW BATCH's blobs (q103's
      // split discipline, ~20% here), not the whole corpus per run —
      // and a wire-bound stage's throughput IS its partition count: the
      // manifest arrives in scan-sized partitions (ONE at small SF ⇒
      // thousands of sequential round trips), so spread it to the
      // session's full parallelism before fetching. The shuffle moves
      // only the thin pointer rows, never blob bytes.
      val manifest = Tables(spark, dir, "documents")
        .filter(substring(md5(concat(lit("fetch:"),
          col("doc_id").cast("string"))), 1, 2) >= "cd")
        .select(col("doc_id"),
          concat(lit("/blobs/doc/"), col("doc_id").cast("string"),
            lit(".bin")).as("path"),
          (col("doc_id") % 32).as("offset"),
          (lit(16L) + col("doc_id") % 64).as("length"))
        .repartition(spark.sparkContext.defaultParallelism)
        .as[RangedPointer]
      derefRanged(spark, manifest, fetcher).toDF().orderBy("doc_id")
    }),
    // q54 [north star]: binary media column + stubbed decode/feature stage.
    "q54_multimodal_stub" -> ((spark, dir) => {
      import spark.implicits._
      val media = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[MediaRow]
      extractFeatures(spark, media).toDF().orderBy("doc_id")
    }),

    // q55 [REF app.py:43-46]: manifest of blob pointers → partition-local
    // deref. The manifest derives from documents so the oracle is exact.
    "q55_sidechannel_deref" -> ((spark, dir) => {
      import spark.implicits._
      val manifest = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          concat(lit("s3://media-bucket/doc/"), col("doc_id").cast("string"),
            lit(".bin")).as("url"))
        .as[ManifestRow]
      derefPointers(spark, manifest).toDF().orderBy("doc_id")
    }),

    // q63 [north star]: aspect-preserving resize metadata (codec stubbed).
    "q63_resize" -> ((spark, dir) => {
      import spark.implicits._
      val media = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[MediaRow]
      resize(spark, media).toDF().orderBy("doc_id")
    }),

    // q56 [north star]: frame sampling over the binary media column.
    "q56_frame_sample" -> ((spark, dir) => {
      import spark.implicits._
      val media = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[MediaRow]
      sampleFrames(spark, media).toDF().orderBy("doc_id", "frame_idx")
    }),

    // q150 [north star, r8]: cross-document FRAME dedup — q56's sampled
    // frames pushed through q42's exact-dedup discipline: the canonical
    // copy of each distinct frame is its lowest (doc_id, frame_idx)
    // occurrence, and each document reports how many of its frames it
    // owns vs borrows. This is the video-pipeline primitive that finds
    // repeated intros/logos/slates across a corpus before training.
    // Scale: the only shuffle keys on the 32-hex frame digest (never
    // frame bytes); frame_idx < MaxFrames is ENFORCED by the sampler's
    // take(MaxFrames) cap, so the canonical pick is an exact BIGINT min
    // over the bijective doc_id·MaxFrames + frame_idx — a
    // partial-aggregating min, no window. The rollup partial-aggregates
    // to |docs| rows.
    "q150_frame_dedup" -> ((spark, dir) => {
      import spark.implicits._
      val media = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[MediaRow]
      val frames = sampleFrames(spark, media).toDF()
        .select(col("doc_id"), col("frame_idx"), col("frame_md5"))
        .withColumn("fkey", col("doc_id") * MaxFrames.toLong + col("frame_idx"))
      val canon = frames.groupBy(col("frame_md5"))
        .agg(min(col("fkey")).as("first_key"))
      frames.join(canon, "frame_md5")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("fkey") === col("first_key"), 1L).otherwise(0L))
            .as("n_canonical"),
          sum(when(col("fkey") === col("first_key"), 0L).otherwise(1L))
            .as("n_dupes"))
        .orderBy("doc_id")
    }),

    // q152 [north star, r9]: REAL-CODEC decode — per-document 24-bit BMPs
    // (width from n_chars, height from doc_id, deterministic pixels) are
    // encoded in-engine and decoded by the JDK's actual ImageIO BMP
    // reader, partition-locally; the output is the codec-REPORTED
    // dimensions plus an exact pixel sum. The oracle recomputes all
    // three as integer arithmetic, so a green row proves the encode →
    // real-decode round trip bit-exactly. Scale: narrow mapPartitions
    // both ways, ≤9 KB per image, decode parallelism = partition count.
    "q152_bmp_decode" -> ((spark, dir) => {
      import spark.implicits._
      val media = graft.Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          MediaRow(id, encodeBmp(id, (1 + nc % 64).toInt, (1 + id % 48).toInt))
        }
      decodeImages(spark, media).toDF().orderBy("doc_id")
    }),
  )

  /** The q187 oracle: per-pixel source values c0..c4 from the fixture
    * formula, then the closed-loop quantized recurrence unrolled frame
    * by frame (q_f from c_f and r_{f-1}, r_f clamped), aggregated with
    * nf-guards for the variable frame count (nf ∈ {3,4,5}, so frames
    * 1–2 always exist).
    */
  private def gvqOracleSql: String = quantOracleSql(f =>
    s"((x*3 + y*7 + doc_id) % 200) + ((x + y + $f*11 + doc_id) % 7) * 8 AS c$f")

  /** q196's oracle: the SAME closed-loop recurrence replay as q187's —
    * with the texture-aligned vector, motion compensation aligns world
    * points, so the recurrence runs per world point and only the
    * content formula changes (q191's scrolling world). The hash also
    * pins every frame's SEARCH: a wrong vector breaks the alignment
    * and every downstream column diverges.
    */
  private def gvvOracleSql: String = quantOracleSql(f =>
    s"((x*7919 + y*104729 + x*y*7907 + doc_id*31) % 200)" +
      s" + ((x + y + $f*11 + doc_id) % 7) * 8 AS c$f")

  private def quantOracleSql(cf: Int => String): String = {
    val cDefs = (0 to 4).map(cf).mkString(",\n        ")
    // chained sub-CTEs: q_f needs r_{f-1}; r_f needs q_f
    val steps = (1 to 4).map { f =>
      s"""sq$f AS (SELECT *, CAST(floor((c$f - r${f - 1} + 2) / 4.0) AS BIGINT) AS q$f FROM sr${f - 1}),
         |sr$f AS (SELECT *, GREATEST(0, LEAST(255, r${f - 1} + 4*q$f)) AS r$f FROM sq$f)""".stripMargin
    }.mkString(",\n")
    def guarded(expr: Int => String): String =
      s"${expr(1)} + ${expr(2)} + CASE WHEN nf > 3 THEN ${expr(3)} ELSE 0 END" +
        s" + CASE WHEN nf > 4 THEN ${expr(4)} ELSE 0 END"
    s"""WITH d AS (SELECT doc_id, 16 + n_chars % 16 AS w, 12 + doc_id % 11 AS h,
       |             3 + doc_id % 3 AS nf FROM documents),
       |px AS (SELECT d.doc_id, d.nf, d.w, d.h, x.k AS x, y.k AS y
       |       FROM d, generate_series(0, 30) x(k), generate_series(0, 21) y(k)
       |       WHERE x.k < d.w AND y.k < d.h),
       |c AS (SELECT *,
       |        $cDefs
       |      FROM px),
       |sr0 AS (SELECT *, c0 AS r0 FROM c),
       |$steps
       |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
       |  CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h,
       |  CAST(1 AS BIGINT) AS n_key,
       |  CAST(SUM(r0 + ${guarded(f => s"r$f")}) AS BIGINT) AS px_sum,
       |  CAST(SUM(${guarded(f => s"abs(r$f - c$f)")}) AS BIGINT) AS err_abs_sum,
       |  CAST(MAX(GREATEST(abs(r1 - c1), abs(r2 - c2),
       |        CASE WHEN nf > 3 THEN abs(r3 - c3) ELSE 0 END,
       |        CASE WHEN nf > 4 THEN abs(r4 - c4) ELSE 0 END)) AS BIGINT) AS max_abs_err,
       |  CAST(SUM(${guarded(f => s"abs(q$f)")}) AS BIGINT) AS qresid_abs_sum,
       |  TRUE AS coded_lt_raw
       |FROM sr4 GROUP BY doc_id, nf, w, h ORDER BY doc_id""".stripMargin
  }

  /** q233's oracle — the q216 Hamming-pair derivation + the q76-style
    * recursive reachability closure + singleton passthrough. Shared
    * VERBATIM by q235: the sparsified edge list provably has the same
    * components (see [[dhashClusterCollapseSparse]]), so the two queries
    * carry one output contract and one oracle — the q223/q228
    * shared-code discipline applied to oracles.
    */
  private val clusterCollapseOracle: String =
    """WITH RECURSIVE
      |d AS (SELECT doc_id, doc_id % 11 AS gid, doc_id // 11 AS member
      |      FROM documents),
      |gb AS (SELECT g.k AS gid, gx.k AS gx, gy.k AS gy,
      |         ((g.k*13 + gx.k*11 + gy.k*5 + gx.k*gx.k*gy.k + gy.k*gy.k*g.k)
      |           * 2654435761 // 268435456) % 2 = 1 AS bit
      |       FROM generate_series(0,10) g(k), generate_series(0,8) gx(k),
      |            generate_series(0,7) gy(k)),
      |lvl AS (SELECT g.gid, g.gx, g.gy,
      |          128 + 12 * COALESCE((SELECT SUM(CASE WHEN b.bit THEN -1 ELSE 1 END)
      |                               FROM gb b
      |                               WHERE b.gid = g.gid AND b.gy = g.gy
      |                                 AND b.gx < g.gx), 0) AS lvl
      |        FROM gb g),
      |nz AS (SELECT d.doc_id, gx.k AS gx, gy.k AS gy,
      |         SUM(((gx.k*4 + dx.k) * (gy.k*4 + dy.k) + d.member) % 3 - 1) AS nsum
      |       FROM d, generate_series(0,8) gx(k), generate_series(0,7) gy(k),
      |            generate_series(0,3) dx(k), generate_series(0,3) dy(k)
      |       GROUP BY d.doc_id, gx.k, gy.k),
      |cs AS (SELECT d.doc_id, n.gx, n.gy,
      |         16 * l.lvl + n.nsum +
      |         CASE WHEN n.gx = 8 AND d.member % 3 = 1
      |                AND (n.gy + d.gid) % 4 = 0 THEN 480 ELSE 0 END AS s
      |       FROM d JOIN nz n ON n.doc_id = d.doc_id
      |       JOIN lvl l ON l.gid = d.gid AND l.gx = n.gx AND l.gy = n.gy),
      |bits AS (SELECT a.doc_id, a.gx, a.gy, a.s > b.s AS bit
      |         FROM cs a JOIN cs b ON b.doc_id = a.doc_id AND b.gy = a.gy
      |           AND b.gx = a.gx + 1
      |         WHERE a.gx < 8),
      |ham AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |          SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h
      |        FROM bits a JOIN bits b ON b.gx = a.gx AND b.gy = a.gy
      |          AND a.doc_id < b.doc_id
      |        GROUP BY a.doc_id, b.doc_id),
      |tp AS (SELECT doc_a, doc_b FROM ham WHERE h <= 3),
      |edges AS (SELECT doc_a AS u, doc_b AS v FROM tp
      |          UNION SELECT doc_b, doc_a FROM tp),
      |reach(id, lbl) AS (
      |  SELECT u, u FROM edges
      |  UNION
      |  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.id = e.v),
      |comp AS (SELECT id AS doc_id, MIN(lbl) AS cid FROM reach GROUP BY id)
      |SELECT d.doc_id, COALESCE(c.cid, d.doc_id) AS cluster_id,
      |  c.cid IS NOT NULL AS in_cluster
      |FROM d LEFT JOIN comp c USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  def oracles: Map[String, String] = Map(
    // q235: the SAME closure — the sparsification is an engine-side
    // plan change with an identical output contract.
    "q235_image_cluster_sparse" -> clusterCollapseOracle,
    // q162: q152's integer-arithmetic oracle with the swapped dimension
    // formulas (w from n_chars % 48, h from doc_id % 64).
    "q162_png_decode" ->
      """WITH d AS (SELECT doc_id, 1 + n_chars % 48 AS w, 1 + doc_id % 64 AS h
        |           FROM documents),
        |p AS (SELECT d.doc_id, d.w, d.h,
        |        (x.k*7 + y.k*13 + d.doc_id) % 256
        |          + (x.k*3 + y.k*5) % 256 + (x.k + y.k) % 256 AS v
        |      FROM d, generate_series(0, 47) x(k), generate_series(0, 63) y(k)
        |      WHERE x.k < d.w AND y.k < d.h)
        |SELECT doc_id, CAST(w AS BIGINT) AS img_w, CAST(h AS BIGINT) AS img_h,
        |  CAST(SUM(v) AS BIGINT) AS px_sum
        |FROM p GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    // q169: the oracle rebuilds the byte-identical HTML + HTTP message
    // with string concatenation and measures the same lengths — octet
    // lengths where the format counts bytes (every Content-Length, the
    // payload slice), code-point length for the extracted text; md5
    // (UTF-8 bytes on both engines) pins the extract loop lossless.
    // (DuckDB spells octet_length-of-VARCHAR as strlen.)
    // q220: the shard geometry in closed form — member sizes, 512-block
    // padding, per-shard offset cumsums — plus the USTAR header
    // checksum as FixedHeaderSum + Σascii(name) + Σ(octal size digits):
    // the writer canon makes every header byte arithmetic.
    "q220_webdataset_tar" ->
      s"""WITH h AS (SELECT doc_id, doc_id % 16 AS shard,
        |             text || '${Warc.NonAsciiProbe}' AS text
        |           FROM documents WHERE text IS NOT NULL),
        |m AS (SELECT doc_id, shard, strlen(text) AS txt,
        |        11 + length(CAST(doc_id AS VARCHAR)) AS js, md5(text) AS md
        |      FROM h),
        |sz AS (SELECT *, 1024 + 512*((txt + 511)//512)
        |                      + 512*((js + 511)//512) AS tot FROM m),
        |off AS (SELECT *, COALESCE(SUM(tot) OVER (PARTITION BY shard
        |          ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS txt_offset FROM sz),
        |ck AS (SELECT doc_id,
        |         (SELECT SUM(ascii(substring(
        |            CAST(o.doc_id AS VARCHAR) || '.txt', CAST(i.k AS INT), 1)))
        |          FROM UNNEST(generate_series(1,
        |            length(CAST(o.doc_id AS VARCHAR)) + 4)) i(k)) AS namesum,
        |         (SELECT SUM((o.txt // CAST(power(8, i.k) AS BIGINT)) % 8)
        |          FROM UNNEST(generate_series(0, 10)) i(k)) AS odsum
        |       FROM off o)
        |SELECT o.doc_id, CAST(o.shard AS BIGINT) AS shard,
        |  CAST(o.txt_offset AS BIGINT) AS txt_offset,
        |  CAST(o.txt AS BIGINT) AS txt_octets,
        |  CAST(o.js AS BIGINT) AS json_octets,
        |  CAST(${Tar.FixedHeaderSum} + c.namesum + c.odsum AS BIGINT)
        |    AS txt_hdr_chksum,
        |  o.md AS text_md5
        |FROM off o JOIN ck c USING (doc_id) ORDER BY o.doc_id""".stripMargin,
    // q219: frame energies in closed form — E(j) = 64·mult·level(j) +
    // ((64j + member) mod 3) − 1 (the per-frame noise sum collapses: 64
    // consecutive residues mod 3 hold the start residue 22× and the
    // others 21× each, so Σ(v−1) = start_residue − 1) — then sign
    // bits and all-pairs Hamming, the q216 oracle shape.
    // q246: q219's energy closed form feeding the SAME reachability
    // closure as q233/q235 — the sparsification is an engine-side plan
    // change with an identical output contract, so the oracle is the
    // honest pair closure over the audio Hamming graph.
    "q246_audio_cluster_collapse" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, doc_id % 5 AS gid, doc_id // 5 AS member,
        |             1 + (doc_id // 5) % 2 AS mult FROM documents),
        |e AS (SELECT d.doc_id, j.k AS j,
        |        64 * d.mult * (CASE WHEN j.k = 64 AND d.member % 3 = 1
        |                       THEN 7000
        |                       ELSE 8000 + 400 * ((j.k * (d.gid + 2)) % 7) END)
        |        + ((j.k * 64 + d.member) % 3) - 1 AS en
        |      FROM d, generate_series(0, 64) j(k)),
        |bits AS (SELECT a.doc_id, a.j, a.en > b.en AS bit
        |         FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.j = a.j + 1
        |         WHERE a.j < 64),
        |ham AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |          SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h
        |        FROM bits a JOIN bits b ON b.j = a.j AND a.doc_id < b.doc_id
        |        GROUP BY a.doc_id, b.doc_id),
        |tp AS (SELECT doc_a, doc_b FROM ham WHERE h <= 3),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM tp
        |          UNION SELECT doc_b, doc_a FROM tp),
        |reach(id, lbl) AS (
        |  SELECT u, u FROM edges
        |  UNION
        |  SELECT e2.u, r.lbl FROM edges e2 JOIN reach r ON r.id = e2.v),
        |comp AS (SELECT id AS doc_id, MIN(lbl) AS cid FROM reach GROUP BY id)
        |SELECT d.doc_id, COALESCE(c.cid, d.doc_id) AS cluster_id,
        |  c.cid IS NOT NULL AS in_cluster
        |FROM d LEFT JOIN comp c USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q219_audio_neardup" ->
      """WITH d AS (SELECT doc_id, doc_id % 5 AS gid, doc_id // 5 AS member,
        |             1 + (doc_id // 5) % 2 AS mult FROM documents),
        |e AS (SELECT d.doc_id, j.k AS j,
        |        64 * d.mult * (CASE WHEN j.k = 64 AND d.member % 3 = 1
        |                       THEN 7000
        |                       ELSE 8000 + 400 * ((j.k * (d.gid + 2)) % 7) END)
        |        + ((j.k * 64 + d.member) % 3) - 1 AS en
        |      FROM d, generate_series(0, 64) j(k)),
        |bits AS (SELECT a.doc_id, a.j, a.en > b.en AS bit
        |         FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.j = a.j + 1
        |         WHERE a.j < 64),
        |ham AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |          SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h
        |        FROM bits a JOIN bits b ON b.j = a.j AND a.doc_id < b.doc_id
        |        GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, CAST(h AS BIGINT) AS hamming
        |FROM ham WHERE h <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // q218: SADs recomputed per adjacent frame pair straight from the
    // scene-raster formula (q194's constant-bound + WHERE pattern);
    // cuts by the same integer bar; longest shot via lag over the
    // {0} ∪ cuts ∪ {nf} boundary rows.
    "q218_scene_cuts" ->
      """WITH d AS (SELECT doc_id, 16 + n_chars % 16 AS w,
        |             8 + (doc_id % 3) * 4 AS h,
        |             2 + doc_id % 2 AS fp,
        |             (2 + doc_id % 3) * (2 + doc_id % 2) AS nf
        |           FROM documents),
        |sad AS (SELECT d.doc_id, f.k AS f, d.w, d.h,
        |          SUM(ABS(
        |            ((x.k*3 + y.k*7 + (d.doc_id + (f.k // d.fp)*7919)*31) % 200
        |              + ((x.k + y.k + f.k*11 + d.doc_id) % 7) * 8)
        |            - ((x.k*3 + y.k*7 + (d.doc_id + ((f.k-1) // d.fp)*7919)*31) % 200
        |              + ((x.k + y.k + (f.k-1)*11 + d.doc_id) % 7) * 8))) AS s
        |        FROM d, generate_series(1, 11) f(k),
        |             generate_series(0, 30) x(k), generate_series(0, 15) y(k)
        |        WHERE f.k < d.nf AND x.k < d.w AND y.k < d.h
        |        GROUP BY d.doc_id, f.k, d.w, d.h),
        |cuts AS (SELECT doc_id, f FROM sad WHERE s > 40 * w * h),
        |agg AS (SELECT doc_id, COUNT(*) AS n_cuts, SUM(f) AS cut_pos_sum
        |        FROM cuts GROUP BY doc_id),
        |bounds AS (SELECT doc_id, 0 AS f FROM d
        |           UNION ALL SELECT doc_id, f FROM cuts
        |           UNION ALL SELECT doc_id, nf AS f FROM d),
        |seg AS (SELECT doc_id,
        |          f - LAG(f) OVER (PARTITION BY doc_id ORDER BY f) AS len
        |        FROM bounds),
        |ls AS (SELECT doc_id, MAX(len) AS longest FROM seg GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.nf AS BIGINT) AS n_frames,
        |  CAST(COALESCE(a.n_cuts, 0) AS BIGINT) AS n_cuts,
        |  CAST(COALESCE(a.cut_pos_sum, 0) AS BIGINT) AS cut_pos_sum,
        |  CAST(l.longest AS BIGINT) AS longest_shot
        |FROM d LEFT JOIN agg a USING (doc_id) JOIN ls l USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // q217: the page structure re-derived arithmetically — the chrome
    // blocks are boilerplate BY CONSTRUCTION (link-dense or under the
    // word bar; 5 of them hold words), so content reduces to the
    // ≥10-word paragraph chunks; block counts, content words, and the
    // normalized-content md5 all recompute from word-list slices.
    "q217_boilerplate_extract" ->
      s"""WITH h AS (
        |  SELECT doc_id, list_filter(
        |      string_split(text || '${Warc.NonAsciiProbe}', ' '),
        |      x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc_id, i.k AS pi,
        |        ws[1 + ${Warc.ParaWords}*i.k :
        |           LEAST(len(ws), ${Warc.ParaWords}*(i.k+1))] AS pw
        |      FROM h, UNNEST(generate_series(0,
        |        CAST(ceil(len(ws)/${Warc.ParaWords}.0) AS INT) - 1)) i(k)),
        |c AS (SELECT doc_id, pi, len(pw) AS nw,
        |        array_to_string(pw, ' ') AS ptxt FROM p),
        |agg AS (SELECT doc_id, COUNT(*) AS np,
        |          SUM(CASE WHEN nw >= 10 THEN 1 ELSE 0 END) AS nc,
        |          SUM(CASE WHEN nw >= 10 THEN nw ELSE 0 END) AS cw,
        |          COALESCE(string_agg(CASE WHEN nw >= 10 THEN ptxt END,
        |            chr(10) ORDER BY pi), '') AS ctxt
        |        FROM c GROUP BY doc_id)
        |SELECT h.doc_id,
        |  CAST(5 + COALESCE(a.np, 0) AS BIGINT) AS n_blocks,
        |  CAST(COALESCE(a.nc, 0) AS BIGINT) AS n_content,
        |  CAST(COALESCE(a.cw, 0) AS BIGINT) AS content_words,
        |  md5(COALESCE(a.ctxt, '')) AS content_md5
        |FROM h LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q169_warc_extract" ->
      s"""WITH h AS (
        |  SELECT doc_id, text || '${Warc.NonAsciiProbe}' AS text
        |  FROM documents WHERE text IS NOT NULL),
        |h2 AS (
        |  SELECT doc_id, text,
        |    '<html><head><title>doc ' || doc_id ||
        |    '</title></head><body><nav>nav links</nav><main><p>' ||
        |    replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |    '</p></main><footer>footer</footer></body></html>' AS html
        |  FROM h),
        |m AS (
        |  SELECT doc_id, text, html,
        |    'HTTP/1.1 200 OK' || chr(13)||chr(10) ||
        |    'Content-Type: text/html; charset=utf-8' || chr(13)||chr(10) ||
        |    'Content-Length: ' || strlen(html) || chr(13)||chr(10) ||
        |    chr(13)||chr(10) || html AS http
        |  FROM h2)
        |SELECT doc_id, CAST(strlen(http) AS BIGINT) AS content_length,
        |  CAST(strlen(html) AS BIGINT) AS html_octets,
        |  CAST(length(text) AS BIGINT) AS n_extracted_chars,
        |  md5(text) AS text_md5
        |FROM m ORDER BY doc_id""".stripMargin,
    // q194: q191's world-coordinate identity per BAND (each band
    // scrolls rigidly, so Σ over (x,y) ≡ Σ over (u,y) within a band);
    // px adds the band term to the texture, the residual magnitude is
    // band-independent (the temporal difference), h = 4·(3 + id%6) and
    // the band split h1 = 4·⌊h/8⌋. DuckDB '/' is float division — the
    // integer split uses '//'.
    "q194_block_motion_video" ->
      """WITH d AS (SELECT doc_id, 16 + n_chars % 16 AS w,
        |             4 * (3 + doc_id % 6) AS h, 3 + doc_id % 3 AS nf,
        |             4 * ((4 * (3 + doc_id % 6)) // 8) AS h1 FROM documents),
        |p AS (SELECT d.doc_id, d.nf, d.w, d.h,
        |        ((x.k*7919 + y.k*104729 + x.k*y.k*7907 + d.doc_id*31
        |          + (CASE WHEN y.k < d.h1 THEN 0 ELSE 1 END) * 4999) % 200)
        |          + ((x.k + y.k + f.k*11 + d.doc_id) % 7) * 8 AS v,
        |        CASE WHEN f.k = 0 THEN 0 ELSE
        |          abs(((x.k + y.k + f.k*11 + d.doc_id) % 7) * 8
        |            - ((x.k + y.k + (f.k-1)*11 + d.doc_id) % 7) * 8) END AS r
        |      FROM d, generate_series(0, 30) x(k), generate_series(0, 31) y(k),
        |           generate_series(0, 4) f(k)
        |      WHERE x.k < d.w AND y.k < d.h AND f.k < d.nf)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h,
        |  CAST(1 AS BIGINT) AS n_key,
        |  CAST(SUM(v) AS BIGINT) AS px_sum,
        |  CAST(SUM(r) AS BIGINT) AS resid_abs_sum
        |FROM p GROUP BY doc_id, nf, w, h ORDER BY doc_id""".stripMargin,
    // q191: the oracle sums over WORLD coordinates (the per-frame
    // displacement is a bijection of the pixel grid, so Σ over (x,y)
    // ≡ Σ over (u,v)): px = aperiodic texture + temporal term; the
    // residual magnitude at the texture-aligned displacement is the
    // temporal term's difference — the encoder minimizes resid_abs_sum,
    // so the hash pins search optimality (see the registration note).
    "q191_motion_video" ->
      """WITH d AS (SELECT doc_id, 16 + n_chars % 16 AS w, 12 + doc_id % 11 AS h,
        |             3 + doc_id % 3 AS nf FROM documents),
        |p AS (SELECT d.doc_id, d.nf, d.w, d.h,
        |        ((x.k*7919 + y.k*104729 + x.k*y.k*7907 + d.doc_id*31) % 200)
        |          + ((x.k + y.k + f.k*11 + d.doc_id) % 7) * 8 AS v,
        |        CASE WHEN f.k = 0 THEN 0 ELSE
        |          abs(((x.k + y.k + f.k*11 + d.doc_id) % 7) * 8
        |            - ((x.k + y.k + (f.k-1)*11 + d.doc_id) % 7) * 8) END AS r
        |      FROM d, generate_series(0, 30) x(k), generate_series(0, 21) y(k),
        |           generate_series(0, 4) f(k)
        |      WHERE x.k < d.w AND y.k < d.h AND f.k < d.nf)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h,
        |  CAST(1 AS BIGINT) AS n_key,
        |  CAST(SUM(v) AS BIGINT) AS px_sum,
        |  CAST(SUM(r) AS BIGINT) AS resid_abs_sum
        |FROM p GROUP BY doc_id, nf, w, h ORDER BY doc_id""".stripMargin,
    // q187: the oracle REPLAYS the closed-loop quantized reconstruction
    // — keyframe exact, then per P-frame q_f = floor((c_f − r_{f−1} +
    // 2)/4) (the engine's Math.floorDiv round-half-up) and r_f =
    // clamp(r_{f−1} + 4·q_f) — unrolled over the max 5 frames, so every
    // distortion column is exact integer arithmetic. Only the entropy-
    // coded byte count is engine-measured (coded_lt_raw literal TRUE).
    "q187_quantized_video" -> gvqOracleSql,
    "q196_full_pframe_video" -> gvvOracleSql,
    // q176: every column exact integer arithmetic — px = spatial
    // gradient (mod 200) + temporal term (mod 7)·8; the residual
    // magnitude between consecutive frames is the temporal term's
    // difference (the spatial part cancels). n_key = 1 by construction
    // (one intra frame per stream).
    "q176_pframe_video" ->
      """WITH d AS (SELECT doc_id, 16 + n_chars % 16 AS w, 12 + doc_id % 11 AS h,
        |             3 + doc_id % 3 AS nf FROM documents),
        |p AS (SELECT d.doc_id, d.nf, d.w, d.h,
        |        ((x.k*3 + y.k*7 + d.doc_id) % 200)
        |          + ((x.k + y.k + f.k*11 + d.doc_id) % 7) * 8 AS v,
        |        CASE WHEN f.k = 0 THEN 0 ELSE
        |          abs(((x.k + y.k + f.k*11 + d.doc_id) % 7) * 8
        |            - ((x.k + y.k + (f.k-1)*11 + d.doc_id) % 7) * 8) END AS r
        |      FROM d, generate_series(0, 30) x(k), generate_series(0, 21) y(k),
        |           generate_series(0, 4) f(k)
        |      WHERE x.k < d.w AND y.k < d.h AND f.k < d.nf)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h,
        |  CAST(1 AS BIGINT) AS n_key,
        |  CAST(SUM(v) AS BIGINT) AS px_sum,
        |  CAST(SUM(r) AS BIGINT) AS resid_abs_sum
        |FROM p GROUP BY doc_id, nf, w, h ORDER BY doc_id""".stripMargin,

    // q168: exact container inventory (the dimension/frame formulas) +
    // the fidelity verdict as literal TRUE — the q19 self-validating
    // discipline for a lossy codec whose raw pixels can't cross engines.
    "q168_mjpeg_video" ->
      """SELECT doc_id, CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
        |  CAST(16 + n_chars % 17 AS BIGINT) AS frame_w,
        |  CAST(16 + doc_id % 13 AS BIGINT) AS frame_h,
        |  TRUE AS within_tol
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q165: frame inventory + pixel arithmetic — w = 8 + n_chars%16,
    // h = 6 + doc_id%10, frames = 2 + doc_id%4, gray g = (7x+13y+31f+id)%256.
    "q165_gif_frames" ->
      """WITH d AS (SELECT doc_id, 8 + n_chars % 16 AS w, 6 + doc_id % 10 AS h,
        |             2 + doc_id % 4 AS nf FROM documents),
        |p AS (SELECT d.doc_id, d.nf, d.w, d.h,
        |        (x.k*7 + y.k*13 + f.k*31 + d.doc_id) % 256 AS v
        |      FROM d, generate_series(0, 23) x(k), generate_series(0, 15) y(k),
        |           generate_series(0, 5) f(k)
        |      WHERE x.k < d.w AND y.k < d.h AND f.k < d.nf)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h,
        |  CAST(SUM(v) AS BIGINT) AS px_sum
        |FROM p GROUP BY doc_id, nf, w, h ORDER BY doc_id""".stripMargin,
    // q164: the decoded format/sample arithmetic — n = 64 + n_chars%512
    // samples of ((doc_id·31 + i·7) mod 4096) − 2048, all integers.
    "q164_wav_decode" ->
      """WITH d AS (SELECT doc_id, 64 + n_chars % 512 AS n FROM documents),
        |s AS (SELECT d.doc_id, d.n,
        |        ((d.doc_id*31 + i.k*7) % 4096) - 2048 AS v
        |      FROM d, generate_series(0, 574) i(k) WHERE i.k < d.n)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels, CAST(n AS BIGINT) AS n_samples,
        |  CAST(SUM(v) AS BIGINT) AS sample_sum
        |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    // q163: rebuild each served payload (ASCII: decimal id + ';'
    // repeated, truncated to 128 + id % 128 bytes), slice the requested
    // [offset, offset+length) range 1-indexed, md5 it. offset+length ≤
    // 31+79 = 110 < 128 ≤ payload length, so the slice is always full.
    "q163_ranged_blob_fetch" ->
      """SELECT doc_id,
        | CAST(16 + doc_id % 64 AS BIGINT) AS n_bytes,
        | md5(substring(
        |   substring(repeat(CAST(doc_id AS VARCHAR) || ';', 300),
        |     1, CAST(128 + doc_id % 128 AS INT)),
        |   CAST(doc_id % 32 + 1 AS INT), CAST(16 + doc_id % 64 AS INT)))
        |   AS blob_md5
        |FROM documents
        |WHERE substring(md5('fetch:' || CAST(doc_id AS VARCHAR)), 1, 2) >= 'cd'
        |ORDER BY doc_id""".stripMargin,
    // q152: the decoded dimensions/pixel-sum as pure integer arithmetic —
    // the cross join fans to ≤ w·h rows per doc (≤ 3072), summed back.
    // q230: the q216 cell-sum machinery verbatim; output pixel =
    // block_sum // 16, summed per doc.
    "q230_image_resize" ->
      """WITH d AS (SELECT doc_id, doc_id % 11 AS gid, doc_id // 11 AS member
        |           FROM documents),
        |gb AS (SELECT g.k AS gid, gx.k AS gx, gy.k AS gy,
        |         ((g.k*13 + gx.k*11 + gy.k*5 + gx.k*gx.k*gy.k + gy.k*gy.k*g.k)
        |           * 2654435761 // 268435456) % 2 = 1 AS bit
        |       FROM generate_series(0,10) g(k), generate_series(0,8) gx(k),
        |            generate_series(0,7) gy(k)),
        |lvl AS (SELECT g.gid, g.gx, g.gy,
        |          128 + 12 * COALESCE((SELECT SUM(CASE WHEN b.bit THEN -1 ELSE 1 END)
        |                               FROM gb b
        |                               WHERE b.gid = g.gid AND b.gy = g.gy
        |                                 AND b.gx < g.gx), 0) AS lvl
        |        FROM gb g),
        |nz AS (SELECT d.doc_id, gx.k AS gx, gy.k AS gy,
        |         SUM(((gx.k*4 + dx.k) * (gy.k*4 + dy.k) + d.member) % 3 - 1) AS nsum
        |       FROM d, generate_series(0,8) gx(k), generate_series(0,7) gy(k),
        |            generate_series(0,3) dx(k), generate_series(0,3) dy(k)
        |       GROUP BY d.doc_id, gx.k, gy.k),
        |cs AS (SELECT d.doc_id, n.gx, n.gy,
        |         16 * l.lvl + n.nsum +
        |         CASE WHEN n.gx = 8 AND d.member % 3 = 1
        |                AND (n.gy + d.gid) % 4 = 0 THEN 480 ELSE 0 END AS s
        |       FROM d JOIN nz n ON n.doc_id = d.doc_id
        |       JOIN lvl l ON l.gid = d.gid AND l.gx = n.gx AND l.gy = n.gy)
        |SELECT doc_id, CAST(36 AS BIGINT) AS in_w, CAST(32 AS BIGINT) AS in_h,
        |  CAST(9 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
        |  CAST(SUM(s // 16) AS BIGINT) AS px_sum
        |FROM cs GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q233_image_cluster_collapse" -> clusterCollapseOracle,
    // q216: the dHash pipeline re-derived arithmetically — group-bit
    // scramble, ±12 column walk (closed-form prefix sum), per-member
    // noise and boost block sums, comparison bits, all-pairs Hamming.
    // The engine's decode must land on the same pairs through actual
    // BMP bytes + ImageIO + the banded join.
    "q216_image_neardup" ->
      """WITH d AS (SELECT doc_id, doc_id % 11 AS gid, doc_id // 11 AS member
        |           FROM documents),
        |gb AS (SELECT g.k AS gid, gx.k AS gx, gy.k AS gy,
        |         ((g.k*13 + gx.k*11 + gy.k*5 + gx.k*gx.k*gy.k + gy.k*gy.k*g.k)
        |           * 2654435761 // 268435456) % 2 = 1 AS bit
        |       FROM generate_series(0,10) g(k), generate_series(0,8) gx(k),
        |            generate_series(0,7) gy(k)),
        |lvl AS (SELECT g.gid, g.gx, g.gy,
        |          128 + 12 * COALESCE((SELECT SUM(CASE WHEN b.bit THEN -1 ELSE 1 END)
        |                               FROM gb b
        |                               WHERE b.gid = g.gid AND b.gy = g.gy
        |                                 AND b.gx < g.gx), 0) AS lvl
        |        FROM gb g),
        |nz AS (SELECT d.doc_id, gx.k AS gx, gy.k AS gy,
        |         SUM(((gx.k*4 + dx.k) * (gy.k*4 + dy.k) + d.member) % 3 - 1) AS nsum
        |       FROM d, generate_series(0,8) gx(k), generate_series(0,7) gy(k),
        |            generate_series(0,3) dx(k), generate_series(0,3) dy(k)
        |       GROUP BY d.doc_id, gx.k, gy.k),
        |cs AS (SELECT d.doc_id, n.gx, n.gy,
        |         16 * l.lvl + n.nsum +
        |         CASE WHEN n.gx = 8 AND d.member % 3 = 1
        |                AND (n.gy + d.gid) % 4 = 0 THEN 480 ELSE 0 END AS s
        |       FROM d JOIN nz n ON n.doc_id = d.doc_id
        |       JOIN lvl l ON l.gid = d.gid AND l.gx = n.gx AND l.gy = n.gy),
        |bits AS (SELECT a.doc_id, a.gx, a.gy, a.s > b.s AS bit
        |         FROM cs a JOIN cs b ON b.doc_id = a.doc_id AND b.gy = a.gy
        |           AND b.gx = a.gx + 1
        |         WHERE a.gx < 8),
        |ham AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |          SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h
        |        FROM bits a JOIN bits b ON b.gx = a.gx AND b.gy = a.gy
        |          AND a.doc_id < b.doc_id
        |        GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, CAST(h AS BIGINT) AS hamming
        |FROM ham WHERE h <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    "q152_bmp_decode" ->
      """WITH d AS (SELECT doc_id, 1 + n_chars % 64 AS w, 1 + doc_id % 48 AS h
        |           FROM documents),
        |p AS (SELECT d.doc_id, d.w, d.h,
        |        (x.k*7 + y.k*13 + d.doc_id) % 256
        |          + (x.k*3 + y.k*5) % 256 + (x.k + y.k) % 256 AS v
        |      FROM d, generate_series(0, 63) x(k), generate_series(0, 47) y(k)
        |      WHERE x.k < d.w AND y.k < d.h)
        |SELECT doc_id, CAST(w AS BIGINT) AS img_w, CAST(h AS BIGINT) AS img_h,
        |  CAST(SUM(v) AS BIGINT) AS px_sum
        |FROM p GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "q54_multimodal_stub" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
        | CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height,
        | md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q55_sidechannel_deref" ->
      """SELECT doc_id,
        | 's3://media-bucket/doc/' || CAST(doc_id AS VARCHAR) || '.bin' AS url,
        | CAST(octet_length(encode('s3://media-bucket/doc/' || CAST(doc_id AS VARCHAR) || '.bin')) AS BIGINT) AS n_bytes,
        | md5('s3://media-bucket/doc/' || CAST(doc_id AS VARCHAR) || '.bin') AS blob_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q63_resize" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS in_w,
        |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS in_h
        |  FROM documents)
        |SELECT doc_id, in_w, in_h,
        | CASE WHEN in_w <= 0 OR in_h <= 0 THEN 0
        |      ELSE in_w * 224 // greatest(in_w, in_h) END AS out_w,
        | CASE WHEN in_w <= 0 OR in_h <= 0 THEN 0
        |      ELSE in_h * 224 // greatest(in_w, in_h) END AS out_h
        |FROM d ORDER BY doc_id""".stripMargin,
    // documents.text is ASCII (lowercase words), so byte offsets == char
    // offsets and DuckDB substring mirrors the byte slicing exactly.
    "q56_frame_sample" ->
      """WITH f AS (
        |  SELECT d.doc_id, s.k AS frame_idx,
        |         substring(d.text, 1 + s.k * 256, 64) AS chunk
        |  FROM documents d,
        |       generate_series(0, 63) s(k)
        |  WHERE s.k * 256 < length(d.text))
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(length(chunk) AS BIGINT) AS n_bytes,
        |       md5(chunk) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // q150: the q56 frame CTE + the q42 canonical-min rule at frame
    // granularity; fkey = doc_id·64 + frame_idx is bijective because the
    // sampler caps frame_idx at 63.
    "q150_frame_dedup" ->
      """WITH f AS (
        |  SELECT d.doc_id, s.k AS frame_idx,
        |         substring(d.text, 1 + s.k * 256, 64) AS chunk
        |  FROM documents d,
        |       generate_series(0, 63) s(k)
        |  WHERE s.k * 256 < length(d.text)),
        |h AS (SELECT doc_id, doc_id * 64 + frame_idx AS fkey,
        |        md5(chunk) AS frame_md5
        |      FROM f),
        |c AS (SELECT frame_md5, min(fkey) AS first_key
        |      FROM h GROUP BY frame_md5)
        |SELECT h.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN h.fkey = c.first_key THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_canonical,
        |  CAST(SUM(CASE WHEN h.fkey = c.first_key THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_dupes
        |FROM h JOIN c USING (frame_md5)
        |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin,
  )
}
