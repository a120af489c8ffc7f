package graft.operators

import java.io.ByteArrayOutputStream

/** Minimal-but-valid AVI (RIFF) muxer and a generic RIFF demuxer for the
  * Motion-JPEG video tier (q168): the muxer writes a spec-shaped
  * `RIFF('AVI ', LIST hdrl(avih, LIST strl(strh 'vids'/'MJPG', strf
  * BITMAPINFOHEADER)), LIST movi('00dc' JPEG frames), idx1)` file; the
  * demuxer walks RIFF chunks generically (LIST recursion, even-byte
  * padding, unknown-chunk skip) and yields the '00dc' frame payloads.
  *
  * RIFF/AVI is a published container format (Microsoft/IBM 1992 spec);
  * the JPEG codec inside the frames is the JDK's own (`ImageIO`) — so
  * q168 exercises real container demux + a real LOSSY codec, the pairing
  * H.264-era video needs, with no external native dependency.
  */
private[graft] object Avi {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4); s.getBytes("US-ASCII")
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(fourcc(id)); out.write(le32(body.length)); out.write(body)
    if (body.length % 2 == 1) out.write(0) // RIFF chunks are even-aligned
    out.toByteArray
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(listType) ++ body)

  /** Mux pre-encoded frames (same dimensions) into an AVI file.
    *
    * `codec` is the stream fourcc ('MJPG' for the q168 tier, 'GVC1' for
    * the q176 temporal-prediction tier); `keyframes(i)` drives the
    * AVIIF_KEYFRAME flag in the idx1 entry for frame i — the container
    * index a real player seeks by, which for a predictive codec must
    * mark ONLY the frames decodable without history (every frame, for
    * intra-only MJPEG — the default).
    */
  def mux(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      codec: String = "MJPG",
      keyframes: Option[Seq[Boolean]] = None): Array[Byte] = {
    require(frames.nonEmpty, "cannot mux an empty frame list")
    require(fps > 0, s"fps must be positive, got $fps")
    require(keyframes.forall(_.length == frames.length),
      "keyframes mask length must equal frame count")
    val keyAt: Int => Boolean = i => keyframes.forall(_(i))
    val maxFrame = frames.map(_.length).max
    val avih = chunk("avih",
      le32(1000000 / fps) ++ le32(maxFrame * fps) ++ le32(0) ++
        le32(0x10 /* AVIF_HASINDEX */) ++ le32(frames.length) ++ le32(0) ++
        le32(1 /* streams */) ++ le32(maxFrame) ++ le32(w) ++ le32(h) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc(codec) ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1 /* scale */) ++ le32(fps /* rate */) ++ le32(0) ++
        le32(frames.length) ++ le32(maxFrame) ++ le32(-1 /* quality */) ++
        le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf", // BITMAPINFOHEADER
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        fourcc(codec) ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val moviBody = new ByteArrayOutputStream()
    val idxBody = new ByteArrayOutputStream()
    var offset = 4 // idx1 offsets are relative to the 'movi' fourcc
    frames.zipWithIndex.foreach { case (f, i) =>
      val c = chunk("00dc", f)
      idxBody.write(fourcc("00dc"))
      idxBody.write(le32(if (keyAt(i)) 0x10 /* AVIIF_KEYFRAME */ else 0))
      idxBody.write(le32(offset)); idxBody.write(le32(f.length))
      moviBody.write(c)
      offset += c.length
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = chunk("idx1", idxBody.toByteArray)
    val riffBody = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ le32(riffBody.length) ++ riffBody
  }

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def cc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Demux: walk the RIFF tree and return the '00dc' frame payloads in
    * stream order. Fails loudly on a malformed container (truncated
    * chunk, wrong magic) — the raise-don't-drift decode discipline.
    */
  def demux(avi: Array[Byte]): Seq[Array[Byte]] = {
    require(avi.length >= 12 && cc(avi, 0) == "RIFF" && cc(avi, 8) == "AVI ",
      "not a RIFF/AVI file")
    val riffSize = readLe32(avi, 4)
    // riffSize is attacker-controlled: negative (or Int-overflow via
    // 8 + size) values must fail loudly, not walk an empty/garbage range
    require(riffSize >= 4 && 8L + riffSize <= avi.length,
      s"bad RIFF payload size $riffSize for ${avi.length}-byte input")
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = cc(avi, p)
        val size = readLe32(avi, p + 4)
        // negative size would both pass the bound check (it SHRINKS the
        // left side) and advance p by zero — an infinite loop, not a
        // loud failure (r10 review finding)
        require(size >= 0, s"negative chunk size $size for $id at $p")
        require(p + 8L + size <= end, s"truncated chunk $id at $p")
        if (id == "LIST") {
          val listType = cc(avi, p + 8)
          walk(p + 12, p + 8 + size, inMovi || listType == "movi")
        } else if (inMovi && id == "00dc") {
          frames += java.util.Arrays.copyOfRange(avi, p + 8, p + 8 + size)
        } // else: unknown chunk (avih/strh/strf/idx1/JUNK) — skip
        p += 8 + size + (size % 2) // even-byte padding
      }
    }
    walk(12, 8 + riffSize, inMovi = false)
    frames.result()
  }

  /** Total frame count the container HEADER claims (avih.dwTotalFrames)
    * — lets tests pin header/stream consistency.
    */
  def headerTotalFrames(avi: Array[Byte]): Int = {
    require(avi.length >= 12 && cc(avi, 0) == "RIFF" && cc(avi, 8) == "AVI ",
      "not a RIFF/AVI file")
    require(readLe32(avi, 4) >= 4 && 8L + readLe32(avi, 4) <= avi.length,
      "bad RIFF payload size")
    var p = 12
    var found = -1
    def walk(start: Int, end: Int): Unit = {
      var q = start
      while (q + 8 <= end && found < 0) {
        val id = cc(avi, q)
        val size = readLe32(avi, q + 4)
        require(size >= 0, s"negative chunk size $size for $id at $q")
        require(q + 8L + size <= end, s"truncated chunk $id at $q")
        if (id == "LIST") walk(q + 12, q + 8 + size)
        else if (id == "avih") {
          require(size >= 20, s"avih chunk too small ($size bytes)")
          found = readLe32(avi, q + 8 + 16)
        }
        q += 8 + size + (size % 2)
      }
    }
    walk(p, 8 + readLe32(avi, 4))
    require(found >= 0, "no avih header")
    found
  }

  /** (width, height) the container HEADER claims (avih.dwWidth/dwHeight)
    * — a byte-raster codec like GVC has no in-payload dimensions (unlike
    * JPEG), so the decode is driven by the container header, with the
    * payload size cross-checked against it.
    */
  def headerDims(avi: Array[Byte]): (Int, Int) = {
    require(avi.length >= 12 && cc(avi, 0) == "RIFF" && cc(avi, 8) == "AVI ",
      "not a RIFF/AVI file")
    require(readLe32(avi, 4) >= 4 && 8L + readLe32(avi, 4) <= avi.length,
      "bad RIFF payload size")
    var dims: (Int, Int) = null
    def walk(start: Int, end: Int): Unit = {
      var q = start
      while (q + 8 <= end && dims == null) {
        val id = cc(avi, q)
        val size = readLe32(avi, q + 4)
        require(size >= 0, s"negative chunk size $size for $id at $q")
        require(q + 8L + size <= end, s"truncated chunk $id at $q")
        if (id == "LIST") walk(q + 12, q + 8 + size)
        else if (id == "avih") {
          require(size >= 40, s"avih chunk too small ($size bytes)")
          dims = (readLe32(avi, q + 8 + 32), readLe32(avi, q + 8 + 36))
        }
        q += 8 + size + (size % 2)
      }
    }
    walk(12, 8 + readLe32(avi, 4))
    require(dims != null, "no avih header")
    dims
  }

  /** The idx1 entries' flag words for the '00dc' stream, in index order —
    * bit 0x10 is AVIIF_KEYFRAME, the seek index a player trusts. Lets
    * the predictive-codec tier cross-check the container's keyframe map
    * against the payloads' own intra/predicted magic.
    */
  def idx1Flags(avi: Array[Byte]): Seq[Int] = {
    require(avi.length >= 12 && cc(avi, 0) == "RIFF" && cc(avi, 8) == "AVI ",
      "not a RIFF/AVI file")
    require(readLe32(avi, 4) >= 4 && 8L + readLe32(avi, 4) <= avi.length,
      "bad RIFF payload size")
    val flags = Seq.newBuilder[Int]
    def walk(start: Int, end: Int): Unit = {
      var q = start
      while (q + 8 <= end) {
        val id = cc(avi, q)
        val size = readLe32(avi, q + 4)
        require(size >= 0, s"negative chunk size $size for $id at $q")
        require(q + 8L + size <= end, s"truncated chunk $id at $q")
        if (id == "LIST") walk(q + 12, q + 8 + size)
        else if (id == "idx1") {
          require(size % 16 == 0, s"idx1 size $size not a multiple of 16")
          var e = q + 8
          while (e < q + 8 + size) {
            if (cc(avi, e) == "00dc") flags += readLe32(avi, e + 4)
            e += 16
          }
        }
        q += 8 + size + (size % 2)
      }
    }
    walk(12, 8 + readLe32(avi, 4))
    flags.result()
  }
}
