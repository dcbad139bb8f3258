package graft.ext

/** Deterministic multimodal fixtures shared by the oracle gate
  * (`multimodal_imageio`), the specs, and the dev drive — ONE source of
  * truth for the payloads behind the precomputed oracle constants, so the
  * gate, the suite, and the smoke check cannot drift apart.
  *
  * Constants: [[rgbImage]] is a 3×2 TYPE_3BYTE_BGR image with RGB triples
  * 10..180 — 18 samples summing 1710, mean intensity exactly 95.0 under
  * any lossless encoding; `wavBytes(1, 8000, 16, 8000)` declares a 0.5 s
  * mono 8 kHz 16-bit PCM payload.
  */
private[graft] object MultimodalFixtures {

  def rgbImage(): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var v = 10
    for (y <- 0 until 2; x <- 0 until 3) {
      img.setRGB(x, y, (v << 16) | ((v + 10) << 8) | (v + 20))
      v += 30
    }
    img
  }

  /** [[rgbImage]] encoded through the JDK writer for `fmt` (png/bmp/...). */
  def encodedImage(fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgbImage(), fmt, bos)
    bos.toByteArray
  }

  /** Uniform w×h image (every pixel RGB(v,v,v)) encoded for `fmt`: any
    * resize — whatever pixels nearest-neighbor rounding picks — preserves
    * mean intensity exactly v, making it the oracle fixture for the
    * resize gate (implementation-independent constants). */
  def uniformImage(w: Int, h: Int, v: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Animated GIF of uniform w×h frames, one per gray value in `vs` —
    * single-color frames survive GIF palette quantization losslessly, so
    * each decoded frame's mean intensity is exactly its `v` (the same
    * implementation-independence trick as [[uniformImage]]). */
  def animatedGif(vs: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      vs.foreach { v =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Spec-complete MJPEG-AVI of uniform w×h gray frames, one per value in
    * `vs`: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    * LIST('movi' 00dc…)) with a correct 56-byte main header and
    * vids/MJPG stream headers — a real (playable) AVI, not a
    * parser-shaped one. JPEG is lossy, but a uniform frame decodes to a
    * near-exact mean (assert with a small tolerance). */
  def mjpegAvi(vs: Seq[Int], w: Int, h: Int): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      fcc(id) ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(typ: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(typ) ++ children)
    val frames = vs.map { v =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avih = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) ++ le32(25) ++ le32(0) ++ le32(frames.length) ++ le32(0) ++
      le32(0xffffffffL) ++ le32(0) ++ le32(0) ++ le32(0)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0, 24, 0) ++ fcc("MJPG") ++ le32(w.toLong * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.map(f => chunk("00dc", f))
      .foldLeft(Array.emptyByteArray)(_ ++ _))
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** PCM WAV carrying the given raw samples (signed; 8-bit written as
    * unsigned-offset per the format). Power-of-two amplitudes make the
    * normalized signal features EXACT doubles — e.g. a ±16384 16-bit
    * square wave has rms = peak = 0.5 and dc_offset = 0.0 exactly. */
  def pcmWav(samples: Seq[Long], ch: Int, rate: Int, bits: Int): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(ch.toShort)
    bb.putInt(rate); bb.putInt(rate * ch * bits / 8)
    bb.putShort((ch * bits / 8).toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach { s =>
      bits match {
        case 8  => bb.put((s + 128).toByte)
        case 16 => bb.putShort(s.toShort)
        case 24 => bb.put((s & 0xff).toByte).put(((s >> 8) & 0xff).toByte)
          .put(((s >> 16) & 0xff).toByte)
        case _  => bb.putInt(s.toInt)
      }
    }
    bb.array()
  }

  /** Canonical 44-byte-header PCM WAV with a zeroed data chunk. */
  def wavBytes(ch: Int, rate: Int, bits: Int, dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(ch.toShort)
    bb.putInt(rate); bb.putInt(rate * ch * bits / 8)
    bb.putShort((ch * bits / 8).toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataLen)
    bb.array()
  }

  // ---- ISO-BMFF (MP4) fixture ----------------------------------------------
  // Big-endian box tree: [size u32][fourcc][payload]. Only the boxes the
  // metadata walk reads are emitted (ftyp, moov/mvhd, trak/tkhd,
  // mdia/minf/stbl/stsd) — a stock mp4 muxer writes more, but a correct
  // walker must not require them.

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length); bb.put(typ.getBytes("US-ASCII"))
    bb.put(payload); bb.array()
  }

  /** Minimal valid MP4 metadata skeleton: version-0 `mvhd` with the given
    * movie timescale/duration, one video track whose version-0 `tkhd`
    * carries 16.16-fixed `width`×`height`, and an `stsd` declaring one
    * sample entry with codec fourcc `codec`. Deterministic bytes — the
    * oracle gate pins the parsed fields to these arguments. */
  def mp4Bytes(brand: String = "isom", timescale: Int = 600,
               duration: Int = 1200, width: Int = 320, height: Int = 240,
               codec: String = "avc1"): Array[Byte] = {
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.put(brand.getBytes("US-ASCII")).putInt(0)
      bb.put("mp41".getBytes("US-ASCII")).array()
    })
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(100) // version-0 payload
      bb.putInt(0)            // version 0 + flags
      bb.putInt(0).putInt(0)  // creation, modification
      bb.putInt(timescale).putInt(duration)
      bb.putInt(0x00010000)   // rate 1.0
      // volume+reserved, 2x reserved, 9x matrix, 6x predefined, next id
      bb.array()              // remaining fields stay zeroed
    })
    val tkhd = box("tkhd", {
      val bb = java.nio.ByteBuffer.allocate(84) // version-0 payload
      bb.putInt(0)            // version 0 + flags
      bb.putInt(0).putInt(0)  // creation, modification
      bb.putInt(1)            // track id
      bb.putInt(0)            // reserved
      bb.putInt(duration)
      bb.position(76)         // reserved/layer/volume/matrix stay zeroed
      bb.putInt(width << 16).putInt(height << 16)
      bb.array()
    })
    val stsd = box("stsd", {
      val entry = java.nio.ByteBuffer.allocate(16)
        .putInt(16).put(codec.getBytes("US-ASCII")).array()
      val bb = java.nio.ByteBuffer.allocate(8 + entry.length)
      bb.putInt(0).putInt(1).put(entry).array()
    })
    val stbl = box("stbl", stsd)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }
}
