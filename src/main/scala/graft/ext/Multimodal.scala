package graft.ext

import graft.GraftFunctions.farmHash64
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction / resize / frame-sampling are per-partition batch
  * operators.
  *
  * Decode kernels: IMAGE decode is REAL for the formats the JDK ships
  * codecs for — `javax.imageio` reads PNG/JPEG/GIF/BMP with zero extra
  * dependencies — and WAV audio features are pure header arithmetic (also
  * real). Payloads no reader claims fall back to the clearly-marked
  * deterministic `stubDecodeImage` fake (so exotic formats keep the
  * pipeline shape testable without their codecs); payloads a codec CLAIMS
  * but cannot decode (right magic, corrupt body) yield null features —
  * never fake numbers. Resize ([[resizeImages]]) and frame sampling
  * ([[sampleFrameFeatures]], animated GIF via ImageIO + MJPEG-AVI via the
  * pure-JDK [[demuxAviFrames]] RIFF demuxer) are REAL; the remaining stub
  * boundary is compressed video codecs (mp4/h264 and kin — no JDK decoder
  * exists), which fall back to the declared deterministic fake.
  *
  * Scale notes: metadata extraction is pure Catalyst (scan-speed, no
  * shuffle); decode operators run via mapPartitions in batches so codec
  * init amortizes per partition — the same shape a Pandas-UDF
  * `mapInPandas` pipeline has in PySpark.
  */
object Multimodal {

  /** Container-format sniff from magic bytes — real (public magic numbers),
    * pure Catalyst: jpeg/png/gif/wav/riff/mp4/unknown. */
  def sniffFormat(bin: Column): Column = {
    val hex8 = upper(hex(substring(bin, 1, 8)))
    when(hex8.startsWith("FFD8FF"), "jpeg")
      .when(hex8.startsWith("89504E47"), "png")
      .when(hex8.startsWith("47494638"), "gif")
      .when(hex8.startsWith("52494646") && upper(hex(substring(bin, 9, 4))) === "57415645", "wav")
      .when(hex8.startsWith("52494646"), "riff")
      .when(upper(hex(substring(bin, 5, 4))) === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** Typed payload metadata: byte size, sniffed format, content
    * fingerprint. Scan-speed column expressions, no decode. */
  def withMetadata(df: DataFrame, binCol: String,
                   metaCol: String = "meta"): DataFrame =
    df.withColumn(metaCol, struct(
      length(col(binCol)).as("n_bytes"),
      sniffFormat(col(binCol)).as("format"),
      farmHash64(col(binCol)).as("fingerprint")))

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("mean_intensity", DoubleType, nullable = true)))

  /** STUB image decode: deterministic fake dimensions/intensity derived
    * from the payload bytes — the fallback for formats the JDK has no
    * codec for (replace with the real codec to integrate one). */
  private def stubDecodeImage(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length < 4) return Row(null, null, null, null)
    val w = ((bytes(0) & 0x7f) << 4 | (bytes(1) & 0x0f)) + 1
    val h = ((bytes(2) & 0x7f) << 4 | (bytes(3) & 0x0f)) + 1
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    Row(w, h, 3, sum.toDouble / bytes.length)
  }

  /** Pixel ceiling for real decode: dimensions are peeked from the header
    * BEFORE any raster is allocated, and a payload whose DECLARED pixel
    * count exceeds this cap is nulled without decoding. Without the peek,
    * a decompression bomb — a few-hundred-byte PNG declaring 30000×30000
    * — would make `ImageIO.read` allocate a multi-GB `BufferedImage` and
    * die with `OutOfMemoryError` (an Error, not Exception), killing the
    * executor: exactly the one-corrupt-payload-kills-the-job failure this
    * module's contract forbids for untrusted training data. 64 M pixels
    * ≈ 256 MB as an int raster — far above any sane training image. */
  private[ext] val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP —
    * public, zero extra dependencies): true width/height, raster band
    * count as channels, and mean raw sample value over all pixels × bands
    * as intensity. Unknown formats (no registered reader) fall back to
    * [[stubDecodeImage]]; claimed-but-corrupt payloads — including bombs
    * over [[MaxDecodePixels]] — yield nulls. */
  private[ext] def decodeImageBytes(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length < 4) return Row(null, null, null, null)
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val img =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return stubDecodeImage(bytes) // no codec claims it
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // header-only dimension peek: no raster exists yet, so the
            // bomb check costs nothing and runs before any big allocation
            val dw = reader.getWidth(0)
            val dh = reader.getHeight(0)
            if (dw.toLong * dh > MaxDecodePixels || dw <= 0 || dh <= 0)
              return Row(null, null, null, null)
            reader.read(0)
          } finally reader.dispose()
        } finally iis.close()
      val (bands, mean) = imageStats(img)
      Row(img.getWidth, img.getHeight, bands, mean)
    } catch {
      // a reader claimed the magic bytes but the body is broken: null
      // features, never fake numbers for a real-format payload. The
      // dimension cap above makes raster allocation bounded, but a
      // malicious codec path could still overshoot (interlace buffers,
      // metadata) — treat OutOfMemoryError from THIS payload's decode as
      // a corrupt-payload null too, rather than letting one byte blob
      // kill the executor; nothing is partially mutated at this point
      case scala.util.control.NonFatal(_) => Row(null, null, null, null)
      case _: OutOfMemoryError => Row(null, null, null, null)
    }
  }

  /** Bomb-capped single-image decode: the BufferedImage, or null when no
    * reader claims the payload, the body is corrupt, or the DECLARED
    * dimensions exceed [[MaxDecodePixels]] (checked header-only, before
    * any raster allocation). The per-frame kernel of the AVI demux path. */
  private def decodeBoundedImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    if (bytes == null || bytes.length < 4) return null
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val dw = reader.getWidth(0)
          val dh = reader.getHeight(0)
          if (dw.toLong * dh > MaxDecodePixels || dw <= 0 || dh <= 0) null
          else reader.read(0)
        } finally reader.dispose()
      } finally iis.close()
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: OutOfMemoryError => null
    }
  }

  /** (channels, mean raw intensity) of a decoded image. Palette-indexed
    * images (e.g. GIF): raster samples are palette INDICES, not
    * intensities — average the resolved RGB components instead. */
  private def imageStats(img: java.awt.image.BufferedImage): (Int, Double) = {
    val w = img.getWidth
    val h = img.getHeight
    if (img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) {
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      (3, sum / (w.toDouble * h * 3))
    } else {
      val raster = img.getRaster
      val bands = raster.getNumBands
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      (bands, sum / (w.toDouble * h * bands))
    }
  }

  /** Image decode + feature extraction over batches: appends
    * `imageFeatureSchema` columns. Real partition-batch plumbing and a
    * real JDK-ImageIO kernel (stub fallback for formats without a JDK
    * codec — see [[decodeImageBytes]]). */
  def decodeImages(df: DataFrame, binCol: String,
                   featCol: String = "img"): DataFrame = {
    val schema = df.schema.add(StructField(featCol, imageFeatureSchema, nullable = true))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      // per-partition init point: ImageIO scans its reader registry
      // lazily; heavier codecs/models would load HERE, once
      javax.imageio.ImageIO.setUseCache(false) // byte-array inputs: no temp files
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decodeImageBytes(bytes))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("duration_sec", DoubleType, nullable = true)))

  /** REAL WAV audio features by RIFF header arithmetic (public format, no
    * codec needed): walks the chunk list for `fmt ` (channels, sample
    * rate, bit depth) and `data` (payload size), duration = dataBytes /
    * (rate × channels × bytesPerSample). Non-WAV or malformed headers
    * yield nulls. */
  private[ext] def decodeWavBytes(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length < 12) return Row(null, null, null, null)
    try {
      def tag(o: Long): String = new String(bytes, o.toInt, 4, "US-ASCII")
      def le16(o: Long): Int = (bytes(o.toInt) & 0xff) | ((bytes(o.toInt + 1) & 0xff) << 8)
      def le32(o: Long): Long = ((bytes(o.toInt) & 0xff).toLong |
        ((bytes(o.toInt + 1) & 0xff).toLong << 8) |
        ((bytes(o.toInt + 2) & 0xff).toLong << 16) |
        ((bytes(o.toInt + 3) & 0xff).toLong << 24))
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return Row(null, null, null, null)
      // offsets in Long: a corrupt 32-bit chunk length near 2^32 must not
      // overflow the cursor negative or stall the walk — le32 is
      // unsigned (0..2^32-1) so the cursor only ever moves forward, and
      // any out-of-bounds read below is caught and nulled
      var off = 12L
      var ch = -1; var rate = -1L; var bits = -1; var dataLen = -1L
      while (off + 8 <= bytes.length) {
        val t = tag(off)
        val len = le32(off + 4)
        if (t == "fmt " && len >= 16 && off + 8 + 16 <= bytes.length) {
          ch = le16(off + 10); rate = le32(off + 12); bits = le16(off + 22)
        }
        if (t == "data") dataLen = len
        // chunks are word-aligned: odd lengths carry one pad byte
        off += 8L + len + (len & 1L)
      }
      if (ch <= 0 || rate <= 0 || bits < 8 || dataLen < 0) Row(null, null, null, null)
      else Row(ch, rate.toInt, bits,
        dataLen.toDouble / (rate.toDouble * ch * (bits / 8)))
    } catch {
      // malformed header (truncated chunk, bogus length): nulls, per the
      // contract — one corrupt payload must never kill or hang the job
      case _: Exception => Row(null, null, null, null)
    }
  }

  val audioSignalSchema: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = true),
    StructField("rms", DoubleType, nullable = true),
    StructField("peak", DoubleType, nullable = true),
    StructField("dc_offset", DoubleType, nullable = true),
    StructField("clipped_frac", DoubleType, nullable = true)))

  /** REAL PCM signal features — the step past [[decodeWavBytes]]'s header
    * arithmetic: decodes every sample of a WAV `data` chunk (integer PCM,
    * format tag 1; 8-bit unsigned, 16/24/32-bit signed LE) to [-1, 1] and
    * computes count, RMS, peak |amplitude|, DC offset (mean), and the
    * fraction of full-scale (clipped) samples — the audio quality/filter
    * signals a curation pipeline gates on (silence ⇒ rms≈0, clipping ⇒
    * clipped_frac>0, DC bias ⇒ |dc_offset|≫0). Channels are interleaved
    * and pooled. Non-WAV, non-integer-PCM (float/compressed), or
    * sample-less payloads yield nulls; a data chunk longer than the
    * payload is computed over the bytes actually present (truncation
    * never fakes samples). Linear in payload bytes, no allocation per
    * sample. */
  private[ext] def pcmSignalBytes(bytes: Array[Byte]): Row = {
    val nulls = Row(null, null, null, null, null)
    if (bytes == null || bytes.length < 12) return nulls
    try {
      def tag(o: Long): String = new String(bytes, o.toInt, 4, "US-ASCII")
      def le16(o: Long): Int = (bytes(o.toInt) & 0xff) | ((bytes(o.toInt + 1) & 0xff) << 8)
      def le32(o: Long): Long = ((bytes(o.toInt) & 0xff).toLong |
        ((bytes(o.toInt + 1) & 0xff).toLong << 8) |
        ((bytes(o.toInt + 2) & 0xff).toLong << 16) |
        ((bytes(o.toInt + 3) & 0xff).toLong << 24))
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return nulls
      var off = 12L
      var fmtTag = -1; var bits = -1
      var dataOff = -1L; var dataLen = -1L
      while (off + 8 <= bytes.length) {
        val t = tag(off)
        val len = le32(off + 4)
        if (t == "fmt " && len >= 16 && off + 8 + 16 <= bytes.length) {
          fmtTag = le16(off + 8); bits = le16(off + 22)
        }
        if (t == "data" && dataOff < 0) { dataOff = off + 8; dataLen = len }
        off += 8L + len + (len & 1L)
      }
      if (fmtTag != 1 || dataOff < 0) return nulls
      val bytesPer = bits / 8
      if (!Set(8, 16, 24, 32).contains(bits)) return nulls
      val end = math.min(dataOff + dataLen, bytes.length.toLong).toInt
      val n = (end - dataOff.toInt) / bytesPer
      if (n <= 0) return nulls
      val fullScale = (1L << (bits - 1)).toDouble
      var i = dataOff.toInt
      var sumSq = 0.0; var sum = 0.0; var peak = 0.0; var clipped = 0L
      var k = 0
      while (k < n) {
        val raw: Long = bits match {
          case 8  => (bytes(i) & 0xff).toLong - 128L
          case 16 => le16(i).toShort.toLong
          case 24 => // sign-extend 3-byte LE
            (((bytes(i) & 0xffL) | (bytes(i + 1) & 0xffL) << 8 |
              (bytes(i + 2) & 0xffL) << 16) << 40) >> 40
          case _  => le32(i).toInt.toLong
        }
        val v = raw / fullScale
        sumSq += v * v; sum += v
        val a = math.abs(v)
        if (a > peak) peak = a
        if (raw == -fullScale.toLong || raw == fullScale.toLong - 1) clipped += 1
        i += bytesPer; k += 1
      }
      Row(n.toLong, math.sqrt(sumSq / n), peak, sum / n, clipped.toDouble / n)
    } catch {
      case _: Exception => nulls
    }
  }

  /** PCM signal-feature extraction over batches: appends
    * [[audioSignalSchema]] — real per-sample decode, same partition-batch
    * shape as [[decodeImages]]. */
  def audioSignalFeatures(df: DataFrame, binCol: String,
                          featCol: String = "signal"): DataFrame = {
    val schema = df.schema.add(StructField(featCol, audioSignalSchema, nullable = true))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ pcmSignalBytes(bytes))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** WAV audio feature extraction over batches: appends
    * `audioFeatureSchema` columns — real header arithmetic, same
    * partition-batch shape as [[decodeImages]]. */
  def decodeAudio(df: DataFrame, binCol: String,
                  featCol: String = "audio"): DataFrame = {
    val schema = df.schema.add(StructField(featCol, audioFeatureSchema, nullable = true))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decodeWavBytes(bytes))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** REAL single-payload resize kernel: decode (same reader/bomb-cap
    * discipline as [[decodeImageBytes]]), nearest-neighbor scale via
    * `java.awt.image.AffineTransformOp` (pure-Java arithmetic —
    * deterministic across JVMs, no antialiasing), re-encode as PNG
    * (lossless, JDK writer). Returns null for payloads no JDK codec
    * claims, corrupt bodies, or declared bombs — a resize pipeline must
    * not fabricate pixels. */
  private[ext] def resizeImageBytes(bytes: Array[Byte], targetW: Int,
                                    targetH: Int): Array[Byte] = {
    if (bytes == null || bytes.length < 4) return null
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val img =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return null
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val dw = reader.getWidth(0)
            val dh = reader.getHeight(0)
            if (dw.toLong * dh > MaxDecodePixels || dw <= 0 || dh <= 0) return null
            reader.read(0)
          } finally reader.dispose()
        } finally iis.close()
      // normalize to a direct-color raster first: AffineTransformOp on a
      // palette-indexed source would interpolate palette INDICES
      val rgb = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = rgb.createGraphics()
      try g.drawImage(img, 0, 0, null) finally g.dispose()
      val op = new java.awt.image.AffineTransformOp(
        java.awt.geom.AffineTransform.getScaleInstance(
          targetW.toDouble / rgb.getWidth, targetH.toDouble / rgb.getHeight),
        java.awt.image.AffineTransformOp.TYPE_NEAREST_NEIGHBOR)
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      op.filter(rgb, out)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: OutOfMemoryError => null
    }
  }

  /** REAL image resize over batches: appends a `resizedCol` binary column
    * holding the nearest-neighbor-scaled payload re-encoded as PNG (null
    * where the source is undecodable) — same partition-batch shape as
    * [[decodeImages]], JDK-only kernel ([[resizeImageBytes]]). */
  def resizeImages(df: DataFrame, binCol: String, targetW: Int, targetH: Int,
                   resizedCol: String = "resized"): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions must be positive, got ${targetW}x$targetH")
    // the decode side caps DECLARED source pixels per payload; the target
    // is a job-wide constant, so an over-cap request fails fast here
    // instead of allocating a multi-GB raster per row on the executors
    require(targetW.toLong * targetH <= MaxDecodePixels,
      s"target ${targetW}x$targetH exceeds the $MaxDecodePixels-pixel decode cap")
    val schema = df.schema.add(StructField(resizedCol, BinaryType, nullable = true))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ resizeImageBytes(bytes, targetW, targetH))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** STUB byte-offset frame sampling: emits `n` deterministic frame
    * offsets per payload as an array of (frame_idx, byte_offset) structs —
    * the fan-out/explode shape a pipeline consumes when the codec needs an
    * external decoder. For the containers a stock JDK CAN read end-to-end
    * — animated GIF (multi-image ImageIO) and MJPEG-AVI (RIFF demux +
    * JPEG ImageIO, [[demuxAviFrames]]) — [[sampleFrameFeatures]] decodes
    * REAL frames. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int,
                   frameCol: String = "frames"): DataFrame = {
    val len = length(col(binCol)).cast("long")
    val idxs = (0 until n).map { i =>
      struct(lit(i).as("frame_idx"),
        (len * i / math.max(n, 1)).cast("long").as("byte_offset")) // sql / is double
    }
    df.withColumn(frameCol, filter(array(idxs: _*), f => len > 0))
  }

  val frameFeatureSchema: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false))), containsNull = false)

  /** Pure-JDK MJPEG-AVI demuxer: walks the RIFF chunk tree and returns
    * the payload of each video-data chunk (`##dc`/`##db`) inside the
    * `movi` list, in stream order. MJPEG stores one complete JPEG per
    * chunk, which ImageIO then decodes natively — AVI+MJPEG is the one
    * video container+codec pair a stock JDK reads end-to-end (every other
    * codec stays behind the declared [[sampleFrames]] offset stub).
    * Returns null when `bytes` is not a RIFF-AVI payload; a truncated or
    * lying chunk tree yields the frames walked so far (bounds-checked —
    * a declared size never reads past the buffer). `maxFrames` caps the
    * walk so a pathological chunk list cannot accumulate unbounded
    * frame references. */
  private[ext] def demuxAviFrames(bytes: Array[Byte],
                                  maxFrames: Int = 10000): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12) return null
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | (bytes(off + 1) & 0xffL) << 8 |
        (bytes(off + 2) & 0xffL) << 16 | (bytes(off + 3) & 0xffL) << 24
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val isData = raw"\d\ddb|\d\ddc".r
    // walk children of [start, end); recurse into LISTs (movi nests rec )
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end && frames.length < maxFrames) {
        val id = fourcc(p)
        val sz = u32(p + 4)
        val dataStart = p + 8
        if (sz < 0 || dataStart + sz > end) return // lying/truncated size
        val dataEnd = dataStart + sz.toInt
        if (id == "LIST" && sz >= 4) walk(dataStart + 4, dataEnd)
        else if (isData.matches(id) && sz > 0)
          frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
        p = dataEnd + (sz.toInt & 1) // chunks pad to even offsets
      }
    }
    // RIFF size at offset 4 counts from offset 8
    walk(12, math.min(8 + u32(4), bytes.length.toLong).toInt)
    frames.toSeq
  }

  /** Evenly-spaced sample of `n` indices from 0 until num. */
  private def evenIdxs(n: Int, num: Int): Seq[Int] =
    if (n >= num) 0 until num
    else if (n == 1) Seq(0) // explicit: j*(num-1)/(n-1) is 0/0
    else (0 until n)
      .map(j => math.round(j * (num - 1).toDouble / (n - 1)).toInt)
      .distinct

  /** Catalyst schema of [[mp4Meta]]'s output struct. */
  val mp4MetaSchema: StructType = StructType(Seq(
    StructField("major_brand", StringType, nullable = true),
    StructField("timescale", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("codecs", ArrayType(StringType, containsNull = false),
      nullable = true)))

  /** REAL pure-JDK MP4 (ISO-BMFF) METADATA box-walk: `ftyp` major brand,
    * `mvhd` timescale + duration (both header versions), per-`tkhd`
    * track count and the first non-zero 16.16-fixed track dimensions,
    * and every `stsd` sample-entry codec fourcc in file order
    * (avc1/hvc1/mp4a/…). Metadata only — FRAME DECODE for these codecs
    * stays behind the declared [[sampleFrames]] stub: no pure-JDK
    * H.264/HEVC/AAC decoder exists (env-blocked, same contract as the
    * non-MJPEG video paths; the reference's multimedia surface has no
    * counterpart either). Bounds-checked like [[demuxAviFrames]]: a
    * declared box size never reads past the buffer, a lying/truncated
    * tree yields the fields walked so far, a non-BMFF payload yields the
    * all-null row — one corrupt payload can never kill the job. Handles
    * 64-bit `largesize` boxes and caps recursion (a box cycle cannot
    * stack-overflow an executor). */
  private[ext] def parseMp4Meta(bytes: Array[Byte]): Row = {
    val empty = Row(null, null, null, null, null, null, null)
    if (bytes == null || bytes.length < 16) return empty
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) << 24 | (bytes(off + 1) & 0xffL) << 16 |
        (bytes(off + 2) & 0xffL) << 8 | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long = u32(off) << 32 | u32(off + 4)
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var width = -1
    var height = -1
    var sawBox = false
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 8) return
      var p = start
      while (p + 8 <= end) {
        val declared = u32(p)
        val typ = fourcc(p + 4)
        val (hdr, size) =
          if (declared == 1L) {
            if (p + 16 > end) return
            (16, u64(p + 8))
          } else if (declared == 0L) (8, (end - p).toLong) // box runs to end
          else (8, declared)
        val ds = p + hdr
        val boxEnd = p + size
        if (size < hdr || boxEnd > end) return // lying/truncated size
        val be = boxEnd.toInt
        sawBox = true
        typ match {
          case t if containers(t) => walk(ds, be, depth + 1)
          case "ftyp" if brand == null && ds + 4 <= be =>
            brand = fourcc(ds)
          case "mvhd" if ds + 4 <= be =>
            val v = bytes(ds) & 0xff
            if (v == 1 && ds + 32 <= be) {
              timescale = u32(ds + 20); duration = u64(ds + 24)
            } else if (v == 0 && ds + 20 <= be) {
              timescale = u32(ds + 12); duration = u32(ds + 16)
            }
          case "tkhd" if ds + 4 <= be =>
            nTracks += 1
            val v = bytes(ds) & 0xff
            val wOff = if (v == 1) ds + 88 else ds + 76
            if (wOff + 8 <= be && width <= 0) {
              val w = (u32(wOff) >> 16).toInt   // 16.16 fixed point
              val h = (u32(wOff + 4) >> 16).toInt
              if (w > 0 && h > 0) { width = w; height = h }
            }
          case "stsd" if ds + 8 <= be =>
            val nEntries = u32(ds + 4)
            var q = ds + 8
            var e = 0L
            while (e < nEntries && q + 8 <= be) {
              val esz = u32(q)
              if (esz < 8 || q + esz > be) { e = nEntries } // lying entry
              else {
                codecs += fourcc(q + 4)
                q += esz.toInt
                e += 1
              }
            }
          case _ => ()
        }
        p = be
      }
    }
    walk(0, bytes.length, 0)
    // a payload with no recognizable BMFF structure is not an mp4 —
    // all-null instead of a half-empty row
    if (!sawBox || (brand == null && timescale < 0 && nTracks == 0)) return empty
    val durMs: Any =
      // overflow guard: a hostile v1 mvhd can declare a 64-bit duration
      // past Long.MaxValue/1000 — the multiply would wrap and emit
      // garbage (possibly negative) where the contract says value-or-null
      if (timescale > 0 && duration >= 0 &&
        duration <= Long.MaxValue / 1000L) java.lang.Long.valueOf(
        duration * 1000L / timescale)
      else null
    Row(brand,
      if (timescale > 0) java.lang.Long.valueOf(timescale) else null,
      durMs,
      java.lang.Integer.valueOf(nTracks),
      if (width > 0) java.lang.Integer.valueOf(width) else null,
      if (height > 0) java.lang.Integer.valueOf(height) else null,
      codecs.toSeq)
  }

  /** Append an [[mp4MetaSchema]] struct parsed from `binCol` — the video
    * analog of [[withMetadata]]: header-arithmetic only, no decode, so it
    * runs at scan speed over opaque binary columns. Non-MP4 payloads get
    * the all-null struct. */
  def mp4Meta(df: DataFrame, binCol: String,
              metaCol: String = "mp4"): DataFrame = {
    val schema = df.schema.add(StructField(metaCol, mp4MetaSchema, nullable = true))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions(_.map { r =>
      val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
      Row.fromSeq(r.toSeq :+ parseMp4Meta(bytes))
    })
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** REAL multi-frame sampling kernel: up to `n` evenly-spaced frames of
    * a multi-frame container — MJPEG-AVI (RIFF demux, [[demuxAviFrames]])
    * or any multi-image ImageIO container (animated GIF in a stock JDK) —
    * each decoded to (frame_idx, width, height, mean_intensity).
    * Single-frame images yield one entry; payloads no reader claims,
    * corrupt bodies, and frames past the pixel cap yield null. Frames are
    * decoded AS STORED (no GIF disposal-method compositing — delta frames
    * stay deltas). */
  private[ext] def frameFeaturesBytes(bytes: Array[Byte], n: Int): Seq[Row] = {
    if (bytes == null || bytes.length < 4 || n <= 0) return null
    val avi = demuxAviFrames(bytes)
    if (avi != null) {
      if (avi.isEmpty) return null
      val rows = evenIdxs(n, avi.length).map { i =>
        val img = decodeBoundedImage(avi(i))
        if (img == null) null
        else {
          val (_, mean) = imageStats(img)
          Row(i, img.getWidth, img.getHeight, mean)
        }
      }.filter(_ != null)
      return if (rows.isEmpty) null else rows
    }
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          // seekForwardOnly = false: getNumImages(true) must count ahead
          reader.setInput(iis, false, true)
          val num = reader.getNumImages(true)
          if (num <= 0) return null
          evenIdxs(n, num).map { i =>
            val dw = reader.getWidth(i)
            val dh = reader.getHeight(i)
            if (dw.toLong * dh > MaxDecodePixels || dw <= 0 || dh <= 0) null
            else {
              val (_, mean) = imageStats(reader.read(i))
              Row(i, dw, dh, mean)
            }
          }.filter(_ != null)
        } finally reader.dispose()
      } finally iis.close()
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: OutOfMemoryError => null
    }
  }

  /** Frame sampling over batches: appends `frameCol` =
    * array<(frame_idx, width, height, mean_intensity)> with up to `n`
    * evenly-spaced REAL decoded frames per payload (see
    * [[frameFeaturesBytes]]) — same partition-batch shape as
    * [[decodeImages]]. */
  def sampleFrameFeatures(df: DataFrame, binCol: String, n: Int,
                          frameCol: String = "frames"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val schema = df.schema.add(StructField(frameCol, frameFeatureSchema, nullable = true))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ frameFeaturesBytes(bytes, n))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
