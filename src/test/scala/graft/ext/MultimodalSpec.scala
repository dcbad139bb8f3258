package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2)
  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 3)
  private val wav = "RIFF".getBytes ++ Array[Byte](1, 2, 3, 4) ++ "WAVE".getBytes
  private lazy val df = Seq(
    (1L, jpeg), (2L, png), (3L, wav), (4L, Array[Byte](1, 2, 3, 4, 5)))
    .toDF("id", "payload")

  behavior of "multimodal metadata"

  it should "sniff container formats from magic bytes and fingerprint payloads" in {
    val m = Multimodal.withMetadata(df, "payload")
    m.select("id", "meta.format").orderBy("id").as[(Long, String)].collect() shouldBe
      Array((1L, "jpeg"), (2L, "png"), (3L, "wav"), (4L, "unknown"))
    m.select("meta.n_bytes").as[Int].collect().sum shouldBe
      jpeg.length + png.length + wav.length + 5
    m.select("meta.fingerprint").distinct().count() shouldBe 4
  }

  behavior of "decode plumbing"

  it should "null out claimed-but-corrupt payloads and stub-decode unknown formats" in {
    val out = Multimodal.decodeImages(df, "payload")
    out.schema("img").dataType shouldBe Multimodal.imageFeatureSchema
    val feats = out.select("id", "img.width", "img.height", "img.mean_intensity")
      .orderBy("id").collect()
    feats.length shouldBe 4
    // jpeg/png magic fragments: a JDK reader claims them, the body is
    // corrupt -> null features, never fake numbers for a real format
    feats(0).isNullAt(1) shouldBe true
    feats(1).isNullAt(1) shouldBe true
    // wav + unknown: no image reader claims them -> deterministic stub
    feats(2).isNullAt(1) shouldBe false
    feats(3).isNullAt(1) shouldBe false
    // deterministic: same input -> same features on re-run
    val again = Multimodal.decodeImages(df, "payload")
      .select("id", "img.width", "img.height", "img.mean_intensity")
      .orderBy("id").collect()
    feats.map(_.toString) shouldBe again.map(_.toString)
  }

  behavior of "real JDK-ImageIO decode"

  // shared fixture: RGB triples 10..180 -> mean 95.0 exactly (see
  // MultimodalFixtures — also the source of the gate's oracle constants)
  private def encoded(fmt: String): Array[Byte] =
    MultimodalFixtures.encodedImage(fmt)

  it should "decode true dimensions, channels, and mean intensity from PNG and BMP" in {
    val real = Seq((1L, encoded("png")), (2L, encoded("bmp"))).toDF("id", "payload")
    val got = Multimodal.decodeImages(real, "payload")
      .select("id", "img.width", "img.height", "img.channels", "img.mean_intensity")
      .orderBy("id").as[(Long, Int, Int, Int, Double)].collect()
    got.map(_._2).toSeq shouldBe Seq(3, 3)
    got.map(_._3).toSeq shouldBe Seq(2, 2)
    got.map(_._4).toSeq shouldBe Seq(3, 3)
    // both formats are lossless for this image
    got.map(_._5).foreach(_ shouldBe 95.0 +- 1e-9)
  }

  it should "null out a decompression-bomb payload without decoding it" in {
    // a valid tiny PNG whose IHDR is re-signed to DECLARE 30000×30000:
    // without the header-only dimension peek, ImageIO.read would allocate
    // a ~3.6 GB raster and die with OutOfMemoryError. PNG layout: 8-byte
    // signature, then IHDR = len(4) + "IHDR"(4) + data(13: width, height,
    // …) + crc(4); the CRC covers type+data, so it must be recomputed or
    // the reader rejects the chunk before the bomb check is exercised.
    val bomb = MultimodalFixtures.encodedImage("png").clone()
    def putInt(off: Int, v: Int): Unit = {
      bomb(off) = (v >>> 24).toByte; bomb(off + 1) = (v >>> 16).toByte
      bomb(off + 2) = (v >>> 8).toByte; bomb(off + 3) = v.toByte
    }
    putInt(16, 30000); putInt(20, 30000)
    val crc = new java.util.zip.CRC32
    crc.update(bomb, 12, 17) // "IHDR" + 13 data bytes
    putInt(29, crc.getValue.toInt)
    val out = Multimodal.decodeImages(Seq((1L, bomb)).toDF("id", "payload"), "payload")
      .select("img.width", "img.mean_intensity").collect()
    out(0).isNullAt(0) shouldBe true
    out(0).isNullAt(1) shouldBe true
    // the kernel itself (not just the pipeline) rejects by declared size
    Multimodal.decodeImageBytes(bomb).isNullAt(0) shouldBe true
  }

  behavior of "WAV header decode"

  private def wavBytes(ch: Int, rate: Int, bits: Int, dataLen: Int): Array[Byte] =
    MultimodalFixtures.wavBytes(ch, rate, bits, dataLen)

  it should "compute channels, rate, depth, and duration by header arithmetic" in {
    val a = Seq(
      (1L, wavBytes(1, 8000, 16, 8000)),   // 0.5 s mono
      (2L, wavBytes(2, 44100, 16, 44100 * 4)), // 1.0 s stereo
      (3L, "not audio at all".getBytes))
      .toDF("id", "payload")
    val got = Multimodal.decodeAudio(a, "payload")
      .select("id", "audio.channels", "audio.sample_rate", "audio.duration_sec")
      .orderBy("id").collect()
    (got(0).getInt(1), got(0).getInt(2), got(0).getDouble(3)) shouldBe ((1, 8000, 0.5))
    (got(1).getInt(1), got(1).getInt(2), got(1).getDouble(3)) shouldBe ((2, 44100, 1.0))
    got(2).isNullAt(1) shouldBe true
  }

  it should "null out corrupt chunk lengths instead of hanging or crashing" in {
    // a chunk length of 0xFFFFFFF8 once made the walk advance by zero
    // (infinite loop) under Int arithmetic; other corrupt lengths drove
    // the cursor out of bounds — all must yield null features
    def corrupt(lenBytes: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "WAVE".getBytes ++
        "junk".getBytes ++ lenBytes ++ Array.fill[Byte](8)(0)
    val rows = Seq(
      (1L, corrupt(Array(0xf8, 0xff, 0xff, 0xff).map(_.toByte))), // -8 as Int
      (2L, corrupt(Array(0x00, 0x00, 0x00, 0x80).map(_.toByte))), // 2^31
      (3L, "RIFF1234WAVEfm".getBytes)) // truncated mid-tag
      .toDF("id", "payload")
    val got = Multimodal.decodeAudio(rows, "payload")
      .select("id", "audio.channels").orderBy("id").collect()
    all(got.map(_.isNullAt(1))) shouldBe true
  }

  behavior of "real resize"

  it should "scale decodable payloads, preserve uniform means, null the rest" in {
    val uniform = MultimodalFixtures.uniformImage(4, 4, 100, "png")
    val real = Seq((1L, uniform), (2L, encoded("png")), (3L, wav))
      .toDF("id", "payload")
    val rs = Multimodal.resizeImages(real, "payload", 3, 3)
    val feats = Multimodal.decodeImages(rs, "resized", "rimg")
      .select("id", "rimg.width", "rimg.height", "rimg.mean_intensity")
      .orderBy("id").collect()
    // uniform 4×4 gray-100 -> 3×3, mean EXACTLY preserved whatever
    // pixels nearest-neighbor rounding picks
    (feats(0).getInt(1), feats(0).getInt(2)) shouldBe ((3, 3))
    feats(0).getDouble(3) shouldBe 100.0 +- 1e-9
    // gradient 3×2 -> 3×3: dims right, mean inside the source range
    (feats(1).getInt(1), feats(1).getInt(2)) shouldBe ((3, 3))
    feats(1).getDouble(3) should (be >= 10.0 and be <= 200.0)
    // non-image payload: resized is null end-to-end
    feats(2).isNullAt(1) shouldBe true
    rs.filter(col("id") === 3).select(col("resized").isNull)
      .as[Boolean].head() shouldBe true
    // deterministic: identical bytes on re-run
    val again = Multimodal.resizeImages(real, "payload", 3, 3)
      .select("id", "resized").as[(Long, Array[Byte])].collect().toMap
    val first = rs.select("id", "resized").as[(Long, Array[Byte])].collect().toMap
    first(1L) shouldBe again(1L)
    first(2L) shouldBe again(2L)
  }

  it should "frame-sample with stable shapes" in {
    val fr = Multimodal.sampleFrames(df, "payload", 3)
    fr.select(org.apache.spark.sql.functions.size(col("frames")))
      .as[Int].collect() shouldBe Array.fill(4)(3)
    fr.select(explode(col("frames.byte_offset"))).as[Long].collect().min shouldBe 0L
  }

  behavior of "real GIF frame sampling"

  it should "decode evenly-spaced frames with exact uniform means" in {
    // 5 uniform frames 10..50: n=3 picks 0, 2, 4 -> means exactly 10/30/50
    val gif = MultimodalFixtures.animatedGif(Seq(10, 20, 30, 40, 50), 4, 3)
    val real = Seq((1L, gif), (2L, encoded("png")), (3L, "junk!".getBytes))
      .toDF("id", "payload")
    val fr = Multimodal.sampleFrameFeatures(real, "payload", 3)
    val gifFrames = fr.filter(col("id") === 1)
      .select(explode(col("frames")).as("f"))
      .select("f.frame_idx", "f.width", "f.height", "f.mean_intensity")
      .as[(Int, Int, Int, Double)].collect().sortBy(_._1)
    gifFrames.map(_._1) shouldBe Array(0, 2, 4)
    gifFrames.map(t => (t._2, t._3)).distinct shouldBe Array((4, 3))
    gifFrames.map(_._4) shouldBe Array(10.0, 30.0, 50.0)
    // single-frame png: one entry, frame 0
    val png = fr.filter(col("id") === 2)
      .select(explode(col("frames")).as("f")).select("f.frame_idx")
      .as[Int].collect()
    png shouldBe Array(0)
    // undecodable: null array, not fake frames
    fr.filter(col("id") === 3).select(col("frames").isNull)
      .as[Boolean].head() shouldBe true
  }

  it should "sample all frames when n exceeds the frame count" in {
    val gif = MultimodalFixtures.animatedGif(Seq(60, 70), 2, 2)
    val fr = Multimodal.sampleFrameFeatures(Seq((1L, gif)).toDF("id", "payload"),
      "payload", 10)
    fr.select(explode(col("frames")).as("f"))
      .select("f.frame_idx", "f.mean_intensity").as[(Int, Double)]
      .collect().sortBy(_._1) shouldBe Array((0, 60.0), (1, 70.0))
  }

  it should "sample exactly the first frame at n = 1" in {
    val gif = MultimodalFixtures.animatedGif(Seq(60, 70, 80), 2, 2)
    Multimodal.sampleFrameFeatures(Seq((1L, gif)).toDF("id", "payload"),
        "payload", 1)
      .select(explode(col("frames")).as("f"))
      .select("f.frame_idx", "f.mean_intensity").as[(Int, Double)]
      .collect() shouldBe Array((0, 60.0))
  }

  behavior of "PCM signal features"

  it should "compute exact rms/peak/dc/clipping on power-of-two waves" in {
    // ±16384 square wave, 16-bit: normalized ±0.5 exactly
    val sq = MultimodalFixtures.pcmWav(
      Seq.tabulate(800)(i => if (i % 2 == 0) 16384L else -16384L), 1, 8000, 16)
    // constant +64 at 8-bit: normalized 0.5 exactly, DC-biased
    val dc8 = MultimodalFixtures.pcmWav(Seq.fill(100)(64L), 1, 8000, 8)
    // full-scale negative 24-bit: every sample clipped
    val clip = MultimodalFixtures.pcmWav(Seq.fill(10)(-(1L << 23)), 1, 8000, 24)
    val df = Seq((1L, sq), (2L, dc8), (3L, clip), (4L, "junk".getBytes))
      .toDF("id", "payload")
    val got = Multimodal.audioSignalFeatures(df, "payload")
      .select(col("id"), col("signal.n_samples"), col("signal.rms"),
        col("signal.peak"), col("signal.dc_offset"), col("signal.clipped_frac"))
      .as[(Long, Option[Long], Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    got(0) shouldBe ((1L, Some(800L), Some(0.5), Some(0.5), Some(0.0), Some(0.0)))
    got(1) shouldBe ((2L, Some(100L), Some(0.5), Some(0.5), Some(0.5), Some(0.0)))
    got(2) shouldBe ((3L, Some(10L), Some(1.0), Some(1.0), Some(-1.0), Some(1.0)))
    got(3) shouldBe ((4L, None, None, None, None, None))
  }

  it should "null float-PCM and compute truncated data over present bytes" in {
    // format tag 3 (IEEE float) is not integer PCM -> nulls
    val float = {
      val w = MultimodalFixtures.pcmWav(Seq.fill(4)(0L), 1, 8000, 32)
      w(20) = 3; w // patch the fmt tag
    }
    val cut = {
      val w = MultimodalFixtures.pcmWav(Seq.fill(100)(16384L), 1, 8000, 16)
      java.util.Arrays.copyOfRange(w, 0, w.length - 100) // drop 50 samples
    }
    val got = Multimodal.audioSignalFeatures(
        Seq((1L, float), (2L, cut)).toDF("id", "payload"), "payload")
      .select(col("id"), col("signal.n_samples")).as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    got(0) shouldBe ((1L, None))
    got(1) shouldBe ((2L, Some(50L)))
  }

  behavior of "real MJPEG-AVI frame sampling"

  it should "demux and decode evenly-spaced video frames" in {
    // 5 uniform frames 0..240: n=3 picks AVI frames 0, 2, 4; JPEG is
    // lossy so uniform means decode near-exactly (±3)
    val avi = MultimodalFixtures.mjpegAvi(Seq(0, 60, 120, 180, 240), 8, 6)
    Multimodal.demuxAviFrames(avi).length shouldBe 5
    val fr = Multimodal.sampleFrameFeatures(
        Seq((1L, avi)).toDF("id", "payload"), "payload", 3)
      .select(explode(col("frames")).as("f"))
      .select("f.frame_idx", "f.width", "f.height", "f.mean_intensity")
      .as[(Int, Int, Int, Double)].collect().sortBy(_._1)
    fr.map(_._1) shouldBe Array(0, 2, 4)
    fr.map(t => (t._2, t._3)).distinct shouldBe Array((8, 6))
    fr.map(_._4).zip(Seq(0.0, 120.0, 240.0)).foreach { case (got, want) =>
      got shouldBe want +- 3.0
    }
  }

  it should "treat truncated and non-AVI RIFF payloads safely" in {
    val avi = MultimodalFixtures.mjpegAvi(Seq(50, 100), 4, 4)
    // truncation mid-chunk: the walk stops at the last complete frame
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - 10)
    Multimodal.demuxAviFrames(cut).length should be <= 2
    // WAV is RIFF but not AVI: not claimed by the demuxer
    Multimodal.demuxAviFrames(
      MultimodalFixtures.wavBytes(1, 8000, 16, 100)) shouldBe null
    Multimodal.demuxAviFrames("junk".getBytes) shouldBe null
    // a movi-less AVI yields a null frames column, not fake entries
    Multimodal.sampleFrameFeatures(
        Seq((1L, java.util.Arrays.copyOfRange(avi, 0, 12)))
          .toDF("id", "payload"), "payload", 2)
      .select(col("frames").isNull).as[Boolean].head() shouldBe true
  }

  behavior of "MP4 metadata box-walk"

  it should "parse brand, duration, track dims, and codec from the fixture" in {
    val mp4 = MultimodalFixtures.mp4Bytes(brand = "isom", timescale = 600,
      duration = 1200, width = 320, height = 240, codec = "avc1")
    Seq(Tuple1(mp4)).toDF("b").select(Multimodal.sniffFormat(col("b")))
      .as[String].head() shouldBe "mp4"
    val row = Multimodal.parseMp4Meta(mp4)
    row.getString(0) shouldBe "isom"
    row.getLong(1) shouldBe 600L
    row.getLong(2) shouldBe 2000L // 1200 / 600 ticks = 2 s
    row.getInt(3) shouldBe 1
    row.getInt(4) shouldBe 320
    row.getInt(5) shouldBe 240
    row.getSeq[String](6) shouldBe Seq("avc1")
    // the DataFrame path carries the same fields under mp4MetaSchema
    val got = Multimodal.mp4Meta(Seq((1L, mp4)).toDF("id", "payload"), "payload")
      .select(col("mp4.major_brand"), col("mp4.duration_ms"),
        col("mp4.width"), col("mp4.codecs")(0))
      .as[(String, Long, Int, String)].head()
    got shouldBe (("isom", 2000L, 320, "avc1"))
  }

  it should "parse a version-1 mvhd and 64-bit largesize boxes" in {
    val mvhd1 = {
      val p = java.nio.ByteBuffer.allocate(112) // v1 payload
      p.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
      p.putLong(0L).putLong(0L)                 // creation, modification
      p.putInt(90000).putLong(270000L)          // timescale, duration (3 s)
      p.array()
    }
    val mvhdBox = java.nio.ByteBuffer.allocate(8 + mvhd1.length)
      .putInt(8 + mvhd1.length).put("mvhd".getBytes("US-ASCII"))
      .put(mvhd1).array()
    // moov wrapped with size==1 + 64-bit largesize
    val largeMoov = {
      val b = java.nio.ByteBuffer.allocate(16 + mvhdBox.length)
      b.putInt(1).put("moov".getBytes("US-ASCII"))
        .putLong(16L + mvhdBox.length).put(mvhdBox).array()
    }
    val ftyp = java.util.Arrays.copyOfRange(
      MultimodalFixtures.mp4Bytes(), 0, 20)
    val row = Multimodal.parseMp4Meta(ftyp ++ largeMoov)
    row.getLong(1) shouldBe 90000L
    row.getLong(2) shouldBe 3000L
  }

  it should "null duration_ms when a hostile v1 duration would overflow the millis multiply" in {
    val mvhd1 = {
      val p = java.nio.ByteBuffer.allocate(112)
      p.put(1.toByte).put(Array[Byte](0, 0, 0))
      p.putLong(0L).putLong(0L)
      p.putInt(90000).putLong(Long.MaxValue / 500L) // * 1000 would wrap
      p.array()
    }
    val mvhdBox = java.nio.ByteBuffer.allocate(8 + mvhd1.length)
      .putInt(8 + mvhd1.length).put("mvhd".getBytes("US-ASCII"))
      .put(mvhd1).array()
    val moov = java.nio.ByteBuffer.allocate(8 + mvhdBox.length)
      .putInt(8 + mvhdBox.length).put("moov".getBytes("US-ASCII"))
      .put(mvhdBox).array()
    val ftyp = java.util.Arrays.copyOfRange(MultimodalFixtures.mp4Bytes(), 0, 20)
    val row = Multimodal.parseMp4Meta(ftyp ++ moov)
    row.getLong(1) shouldBe 90000L // timescale still parsed
    row.isNullAt(2) shouldBe true  // duration_ms value-or-NULL, never garbage
  }

  it should "yield all-null for non-BMFF payloads and survive lying sizes" in {
    val wavRow = Multimodal.parseMp4Meta(MultimodalFixtures.wavBytes(1, 8000, 16, 100))
    (0 until 7).foreach(i => assert(wavRow.isNullAt(i),
      s"field $i of a WAV payload must be null"))
    Multimodal.parseMp4Meta("junk".getBytes).toSeq.forall(_ == null) shouldBe true
    Multimodal.parseMp4Meta(null).toSeq.forall(_ == null) shouldBe true
    // truncation mid-moov: the walk keeps the fields it completed
    val mp4 = MultimodalFixtures.mp4Bytes()
    val cut = java.util.Arrays.copyOfRange(mp4, 0, mp4.length - 30)
    val row = Multimodal.parseMp4Meta(cut)
    row.getString(0) shouldBe "isom" // ftyp still parsed
    // a box declaring a size past the buffer must not read past it
    val lying = mp4.clone()
    lying(20) = 0x7f.toByte // inflate moov's declared size
    noException should be thrownBy Multimodal.parseMp4Meta(lying)
  }
}
