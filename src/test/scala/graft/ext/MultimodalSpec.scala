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

  it should "append image features per batch with deterministic stub values" in {
    val out = Multimodal.decodeImages(df, "payload")
    out.schema("img").dataType shouldBe Multimodal.imageFeatureSchema
    val feats = out.select("id", "img.width", "img.height", "img.mean_intensity")
      .orderBy("id").collect()
    feats.length shouldBe 4
    // deterministic: same input -> same features on re-run
    val again = Multimodal.decodeImages(df, "payload")
      .select("id", "img.width", "img.height", "img.mean_intensity")
      .orderBy("id").collect()
    feats.map(_.toString) shouldBe again.map(_.toString)
    all(feats.map(_.getInt(1))) should be > 0
  }

  it should "resize and frame-sample with stable shapes" in {
    val dec = Multimodal.decodeImages(df, "payload")
    val rs = Multimodal.resizeImages(dec, "img", 64, 64)
    rs.select("img.width").distinct().as[Int].collect() shouldBe Array(64)
    val fr = Multimodal.sampleFrames(df, "payload", 3)
    fr.select(org.apache.spark.sql.functions.size(col("frames")))
      .as[Int].collect() shouldBe Array.fill(4)(3)
    fr.select(explode(col("frames.byte_offset"))).as[Long].collect().min shouldBe 0L
  }
}
