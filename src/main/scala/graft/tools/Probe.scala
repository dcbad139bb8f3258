package graft.tools

import graft.ext.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: multimodal pipeline end-to-end on real documents. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .withColumn("payload", encode(col("text"), "UTF-8"))

    val meta = Multimodal.withMetadata(docs, "payload")
    println("== metadata:")
    meta.select("doc_id", "meta.n_bytes", "meta.format", "meta.fingerprint").show(3, false)

    val dec = Multimodal.decodeImages(meta, "payload")
    val fr = Multimodal.sampleFrames(
      Multimodal.resizeImages(dec, "img", 224, 224), "payload", 4)
    println("== decoded+resized+frames:")
    fr.select("doc_id", "img.width", "img.mean_intensity", "frames").show(3, false)
    println("== frame offsets monotone per row: " +
      fr.select(expr("forall(zip_with(frames.byte_offset, slice(frames.byte_offset, 2, 3), (a, b) -> b >= a), x -> x or x is null)"))
        .distinct().collect().mkString(","))

    // probe: zero-length payload
    import spark.implicits._
    val edge = Seq((1L, Array.empty[Byte]), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    println("== empty/null payloads:")
    Multimodal.sampleFrames(Multimodal.decodeImages(
      Multimodal.withMetadata(edge, "payload"), "payload"), "payload", 3)
      .select("id", "meta", "img", "frames").show(false)
    spark.stop()
  }
}
