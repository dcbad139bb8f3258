package graft.tools

import graft.streaming.StreamOps
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: drive the streaming surface with a real file stream —
  * readStream over json files arriving in a directory, like production. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("stream").toString
    val in = s"$dir/in"; new java.io.File(in).mkdirs()

    // batch 1 lands before the stream starts
    Seq((1L, "2026-01-01T00:00:01", "the quick brown fox"),
      (2L, "2026-01-01T00:00:02", "THE  quick brown fox"),
      (3L, "2026-01-01T00:00:03", "unrelated content here"))
      .toDF("id", "ts_s", "text").write.json(s"$in/b1")

    val schema = "id LONG, ts_s STRING, text STRING"
    val stream = spark.readStream.schema(schema).json(s"$in/*")
      .withColumn("ts", col("ts_s").cast("timestamp"))

    val scored = StreamOps.scoreEvents(
      StreamOps.dedupByContent(
        StreamOps.hashSample(stream, 1.0, Seq("id")), "text", "ts", "1 minute"),
      "text")
    val q = scored.select("id", "n_tokens", "lang_pred", "fingerprint")
      .writeStream.format("memory").queryName("probe_stream")
      .outputMode("append").start()
    q.processAllAvailable()

    // batch 2 arrives while running: one more dup of id 3, one new doc
    Seq((4L, "2026-01-01T00:00:04", "unrelated  CONTENT here"),
      (5L, "2026-01-01T00:00:05", "fresh document entirely"))
      .toDF("id", "ts_s", "text").write.json(s"$in/b2")
    q.processAllAvailable(); q.stop()

    println("== streamed, deduped, scored (expect ids 1,3,5; 2 and 4 are dups):")
    spark.table("probe_stream").orderBy("id").show(false)
    spark.stop()
  }
}
