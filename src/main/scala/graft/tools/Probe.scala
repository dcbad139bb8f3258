package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch probe: degenerate inputs through the dedup surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and agaiN"),
      (3L, "abc"),                 // shorter than shingleLen=5
      (4L, ""),                    // empty
      (5L, "   "),                 // whitespace only
      (6L, "completely different text with other words entirely here")
    ).toDF("doc_id", "text")

    val out = Dedup.minhashNearDups(corpus, "doc_id", "text",
      numHashes = 64, bands = 32, shingleLen = 5, threshold = 0.5)
    println("== pairs:")
    out.orderBy("id_a", "id_b").show(false)

    val sim = Dedup.simhashNearDups(corpus, "doc_id", "text", maxHamming = 3, chunks = 4)
    println("== simhash pairs:")
    sim.orderBy("id_a", "id_b").show(false)
    spark.stop()
  }
}
