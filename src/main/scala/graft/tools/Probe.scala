package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: simhash string fast path through simhashNearDups. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val dups = docs.select((col("doc_id") + 100000).as("doc_id"),
      expr("substring(text, 1, greatest(length(text) - 10, 20))").as("text"))
    val corpus = docs.unionByName(dups)

    val pairs = Dedup.simhashNearDups(corpus, "doc_id", "text", maxHamming = 3)
    val constructed = pairs.filter(col("id_b") === col("id_a") + 100000).count()
    println(s"== simhash pairs: ${pairs.count()} (constructed recovered: $constructed/500)")

    // edge probes through the same surface: tabs/newlines, empty, one word
    val edge = Seq((1L, "a\tb\nc  d"), (2L, "a b c d"), (3L, ""),
      (4L, "word"), (5L, "   "), (6L, "word")).toDF("doc_id", "text")
    val ep = Dedup.simhashNearDups(edge, "doc_id", "text", maxHamming = 0)
    println("== edge pairs (expect (4,6) identical single-word docs):")
    ep.show(false)
    spark.stop()
  }
}
