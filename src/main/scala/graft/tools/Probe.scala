package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: embeddingNearDups extremes. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val dups = emb.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(dups)

    val n = Dedup.embeddingNearDups(corpus, "vec_id", "embedding", dim,
      simThreshold = 0.99, bits = 6, tables = 8).count()
    println(s"== pairs at threshold 0.99: $n (500 constructed + any true near-dups)")

    val over = Dedup.embeddingNearDups(corpus, "vec_id", "embedding", dim,
      simThreshold = 1.01, bits = 6, tables = 8).count()
    println(s"== pairs at impossible threshold 1.01: $over (expect 0)")

    val capped = Dedup.embeddingNearDups(corpus, "vec_id", "embedding", dim,
      simThreshold = 0.99, bits = 6, tables = 8, maxBucketSize = 1).count()
    println(s"== pairs with maxBucketSize=1: $capped (expect 0 — every bucket hot)")
    spark.stop()
  }
}
