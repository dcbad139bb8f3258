package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: ANN recall vs brute force on real embeddings after the
  * LshSignBits rewrite. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val q = emb.filter(col("vec_id") < 20)

    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", 5, dim,
        bits = 6, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    println(f"== recall@5 over 20 queries, 500-vector corpus: $recall%.2f " +
      s"(bf=${bf.size} lsh_hits=${(bf intersect lsh).size})")

    // determinism probe: same call twice -> identical buckets/results
    val again = Similarity.lshTopK(emb, q, "vec_id", "embedding", 5, dim,
        bits = 6, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    println(s"== deterministic across runs: ${lsh == again}")
    spark.stop()
  }
}
