package graft.tools

import graft.GraftFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Min planted-pair Jaccard for several truncation depths. */
object ProbeJJ2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(col("doc_id"), col("text"))
      for (drop <- Seq(3, 4, 6, 10)) {
        val j = docs.select(
            shingleHashes(col("text"), 5).as("a"),
            shingleHashes(expr(s"substring(text, 1, greatest(length(text) - $drop, 20))"), 5).as("b"))
          .filter(size(col("a")) > 0 && size(col("b")) > 0)
          .select(jaccardSorted(col("a"), col("b")).as("j"))
          .agg(min("j"), avg("j")).first()
        println(f"$sf drop=$drop min=${j.getDouble(0)}%.3f avg=${j.getDouble(1)}%.3f")
      }
    }
    spark.stop()
  }
}
