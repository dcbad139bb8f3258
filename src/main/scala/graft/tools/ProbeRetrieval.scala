package graft.tools

import graft.ext.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan audit for the retrieval surface: prints the executed plans
  * of bm25TopK and searchIvfIndex so the shuffle/broadcast shape can be
  * read directly. Not part of any gate. */
object ProbeRetrieval {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = Seq((1L, "spark join filter"), (2L, "customer order data"))
      .toDF("qid", "qtext")
    val bm = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", k = 10)
    println("==== bm25TopK plan ====")
    println(bm.queryExecution.executedPlan.toString)
    println("==== exchanges: " +
      "Exchange".r.findAllIn(bm.queryExecution.executedPlan.toString).size)
    bm.count()
  }
}
