package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probe for the round-8 operators: a synthetic ~2M-doc
  * corpus (built on the fly, never persisted to the repo) through
  * segment dedup, incremental dedup, decontamination, and mixture
  * resampling, watching for driver-memory cliffs and runaway shuffles. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](name: String)(f: => T): T = { val t0=System.nanoTime; val r=f
      println(f"[scale] $name%-30s ${(System.nanoTime-t0)/1e9}%8.1f s"); r }
    val n = 2000000L
    // ~120 chars/doc, word soup with planted shared segments and dups
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(
        when(col("id") % 7 === 0, lit("Shared Header. ")).otherwise(lit("")),
        lit("w"), (col("id") * 37 % 99991).cast("string"), lit(" body "),
        sha2(col("id").cast("string"), 256), lit(". "),
        lit("tail "), (col("id") % 1000).cast("string")).as("text"),
      (col("id") % 13).cast("string").as("lang"))
    tm("corpus materialize (count)")(println(docs.count()))
    tm("segment_dedup")(println(
      graft.ext.TextAnalysis.dedupSegmentsKeepFirst(docs, "doc_id", "text", ". ")
        .agg(sum(length(col("text")))).head()))
    val ex = docs.filter(col("doc_id") % 2 === 0)
    val inc = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(ex.limit(50000).select((col("doc_id") + n).as("doc_id"),
        col("text"), col("lang")))
    tm("incremental_dedup")(println(
      graft.ext.Dedup.newAgainst(ex, inc, "text").count()))
    val bench = docs.filter(col("doc_id") % 9973 === 0) // ~200 docs
    tm("decontaminate")(println(
      graft.ext.TextAnalysis.decontaminate(docs, "doc_id", "text",
        bench, "text", n = 40).count()))
    tm("duplicated_spans")(println(
      graft.ext.Dedup.duplicatedSpans(docs, "doc_id", "text", minLen = 100)
        .count()))
    val mixIn = docs.withColumn("score",
      ((col("doc_id") * 1103515245L + 12345L) % 1000003L).cast("double"))
    tm("mixture_resample")(println(
      graft.ext.ScoreFilter.keepTopFractionPerKey(mixIn, Seq("lang"), "score",
        Map("0" -> 0.5), 0.1, Seq("doc_id")).count()))
  }
}
