package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: the spark.sql.extensions config route — a FRESH session
  * built with the extension class, the spark-submit user's path. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("== SQL over extension-registered functions (fresh session):")
    spark.sql(
      """SELECT farm_hash64('hello world') AS fh,
        |       simhash('the quick brown fox') AS sh,
        |       jaccard_sorted(shingle_hashes('abcdefgh', 3),
        |                      shingle_hashes('abcdefxx', 3)) AS j
        |""".stripMargin).show(false)

    println("== end-to-end SQL dedup sketch on real documents:")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    spark.sql(
      """SELECT count(*) AS n_docs,
        |       count(DISTINCT farm_hash64(text)) AS n_distinct_fp,
        |       avg(size(shingle_hashes(text, 5))) AS avg_shingles
        |FROM documents""".stripMargin).show(false)

    println("== DESCRIBE FUNCTION works:")
    spark.sql("DESCRIBE FUNCTION farm_hash64").show(false)
    spark.stop()
  }
}
