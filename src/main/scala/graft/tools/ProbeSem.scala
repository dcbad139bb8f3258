package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: run selected SparkEntry gates at verify SFs and print. */
object ProbeSem {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = sys.env.getOrElse("PROBE_QUERIES", "semdedup").split(",")
    val sfs = sys.env.getOrElse("PROBE_SFS", "sf0.001,sf0.01").split(",").toSeq
    for (sf <- sfs; n <- names) {
      val t0 = System.nanoTime()
      val dir = if (sf.startsWith("/")) sf else s"/root/testdata/$sf"
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.show(20, truncate = false)
      println(f"== $sf $n rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
