package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named SparkEntry gates to files —
  * the plan evidence the optimization rounds commit under plans/.
  *
  * Usage: ExplainDump <outDir> <suffix> <gate> [gate...]
  * Writes <outDir>/<gate>_<suffix>.txt. Runs under the Bench session
  * shape. Building a gate's DataFrame executes its eager fixture work
  * (index builds, checkpoints); the final plan is what is dumped.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val gates = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    gates.foreach { g =>
      graft.SparkEntry.queries.get(g) match {
        case None => System.err.println(s"[explain] unknown gate: $g")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${g}_$suffix.txt"), plan)
            System.err.println(s"[explain] wrote $g")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $g FAILED: ${e.getMessage}")
          }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
