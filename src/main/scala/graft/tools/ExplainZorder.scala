package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-side plan evidence for the narrow-scan fan-out guard (r21
  * verdict #5): dumps `.explain("formatted")` of the EXACT frame
  * Layout.zorderWrite writes — once over the raw single-row-group bench
  * input (narrow: the guard must add one round-robin Exchange) and once
  * over the same rows pre-scattered into >= parallelism partitions
  * (wide: the guard must add NOTHING — the cluster-scale shape). Also
  * dumps the zorder gate's guarded single-sort comparison leg both ways.
  *
  * Usage: ExplainZorder <outDir> <suffix>   (env like Bench)
  */
object ExplainZorder {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      System.err.println(s"[explain] wrote $name")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    // wide stand-in for the cluster-scale input: same rows, but already
    // carrying >= parallelism partitions, staged to parquet so the scan
    // itself is many-split (the condition fanOutNarrow actually tests)
    val wideDir = java.nio.file.Files
      .createTempDirectory("graft_zplan_wide").toString
    li.repartition(spark.sparkContext.defaultParallelism * 2)
      .write.mode("overwrite").parquet(wideDir)
    val liWide = spark.read.parquet(wideDir)
    dump("zorder_write_narrow",
      graft.ext.Layout.zorderFrame(li, Seq("l_partkey", "l_orderkey"),
        numFiles = 16, bits = 6))
    dump("zorder_write_wide",
      graft.ext.Layout.zorderFrame(liWide, Seq("l_partkey", "l_orderkey"),
        numFiles = 16, bits = 6))
    dump("zorder_singlesort_narrow",
      graft.ext.Layout.fanOutNarrow(li)
        .repartitionByRange(16, col("l_partkey"))
        .sortWithinPartitions("l_partkey"))
    dump("zorder_singlesort_wide",
      graft.ext.Layout.fanOutNarrow(liWide)
        .repartitionByRange(16, col("l_partkey"))
        .sortWithinPartitions("l_partkey"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wideDir))
    spark.stop()
  }
}
