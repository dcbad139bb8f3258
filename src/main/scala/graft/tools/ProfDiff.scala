package graft.tools

import graft.diffy.BigDiffy
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the diffy_field_stats gate — NOT part of the
  * library surface. Times each pipeline stage separately at sf0.1. */
object ProfDiff {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime(); val r = f
      println(f"== $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    spark.read.parquet(s"$dir/orders.parquet").count()  // warm scan

    // the gate's exact perturbation, shared so the profile can't drift
    def inputs() = graft.SparkEntry.diffInputs(spark, dir)

    for (round <- 1 to 2) {
      println(s"-- round $round --")
      t("full gate (check+fieldStats)") {
        val (l, r) = inputs()
        val d = BigDiffy.diff(l, r, Seq("o_orderkey"))
        d.fieldStats().count(); d.unpersist()
      }
      t("no-check fieldStats") {
        val (l, r) = inputs()
        val d = BigDiffy.diff(l, r, Seq("o_orderkey"), enforceUniqueKeys = false)
        d.fieldStats().count(); d.unpersist()
      }
      t("no-check globalStats only") {
        val (l, r) = inputs()
        val d = BigDiffy.diff(l, r, Seq("o_orderkey"), enforceUniqueKeys = false)
        d.globalStats.count(); d.unpersist()
      }
      t("bare join count") {
        val (l, r) = inputs()
        import graft.core.SchemaPaths
        SchemaPaths.keyBy(l, Seq("o_orderkey"), "__l")
          .join(SchemaPaths.keyBy(r, Seq("o_orderkey"), "__r"), Seq("__key"), "full_outer")
          .count()
      }
    }
    spark.stop()
  }
}
