package graft.tools

import graft.diffy.BigDiffy
import graft.sources.GraftIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: bucketed-table diff over REAL orders data — plan shape
  * (Exchange count) bucketed vs plain. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val perturbed = o.withColumn("o_totalprice",
      when(col("o_orderkey") % 10 === 0, col("o_totalprice") + 1.0)
        .otherwise(col("o_totalprice")))
    GraftIO.writeBucketed(o, "orders_l", Seq("o_orderkey"), buckets = 8)
    GraftIO.writeBucketed(perturbed, "orders_r", Seq("o_orderkey"), buckets = 8)

    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).size

    val plainJoin = o.join(perturbed, Seq("o_orderkey"), "full_outer")
    val bucketedJoin = spark.table("orders_l")
      .join(spark.table("orders_r"), Seq("o_orderkey"), "full_outer")
    println(s"== exchanges in plain join: ${exchanges(plainJoin)} (expect 2)")
    println(s"== exchanges in bucketed join: ${exchanges(bucketedJoin)} (expect 0)")

    val g = BigDiffy.diff(spark.table("orders_l"), spark.table("orders_r"),
      Seq("o_orderkey")).globalStats.head()
    println(s"== diff over bucketed tables: total=${g.getLong(0)} diff=${g.getLong(2)} " +
      s"(expect 6000 total, 600 diff)")
    spark.stop()
  }
}
