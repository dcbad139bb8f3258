package graft.tools

import graft.sampling.DirectSampler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: topByKey + reservoir guard on real testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    println("== topByKey: 2 cheapest lineitems per returnflag:")
    val top = DirectSampler.topByKey(li, Seq("l_returnflag"),
      Seq("l_extendedprice", "l_orderkey", "l_linenumber"), 2)
    top.select("l_returnflag", "l_extendedprice").orderBy("l_returnflag", "l_extendedprice")
      .show(6, false)
    println("   rows: " + top.count() + " (expect 6 = 3 flags x 2)")
    // cross-check against a groupBy-min
    val mins = li.groupBy("l_returnflag").agg(min("l_extendedprice").as("m"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    val got = top.groupBy("l_returnflag").agg(min("l_extendedprice").as("m"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    println("   per-flag minima match groupBy-min: " + (mins sameElements got))

    println("== reservoir guard: n beyond the cap:")
    try {
      DirectSampler.reservoir(li, 20000000)
      println("   NO ERROR — BUG")
    } catch {
      case e: IllegalArgumentException => println("   " + e.getMessage)
    }
    spark.stop()
  }
}
