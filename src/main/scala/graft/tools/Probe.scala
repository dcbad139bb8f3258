package graft.tools

import graft.sampling.BigSampler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: R7 distribution assertion on real testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val sampled = BigSampler.sample(li, 0.1,
      BigSampler.Hashed(Seq("l_orderkey", "l_linenumber")),
      BigSampler.Stratified(Seq("l_returnflag")), exact = true)

    println("== assertion at the true target (0.1, tol 0.01): expect silence")
    BigSampler.assertDistribution(li, sampled, Seq("l_returnflag"), 0.1)
    println("   passed")

    println("== assertion at a wrong target (0.25): expect throw w/ strata detail")
    try {
      BigSampler.assertDistribution(li, sampled, Seq("l_returnflag"), 0.25)
      println("   NO ERROR — BUG")
    } catch {
      case e: IllegalStateException => println("   " + e.getMessage)
    }

    println("== approximate arm within loose tolerance (0.1 +- 0.02):")
    val approx = BigSampler.sample(li, 0.1, BigSampler.Random(3L),
      BigSampler.Stratified(Seq("l_returnflag")))
    BigSampler.assertDistribution(li, approx, Seq("l_returnflag"), 0.1, 0.02)
    println("   passed")
    spark.stop()
  }
}
