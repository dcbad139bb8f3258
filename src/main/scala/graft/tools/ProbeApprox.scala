package graft.tools

import graft.sampling.BigSampler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement probe for the approximate sampler tolerance gates
  * (sample_stratified_approx_tol / sample_uniform_approx_tol): prints the
  * achieved per-stratum fraction/count deviation for both coins at a given
  * SF dir so the gate bands can be set with measured margin instead of
  * guessed. Not part of the shipped surface. */
object ProbeApprox {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the SAME deliberately skewed 60/30/10 derived stratum the tolerance
    // gates band (sample_stratified_approx_tol / sample_uniform_approx_tol)
    // -- measuring the natural near-equal l_returnflag strata instead
    // would calibrate the bands against the wrong distribution (the 10%
    // stratum 'c' is the one whose margin is tightest)
    val li = spark.read.parquet(s"$dir/lineitem.parquet").withColumn("grp",
      when(col("l_orderkey") % 10 < 6, "a")
        .when(col("l_orderkey") % 10 < 9, "b").otherwise("c"))
    val coins: Seq[(String, BigSampler.Determinism)] = Seq(
      "hash" -> BigSampler.Hashed(Seq("l_orderkey", "l_linenumber")),
      "random" -> BigSampler.Random(42L))
    val totals = li.groupBy(col("grp").as("stratum"))
      .agg(count(lit(1)).as("n_total"))
    val grand = li.count()
    val nStrata = totals.count()
    val pop = grand * 0.1 / nStrata
    for ((name, det) <- coins) {
      val strat = BigSampler.sample(li, 0.1, det,
          BigSampler.Stratified(Seq("grp")))
        .groupBy(col("grp").as("stratum"))
        .agg(count(lit(1)).as("n_samp"))
        .join(totals, "stratum").orderBy("stratum").collect()
      strat.foreach { r =>
        val f = r.getAs[Long]("n_samp").toDouble / r.getAs[Long]("n_total")
        println(f"STRAT $name%-6s ${r.getString(0)}%-2s frac=$f%.5f dev=${math.abs(f - 0.1)}%.5f")
      }
      val uni = BigSampler.sample(li, 0.1, det,
          BigSampler.Uniform(Seq("grp")))
        .groupBy(col("grp").as("stratum"))
        .agg(count(lit(1)).as("n_samp"))
        .join(totals, "stratum").orderBy("stratum").collect()
      uni.foreach { r =>
        val expected = math.min(pop, r.getAs[Long]("n_total").toDouble)
        val n = r.getAs[Long]("n_samp")
        println(f"UNI   $name%-6s ${r.getString(0)}%-2s n=$n exp=$expected%.1f " +
          f"reldev=${math.abs(n - expected) / expected}%.4f")
      }
    }
    spark.stop()
  }
}
