package graft.tools

import graft.sampling.BigSampler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the exact-sampler gates — NOT library surface. */
object ProfSampler {
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
      println(f"== $name%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.count() // warm scan

    for (round <- 1 to 2) {
      println(s"-- round $round --")
      t("scan+hash coin only") {
        import graft.GraftFunctions._
        li.select(hashDice(Seq(col("l_orderkey"), col("l_linenumber")), "farm",
          None, graft.functions.ByteEncoding.Raw).as("c"))
          .agg(sum("c")).collect()
      }
      t("counting job (groupBy+collect)") {
        import graft.GraftFunctions._
        li.withColumn("__stratum", col("l_returnflag").cast("string"))
          .withColumn("__coin", hashDice(Seq(col("l_orderkey"), col("l_linenumber")),
            "farm", None, graft.functions.ByteEncoding.Raw))
          .withColumn("__bkt", least(floor(col("__coin") * 1024), lit(1023)).cast("int"))
          .groupBy("__stratum", "__bkt").count().collect()
      }
      t("full exact stratified gate") {
        BigSampler.sample(li, 0.1,
            BigSampler.Hashed(Seq("l_orderkey", "l_linenumber")),
            BigSampler.Stratified(Seq("l_returnflag")), exact = true)
          .groupBy(col("l_returnflag").as("stratum")).agg(count(lit(1)).as("n"))
          .orderBy("stratum").collect()
      }
      t("full exact uniform gate") {
        BigSampler.sample(li, 0.1,
            BigSampler.Hashed(Seq("l_orderkey", "l_linenumber")),
            BigSampler.Uniform(Seq("l_returnflag")), exact = true)
          .groupBy(col("l_returnflag").as("stratum")).agg(count(lit(1)).as("n"))
          .orderBy("stratum").collect()
      }
    }
    spark.stop()
  }
}
