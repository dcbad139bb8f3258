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
      t("two-pass accumulator variant (probe)") {
        twoPassExactStratified(li, 0.1)
          .groupBy(col("l_returnflag").as("stratum")).agg(count(lit(1)).as("n"))
          .orderBy("stratum").collect()
      }
    }
    // correctness cross-check, untimed: with the SAME deterministic coin
    // both designs must select the per-stratum smallest-coin rows — the
    // exact same multiset, not just the same counts
    {
      import spark.implicits._
      val a = BigSampler.sample(li, 0.1,
          BigSampler.Hashed(Seq("l_orderkey", "l_linenumber")),
          BigSampler.Stratified(Seq("l_returnflag")), exact = true)
        .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
      val b = twoPassExactStratified(li, 0.1)
        .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
      println(s"== cross-check: rank-cut == two-pass multiset: ${a == b} " +
        s"(${a.size} vs ${b.size} rows)")
    }
    spark.stop()
  }

  /** PROBE implementation of the sampleByKeyExact-style TWO-PASS
    * accumulator design for the exact stratified sample (SURVEY §7.4.4
    * open note), measured against the shipped recursive histogram-cut:
    * pass 1 exact per-stratum counts → targets; pass 2 accept every row
    * whose deterministic coin is below a Chernoff-safe low threshold
    * outright, window-sort ONLY the [lo, hi) waitlist band and take the
    * remainder in coin order. Same deterministic coin as the shipped
    * sampler, so the selected multiset must be identical. The waitlist
    * band is sized like RDD.sampleByKeyExact's acceptance bound
    * (±5σ of the binomial at the cut, floored for small strata). */
  private def twoPassExactStratified(df: org.apache.spark.sql.DataFrame,
                                     fraction: Double)
      : org.apache.spark.sql.DataFrame = {
    import graft.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val coined = df
      .withColumn("__stratum", col("l_returnflag").cast("string"))
      .withColumn("__coin", hashDice(Seq(col("l_orderkey"), col("l_linenumber")),
        "farm", None, graft.functions.ByteEncoding.Raw))
    // pass 1: exact counts -> targets (the shipped rounding: ceil(n*p))
    val counts = coined.groupBy("__stratum").count().as[(String, Long)]
      .collect().toMap
    val bands = counts.toSeq.map { case (s, n) =>
      val t = math.ceil(n * fraction).toLong
      val p0 = if (n == 0) 0.0 else t.toDouble / n
      val sigma = math.sqrt(p0 * (1 - p0) / math.max(1L, n))
      val lo = math.max(0.0, p0 - 5 * sigma - 16.0 / math.max(1L, n))
      val hi = math.min(1.0, p0 + 5 * sigma + 16.0 / math.max(1L, n))
      (s, t, lo, hi)
    }
    val bandDf = broadcast(bands.toDF("__stratum", "__t", "__lo", "__hi"))
    val j = coined.join(bandDf, "__stratum")
    val accepted = j.filter(col("__coin") < col("__lo"))
    // how many each stratum still needs comes from the accepted counts
    // (second full pass — the price of not histogramming)
    val accCounts = accepted.groupBy("__stratum").count().as[(String, Long)]
      .collect().toMap
    val needDf = broadcast(bands.map { case (s, t, _, _) =>
      val need = t - accCounts.getOrElse(s, 0L)
      // need < 0 means MORE rows were accepted than the target, i.e. the
      // acceptance cut (lo) was set too HIGH — name that, not the band
      require(need >= 0, s"acceptance cut (lo) too high for stratum '$s': " +
        s"accepted ${accCounts.getOrElse(s, 0L)} exceeds target $t")
      (s, need)
    }.toDF("__stratum", "__need"))
    val waitBand = j
      .filter(col("__coin") >= col("__lo") && col("__coin") < col("__hi"))
    // symmetric band validation: a too-low `hi` would silently
    // undersample (fewer waitlist rows than needed) and read as a design
    // inequivalence in the cross-check instead of a band bug — fail here
    val waitCounts = waitBand.groupBy("__stratum").count()
      .as[(String, Long)].collect().toMap
    bands.foreach { case (s, t, _, _) =>
      val need = t - accCounts.getOrElse(s, 0L)
      require(waitCounts.getOrElse(s, 0L) >= need,
        s"waitlist band too high for $s: " +
          s"${waitCounts.getOrElse(s, 0L)} banded rows < $need needed")
    }
    val waitlisted = waitBand
      .join(needDf, "__stratum")
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy("__stratum").orderBy("__coin")))
      .filter(col("__rn") <= col("__need"))
      .drop("__rn", "__need")
    accepted.unionByName(waitlisted)
      .drop("__stratum", "__coin", "__t", "__lo", "__hi")
  }
}
