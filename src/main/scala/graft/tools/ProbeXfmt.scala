package graft.tools

import graft.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: where do hash_cross_format's audit seconds go?
  * Times each leg of the gate separately (avro write / avro read+sig /
  * json write / json read+sig / cohorts+exceptAll). */
object ProbeXfmt {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_xfmt_probe").toString
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_returnflag", "l_shipdate")
    val li = spark.read.parquet(s"$sf/lineitem.parquet").select(cols.map(col): _*)
    println("rows=" + li.count())
    val sharded = time("repartition")(
      { val r = li.repartition(spark.sparkContext.defaultParallelism); r.count(); r })
    time("avro write")(graft.sources.AvroIO.write(sharded, s"$tmp/avro"))
    time("json write")(graft.sources.GraftIO.writeJsonLines(sharded, s"$tmp/json"))
    val avro = time("avro read+checkpoint")(
      graft.sources.AvroIO.read(spark, s"$tmp/avro").localCheckpoint(true))
    val json = graft.sources.GraftIO.readJsonLines(spark, s"$tmp/json",
      Some(li.schema))
    def sig(df: DataFrame): (Long, Long, Long) = {
      val r = df.select(fieldHash(cols.map(col)).as("h"))
        .agg(count(lit(1)), count_distinct(col("h")), expr("bit_xor(h)")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val sp = time("sig parquet")(sig(li))
    val sa = time("sig avro (read+convert+hash)")(sig(avro))
    val sj = time("sig json (read+parse+hash)")(sig(json))
    println(s"parity avro=${sa == sp} json=${sj == sp}")
    def cohort(df: DataFrame) = graft.sampling.BigSampler.sample(df, 0.05,
        graft.sampling.BigSampler.Hashed(Seq("l_orderkey", "l_linenumber")))
      .select("l_orderkey", "l_linenumber").localCheckpoint(true)
    val cp = time("cohort parquet")(cohort(li))
    val ca = time("cohort avro (2nd read)")(cohort(avro))
    val orphans = time("exceptAll both ways")(
      cp.exceptAll(ca).count() + ca.exceptAll(cp).count())
    println(s"orphans=$orphans")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
