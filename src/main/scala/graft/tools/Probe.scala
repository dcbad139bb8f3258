package graft.tools

import graft.diffy.BigDiffy
import graft.gen.{Gen, RowGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch probe: distributed generation through the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("attrs", MapType(StringType, DoubleType), nullable = true)))

    // 100k rows over 32 shards; ids amended to full-range randoms
    val gen = RowGen.amend(RowGen.of(schema), schema)("id", Gen.long.map(identity[Any]))
    val df = RowGen.distributed(spark, gen, schema, 100000, shards = 32).cache()
    println(s"== rows: ${df.count()}  distinct ids: " +
      df.select(countDistinct(col("id"))).head().getLong(0))
    df.show(3, 60)

    // correlated pair fixture drives a real diff: perturb rhs score on ~10%
    val (lh, rh) = (df, df.withColumn("score",
      when(pmod(col("id"), lit(10)) === 0, col("score") + 1.0).otherwise(col("score"))))
    val g = BigDiffy.diff(lh, rh, Seq("id")).globalStats.head()
    println(s"== diff over generated fixture: total=${g.getLong(0)} same=${g.getLong(1)} " +
      s"diff=${g.getLong(2)}")

    // same seed, different shard count -> same rows? (NOT guaranteed; show)
    val df16 = RowGen.distributed(spark, gen, schema, 100000, shards = 16)
    println(s"== 16-shard distinct ids: " +
      df16.select(countDistinct(col("id"))).head().getLong(0))
    spark.stop()
  }
}
