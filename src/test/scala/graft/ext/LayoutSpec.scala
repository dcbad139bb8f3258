package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout kernels: Morton interleave, equi-depth bucketing, and
  * the end-to-end locality property the parquet pruner depends on. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  behavior of "fanOutNarrow"

  it should "fan a narrow file-backed scan out to the session parallelism" in {
    val dir = java.nio.file.Files.createTempDirectory("layout_fan").toString
    spark.range(1000).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val narrow = spark.read.parquet(dir)
    val fanned = Layout.fanOutNarrow(narrow)
    fanned.rdd.getNumPartitions shouldBe
      spark.sparkContext.defaultParallelism
    fanned.count() shouldBe 1000L
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  it should "leave an input with >= parallelism files untouched" in {
    val par = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("layout_wide").toString
    spark.range(1000).toDF("id").repartition(par * 2)
      .write.mode("overwrite").parquet(dir)
    val wide = spark.read.parquet(dir)
    // same DataFrame object back: no exchange was added
    (Layout.fanOutNarrow(wide) eq wide) shouldBe true
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  it should "fall back to the RDD width probe for non-file plans" in {
    val mem = spark.range(100, 0, -1, numPartitions = 1).toDF("id")
    Layout.fanOutNarrow(mem).rdd.getNumPartitions shouldBe
      spark.sparkContext.defaultParallelism
    val wide = spark.range(100, 0, -1,
      numPartitions = spark.sparkContext.defaultParallelism).toDF("id")
    (Layout.fanOutNarrow(wide) eq wide) shouldBe true
  }

  behavior of "interleaveBits"

  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    var out = 0L
    val k = vals.length
    for (j <- 0 until bits; d <- 0 until k)
      out |= ((vals(d) >> j) & 1L) << (j * k + d)
    out
  }

  it should "match the reference Morton code on random bucket ids" in {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = rows.toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].collect()
    got.toSeq shouldBe rows.map { case (x, y) => mortonRef(Seq(x, y), 8) }
  }

  it should "interleave three dimensions without bit collisions" in {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)(
      (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
    val got = rows.toDF("x", "y", "z")
      .select(Layout.interleaveBits(Seq(col("x"), col("y"), col("z")), 6).as("m"))
      .as[Long].collect()
    got.toSeq shouldBe rows.map { case (x, y, z) => mortonRef(Seq(x, y, z), 6) }
    // distinct inputs -> distinct codes (bijective on the bucket cube)
    got.distinct.length shouldBe rows.distinct.length
  }

  behavior of "equiDepthBucket"

  it should "count boundaries strictly below the value, null to 0, NaN to top" in {
    val bnds = Array(10.0, 20.0, 30.0)
    val got = Seq[java.lang.Double](5.0, 10.0, 10.5, 25.0, 35.0, null,
        Double.NaN)
      .toDF("v")
      .select(Layout.equiDepthBucket(col("v"), bnds).as("b"))
      .as[Long].collect()
    got.toSeq shouldBe Seq(0L, 0L, 1L, 2L, 3L, 0L, 3L)
  }

  it should "yield near-equal bucket depths on uniform data" in {
    val df = (0 until 4096).map(_.toDouble).toDF("v")
    val bnds = Layout.bucketBoundaries(df, Seq("v"), bits = 2).head
    bnds.length shouldBe 3
    val counts = df.select(Layout.equiDepthBucket(col("v"), bnds).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    counts.keySet shouldBe Set(0L, 1L, 2L, 3L)
    // percentile_approx at accuracy 10000 is exact here
    counts.values.foreach(_.toDouble shouldBe 1024.0 +- 64.0)
  }

  it should "dedup repeated quantiles on low-cardinality columns" in {
    val df = Seq.fill(1000)(1.0).toDF("v")
    val bnds = Layout.bucketBoundaries(df, Seq("v"), bits = 4).head
    bnds.length shouldBe 1 // all 15 quantiles collapse to the single value
  }

  behavior of "zorderWrite plan and guards"

  it should "cluster with exactly one exchange (the range shuffle)" in {
    val df = (0 until 1024).map(i => (i.toLong, (i * 7 % 64).toLong))
      .toDF("x", "y")
    val bnds = Layout.bucketBoundaries(df, Seq("x", "y"), bits = 4)
    val staged = Seq("x", "y").zip(bnds).zipWithIndex.foldLeft(df) {
      case (acc, ((c, b), i)) =>
        acc.withColumn(s"__zb_$i", Layout.equiDepthBucket(col(c), b))
    }
    val clustered = staged
      .withColumn("__z",
        Layout.interleaveBits(Seq(col("__zb_0"), col("__zb_1")), 4))
      .repartitionByRange(8, col("__z"))
      .sortWithinPartitions("__z")
    val physical = clustered.queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(physical).length shouldBe 1
  }

  it should "reject reserved scratch column names" in {
    val df = Seq((1L, 2L)).toDF("x", "__z")
    val e = intercept[IllegalArgumentException] {
      Layout.zorderWrite(df, Seq("x"), "/tmp/never", numFiles = 2)
    }
    e.getMessage should include("__z")
  }

  behavior of "zorderWrite locality"

  it should "keep every file a small rectangle in both dimensions" in {
    val n = 64
    val grid = for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val dir = graft.SparkSpec.tempDir("layout_spec").toString
    Layout.zorderWrite(df, Seq("x", "y"), s"$dir/z", numFiles = 16, bits = 6)
    val spans = Layout.fileSpanStats(spark, s"$dir/z", Seq("x", "y"))
      .select("mean_span_x", "mean_span_y").as[(Double, Double)].head()
    // 16 files over a 64x64 grid: ideal file = a 16x16 block (span .25);
    // sampling slop stays well under .5. A row-major write would give
    // span_y ~= 1.0 on every file.
    spans._1 should be < 0.5
    spans._2 should be < 0.5
    // integrity: nothing lost or duplicated
    spark.read.parquet(s"$dir/z").count() shouldBe (n * n).toLong
  }

  behavior of "compactTo"

  private def fileCount(dir: String): Int =
    new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))

  it should "merge a many-small-files layout down to the computed count" in {
    val dir = graft.SparkSpec.tempDir("layout_compact").toString
    val df = spark.range(20000).selectExpr("id", "id * 2 AS v")
    df.repartition(64).write.parquet(s"$dir/small") // 64 tiny files
    val inBytes = new java.io.File(s"$dir/small").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = inBytes / 4 + 1 // ask for ~4 files
    val n = Layout.compactTo(spark, s"$dir/small", s"$dir/big", target)
    n should (be >= 4 and be <= 5)
    fileCount(s"$dir/big") shouldBe n
    // content preserved exactly
    val out = spark.read.parquet(s"$dir/big")
    out.count() shouldBe 20000L
    out.exceptAll(df).count() shouldBe 0L
  }

  it should "keep each input file's rows contiguous and ordered with preserveOrder (no shuffle)" in {
    val dir = graft.SparkSpec.tempDir("layout_compact2").toString
    // 4 files, each internally sorted
    spark.range(10000).selectExpr("id")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.parquet(s"$dir/sorted")
    val inBytes = new java.io.File(s"$dir/sorted").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    Layout.compactTo(spark, s"$dir/sorted", s"$dir/out",
      inBytes + 1, preserveOrder = true) shouldBe 1
    // the single output file is a concatenation of the 4 sorted inputs:
    // at most 4 monotone runs (global order across files NOT promised —
    // Spark orders inputs by size)
    val got = spark.read.parquet(s"$dir/out").collect().map(_.getLong(0))
    got.length shouldBe 10000
    val descents = got.sliding(2).count(w => w(1) < w(0))
    descents should be <= 3
    // and the plan is shuffle-free
    val plan = spark.read.parquet(s"$dir/sorted").coalesce(1)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  it should "split an oversized layout into more files when asked" in {
    val dir = graft.SparkSpec.tempDir("layout_split").toString
    spark.range(50000).selectExpr("id", "id * 3 AS v")
      .coalesce(1).write.parquet(s"$dir/one")
    val inBytes = new java.io.File(s"$dir/one").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n = Layout.compactTo(spark, s"$dir/one", s"$dir/many", inBytes / 8 + 1)
    n should be >= 8
    fileCount(s"$dir/many") shouldBe n
    spark.read.parquet(s"$dir/many").count() shouldBe 50000L
  }

  it should "reject a non-positive target" in {
    an[IllegalArgumentException] should be thrownBy
      Layout.compactTo(spark, "/tmp/x", "/tmp/y", 0L)
  }
}
