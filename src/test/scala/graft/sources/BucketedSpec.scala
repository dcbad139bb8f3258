package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed-table contract: results identical to the unbucketed plan,
  * and the plan-shape payoffs actually materialize — zero exchanges on a
  * bucketed-bucketed join, one on a half-bucketed join, none under a
  * bucket-key aggregation, and bucket pruning on key-equality filters. */
class BucketedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(): String = {
    val p = graft.SparkSpec.tempDir("graft_bucketed_spec")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r.findAllIn(plan(df)).size

  private lazy val ordersB = {
    val dir = tmpDir()
    Bucketed.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_totalprice"),
      "spec_orders_b", s"$dir/orders", buckets = 4, keys = Seq("o_orderkey"))
  }

  private lazy val lineitemB = {
    val dir = tmpDir()
    Bucketed.writeBucketed(
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity"),
      "spec_lineitem_b", s"$dir/lineitem", buckets = 4, keys = Seq("l_orderkey"))
  }

  behavior of "Bucketed.writeBucketed"

  it should "preserve content exactly" in {
    val orig = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    ordersB.exceptAll(orig).count() shouldBe 0
    orig.exceptAll(ordersB).count() shouldBe 0
  }

  it should "be re-writable with a different bucket count" in {
    val dir = tmpDir()
    val again = Bucketed.writeBucketed(
      spark.read.parquet(s"$sf/region.parquet"),
      "spec_region_b", s"$dir/r1", buckets = 2, keys = Seq("r_regionkey"))
    again.count() shouldBe 5
    val rewritten = Bucketed.writeBucketed(
      spark.read.parquet(s"$sf/region.parquet"),
      "spec_region_b", s"$dir/r2", buckets = 3, keys = Seq("r_regionkey"))
    rewritten.count() shouldBe 5
    Bucketed.drop(spark, "spec_region_b")
  }

  it should "reject non-identifier table names" in {
    an[IllegalArgumentException] should be thrownBy
      Bucketed.writeBucketed(spark.range(1).toDF("id"),
        "bad name; drop table x", "/tmp/x", 2, Seq("id"))
  }

  behavior of "a bucketed-bucketed join"

  it should "plan with zero shuffle exchanges and match the unbucketed result" in {
    val joined = lineitemB.hint("merge")
      .join(ordersB, col("l_orderkey") === col("o_orderkey"))
    shuffles(joined) shouldBe 0
    plan(joined) should include("SortMergeJoin")

    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .join(spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
    joined.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(joined).count() shouldBe 0
  }

  it should "shuffle only the unbucketed side when one side is bucketed" in {
    val plain = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val joined = plain.hint("merge")
      .join(ordersB, col("l_orderkey") === col("o_orderkey"))
    shuffles(joined) shouldBe 1
  }

  behavior of "a bucket-key aggregation"

  it should "plan without an exchange" in {
    val agg = ordersB.groupBy("o_orderkey")
      .agg(sum("o_totalprice").as("t"))
    shuffles(agg) shouldBe 0
  }

  behavior of "bucket pruning"

  it should "select a single bucket for a key-equality filter" in {
    // autoBucketedScan disables bucketed reading on a plan with no join/
    // agg interest — scoped off so the bare filter scan keeps the bucket
    // spec and pruning shows up (planning happens inside the block)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val filtered = ordersB.filter(col("o_orderkey") === 7L)
      plan(filtered) should include("SelectedBucketsCount: 1 out of 4")
    } finally
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }
}
