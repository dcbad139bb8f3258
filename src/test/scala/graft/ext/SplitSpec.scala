package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitSpec extends SparkSpec {
  import spark.implicits._

  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  behavior of "Split.hashSplit"

  it should "respect fractions within tolerance and cover every row" in {
    val df = spark.range(20000).toDF("id")
    val got = Split.hashSplit(df, Seq("id"), fracs)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    got.keySet shouldBe Set("train", "val", "test")
    got.values.sum shouldBe 20000L
    (got("train") / 20000.0) shouldBe 0.8 +- 0.02
    (got("val") / 20000.0) shouldBe 0.1 +- 0.01
    (got("test") / 20000.0) shouldBe 0.1 +- 0.01
  }

  it should "be deterministic and stable under corpus changes" in {
    val df = spark.range(5000).toDF("id")
    val a = Split.hashSplit(df, Seq("id"), fracs)
      .as[(Long, String)].collect().toMap
    val b = Split.hashSplit(df.filter(col("id") % 7 =!= 3), Seq("id"), fracs)
      .as[(Long, String)].collect().toMap
    // surviving rows keep their assignment when neighbors disappear
    b.foreach { case (id, s) => s shouldBe a(id) }
  }

  it should "keep groups atomic when keyed on the group column" in {
    val df = spark.range(10000).toDF("id")
      .withColumn("grp", col("id") % 97)
    Split.hashSplit(df, Seq("grp"), fracs)
      .groupBy("grp").agg(countDistinct("split").as("n"))
      .filter(col("n") =!= 1).count() shouldBe 0L
  }

  it should "re-deal wholesale under a different seed" in {
    val df = spark.range(5000).toDF("id")
    val a = Split.hashSplit(df, Seq("id"), fracs).as[(Long, String)].collect().toMap
    val b = Split.hashSplit(df, Seq("id"), fracs, seed = Some(7))
      .as[(Long, String)].collect().toMap
    // not identical (re-dealt), but both respect fractions
    a should not equal b
    Seq(a, b).foreach { m =>
      m.values.count(_ == "train") / 5000.0 shouldBe 0.8 +- 0.03
    }
  }

  it should "reject bad fractions" in {
    val df = spark.range(10).toDF("id")
    an[IllegalArgumentException] should be thrownBy
      Split.hashSplit(df, Seq("id"), Seq("a" -> 0.5, "b" -> 0.4))
    an[IllegalArgumentException] should be thrownBy
      Split.hashSplit(df, Seq("id"), Seq("a" -> 1.2, "b" -> -0.2))
  }

  it should "compose with near-dup clusters for a leakage-safe split" in {
    // plant near-dup pairs; cluster; split on the cluster id: a doc and
    // its near-dup must NEVER straddle the train/test boundary
    val docs = (0L until 200L).map { i =>
      val base = s"document number $i with some shared running text body " +
        s"for clustering tests ${i % 13}"
      (i, if (i % 2 == 0) base else base + " near dup tail")
    }.toDF("doc_id", "text")
      // make odd docs near-dups of their even predecessor
      .withColumn("text", when(col("doc_id") % 2 === 1,
        concat(lit("document number "), col("doc_id") - 1,
          lit(" with some shared running text body for clustering tests "),
          (col("doc_id") - 1) % 13, lit(" xx"))).otherwise(col("text")))
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      numHashes = 32, bands = 16, shingleLen = 4, threshold = 0.5)
    pairs.count() should be > 0L
    // cluster id = component for paired docs, own id for singletons
    val comps = Dedup.connectedComponents(pairs)
    val labeled = docs.join(comps, docs("doc_id") === comps("id"), "left")
      .withColumn("cluster_id", coalesce(col("component"), col("doc_id")))
    val split = Split.hashSplit(labeled, Seq("cluster_id"), fracs)
    split.groupBy("cluster_id").agg(countDistinct("split").as("n"))
      .filter(col("n") =!= 1).count() shouldBe 0L
  }
}
