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

  behavior of "Split.leakageSafeSplit"

  private def dupCorpus = {
    val base = (0L until 300L).map { i =>
      val words = (0 until 30).map(j => s"tok${(i * 37 + j * 11) % 211}")
      (i, words.mkString(" "))
    }
    // 400+i is a near-copy of i for the first 100 docs (drop 2 words)
    val near = base.take(100).map { case (i, t) =>
      (i + 400L, t.split(" ").dropRight(2).mkString(" "))
    }
    (base ++ near).toDF("doc_id", "text")
  }

  it should "never let a near-dup pair straddle a split and keep the cluster handle" in {
    val split = Split.leakageSafeSplit(dupCorpus, "doc_id", "text", fracs,
      numHashes = 64, bands = 32, threshold = 0.5)
    split.columns.toSeq shouldBe Seq("doc_id", "text", "cluster", "split")
    split.count() shouldBe 400L
    val m = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    val c = split.select("doc_id", "cluster").as[(Long, Long)].collect().toMap
    (0L until 100L).foreach { i =>
      c(i + 400L) shouldBe c(i) // planted pair clustered together...
      m(i + 400L) shouldBe m(i) // ...hence split together
    }
    // clusters are split-atomic globally
    split.groupBy("cluster").agg(countDistinct("split").as("n"))
      .filter(col("n") =!= 1).count() shouldBe 0L
  }

  it should "split by precomputed components with singletons on their own id" in {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "d"))
      .toDF("doc_id", "text")
    val comps = Seq((1L, 1L), (2L, 1L)).toDF("id", "component")
    val split = Split.leakageSafeSplitByComponents(df, "doc_id", comps, fracs)
    val got = split.select("doc_id", "cluster", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    got.map(_._2) shouldBe Array(1L, 1L, 3L, 9L)
    got(0)._3 shouldBe got(1)._3 // same cluster, same split
    // cluster keyed like hashSplit on the same column: identical labels
    val base = Split.hashSplit(
        df.withColumn("cluster", when(col("doc_id") <= 2, 1L).otherwise(col("doc_id"))),
        Seq("cluster"), fracs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    got.foreach { case (id, _, s) => s shouldBe base(id) }
  }

  it should "reject a pre-existing cluster column" in {
    val df = Seq((1L, "a")).toDF("doc_id", "cluster")
    an[IllegalArgumentException] should be thrownBy
      Split.leakageSafeSplitByComponents(df, "doc_id",
        Seq((1L, 1L)).toDF("id", "component"), fracs)
  }

  behavior of "trainOrder"

  private lazy val corpus = (0L until 1000L).map(i => (i, s"doc $i"))
    .toDF("doc_id", "text")

  it should "produce a reproducible permutation that a salt change re-deals" in {
    def order(salt: String): Seq[Long] =
      Split.trainOrder(corpus, Seq("doc_id"), salt, numShards = 4)
        .orderBy("shard", "order_key").select("doc_id").as[Long]
        .collect().toSeq
    val e0 = order("epoch0")
    order("epoch0") shouldBe e0 // deterministic rerun
    e0 should not be order("epoch1") // new epoch, new permutation
    e0.sorted shouldBe (0L until 1000L) // still a permutation
    e0 should not be (0L until 1000L) // and not the identity
  }

  it should "balance shards within multinomial noise" in {
    val sizes = Split.trainOrder(corpus, Seq("doc_id"), "s", numShards = 8)
      .groupBy("shard").count().select("count").as[Long].collect()
    sizes should have length 8
    all(sizes) should be > 80L // E=125, 4-sigma ≈ 44
    all(sizes) should be < 170L
  }

  it should "derive shard from the order key's leading hex digits" in {
    val row = Split.trainOrder(corpus.limit(3), Seq("doc_id"), "s", 7)
      .select("order_key", "shard").as[(String, Int)].collect()
    row.foreach { case (k, s) =>
      s shouldBe (java.lang.Long.parseLong(k.take(6), 16) % 7).toInt
    }
  }

  it should "sort within each partition with no global sort exchange" in {
    val plan = Split.trainOrder(corpus, Seq("doc_id"), "s", numShards = 4)
      .queryExecution.executedPlan.toString
    plan should include("Exchange hashpartitioning")
    plan should not include "Exchange rangepartitioning"
    plan should include("Sort")
  }
}
