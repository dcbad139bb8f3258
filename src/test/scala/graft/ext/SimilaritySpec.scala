package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANN correctness: LSH recall against the brute-force oracle. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    val clusters = Array.fill(5)(Array.fill(dim)(rnd.nextGaussian()))
    (0L until 200L).map { i =>
      val c = clusters((i % 5).toInt)
      val v = c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding").cache()
  }

  behavior of "bruteForceTopK"

  it should "return k ranked neighbors per query, self excluded" in {
    val q = vecs.filter(col("vec_id") < 3)
    val got = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 4)
    got.count() shouldBe 12L
    got.filter(col("query_id") === col("neighbor_id")).count() shouldBe 0L
    val ranks = got.filter(col("query_id") === 0).orderBy("rank")
      .select("rank").as[Int].collect()
    ranks shouldBe Array(1, 2, 3, 4)
    // top neighbors of a clustered vector share its cluster (ids ≡ 0 mod 5)
    val top = got.filter(col("query_id") === 0 && col("rank") === 1)
      .select("neighbor_id").as[Long].head()
    top % 5 shouldBe 0L
  }

  behavior of "lshTopK"

  it should "recall most brute-force neighbors on clustered data" in {
    val q = vecs.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(vecs, q, "vec_id", "embedding", 3, dim,
        bits = 8, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    (bf intersect lsh).size.toDouble / bf.size should be >= 0.8
  }

  it should "drop hot buckets via maxBucketSize" in {
    val q = vecs.filter(col("vec_id") < 2)
    // bits=1 -> 2 buckets; every bucket is hot under a tiny cap
    Similarity.lshTopK(vecs, q, "vec_id", "embedding", 3, dim,
      bits = 1, tables = 1, maxBucketSize = 5).count() shouldBe 0L
  }

  behavior of "ivfTopK"

  it should "recall most brute-force neighbors on clustered data" in {
    // 5 genuine clusters: the k-means quantizer should carve cells along
    // them, so probing a few cells recovers nearly all true neighbors
    val q = vecs.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(vecs, q, "vec_id", "embedding", 3,
        nlist = 8, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    (bf intersect ivf).size.toDouble / bf.size should be >= 0.8
  }

  it should "tolerate NaN vectors, tiny corpora, and an empty corpus" in {
    // NaN embedding: row degrades to null cell (skipped), job survives
    val dirty = vecs.unionByName(
      Seq((9000L, Seq.fill(dim)(Float.NaN).toSeq)).toDF("vec_id", "embedding"))
    noException should be thrownBy
      Similarity.ivfTopK(dirty, dirty.filter(col("vec_id") < 2),
        "vec_id", "embedding", k = 2, nlist = 4, nprobe = 2).count()
    // corpus with fewer distinct points than nlist: KMeans returns fewer
    // centroids; nprobe clamps instead of failing the require
    val tiny = vecs.filter(col("vec_id") < 3)
    Similarity.ivfTopK(tiny, tiny, "vec_id", "embedding", k = 2,
      nlist = 16, nprobe = 6).count() should be > 0L
    // empty corpus: empty result with the right schema, no KMeans.fit crash
    val empty = vecs.filter(col("vec_id") < 0)
    val got = Similarity.ivfTopK(empty, tiny, "vec_id", "embedding", k = 2)
    got.count() shouldBe 0L
    got.columns.toSeq shouldBe Seq("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  it should "support non-integral ids through the string top-k branch" in {
    // same data, ids rendered as strings: the TopK aggregator's String
    // branch must rank identically (modulo id type) to the Long branch
    val svecs = vecs.select(concat(lit("doc-"), format_string("%04d", col("vec_id")))
      .as("vec_id"), col("embedding"))
    val q = svecs.filter(col("vec_id") < "doc-0003")
    val got = Similarity.bruteForceTopK(svecs, q, "vec_id", "embedding", 4)
    got.schema("neighbor_id").dataType shouldBe
      org.apache.spark.sql.types.StringType
    got.count() shouldBe 12L
    val long = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 3),
        "vec_id", "embedding", 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().map { case (a, b, r) => (f"doc-$a%04d", f"doc-$b%04d", r) }.toSet
    got.select("query_id", "neighbor_id", "rank").as[(String, String, Int)]
      .collect().toSet shouldBe long
  }

  behavior of "clusterAssign"

  it should "recover the 5 planted clusters as pure label groups" in {
    // every point was drawn around one of 5 well-separated directions;
    // k=5 cosine k-means must put same-plant points under one label
    val got = Similarity.clusterAssign(vecs, "vec_id", "embedding", k = 5)
      .as[(Long, Int)].collect()
    got.length shouldBe 200
    val byPlant = got.groupBy { case (id, _) => id % 5 }
    // each planted group maps to exactly one dominant label, ≥ 95% pure
    val labels = byPlant.map { case (_, members) =>
      val counts = members.groupBy(_._2).view.mapValues(_.size)
      val (top, n) = counts.maxBy(_._2)
      n.toDouble / members.size should be >= 0.95
      top
    }
    labels.toSet.size shouldBe 5 // distinct dominant labels: no merged plants
  }

  it should "assign deterministically and equal assignClusters on trained centroids" in {
    val a = Similarity.clusterAssign(vecs, "vec_id", "embedding", k = 5)
      .as[(Long, Int)].collect().sorted
    val cs = Similarity.trainCentroids(vecs, "embedding", k = 5)
    cs.length shouldBe 5
    val b = Similarity.assignClusters(vecs, "vec_id", "embedding", cs)
      .as[(Long, Int)].collect().sorted
    a shouldBe b
  }

  it should "return empty on an empty corpus and reject empty centroids" in {
    Similarity.clusterAssign(vecs.limit(0), "vec_id", "embedding", k = 3)
      .count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Similarity.assignClusters(vecs, "vec_id", "embedding", Array.empty)
  }

  behavior of "pqTopK"

  it should "recall most brute-force neighbors after exact re-rank" in {
    val q = vecs.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(vecs, q, "vec_id", "embedding", 3,
        m = 4, codebookSize = 16, rerankFactor = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    (bf intersect pq).size.toDouble / bf.size should be >= 0.8
    // re-ranked scores are EXACT cosines: every recalled pair's score must
    // match the brute-force score bit-for-bit (same expression, same data)
    val bfScores = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "cosine_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    Similarity.pqTopK(vecs, q, "vec_id", "embedding", 3,
        m = 4, codebookSize = 16, rerankFactor = 8)
      .select("query_id", "neighbor_id", "cosine_sim")
      .as[(Long, Long, Double)].collect()
      .foreach { case (a, b, s) =>
        bfScores.get((a, b)).foreach(_ shouldBe s +- 1e-12)
      }
  }

  it should "return approximate ADC scores without re-rank, tracking exact cosine" in {
    val q = vecs.filter(col("vec_id") < 3)
    val approx = Similarity.pqTopK(vecs, q, "vec_id", "embedding", 5,
        m = 8, codebookSize = 32, rerankFactor = 1)
      .select("query_id", "neighbor_id", "cosine_sim")
      .as[(Long, Long, Double)].collect()
    approx should not be empty
    // clustered data at m=8/32 codes: the ADC estimate sits within ~0.1
    // of the true cosine for every scored pair
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 199)
      .select("query_id", "neighbor_id", "cosine_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    approx.foreach { case (a, b, s) =>
      math.abs(s - exact((a, b))) should be < 0.1
    }
  }

  it should "tolerate NaN rows, tiny corpora, and an empty corpus" in {
    val dirty = vecs.unionByName(
      Seq((9000L, Seq.fill(dim)(Float.NaN).toSeq)).toDF("vec_id", "embedding"))
    noException should be thrownBy
      Similarity.pqTopK(dirty, dirty.filter(col("vec_id") < 2),
        "vec_id", "embedding", k = 2, m = 4, codebookSize = 8).count()
    val tiny = vecs.filter(col("vec_id") < 3)
    Similarity.pqTopK(tiny, tiny, "vec_id", "embedding", k = 2,
      m = 4, codebookSize = 8).count() should be > 0L
    val empty = vecs.filter(col("vec_id") < 0)
    val got = Similarity.pqTopK(empty, tiny, "vec_id", "embedding", k = 2)
    got.count() shouldBe 0L
    got.columns.toSeq shouldBe Seq("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  behavior of "ivfpqTopK"

  it should "recall most brute-force neighbors via residual-PQ scored cells" in {
    val q = vecs.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfpqTopK(vecs, q, "vec_id", "embedding", 3,
        nlist = 8, nprobe = 4, m = 4, codebookSize = 16, rerankFactor = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    (bf intersect got).size.toDouble / bf.size should be >= 0.8
  }

  it should "tolerate NaN rows and an empty corpus" in {
    val dirty = vecs.unionByName(
      Seq((9000L, Seq.fill(dim)(Float.NaN).toSeq)).toDF("vec_id", "embedding"))
    noException should be thrownBy
      Similarity.ivfpqTopK(dirty, dirty.filter(col("vec_id") < 2),
        "vec_id", "embedding", k = 2, nlist = 4, nprobe = 2,
        m = 4, codebookSize = 8).count()
    val tiny = vecs.filter(col("vec_id") < 3)
    val empty = vecs.filter(col("vec_id") < 0)
    val got = Similarity.ivfpqTopK(empty, tiny, "vec_id", "embedding", k = 2)
    got.count() shouldBe 0L
    got.columns.toSeq shouldBe Seq("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  it should "rank the scaled copy of a query first (same direction, cosine 1)" in {
    val copies = vecs.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = vecs.unionByName(copies)
    val got = Similarity.ivfTopK(corpus, vecs.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 1, nlist = 8, nprobe = 2)
    got.filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .foreach { case (qid, nid) => nid shouldBe (qid + 1000L) }
  }
}
