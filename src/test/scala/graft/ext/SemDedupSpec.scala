package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup semantics: spherical clustering, the earlier-id keep policy,
  * degenerate vectors, the oversized-cluster fallback, determinism. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  // two well-separated directions in BLOCK layout (ids 0-19 one direction,
  // 20-39 the other) so the strided training sample — head rows of each
  // partition — sees both directions; noise keeps same-direction pairs
  // above ~0.99 cosine and cross-direction pairs below ~0.3
  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    val dirs = Array(
      Array.fill(dim)(rnd.nextGaussian()),
      Array.fill(dim)(rnd.nextGaussian()))
    (0L until 40L).map { i =>
      val d = dirs(if (i < 20) 0 else 1)
      val scale = 1.0 + (i % 7) * 0.5 // wildly different magnitudes
      (i, d.map(x => (x * scale + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
  }

  behavior of "semanticDedup"

  it should "keep exactly the earliest id of each semantic group" in {
    val r = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
      k = 2, tau = 0.95, seed = 3L)
    r.count() shouldBe 40L
    val kept = r.filter(col("keep")).select("id").as[Long].collect().sorted
    // one survivor per direction block, each the block's earliest id
    kept shouldBe Array(0L, 20L)
  }

  it should "be scale-invariant (spherical): a rescaled copy is removed" in {
    val dups = vecs.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(25.0f)).as("embedding"))
    val r = SemDedup.semanticDedup(vecs.unionByName(dups), "vec_id",
      "embedding", k = 2, tau = 0.95, seed = 3L)
    r.filter(col("id") >= 1000L && col("keep")).count() shouldBe 0L
  }

  it should "not remove anything when tau exceeds every pairwise cosine" in {
    val r = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
      k = 2, tau = 0.99999999, seed = 3L)
    r.filter(!col("keep")).count() shouldBe 0L
  }

  it should "keep degenerate vectors (zero norm, NaN) in cluster -1" in {
    val bad = Seq(
      (500L, Seq.fill(dim)(0.0f)),
      (501L, Seq.fill(dim)(Float.NaN))).toDF("vec_id", "embedding")
    val r = SemDedup.semanticDedup(vecs.unionByName(bad), "vec_id",
      "embedding", k = 2, tau = 0.95, seed = 3L)
    val badRows = r.filter(col("id") >= 500L)
      .select("cluster", "keep").as[(Long, Boolean)].collect()
    badRows should have length 2
    all(badRows.map(_._1)) shouldBe -1L
    all(badRows.map(_._2)) shouldBe true
  }

  it should "recursively split oversized clusters instead of skipping them" in {
    // k=1 lumps all 40 vectors into ONE cluster, 8× the 5-row cap: the
    // split rounds must break it down until every final cluster fits
    val r = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
      k = 1, tau = 0.95, seed = 3L, maxClusterSize = 5)
    r.count() shouldBe 40L
    r.filter(col("oversized")).count() shouldBe 0L
    // dedup actually RUNS inside the split clusters (same-direction
    // cosines are ≥ ~0.99, so any multi-member cluster prunes)
    r.filter(!col("keep")).count() should be > 0L
    // the kept set is tau-sparse within every FINAL cluster
    val kept = r.filter(col("keep")).select(col("id"), col("cluster"))
    val withV = kept.join(vecs.withColumnRenamed("vec_id", "id"), "id")
    val a = withV.select(col("cluster"), col("id").as("ia"), col("embedding").as("va"))
    val b = withV.select(col("cluster"), col("id").as("ib"), col("embedding").as("vb"))
    a.join(b, Seq("cluster")).filter(col("ia") < col("ib"))
      .filter(lit(1.0) - graft.GraftFunctions.cosineDistance(col("va"), col("vb")) >= 0.95)
      .count() shouldBe 0L
  }

  it should "fully dedup a giant single-direction cluster via exact collapse" in {
    // 40 copies of one direction at power-of-two scales (normalization is
    // bit-exact for those): k-means can never split this, but the
    // exact-direction collapse reduces it to one representative BEFORE
    // any pair step — full dedup, nothing flagged, no c² anywhere
    val big = (0L until 40L).map { i =>
      (i, Seq.fill(dim)(0.5f * (1 << (i % 3).toInt)))
    }.toDF("vec_id", "embedding")
    val r = SemDedup.semanticDedup(big, "vec_id", "embedding",
      k = 1, tau = 0.9, seed = 3L, maxClusterSize = 5)
    r.count() shouldBe 40L
    r.filter(col("oversized")).count() shouldBe 0L
    r.filter(col("keep")).select("id").as[Long].collect() shouldBe Array(0L)
  }

  it should "flag genuinely unsplittable clusters at tau ~ 1 and terminate" in {
    // tau numerically 1.0 disables the collapse (the float cosine of
    // identical vectors may round a hair under 1.0, so removal could lack
    // a ≥ tau witness); identical directions defeat k-means too — the
    // sample-identity check must declare the cluster stuck immediately
    // rather than burn all split rounds, and the honest flag survives
    val big = (0L until 40L).map(i => (i, Seq.fill(dim)(0.5f)))
      .toDF("vec_id", "embedding")
    val r = SemDedup.semanticDedup(big, "vec_id", "embedding",
      k = 1, tau = 1.0, seed = 3L, maxClusterSize = 5)
    r.filter(!col("keep")).count() shouldBe 0L
    r.filter(col("oversized")).count() shouldBe 40L
  }

  it should "restore plain skip-and-flag at maxSplitRounds = 0" in {
    val r = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
      k = 1, tau = 0.95, seed = 3L, maxClusterSize = 5, maxSplitRounds = 0)
    r.filter(!col("keep")).count() shouldBe 0L
    r.filter(col("oversized")).count() shouldBe 40L
  }

  it should "be deterministic across runs for a fixed seed" in {
    def run() = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
        k = 4, tau = 0.95, seed = 9L)
      .select("id", "cluster", "keep").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1).toSeq
    run() shouldBe run()
  }

  it should "be deterministic through the split rounds too" in {
    def run() = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
        k = 1, tau = 0.95, seed = 9L, maxClusterSize = 5)
      .select("id", "cluster", "keep").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1).toSeq
    run() shouldBe run()
  }

  it should "produce identical results under a wave-bounded driver budget" in {
    // the §5 driver guard: a budget so tight every sample wave holds ONE
    // cluster (and the sub-centroid map defers past one cluster's
    // centroids) must only change driver residency/round pacing, never
    // the emitted (id, keep) decisions — the guard's degradation path is
    // extra rounds, and this corpus settles well inside the default 6
    def run(budget: Long) = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
        k = 1, tau = 0.95, seed = 9L, maxClusterSize = 5,
        driverSplitBudgetBytes = budget)
      .select("id", "keep").as[(Long, Boolean)]
      .collect().sortBy(_._1).toSeq
    // one cluster's sample = 1024 × dim × 8 bytes; a budget of exactly
    // that forces single-cluster waves
    run(1024L * dim * 8) shouldBe run(SemDedup.DefaultDriverSplitBudgetBytes)
  }

  it should "leave the kept set tau-sparse within every cluster" in {
    val dups = vecs.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = vecs.unionByName(dups)
    val r = SemDedup.semanticDedup(corpus, "vec_id", "embedding",
      k = 2, tau = 0.95, seed = 3L)
    val kept = r.filter(col("keep")).select(col("id"), col("cluster"))
    val withV = kept.join(corpus.withColumnRenamed("vec_id", "id"), "id")
    val a = withV.select(col("cluster"), col("id").as("ia"), col("embedding").as("va"))
    val b = withV.select(col("cluster"), col("id").as("ib"), col("embedding").as("vb"))
    val viol = a.join(b, Seq("cluster")).filter(col("ia") < col("ib"))
      .filter(lit(1.0) - graft.GraftFunctions.cosineDistance(col("va"), col("vb")) >= 0.95)
    viol.count() shouldBe 0L
  }
}
