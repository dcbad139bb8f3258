package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrain remediation for the persisted ANN indexes: inject quantizer
  * drift (a shifted appended batch), observe the recall / drift-metric
  * decay ivfDriftCheck reports, retrain, and verify recovery — plus the
  * folded-ledger contract (a keyed append replayed after its batch was
  * folded by a retrain must no-op). */
class IndexRetrainSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    graft.SparkSpec.tempDir("retrain").toString + "/idx"

  /** `n` vectors near the given axis: axis + U(0, 0.1) jitter on the two
    * other coordinates, deterministic per (axis, i). */
  private def cluster(axis: Int, n: Int, idBase: Long): Seq[(Long, Array[Double])] =
    (0 until n).map { i =>
      val r1 = ((i * 7919 + axis * 104729) % 1000) / 10000.0
      val r2 = ((i * 6271 + axis * 15485863) % 1000) / 10000.0
      val v = Array.fill(3)(0.0)
      v(axis) = 1.0
      v((axis + 1) % 3) = r1
      v((axis + 2) % 3) = r2
      (idBase + i, v)
    }

  private lazy val ab = (cluster(0, 50, 0L) ++ cluster(1, 50, 100L))
    .toDF("id", "v").cache()
  private lazy val cBatch = cluster(2, 50, 200L).toDF("id", "v").cache()

  /** recall@k of `got` (query_id, neighbor_id) against brute force over
    * `corpus` for `queries`. */
  private def recallAgainstBrute(corpus: DataFrame, queries: DataFrame,
                                 got: DataFrame, k: Int): Double = {
    val truth = Similarity.bruteForceTopK(corpus, queries, "id", "v", k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(got.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    hits.toDouble / truth.count()
  }

  behavior of "retrainIvfIndex"

  it should "recover recall lost to a drifted appended batch" in {
    val path = tmpDir()
    Similarity.buildIvfIndex(ab, "id", "v", path, nlist = 2) shouldBe 2
    Similarity.appendIvfIndex(cBatch, "id", "v", path,
      batchId = Some("day-1")) shouldBe 50L
    val all = ab.unionByName(cBatch)
    // drift: the new cluster has no cell of its own — the probe (overall
    // row, cell = -1) shows its mean assignment distance
    val driftBefore = IndexAdmin.ivfDriftCheck(spark, path, cBatch, "id", "v")
      .filter(col("cell") === -1).head().getAs[Double]("mean_dist")
    // queries from the drifted cluster at nprobe=1: the cluster straddles
    // the two stale cells, so single-probe recall decays
    val queries = cBatch.filter(col("id") % 5 === 0)
    val before = recallAgainstBrute(all, queries,
      Similarity.searchIvfIndex(spark, path, queries, "id", "v",
        k = 5, nprobe = 1), 5)
    val cells = Similarity.retrainIvfIndex(spark, path, nlist = 3)
    cells shouldBe 3
    val after = recallAgainstBrute(all, queries,
      Similarity.searchIvfIndex(spark, path, queries, "id", "v",
        k = 5, nprobe = 1), 5)
    val driftAfter = IndexAdmin.ivfDriftCheck(spark, path, cBatch, "id", "v")
      .filter(col("cell") === -1).head().getAs[Double]("mean_dist")
    withClue(s"recall before=$before after=$after, " +
      s"drift before=$driftBefore after=$driftAfter:") {
      before should be < 1.0 // single-probe misses straddled neighbors
      after shouldBe 1.0 // the drifted cluster owns a cell again
      // the primary decay signal: assignment distance collapses once the
      // quantizer has a cell for the drifted cluster
      driftAfter should be < driftBefore / 10
    }
    // nothing lost: every posting survived the re-cell
    spark.read.parquet(s"$path/postings").count() shouldBe 150L
  }

  it should "no-op a keyed append replayed after its batch was folded" in {
    val path = tmpDir()
    Similarity.buildIvfIndex(ab, "id", "v", path, nlist = 2)
    Similarity.appendIvfIndex(cBatch, "id", "v", path,
      batchId = Some("day-1")) shouldBe 50L
    Similarity.retrainIvfIndex(spark, path, nlist = 3)
    // checkpoint replay after the retrain folded day-1 away
    Similarity.appendIvfIndex(cBatch, "id", "v", path,
      batchId = Some("day-1")) shouldBe 0L
    spark.read.parquet(s"$path/postings").count() shouldBe 150L
  }

  it should "serve post-retrain searches identical to in-memory ivfSearch" in {
    val path = tmpDir()
    Similarity.buildIvfIndex(ab, "id", "v", path, nlist = 2)
    Similarity.appendIvfIndex(cBatch, "id", "v", path, batchId = Some("d1"))
    Similarity.retrainIvfIndex(spark, path, nlist = 3)
    val queries = cBatch.filter(col("id") % 7 === 0)
    val centroids = Similarity.loadIvfCentroids(spark, path)
    val all = ab.unionByName(cBatch)
    val fromDisk = Similarity.searchIvfIndex(spark, path, queries, "id", "v",
        k = 4, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sorted
    val inMem = Similarity.ivfSearch(all,
        queries.select(col("id").as("query_id"), col("v").as("qv")),
        centroids, k = 4, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sorted
    fromDisk shouldBe inMem
  }

  behavior of "retrainIvfPqIndex"

  it should "rebuild quantizers from the caller corpus and recover recall" in {
    val path = tmpDir()
    Similarity.buildIvfPqIndex(ab, "id", "v", path, nlist = 2, m = 3,
      codebookSize = 16) shouldBe 2
    Similarity.appendIvfPqIndex(cBatch, "id", "v", path,
      batchId = Some("day-1")) shouldBe 50L
    val all = ab.unionByName(cBatch)
    val queries = cBatch.filter(col("id") % 5 === 0)
    // PQ postings hold no vectors: retrain takes the full corpus
    val cells = Similarity.retrainIvfPqIndex(all, "id", "v", path,
      nlist = 3, m = 3, codebookSize = 16)
    cells shouldBe 3
    spark.read.parquet(s"$path/postings").count() shouldBe 150L
    val after = recallAgainstBrute(all, queries,
      Similarity.searchIvfPqIndex(spark, path, queries, "id", "v",
        k = 5, nprobe = 1, rerankFactor = 4, rerank = Some(all)), 5)
    withClue(s"post-retrain recall=$after:") { after should be >= 0.9 }
    // folded ledger holds across the PQ path too
    Similarity.appendIvfPqIndex(cBatch, "id", "v", path,
      batchId = Some("day-1")) shouldBe 0L
    spark.read.parquet(s"$path/postings").count() shouldBe 150L
  }

  it should "refuse to retrain an empty index" in {
    val path = tmpDir()
    Similarity.buildIvfIndex(ab.limit(0), "id", "v", path, nlist = 2)
    // the empty-built layout carries a schema-bearing zero-row file, so
    // the failure surfaces at training (no finite vectors), not listing
    intercept[IllegalStateException](
      Similarity.retrainIvfIndex(spark, path))
  }
}
