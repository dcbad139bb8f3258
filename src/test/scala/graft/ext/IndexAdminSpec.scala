package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operational tooling over the persisted-index family: the per-batch
  * census and the quantizer-drift probe. */
class IndexAdminSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    graft.SparkSpec.tempDir("graft_idxadmin").toString + "/idx"

  behavior of "IndexAdmin.describeIndex"

  it should "report every relation per batch with exact row counts" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val path = tmpDir()
    DedupIndex.build(a, "doc_id", "text", path, numHashes = 64, bands = 32)
    DedupIndex.append(b, "doc_id", "text", path, batchId = Some("crawl-1"))
    val d = IndexAdmin.describeIndex(spark, path)
      .as[(String, String, Long, Long, Option[Long])].collect()
    val byRel = d.groupBy(_._1)
    // three relations, two batches each, init + crawl-1
    for (rel <- Seq("fingerprints", "shingles", "bands")) {
      byRel(rel).map(_._2).toSet shouldBe Set("init", "crawl-1")
    }
    // fingerprint rows per batch are exact
    byRel("fingerprints").map(r => r._2 -> r._5.get).toMap shouldBe
      Map("init" -> a.count(), "crawl-1" -> b.count())
    // bands = 32 per doc
    byRel("bands").map(_._5.get).sum shouldBe docs.count() * 32
    // bloom dirs report one segment per batch, named by its id
    byRel("bloom_fp").map(_._2).toSet shouldBe Set("init", "crawl-1")
    all(byRel("bloom_fp").map(_._3)) shouldBe 1L
    // params is batch-less
    byRel("params").head._2 shouldBe (null: String)
    byRel("params").head._5 shouldBe Some(1L)
    // after a compact the census collapses to one batch per relation
    DedupIndex.compact(spark, path)
    val d2 = IndexAdmin.describeIndex(spark, path)
      .as[(String, String, Long, Long, Option[Long])].collect()
    d2.filter(_._1 == "fingerprints").map(_._2).toSeq match {
      case Seq(one) => one should startWith("compact-")
      case other    => fail(s"expected one batch, got $other")
    }
    d2.filter(_._1 == "fingerprints").head._5 shouldBe Some(docs.count())
  }

  behavior of "IndexAdmin.ivfDriftCheck"

  it should "flag a shifted batch with larger assignment distances" in {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = tmpDir()
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", path, nlist = 8)
    def overallMean(batch: org.apache.spark.sql.DataFrame): Double =
      IndexAdmin.ivfDriftCheck(spark, path, batch, "vec_id", "embedding")
        .filter(col("cell") === -1)
        .select("mean_dist").as[Double].head()
    // a batch ON the trained directions (the centroids themselves) has
    // ~zero assignment distance; the same batch directionally INVERTED
    // is as far as cosine gets from every trained cell — the ordering a
    // drift monitor keys on, in the index's own metric
    val cents = Similarity.loadIvfCentroids(spark, path).zipWithIndex
      .map { case (c, i) => (i.toLong, c.map(_.toFloat).toSeq) }.toSeq
    val onModel = cents.toDF("vec_id", "embedding")
    val inverted = cents.map { case (i, c) => (i, c.map(x => -x)) }
      .toDF("vec_id", "embedding")
    val sameDist = overallMean(onModel)
    val shiftDist = overallMean(inverted)
    sameDist should be < 0.05
    shiftDist should be > 0.5
    shiftDist should be > sameDist + 0.5
    // per-cell rows cover the full batch
    val rows = IndexAdmin.ivfDriftCheck(spark, path, emb, "vec_id", "embedding")
      .filter(col("cell") >= 0).select("n").as[Long].collect()
    rows.sum shouldBe emb.count()
  }
}
