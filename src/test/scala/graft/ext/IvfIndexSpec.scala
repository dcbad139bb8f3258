package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(): String =
    graft.SparkSpec.tempDir("ivfidx").toString + "/idx"

  behavior of "Similarity IVF index persistence"

  it should "round-trip: from-disk search equals in-memory search with the loaded centroids" in {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val path = tmpDir()
    val n = Similarity.buildIvfIndex(emb, "vec_id", "embedding", path, nlist = 8)
    n shouldBe 8
    val centroids = Similarity.loadIvfCentroids(spark, path)
    centroids.length shouldBe 8
    val fromDisk = Similarity.searchIvfIndex(spark, path, q,
        "vec_id", "embedding", k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    val inMem = Similarity.ivfSearch(
        emb.select(col("vec_id").as("id"), col("embedding").as("v")),
        q.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        centroids, k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    fromDisk shouldBe inMem
    fromDisk.length shouldBe 25
  }

  it should "store every posting in its argmin cell and cover the whole corpus" in {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = tmpDir()
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", path, nlist = 8)
    val centroids = Similarity.loadIvfCentroids(spark, path)
    val postings = spark.read.parquet(s"$path/postings")
    postings.count() shouldBe emb.count()
    import graft.GraftFunctions.nearestCells
    postings.withColumn("best", nearestCells(col("v"), centroids, 1)(0))
      .filter(col("cell") =!= col("best")).count() shouldBe 0L
  }

  it should "prune unprobed cell directories at the postings scan" in {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
    val path = tmpDir()
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", path, nlist = 8)
    val search = Similarity.searchIvfIndex(spark, path, q,
      "vec_id", "embedding", k = 3, nprobe = 2)
    val plan = search.queryExecution.executedPlan.toString
    plan should include regex "PartitionFilters: \\[.*cell.*"
    plan should not include "Window"
    // nprobe=2 of 8 cells: the scan must report only the probed partitions
    search.count() shouldBe 3L
  }

  it should "handle an empty corpus index cleanly" in {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = tmpDir()
    Similarity.buildIvfIndex(emb.limit(0), "vec_id", "embedding",
      path, nlist = 8) shouldBe 0
    Similarity.loadIvfCentroids(spark, path).length shouldBe 0
    Similarity.searchIvfIndex(spark, path,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .count() shouldBe 0L
    an[IllegalStateException] should be thrownBy
      Similarity.appendIvfIndex(emb, "vec_id", "embedding", path)
    // compacting the empty-built layout is a no-op — the zero-row
    // unpartitioned postings must survive untouched (a staged zero-row
    // partitioned rewrite would leave no schema-bearing file)
    Similarity.compactIvfIndex(spark, path)
    Similarity.searchIvfIndex(spark, path,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .count() shouldBe 0L
  }

  it should "serve appended postings assigned with the loaded centroids" in {
    // incremental growth: assign NEW rows against the existing quantizer
    // and append — the search must see old and new rows through the same
    // pruned scan
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val old = emb.filter(col("vec_id") % 2 === 0)
    val fresh = emb.filter(col("vec_id") % 2 =!= 0)
    val path = tmpDir()
    Similarity.buildIvfIndex(old, "vec_id", "embedding", path, nlist = 8)
    Similarity.appendIvfIndex(fresh, "vec_id", "embedding", path) shouldBe
      fresh.count()
    spark.read.parquet(s"$path/postings").count() shouldBe emb.count()
    // appended rows sit in their argmin cell like built ones
    val centroids = Similarity.loadIvfCentroids(spark, path)
    import graft.GraftFunctions.nearestCells
    spark.read.parquet(s"$path/postings")
      .withColumn("best", nearestCells(col("v"), centroids, 1)(0))
      .filter(col("cell") =!= col("best")).count() shouldBe 0L
    val q = emb.filter(col("vec_id") < 3)
    val got = Similarity.searchIvfIndex(spark, path, q,
        "vec_id", "embedding", k = 5, nprobe = 8)
      .select("neighbor_id").as[Long].collect()
    // probing all 8 cells over the full corpus = exact search: compare
    // against brute force on the union
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
      .select("neighbor_id").as[Long].collect()
    got.sorted shouldBe bf.sorted
  }

  it should "compact per-append file sets and drop double-appended rows" in {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val old = emb.filter(col("vec_id") % 2 === 0)
    val fresh = emb.filter(col("vec_id") % 2 =!= 0)
    val path = tmpDir()
    Similarity.buildIvfIndex(old, "vec_id", "embedding", path, nlist = 8)
    Similarity.appendIvfIndex(fresh, "vec_id", "embedding", path)
    Similarity.appendIvfIndex(fresh, "vec_id", "embedding", path) // blind retry
    spark.read.parquet(s"$path/postings").count() shouldBe
      old.count() + 2 * fresh.count()
    Similarity.compactIvfIndex(spark, path)
    // dedupe restored the corpus, and search equals brute force again
    spark.read.parquet(s"$path/postings").count() shouldBe emb.count()
    val q = emb.filter(col("vec_id") < 3)
    Similarity.searchIvfIndex(spark, path, q, "vec_id", "embedding",
        k = 5, nprobe = 8)
      .select("neighbor_id").as[Long].collect().sorted shouldBe
      Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select("neighbor_id").as[Long].collect().sorted
    // batches collapsed to one compact batch, one file set per cell
    val batchDirs = new java.io.File(s"$path/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    batchDirs.map(_.getName).toSeq match {
      case Seq(one) => one should startWith("batch=compact-")
      case other    => fail(s"expected one compact batch dir, got $other")
    }
    val cellDirs = batchDirs.head.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    cellDirs.length should be > 0
    all(cellDirs.map(_.listFiles().count(_.getName.endsWith(".parquet")))) shouldBe 1
  }

  it should "make keyed re-appends idempotent" in {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val old = emb.filter(col("vec_id") % 2 === 0)
    val fresh = emb.filter(col("vec_id") % 2 =!= 0)
    val path = tmpDir()
    Similarity.buildIvfIndex(old, "vec_id", "embedding", path, nlist = 8)
    Similarity.appendIvfIndex(fresh, "vec_id", "embedding", path,
      batchId = Some("b7"))
    Similarity.appendIvfIndex(fresh, "vec_id", "embedding", path,
      batchId = Some("b7")) // retry overwrites its own batch partition
    spark.read.parquet(s"$path/postings").count() shouldBe emb.count()
    // a compaction consumes the id: replaying the append afterwards
    // must no-op instead of re-adding the folded rows
    Similarity.compactIvfIndex(spark, path)
    Similarity.appendIvfIndex(fresh, "vec_id", "embedding", path,
      batchId = Some("b7")) shouldBe 0L
    spark.read.parquet(s"$path/postings").count() shouldBe emb.count()
    // and a fresh-keyed batch is surgically removable
    Similarity.appendIvfIndex(fresh, "vec_id", "embedding", path,
      batchId = Some("b8"))
    Similarity.dropIndexBatch(spark, path, "b8")
    spark.read.parquet(s"$path/postings").count() shouldBe emb.count()
  }
}
