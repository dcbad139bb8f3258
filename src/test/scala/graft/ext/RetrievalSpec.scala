package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Retrieval.bm25TopK"

  // hand-checkable corpus: term frequencies and lengths chosen so the
  // expected ranking is derivable from the BM25 formula by hand
  private def corpus() = Seq(
    (1L, "apple apple apple banana"),
    (2L, "apple banana cherry date"),
    (3L, "banana banana banana banana"),
    (4L, "cherry date elderberry fig"),
    (5L, "apple")
  ).toDF("doc_id", "text")

  private def bruteBm25(docs: Seq[(Long, Seq[String])], query: Seq[String],
                        k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / docs.size
    val qTerms = query.distinct
    val df = qTerms.map(t => t -> docs.count(_._2.contains(t))).toMap
    docs.flatMap { case (id, toks) =>
      val s = qTerms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) 0.0
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          idf * tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * toks.size / avgdl))
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }.toMap
  }

  it should "match a brute-force in-memory BM25 on every score" in {
    val q = Seq((10L, "apple banana"), (11L, "cherry")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(corpus(), "doc_id", "text", q, "qid", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val docs = Seq(
      1L -> Seq("apple", "apple", "apple", "banana"),
      2L -> Seq("apple", "banana", "cherry", "date"),
      3L -> Seq("banana", "banana", "banana", "banana"),
      4L -> Seq("cherry", "date", "elderberry", "fig"),
      5L -> Seq("apple"))
    val exp10 = bruteBm25(docs, Seq("apple", "banana"))
    val exp11 = bruteBm25(docs, Seq("cherry"))
    got.keySet shouldBe (exp10.keys.map((10L, _)) ++ exp11.keys.map((11L, _))).toSet
    got.foreach { case ((qid, did), s) =>
      val e = if (qid == 10L) exp10(did) else exp11(did)
      s shouldBe e +- 1e-12
    }
  }

  it should "rank by score desc with doc_id breaking exact ties" in {
    // two docs with identical token multisets => mathematically tied
    val docs = Seq((7L, "tie tie other"), (3L, "tie tie other"),
      (9L, "tie")).toDF("doc_id", "text")
    val q = Seq((1L, "tie")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", k = 3)
      .orderBy("rank").collect()
    // doc 9 wins on length normalization; the mathematically tied pair
    // (3, 7) then orders by doc_id asc
    got.map(_.getLong(1)) shouldBe Array(9L, 3L, 7L)
    got.map(_.getInt(3)) shouldBe Array(1, 2, 3)
  }

  it should "respect k and drop docs with no query term" in {
    val q = Seq((1L, "apple")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(corpus(), "doc_id", "text", q, "qid", "qtext", k = 2)
      .collect()
    got.length shouldBe 2
    // docs 3 and 4 contain no 'apple' and must never appear at any k
    val all = Retrieval.bm25TopK(corpus(), "doc_id", "text", q, "qid", "qtext", k = 100)
      .collect().map(_.getLong(1)).toSet
    all shouldBe Set(1L, 2L, 5L)
  }

  it should "return empty for queries whose terms miss the corpus and on empty corpora" in {
    val qMiss = Seq((1L, "zzz qqq")).toDF("qid", "qtext")
    Retrieval.bm25TopK(corpus(), "doc_id", "text", qMiss, "qid", "qtext", k = 5)
      .count() shouldBe 0L
    val empty = corpus().limit(0)
    val q = Seq((1L, "apple")).toDF("qid", "qtext")
    Retrieval.bm25TopK(empty, "doc_id", "text", q, "qid", "qtext", k = 5)
      .count() shouldBe 0L
  }

  it should "retrieve CJK text without whitespace" in {
    // script-aware tokenization: each Han char is a token, so a Chinese
    // query matches an unspaced Chinese document
    val docs = Seq((1L, "你好世界"), (2L, "plain english")).toDF("doc_id", "text")
    val q = Seq((1L, "世界")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", k = 5)
      .collect()
    got.map(_.getLong(1)).toSet shouldBe Set(1L)
  }

  it should "quantize ranking when roundScoresTo is set" in {
    val q = Seq((1L, "apple banana")).toDF("qid", "qtext")
    val r = Retrieval.bm25TopK(corpus(), "doc_id", "text", q, "qid", "qtext",
      k = 10, roundScoresTo = Some(2))
    r.collect().foreach { row =>
      val s = row.getDouble(2)
      (s * 100).round / 100.0 shouldBe s
    }
  }

  it should "plan broadcast joins against the query side and no Window" in {
    val q = Seq((1L, "apple banana")).toDF("qid", "qtext")
    for (df <- Seq(
      Retrieval.bm25TopK(corpus(), "doc_id", "text", q, "qid", "qtext", k = 5),
      Retrieval.tfIdfTopK(corpus(), "doc_id", "text", q, "qid", "qtext", k = 5))) {
      val plan = df.queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin")
      plan should not include "Window"
      plan should not include "CartesianProduct"
    }
  }

  behavior of "Retrieval.tfIdfTopK"

  it should "match a brute-force in-memory tf-idf cosine on every score" in {
    val q = Seq((10L, "apple banana"), (11L, "cherry")).toDF("qid", "qtext")
    val got = Retrieval.tfIdfTopK(corpus(), "doc_id", "text", q, "qid", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val docs = Seq(
      1L -> Seq("apple", "apple", "apple", "banana"),
      2L -> Seq("apple", "banana", "cherry", "date"),
      3L -> Seq("banana", "banana", "banana", "banana"),
      4L -> Seq("cherry", "date", "elderberry", "fig"),
      5L -> Seq("apple"))
    val n = docs.size.toDouble
    val df = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size).toMap
    def weights(toks: Seq[String]): Map[String, Double] =
      toks.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toDouble / toks.size * math.log(n / df(t))
      }
    def cos(a: Map[String, Double], b: Map[String, Double]): Double = {
      val dot = a.keySet.intersect(b.keySet).toSeq.map(t => a(t) * b(t)).sum
      val na = math.sqrt(a.values.map(x => x * x).sum)
      val nb = math.sqrt(b.values.map(x => x * x).sum)
      dot / (na * nb)
    }
    for ((qid, qtoks) <- Seq(10L -> Seq("apple", "banana"), 11L -> Seq("cherry"))) {
      val qw = weights(qtoks)
      docs.foreach { case (did, dtoks) =>
        val expected = cos(qw, weights(dtoks))
        if (expected > 0) got((qid, did)) shouldBe expected +- 1e-12
        else got.get((qid, did)) shouldBe None
      }
    }
  }

  it should "agree with bm25TopK on the candidate doc set but rank by cosine" in {
    val q = Seq((1L, "apple")).toDF("qid", "qtext")
    val vs = Retrieval.tfIdfTopK(corpus(), "doc_id", "text", q, "qid", "qtext", k = 10)
      .collect()
    // same matching docs as bm25 (docs containing 'apple')
    vs.map(_.getLong(1)).toSet shouldBe Set(1L, 2L, 5L)
    // doc 5 = pure 'apple' vector: cosine 1 with the query, rank 1
    vs.minBy(_.getInt(3)).getLong(1) shouldBe 5L
    vs.find(_.getLong(1) == 5L).get.getDouble(2) shouldBe 1.0 +- 1e-12
  }

  behavior of "Retrieval text index"

  private def idxDir(): String =
    graft.SparkSpec.tempDir("txtidx").toString + "/idx"

  it should "serve identical results to direct bm25TopK from the persisted index" in {
    // the two paths sum contributions under different partitionings, so
    // raw doubles can differ in the last ulp — rank-quantization (the
    // operator's own reproducibility knob) makes the comparison exact
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Seq((1L, "spark join filter"), (2L, "customer order data"))
      .toDF("qid", "qtext")
    val path = idxDir()
    val n = Retrieval.buildTextIndex(docs, "doc_id", "text", path, buckets = 16)
    n shouldBe docs.count()
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext",
        k = 8, roundScoresTo = Some(9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val indexed = Retrieval.searchTextIndex(spark, path, q, "qid", "qtext", k = 8,
        roundScoresTo = Some(9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    indexed shouldBe direct
  }

  it should "prune unqueried buckets at the postings scan" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Seq((1L, "spark")).toDF("qid", "qtext")
    val path = idxDir()
    Retrieval.buildTextIndex(docs, "doc_id", "text", path, buckets = 16)
    val search = Retrieval.searchTextIndex(spark, path, q, "qid", "qtext", k = 5)
    val plan = search.queryExecution.executedPlan.toString
    plan should include regex "PartitionFilters: \\[.*bucket.*"
    search.count() shouldBe 5L
  }

  it should "handle an empty corpus index" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = idxDir()
    Retrieval.buildTextIndex(docs.limit(0), "doc_id", "text", path) shouldBe 0L
    val q = Seq((1L, "spark")).toDF("qid", "qtext")
    Retrieval.searchTextIndex(spark, path, q, "qid", "qtext", k = 5)
      .count() shouldBe 0L
  }

  it should "append == rebuild: same postings multiset, same stats, same search" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val pAppend = idxDir(); val pRebuild = idxDir()
    Retrieval.buildTextIndex(a, "doc_id", "text", pAppend, buckets = 16)
    Retrieval.appendTextIndex(b, "doc_id", "text", pAppend) shouldBe b.count()
    Retrieval.buildTextIndex(docs, "doc_id", "text", pRebuild, buckets = 16)
    // corpus stats are the SUM over per-batch rows
    def stats(p: String) = spark.read.parquet(s"$p/stats")
      .groupBy().agg(sum("n_docs"), sum("sum_dl"), max("buckets"))
      .as[(Long, Long, Int)].head()
    stats(pAppend) shouldBe stats(pRebuild)
    def postings(p: String) = spark.read.parquet(s"$p/postings")
      .select("term", "doc_id", "dl", "tf", "bucket")
      .as[(String, Long, Long, Long, Long)].collect().sorted
    postings(pAppend) shouldBe postings(pRebuild)
    val q = Seq((1L, "spark join filter")).toDF("qid", "qtext")
    def search(p: String) = Retrieval.searchTextIndex(spark, p, q,
        "qid", "qtext", k = 8, roundScoresTo = Some(9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    search(pAppend) shouldBe search(pRebuild)
    // appending onto an empty-built index just lands the first batch
    val pEmpty = idxDir()
    Retrieval.buildTextIndex(docs.limit(0), "doc_id", "text", pEmpty,
      buckets = 16)
    Retrieval.appendTextIndex(docs, "doc_id", "text", pEmpty) shouldBe docs.count()
    search(pEmpty) shouldBe search(pRebuild)
  }

  it should "make keyed re-appends idempotent and batches droppable" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val path = idxDir(); val pRebuild = idxDir()
    Retrieval.buildTextIndex(a, "doc_id", "text", path, buckets = 16)
    Retrieval.appendTextIndex(b, "doc_id", "text", path,
      batchId = Some("day-2026-08-14"))
    // the torn-append retry: postings AND the stats row overwrite
    // themselves — summed corpus stats stay exact
    Retrieval.appendTextIndex(b, "doc_id", "text", path,
      batchId = Some("day-2026-08-14"))
    Retrieval.buildTextIndex(docs, "doc_id", "text", pRebuild, buckets = 16)
    def stats(p: String) = spark.read.parquet(s"$p/stats")
      .groupBy().agg(sum("n_docs"), sum("sum_dl"), max("buckets"))
      .as[(Long, Long, Int)].head()
    stats(path) shouldBe stats(pRebuild)
    val q = Seq((1L, "spark join filter")).toDF("qid", "qtext")
    def search(p: String) = Retrieval.searchTextIndex(spark, p, q,
        "qid", "qtext", k = 8, roundScoresTo = Some(9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    search(path) shouldBe search(pRebuild)
    // dropping the batch removes its postings and its stats row
    Retrieval.dropTextBatch(spark, path, "day-2026-08-14")
    stats(path)._1 shouldBe a.count()
    an[IllegalArgumentException] should be thrownBy
      Retrieval.appendTextIndex(b, "doc_id", "text", path,
        batchId = Some("bad id"))
    an[IllegalArgumentException] should be thrownBy
      Retrieval.appendTextIndex(b, "doc_id", "text", path,
        batchId = Some("init"))
    // a compaction consumes keyed ids: replaying the trigger afterwards
    // must no-op — the stats sum (the double-count hazard) stays exact
    Retrieval.appendTextIndex(b, "doc_id", "text", path,
      batchId = Some("day-2"))
    Retrieval.compactTextIndex(spark, path)
    Retrieval.appendTextIndex(b, "doc_id", "text", path,
      batchId = Some("day-2")) shouldBe 0L
    stats(path) shouldBe stats(pRebuild)
    search(path) shouldBe search(pRebuild)
  }

  it should "treat a tokenless corpus and an all-batches-dropped index as empty, not crash" in {
    // punctuation-only docs: n_docs > 0 but zero posting rows anywhere —
    // the postings relation must not poison schema inference
    val docs = Seq((1L, "!!! ???"), (2L, "... --- !!!")).toDF("doc_id", "text")
    val p = idxDir()
    Retrieval.buildTextIndex(docs, "doc_id", "text", p, buckets = 4) shouldBe 2L
    val q = Seq((1L, "spark")).toDF("qid", "qtext")
    Retrieval.searchTextIndex(spark, p, q, "qid", "qtext", k = 3)
      .count() shouldBe 0L
    // dropping the last batch leaves empty relation dirs: searches read
    // as empty, appends reject with a clear contract error (the bucket
    // modulus is unknowable), neither crashes at schema inference
    Retrieval.dropTextBatch(spark, p, "init")
    Retrieval.searchTextIndex(spark, p, q, "qid", "qtext", k = 3)
      .count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Retrieval.appendTextIndex(docs, "doc_id", "text", p)
  }

  it should "compact accumulated append file sets down to O(1) files per bucket" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = idxDir()
    Retrieval.buildTextIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", path, buckets = 8)
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", path)
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", path)
    // files per bucket ACROSS batch partitions (batch=<id>/bucket=<b>)
    def bucketFiles(): Map[String, Int] = {
      val root = new java.io.File(s"$path/postings")
      root.listFiles().filter(_.getName.startsWith("batch="))
        .flatMap(_.listFiles().filter(_.getName.startsWith("bucket=")))
        .groupBy(_.getName)
        .map { case (b, ds) =>
          b -> ds.map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum }
    }
    val before = spark.read.parquet(s"$path/postings")
      .select("term", "doc_id", "tf").as[(String, Long, Long)].collect().sorted
    bucketFiles().values.max should be > 1 // three write rounds accumulated
    Retrieval.compactTextIndex(spark, path)
    bucketFiles().values.max shouldBe 1
    // batches collapsed to one, stats to one summed row
    new java.io.File(s"$path/postings").listFiles()
      .count(_.getName.startsWith("batch=")) shouldBe 1
    spark.read.parquet(s"$path/stats").count() shouldBe 1L
    // compaction must not change a single posting
    spark.read.parquet(s"$path/postings")
      .select("term", "doc_id", "tf").as[(String, Long, Long)]
      .collect().sorted shouldBe before
    // and the compacted index still serves
    val q = Seq((1L, "spark join filter")).toDF("qid", "qtext")
    Retrieval.searchTextIndex(spark, path, q, "qid", "qtext", k = 5)
      .count() shouldBe 5L
  }

  behavior of "Retrieval.hybridSearchIndexes"

  it should "serve the vector leg from a PQ artifact, exactly under deep rerank" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tT = idxDir(); val tV = idxDir(); val tPQ = idxDir()
    Retrieval.buildTextIndex(docs, "doc_id", "text", tT, buckets = 16)
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", tV, nlist = 8)
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", tPQ,
      nlist = 8, m = 16, codebookSize = 32, maxIter = 5)
    val q = Seq((1L, "spark join filter"), (2L, "customer order data"))
      .toDF("qid", "qtext")
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "qid")
    def run(vt: String, path: String,
            rr: Option[org.apache.spark.sql.DataFrame]) =
      Retrieval.hybridSearchIndexes(spark, tT, path, q,
          "qid", "qtext", "qvec", k = 8, nprobe = 8,
          roundScoresTo = Some(9), vecIndexType = vt, rerank = rr,
          rerankFactor = 100, rerankIdCol = Some("vec_id"),
          rerankVecCol = Some("embedding"))
        .select("query_id", "doc_id", "rank")
        .as[(Long, Long, Int)].collect().sorted
    // nprobe = nlist makes the ivf leg exact; the PQ leg with an
    // all-candidate exact rerank reaches the same exact ranking, so the
    // two artifact stacks must fuse IDENTICALLY
    run("ivfpq", tPQ, Some(emb)).toSeq shouldBe run("ivf", tV, None).toSeq
    // pure-ADC mode: the vector leg ranks from compressed postings
    // alone (no full vector anywhere) and still fills k per query
    val adc = Retrieval.hybridSearchIndexes(spark, tT, tPQ, q,
      "qid", "qtext", "qvec", k = 8, nprobe = 8, vecIndexType = "ivfpq")
    adc.groupBy("query_id").count().select("count")
      .as[Long].collect() shouldBe Array(8L, 8L)
    an[IllegalArgumentException] should be thrownBy
      Retrieval.hybridSearchIndexes(spark, tT, tV, q, "qid", "qtext",
        "qvec", k = 8, vecIndexType = "flat")
  }

  behavior of "Retrieval.rrfFuse"

  it should "match hand-computed reciprocal-rank fusion of two lists" in {
    // list A ranks docs 1,2,3; list B ranks 3,1 — doc 3: 1/63 + 1/61,
    // doc 1: 1/61 + 1/62, doc 2: 1/62
    val a = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 3L, 1), (1L, 1L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    val s1 = 1.0 / 61 + 1.0 / 62
    val s3 = 1.0 / 63 + 1.0 / 61
    val s2 = 1.0 / 62
    s1 should be > s3 // doc 1 wins
    got shouldBe Array((1L, s1, 1), (3L, s3, 2), (2L, s2, 3))
  }

  it should "respect k, break exact ties by doc_id, and handle disjoint queries" in {
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (2L, 30L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 10L, 2)).toDF("query_id", "doc_id", "rank")
    // docs 10 and 20 have identical fused scores {1/61 + 1/62}: id asc
    val got = Retrieval.rrfFuse(Seq(a, b), k = 1)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    got shouldBe Array((1L, 10L, 1), (2L, 30L, 1))
  }

  behavior of "Retrieval.tfIdf"

  it should "match the closed-form tf-idf on a tiny corpus" in {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b c c")).toDF("doc_id", "text")
    val got = Retrieval.tfIdf(docs, "doc_id", "text", minDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // df: a->2, b->2, c->2 (all kept at minDocFreq=2); n=3
    val ln32 = math.log(3.0 / 2.0)
    got((1L, "a")) shouldBe (2.0 / 3.0 * ln32) +- 1e-12
    got((1L, "b")) shouldBe (1.0 / 3.0 * ln32) +- 1e-12
    got((2L, "a")) shouldBe (1.0 / 2.0 * ln32) +- 1e-12
    got((3L, "c")) shouldBe (2.0 / 3.0 * ln32) +- 1e-12
    got.keySet.map(_._2) shouldBe Set("a", "b", "c")
  }

  it should "prune terms below minDocFreq" in {
    val docs = Seq((1L, "common rare1"), (2L, "common rare2")).toDF("doc_id", "text")
    val got = Retrieval.tfIdf(docs, "doc_id", "text", minDocFreq = 2)
      .select("term").distinct().as[String].collect()
    got shouldBe Array("common")
  }
}
