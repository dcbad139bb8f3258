package graft.tools

import graft.ext.{Dedup, DedupIndex, Retrieval, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-vs-serve cost split for the persisted index family at a given
  * SF dir (run at sf0.1 / sf1 for the SURVEY scale record):
  *
  *   - text index: build wall, append wall, index-served BM25 wall vs
  *     direct bm25TopK wall, and the pruned-partition count at the
  *     postings scan;
  *   - dedup index: build wall, then the gate's incoming construction
  *     searched via DedupIndex.minhashNewAgainst (corpus NOT re-shingled)
  *     vs the direct operator (corpus re-shingled every call);
  *   - IVF-PQ index: build wall vs from-disk search wall.
  *
  * Not part of any gate. One clean sequential pass; run on an idle
  * machine for comparable numbers. */
object ProbeIndexes {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = java.nio.file.Files.createTempDirectory("probeidx").toString

    // ---- text index ----
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val q = Seq((1L, "spark join filter"), (2L, "customer order data"),
      (3L, "window merge sort scan"), (4L, "slow batch value stream"))
      .toDF("qid", "qtext")
    time("text build (half corpus)") {
      Retrieval.buildTextIndex(half1, "doc_id", "text", s"$base/tidx")
    }
    time("text append (other half)") {
      Retrieval.appendTextIndex(half2, "doc_id", "text", s"$base/tidx")
    }
    time("text compact") { Retrieval.compactTextIndex(spark, s"$base/tidx") }
    val srch = Retrieval.searchTextIndex(spark, s"$base/tidx", q,
      "qid", "qtext", k = 10, roundScoresTo = Some(5))
    time("text search (index-served)") { srch.count() }
    val pf = "PartitionFilters: \\[[^\\]]*".r
      .findFirstIn(srch.queryExecution.executedPlan.toString)
    println(s"== text search partition filter: ${pf.getOrElse("NONE")}")
    time("text search (direct bm25TopK, corpus re-tokenized)") {
      Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext",
        k = 10, roundScoresTo = Some(5)).count()
    }

    // ---- dedup index ----
    // the append-a-crawl shape: a SMALL incoming batch (1% of corpus as
    // near-copies + 1% novel) against the full accumulated corpus — the
    // regime where the direct operator's existing-side re-shingle + bloom
    // rebuild dominates and the persisted index should win
    // `copies` (arg 2, default 1) unions offset-keyed copies of the
    // corpus into the EXISTING side only, so the accumulated-corpus size
    // scales while the batch stays fixed — the dimension along which the
    // direct operator degrades and the index must not
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val off0 = docs.agg(max("doc_id")).first().getLong(0) + 1
    val existing = (0 until copies).map { c =>
      docs.select((col("doc_id") + lit(c.toLong * off0 * 10)).as("doc_id"),
        if (c == 0) col("text")
        else concat(lit(s"copy$c "), col("text")).as("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"== existing corpus: ${existing.count()} docs (copies=$copies)")
    val off = copies.toLong * off0 * 10 + off0
    val planted = docs.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + off).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 10, 20))").as("text"))
    val novel = docs.filter(col("doc_id") % 100 === 1)
      .select((col("doc_id") + off).as("doc_id"), reverse(col("text")).as("text"))
    val incoming = planted.unionByName(novel).localCheckpoint(true)
    time("dedup index build (full corpus)") {
      DedupIndex.build(existing, "doc_id", "text", s"$base/didx",
        numHashes = 64, bands = 32)
    }
    val nServed = time("dedup search (index-served, corpus NOT re-shingled)") {
      DedupIndex.minhashNewAgainst(spark, s"$base/didx", incoming,
        "doc_id", "text", threshold = 0.7).count()
    }
    val nDirect = time("dedup search (direct, corpus re-shingled)") {
      Dedup.minhashNewAgainst(existing, incoming, "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.7).count()
    }
    println(s"== dedup pair counts: served=$nServed direct=$nDirect")
    time("exact newAgainst (index-served)") {
      DedupIndex.newAgainst(spark, s"$base/didx", incoming, "text").count()
    }
    time("exact newAgainst (direct)") {
      Dedup.newAgainst(existing, incoming, "text").count()
    }
    // the r14-10 append regime: keyed append wall, the idempotent retry
    // (same id — must cost ~the same and change nothing), and the
    // compaction that collapses accumulated batches
    time("dedup keyed append (incoming batch)") {
      DedupIndex.append(incoming, "doc_id", "text", s"$base/didx",
        batchId = Some("probe"))
    }
    time("dedup keyed re-append (idempotent retry, same id)") {
      DedupIndex.append(incoming, "doc_id", "text", s"$base/didx",
        batchId = Some("probe"))
    }
    time("dedup compact") { DedupIndex.compact(spark, s"$base/didx") }

    // ---- streaming-sink scale (r15): per-trigger append latency as the
    // artifact accumulates. Drives the StreamOps.dedupIndexSink and
    // textIndexSink callbacks directly with equal-sized slices — the
    // exact code a foreachBatch trigger runs, minus the fixed
    // streaming-harness overhead (checkpoint IO, source listing), so the
    // measured dimension is the one that matters: append cost MUST stay
    // ~flat in trigger number because a batch writes only its own
    // batch=<id> partitions + one Bloom segment, never rewriting the
    // accumulated corpus. A rising trend here is the scale bug the
    // artifact design exists to prevent. ----
    val nTriggers = 8
    val dSinkPath = s"$base/stream_didx"
    val tSinkPath = s"$base/stream_tidx"
    DedupIndex.build(docs.limit(0), "doc_id", "text", dSinkPath,
      numHashes = 64, bands = 32)
    Retrieval.buildTextIndex(docs.limit(0), "doc_id", "text", tSinkPath)
    val dSink = graft.streaming.StreamOps.dedupIndexSink(
      dSinkPath, "doc_id", "text")
    val tSink = graft.streaming.StreamOps.textIndexSink(
      tSinkPath, "doc_id", "text")
    (0 until nTriggers).foreach { i =>
      val slice = docs.filter(col("doc_id") % nTriggers === i)
        .localCheckpoint(true) // slice cost out of the measured append
      val n = slice.count()
      val t0 = System.nanoTime()
      dSink(slice, i.toLong)
      val dDt = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      tSink(slice, i.toLong)
      val tDt = (System.nanoTime() - t1) / 1e9
      val acc = spark.read.parquet(s"$dSinkPath/fingerprints").count()
      println(f"== stream-sink trigger $i: rows=$n accumulated=$acc " +
        f"dedup_append=$dDt%.2f s text_append=$tDt%.2f s")
    }

    // ---- IVF-PQ index ----
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = emb.filter(col("vec_id") < 10)
    time("ivfpq build") {
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", s"$base/vidx",
        nlist = 16, m = 16, codebookSize = 32, maxIter = 5)
    }
    time("ivfpq search (from disk, rerank 20)") {
      Similarity.searchIvfPqIndex(spark, s"$base/vidx", qv,
        "vec_id", "embedding", k = 5, nprobe = 10, rerankFactor = 20,
        rerank = Some(emb)).count()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.stop()
  }
}
