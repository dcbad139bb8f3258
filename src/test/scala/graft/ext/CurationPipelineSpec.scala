package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end integration of the curation chain over REAL testdata —
  * exact dedup → near-dup clustering (keep one) → benchmark
  * decontamination → quality top-fraction → token budget — each stage
  * consuming the previous stage's output, with planted rows proving
  * every stage actually fires. The operator-level oracles live in their
  * own specs/gates; this locks the COMPOSITION. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  it should "run dedup -> decontaminate -> quality filter -> budget as one chain" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val n0 = docs.count()
    // plants: an exact duplicate of doc 1, a truncation near-dup of doc
    // 0, and the benchmark doc is 7 — all must be gone at the end
    val bench = docs.filter(col("doc_id") === 7)
    val corpus = docs
      .unionByName(docs.filter(col("doc_id") === 1)
        .select((col("doc_id") + 2000).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") === 0)
        .select((col("doc_id") + 1000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) - 12, 30))").as("text")))

    // 1. exact dedup (fingerprint shuffle): keeps min(id) per content
    val exactKept = Dedup.exactByFingerprint(corpus, "doc_id", "text")
      .select("doc_id")
    val afterExact = corpus.join(exactKept, "doc_id")
    afterExact.count() shouldBe n0 + 1 // only the verbatim copy collapsed
    afterExact.filter(col("doc_id") === 2001).count() shouldBe 0

    // 2. near-dup clustering + keep-one: the planted truncation pairs
    // with its source; min-id representative (the original) survives
    val pairs = Dedup.minhashNearDups(afterExact, "doc_id", "text",
      threshold = 0.7)
    val afterNear = Dedup.dropNearDups(afterExact, "doc_id",
      Dedup.connectedComponents(pairs))
    afterNear.filter(col("doc_id") === 1000).count() shouldBe 0
    afterNear.filter(col("doc_id") === 0).count() shouldBe 1
    val n2 = afterNear.count()
    n2 should be < (n0 + 1)

    // 3. benchmark decontamination: doc 7 (and any doc sharing a
    // 40-gram with it) drops
    val afterDecon = TextAnalysis.decontaminate(afterNear, "doc_id", "text",
      bench, "text", n = 40)
    afterDecon.filter(col("doc_id") === 7).count() shouldBe 0
    val n3 = afterDecon.count()
    n3 should be < n2

    // 4. quality top-60% by composite score, then a token budget on what
    // remains — each stage shrinks or holds, never grows
    val scored = TextAnalysis.qualitySignals(afterDecon, "text")
    val afterQuality = ScoreFilter.keepTopFraction(
      scored, "quality_score", 0.6, tieBreak = Seq("doc_id"))
    afterQuality.count() shouldBe math.ceil(n3 * 0.6).toLong
    val afterBudget = ScoreFilter.keepTopByBudget(
      afterQuality, "quality_score", "n_tokens", 800L, tieBreak = Seq("doc_id"))
    val kept = afterBudget.agg(sum("n_tokens")).head().getLong(0)
    assert(kept <= 800L,
      s"budget stage kept $kept tokens, over the 800-token budget")
    afterBudget.count() should be > 0L
    // the chain preserves the corpus schema + the quality columns
    afterBudget.columns should contain allOf ("doc_id", "text", "n_tokens")
  }

  it should "run span strip -> segment dedup -> incremental gate -> mixture -> report" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // plants: doc 3's text appended verbatim into doc 11 (a >=100-char
    // cross-doc span), and a shared segment header on every 4th doc
    val span = docs.filter(col("doc_id") === 3).head().getString(1)
    val corpus = docs.select(col("doc_id"),
      when(col("doc_id") === 11, concat(col("text"), lit(" "), lit(span)))
        .when(col("doc_id") % 4 === 0, concat(lit("Nav Header. "), col("text")))
        .otherwise(col("text")).as("text"))

    // 1. cross-doc span strip (keep-first): doc 11 loses the copied span
    val spans = Dedup.duplicatedSpans(corpus, "doc_id", "text", minLen = 100)
    spans.filter(col("id_a") === 3 && col("id_b") === 11).count() should be >= 1L
    val afterSpans = Dedup.stripDuplicatedSpans(corpus, "doc_id", "text", spans)
    afterSpans.filter(col("doc_id") === 11).head().getString(1) should not include span

    // 2. global keep-first segment dedup: one doc keeps the Nav Header
    val afterSeg = TextAnalysis.dedupSegmentsKeepFirst(
      afterSpans, "doc_id", "text", ". ")
    afterSeg.filter(col("text").contains("Nav Header")).count() shouldBe 1L

    // 3. incremental dedup against an "already-shipped" half
    val shipped = afterSeg.filter(col("doc_id") < 250)
    val incoming = afterSeg.filter(col("doc_id") >= 250)
    val newRows = Dedup.newAgainst(shipped, incoming, "text")
    newRows.count() should be <= incoming.count()

    // 4. mixture resample at per-bucket weights, then the corpus card
    val mixIn = newRows.withColumn("bucket", (col("doc_id") % 3).cast("string"))
      .withColumn("score",
        ((col("doc_id") * 1103515245L + 12345L) % 1000003L).cast("double"))
    val mixed = ScoreFilter.keepTopFractionPerKey(mixIn, Seq("bucket"), "score",
      Map("0" -> 0.5), 0.25, Seq("doc_id"))
    val quota = mixIn.groupBy("bucket").count()
      .join(mixed.groupBy("bucket").agg(count(lit(1)).as("kept")), "bucket")
      .filter(col("kept") =!= ceil(col("count") *
        when(col("bucket") === "0", 0.5).otherwise(0.25)).cast("long")).count()
    quota shouldBe 0L
    val report = TextAnalysis.corpusReport(mixed, "text", Seq("bucket"))
    report.agg(sum("n_docs")).head().getLong(0) shouldBe mixed.count()
  }

  it should "run curation filter -> vocab -> tokenize -> pack -> order as one chain" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    // plant a repetition-spam doc that passes the base Gopher rules but
    // must die on the repetition rules
    val spam = Seq((9001L,
      "the fox " + (1 to 30).map(_ => "of and that have with be").mkString(" "),
      "en")).toDF("doc_id", "text", "lang")
    val corpus = docs.unionByName(spam)

    // 1. full Gopher gate (rules + repetition), thresholds tuned to the
    // corpus as real curation does (the synthetic docs carry at most one
    // of the canonical required stopwords, and half sit under 50 words):
    // spam passes the rule half, dies on repetition
    val sig = TextAnalysis.gopherSignals(corpus, "text",
      minWords = 30L, minStopwordHits = 1L)
    val kept = TextAnalysis.repetitionFilter(
      sig.filter(col("keep")).select(col("doc_id"), col("text"), col("lang")),
      "text")
    kept.filter(col("doc_id") === 9001L).count() shouldBe 0L
    kept.count() should be > 100L

    // 2. corpus vocabulary: exact heavy words feed... nothing downstream
    // here, but the pass must agree with a plain groupBy on the SAME slice
    val hw = Frequent.heavyWords(kept, "text", minFreqPpm = 2000L)
      .as[(String, Long)].collect().toMap
    hw should not be empty

    // 3. learned tokenizer on the kept slice; tokenize map-side
    val model = Bpe.train(kept, "text", numMerges = 300)
    val tokenized = kept.select(col("doc_id"),
        model.tokenCountCol(col("text")).as("n_toks"))
    // the corpus's most frequent word must be a single token (as a
    // boundary-final word unit — the form whitespace corpora train)
    val topWord = hw.maxBy(_._2)._1
    model.encodeWord(topWord + Bpe.Marker).length shouldBe 1

    // 4. pack to fixed sequences: the span map conserves every token and
    // never overflows a sequence
    val seqLen = 128L
    val packed = Pack.packSequences(tokenized, "doc_id", "n_toks", seqLen)
    val totalTokens = tokenized.select(sum("n_toks")).head().getLong(0)
    packed.select(sum("span_len")).head().getLong(0) shouldBe totalTokens
    packed.filter(col("span_len") > seqLen).count() shouldBe 0L
    // every sequence except the last is exactly full
    val lastSeq = packed.select(max("seq_id")).head().getLong(0)
    packed.filter(col("seq_id") < lastSeq).groupBy("seq_id")
      .agg(sum("span_len").as("n")).filter(col("n") =!= seqLen)
      .count() shouldBe 0L

    // 5. deterministic training order over the packed sequences
    val ordered = Split.trainOrder(
      packed.select("doc_id", "seq_id"), Seq("doc_id", "seq_id"), "epoch0", 16)
    ordered.count() shouldBe packed.count()
  }
}
