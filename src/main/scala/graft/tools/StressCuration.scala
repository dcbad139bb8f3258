package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stress probe for the round-9 curation operators at `copies`× sf0.1:
  * DSIR exact + frozen-LM importance scoring and the deterministic
  * training-order shuffle over a concatenated documents corpus, and
  * SemDeDup over a perturbed-copy embeddings corpus. Prints wall time and
  * the same per-stage task-skew report as [[StressDedup]] — Zipf-heavy
  * word keys are the interesting skew case for the exact LM join. */
object StressCuration {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val skew = new StressDedup.SkewListener
    spark.sparkContext.addSparkListener(skew)

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text", "lang")
    val corpus = (0 until copies).map { c =>
      if (c == 0) base
      else base.select((col("doc_id") + c * 10000000L).as("doc_id"),
        concat(col("text"), lit(s" rev$c")).as("text"), col("lang"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[stress] docs corpus: ${corpus.count()} (${copies}x sf0.1)")

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val vecs = (0 until copies).map { c =>
      if (c == 0) emb.select("vec_id", "embedding")
      else emb.select((col("vec_id") + c * 10000000L).as("vec_id"),
        // deterministic per-copy perturbation: same direction family,
        // slightly rotated magnitudes — cluster-heavy like real dup pools
        transform(col("embedding"),
          x => x * (lit(1.0f) + lit(c.toFloat / 1000f))).as("embedding"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[stress] vec corpus: ${vecs.count()} (${copies}x sf0.1)")

    def tm(name: String)(f: => Any): Unit = {
      Thread.sleep(500)
      skew.reset(); System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name%-18s ${(System.nanoTime - t0) / 1e9}%7.1f s -> $r")
      Thread.sleep(500)
      println(skew.report())
    }

    tm("importance_exact")(
      graft.ext.Importance.importanceScores(corpus, "doc_id", "text",
          col("lang") === "en")
        .agg(count(lit(1)), sum("imp_logratio")).head())
    tm("frozen_lm_score") {
      val lm = graft.ext.Importance.trainHashedLm(corpus, "text",
        col("lang") === "en")
      corpus.select(graft.ext.Importance.scoreWith(lm, col("text")).as("s"))
        .agg(count(lit(1)), sum("s")).head()
    }
    tm("train_order")(
      graft.ext.Split.trainOrder(corpus, Seq("doc_id"), "ep0", 256)
        .groupBy("shard").count().agg(max("count"), min("count")).head())
    tm("semdedup")(
      graft.ext.SemDedup.semanticDedup(vecs, "vec_id", "embedding",
          k = math.max(64, copies * 4), tau = 0.999)
        .agg(count(lit(1)), sum(when(!col("keep"), 1L).otherwise(0L))).head())
    // round-9 continuation operators: all per-doc or sketch-shaped, so the
    // interesting question is pure throughput + whether any stage skews
    tm("repetition")(
      graft.ext.TextAnalysis.repetitionSignals(corpus, "text")
        .agg(count(lit(1)),
          sum(when(col("rep_keep"), 1L).otherwise(0L))).head())
    tm("heavy_words")(
      graft.ext.Frequent.heavyWords(corpus, "text", minFreqPpm = 2000L)
        .agg(count(lit(1)), sum("cnt")).head())
    // adversarial MG decrement storm: every item distinct, so a saturated
    // sketch decrements-all once per k arrivals — the amortized-O(1) claim
    // under its worst input (Zipf hits the cheap increment path instead)
    tm("heavy_words_storm")(
      graft.ext.Frequent.heavyHitters(
        corpus.select(explode(graft.GraftFunctions.whitespaceTokens(
            col("text"))).as("w"))
          .select(concat(col("w"), lit("#"),
            monotonically_increasing_id()).as("item")),
        "item", minFreqPpm = 2000L)
        .agg(count(lit(1))).head())
    tm("vocab_divergence")(
      graft.ext.Importance.vocabDivergence(
        corpus.filter(col("lang") === "en"),
        corpus.filter(col("lang") =!= "en"), "text").head())
    tm("bpe_train_count") {
      val m = graft.ext.Bpe.train(corpus, "text", numMerges = 500)
      val toks = corpus.select(m.tokenCountCol(col("text")).as("n"))
        .agg(sum("n")).head()
      s"merges=${m.merges.size} tokens=$toks"
    }
    spark.stop()
  }
}
