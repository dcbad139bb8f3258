package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance scoring: LLR math against a hand-computed oracle, the
  * hashed path's agreement + broadcast plan, Gumbel resampling contract. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  // target docs speak "ml", raw pool speaks "cooking"; doc 5 is empty
  private lazy val docs = Seq(
    (0L, "gradient descent model training", true),
    (1L, "model training loss gradient", true),
    (2L, "salt pepper butter recipe", false),
    (3L, "butter recipe oven salt", false),
    (4L, "gradient butter", false),
    (5L, "", false)).toDF("doc_id", "text", "is_tgt")

  behavior of "importanceScores"

  it should "match a hand-computed smoothed log-likelihood ratio" in {
    val got = Importance.importanceScores(docs, "doc_id", "text",
        col("is_tgt"))
      .orderBy("id").as[(Long, Long, Double)].collect()

    // replicate the math in plain scala
    val corpus = Seq(
      (0L, "gradient descent model training", true),
      (1L, "model training loss gradient", true),
      (2L, "salt pepper butter recipe", false),
      (3L, "butter recipe oven salt", false),
      (4L, "gradient butter", false),
      (5L, "", false))
    val toks = corpus.map { case (id, t, tg) =>
      (id, t.toLowerCase.split("\\s+").filter(_.nonEmpty), tg) }
    val all = toks.flatMap(_._2)
    val tgt = toks.filter(_._3).flatMap(_._2)
    val vocab = all.distinct
    val v = vocab.size.toDouble
    def llr(w: String): Double = math.log(
      ((tgt.count(_ == w) + 1) / (tgt.size + v)) /
        ((all.count(_ == w) + 1) / (all.size + v)))
    val want = toks.map { case (id, ws, _) =>
      (id, ws.length.toLong, ws.map(llr).sum) }.sortBy(_._1)

    got.map(_._1) shouldBe want.map(_._1).toArray
    got.map(_._2) shouldBe want.map(_._2).toArray
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) =>
      g shouldBe w +- 1e-9 }
    // sanity: target-speak docs score positive, cooking docs negative
    got.take(2).foreach(_._3 should be > 0.0)
    got.slice(2, 4).foreach(_._3 should be < 0.0)
    got(5)._3 shouldBe 0.0 // empty doc
  }

  behavior of "hashedImportanceScores"

  it should "score like the exact path when buckets don't collide" in {
    val exact = Importance.importanceScores(docs, "doc_id", "text",
        col("is_tgt"))
      .select("id", "imp_logratio").as[(Long, Double)].collect().toMap
    val hashed = Importance.hashedImportanceScores(docs, "doc_id", "text",
        col("is_tgt"), nBuckets = 1 << 20)
      .select("id", "imp_logratio").as[(Long, Double)].collect().toMap
    hashed.keySet shouldBe exact.keySet
    // identical math modulo float summation order (no collisions at 2^20)
    exact.foreach { case (id, s) => hashed(id) shouldBe s +- 1e-9 }
  }

  it should "broadcast the bucket LM (no word-keyed shuffle join)" in {
    val plan = Importance.hashedImportanceScores(docs, "doc_id", "text",
        col("is_tgt"))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    // the scoring join must not hash-shuffle the exploded token relation
    "SortMergeJoin".r.findAllIn(plan) shouldBe empty
  }

  it should "still score every doc under heavy collisions (2 buckets)" in {
    val got = Importance.hashedImportanceScores(docs, "doc_id", "text",
      col("is_tgt"), nBuckets = 2)
    got.count() shouldBe 6L
    got.filter(col("imp_logratio").isNull).count() shouldBe 0L
  }

  behavior of "trainHashedLm / scoreWith"

  it should "reproduce the self-trained hashed scores as a pure expression" in {
    val lm = Importance.trainHashedLm(docs, "text", col("is_tgt"),
      nBuckets = 1 << 16)
    val frozen = docs.select(col("doc_id"),
        Importance.scoreWith(lm, col("text")).as("s"))
      .as[(Long, Double)].collect().toMap
    val batch = Importance.hashedImportanceScores(docs, "doc_id", "text",
        col("is_tgt"), nBuckets = 1 << 16)
      .select("id", "imp_logratio").as[(Long, Double)].collect().toMap
    frozen.keySet shouldBe batch.keySet
    batch.foreach { case (id, s) => frozen(id) shouldBe s +- 1e-9 }
  }

  it should "score unseen-bucket tokens with the smoothed default, null text 0" in {
    val lm = Importance.trainHashedLm(docs, "text", col("is_tgt"),
      nBuckets = 1 << 16)
    val novel = Seq((100L, "zzzzqqq xyzzyx"), (101L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = novel.select(col("doc_id"),
        Importance.scoreWith(lm, col("text")).as("s"))
      .as[(Long, Double)].collect().toMap
    got(100L) shouldBe (2 * lm.defaultLlr) +- 1e-9
    got(101L) shouldBe 0.0
  }

  behavior of "nbPosteriors / nbPredict"

  it should "match hand-computed smoothed class log-probabilities" in {
    val got = Importance.nbPosteriors(
        docs.filter(col("doc_id") < 4)
          .withColumn("dom", col("is_tgt").cast("string")),
        "doc_id", "text", "dom")
      .select("id", "cls", "nb_logprob")
      .as[(Long, String, Double)].collect()
      .map { case (i, c, p) => (i, c) -> p }.toMap

    // classes: "true" = ml docs {0,1}, "false" = cooking docs {2,3}
    val mlToks = Seq("gradient", "descent", "model", "training",
      "model", "training", "loss", "gradient")
    val ckToks = Seq("salt", "pepper", "butter", "recipe",
      "butter", "recipe", "oven", "salt")
    val vocab = (mlToks ++ ckToks).distinct.size.toDouble
    def lp(toks: Seq[String], cls: Seq[String]): Double =
      math.log(0.5) + toks.map(w =>
        math.log((cls.count(_ == w) + 1) / (cls.size + vocab))).sum
    val d0 = Seq("gradient", "descent", "model", "training")
    got((0L, "true")) shouldBe lp(d0, mlToks) +- 1e-9
    got((0L, "false")) shouldBe lp(d0, ckToks) +- 1e-9
    got.size shouldBe 8 // 4 docs x 2 classes
  }

  it should "route every doc to its own domain and stay window-free" in {
    val pred = Importance.nbPredict(
      docs.filter(col("doc_id") < 5)
        .withColumn("dom", col("is_tgt").cast("string")),
      "doc_id", "text", "dom")
    pred.queryExecution.executedPlan.toString should not include "Window"
    val byId = pred.select("id", "predicted").as[(Long, String)]
      .collect().toMap
    byId(0L) shouldBe "true"
    byId(1L) shouldBe "true"
    byId(2L) shouldBe "false"
    byId(3L) shouldBe "false"
    byId(4L) shouldBe "false" // "gradient butter" leans cooking (labeled so)
  }

  behavior of "gumbelTopFraction"

  it should "keep ~fraction rows, deterministically, biased toward high scores" in {
    val n = 2000
    val scored = (0 until n).map(i =>
      (i.toLong, if (i < n / 2) 2.0 else -2.0)).toDF("id", "score")
    val kept = Importance.gumbelTopFraction(scored, "id", "score",
      fraction = 0.25, temperature = 1.0, salt = "t")
    val ids = kept.select("id").as[Long].collect().toSet
    // deterministic
    Importance.gumbelTopFraction(scored, "id", "score", 0.25, 1.0, "t")
      .select("id").as[Long].collect().toSet shouldBe ids
    // a different salt reshuffles the selection
    Importance.gumbelTopFraction(scored, "id", "score", 0.25, 1.0, "u")
      .select("id").as[Long].collect().toSet should not be ids
    ids.size.toDouble shouldBe (n * 0.25) +- n * 0.02
    // high-score half should dominate the kept set (exp(4):1 odds per pair)
    ids.count(_ < n / 2).toDouble / ids.size should be > 0.9
  }

  it should "converge to pure top-fraction as temperature -> 0" in {
    val scored = (0 until 100).map(i => (i.toLong, i.toDouble))
      .toDF("id", "score")
    val kept = Importance.gumbelTopFraction(scored, "id", "score",
        fraction = 0.1, temperature = 1e-9)
      .select("id").as[Long].collect().sorted
    kept shouldBe (90L until 100L).toArray
  }

  behavior of "hashed n-gram order"

  it should "see word order that the unigram model provably cannot" in {
    // two corpora with IDENTICAL unigram distributions whose reversals
    // share NO bigram: cycling "alpha beta gamma" yields bigrams
    // {alpha beta, beta gamma, gamma alpha}; the reverse cycle yields
    // {gamma beta, beta alpha, alpha gamma} — disjoint sets
    val ab = Seq.fill(40)("alpha beta gamma").mkString(" ")
    val ba = Seq.fill(40)("gamma beta alpha").mkString(" ")
    val ref = Seq((1L, ab, true), (2L, ba, false), (3L, ab, true), (4L, ba, false))
      .toDF("id", "text", "is_tgt")

    val uni = Importance.trainHashedLm(ref, "text", col("is_tgt"),
      nBuckets = 4096, ngramOrder = 1)
    val bi = Importance.trainHashedLm(ref, "text", col("is_tgt"),
      nBuckets = 4096, ngramOrder = 2)
    val probe = Seq((10L, ab), (11L, ba)).toDF("id", "text")
    def scores(lm: Importance.HashedLm): Map[Long, Double] =
      probe.select(col("id"), Importance.scoreWith(lm, col("text")).as("s"))
        .as[(Long, Double)].collect().toMap

    val u = scores(uni)
    u(10L) shouldBe u(11L) +- 1e-9 // unigram: the corpora are identical
    val b = scores(bi)
    b(10L) should be > (b(11L) + 1.0) // bigram: target order wins clearly

    // batch scorer agrees with the frozen-LM scorer at order 2
    val batch = Importance.hashedImportanceScores(
        ref.limit(4).toDF("id", "text", "is_tgt"), "id", "text",
        col("is_tgt"), nBuckets = 4096, ngramOrder = 2)
      .select("id", "imp_logratio").as[(Long, Double)].collect().toMap
    batch(1L) should be > 0.0
    batch(2L) should be < 0.0
  }

  it should "yield empty gram streams for docs shorter than the order" in {
    val lm = Importance.trainHashedLm(
      Seq((1L, "a b c", true), (2L, "d e f", false)).toDF("id", "text", "t"),
      "text", col("t"), nBuckets = 64, ngramOrder = 3)
    Seq((1L, "two words"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(Importance.scoreWith(lm, col("text")))
      .as[Double].collect() shouldBe Array(0.0, 0.0)
  }

  behavior of "vocabDivergence"

  it should "report zero divergence for identical corpora and grow with drift" in {
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma epsilon"))
      .toDF("id", "text")
    val same = Importance.vocabDivergence(a, a, "text").head()
    same.getAs[Double]("kl_ab") shouldBe 0.0
    same.getAs[Double]("kl_ba") shouldBe 0.0
    same.getAs[Double]("js") shouldBe 0.0
    same.getAs[Long]("vocab_shared") shouldBe same.getAs[Long]("vocab_a")

    // counts must dominate the add-one floor for the divergence to show:
    // 100 tokens per side, fully disjoint vocabularies
    val bigA = Seq((1L, Seq.fill(50)("alpha beta").mkString(" "))).toDF("id", "text")
    val b = Seq((1L, Seq.fill(50)("omega psi").mkString(" "))).toDF("id", "text")
    val drift = Importance.vocabDivergence(bigA, b, "text").head()
    drift.getAs[Long]("vocab_shared") shouldBe 0L
    drift.getAs[Double]("js") should be > 0.3
    drift.getAs[Double]("js") should be <= math.log(2.0) + 1e-12
    drift.getAs[Double]("kl_ab") should be > 0.0
    // JS is symmetric; KL is not in general
    val rev = Importance.vocabDivergence(b, bigA, "text").head()
    rev.getAs[Double]("js") shouldBe drift.getAs[Double]("js") +- 1e-12
  }

  it should "count token mass and vocab sizes exactly" in {
    val a = Seq((1L, "x x y")).toDF("id", "text")
    val b = Seq((1L, "y z")).toDF("id", "text")
    val r = Importance.vocabDivergence(a, b, "text").head()
    r.getAs[Long]("tokens_a") shouldBe 3L
    r.getAs[Long]("tokens_b") shouldBe 2L
    r.getAs[Long]("vocab_a") shouldBe 2L
    r.getAs[Long]("vocab_b") shouldBe 2L
    r.getAs[Long]("vocab_shared") shouldBe 1L
  }

  behavior of "bigramPerplexity"

  it should "match the hand-computed smoothed bigram model" in {
    // corpus: "a b a b" and "a b c"; V = 3
    // bigrams: (a,b)x3, (b,a)x1, (b,c)x1 => C1: a->3, b->2
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "text")
    val got = Importance.bigramPerplexity(df, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pAB = (3.0 + 1) / (3.0 + 3) // p(b|a)
    val pBA = (1.0 + 1) / (2.0 + 3) // p(a|b)
    val pBC = (1.0 + 1) / (2.0 + 3) // p(c|b)
    val ppl1 = math.exp(-(2 * math.log(pAB) + math.log(pBA)) / 3.0)
    val ppl2 = math.exp(-(math.log(pAB) + math.log(pBC)) / 2.0)
    got.length shouldBe 2
    got(0)._2 shouldBe 3L
    got(0)._3 shouldBe ppl1 +- 1e-9
    got(1)._2 shouldBe 2L
    got(1)._3 shouldBe ppl2 +- 1e-9
  }

  it should "score a held-out corpus against a reference LM with unknowns smoothed" in {
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "text")
    val score = Seq((9L, "z q"), (10L, "a b")).toDF("id", "text")
    val got = Importance.bigramPerplexity(score, "id", "text", train = Some(train))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    // unknown bigram (z,q): p = 1/(0 + 3) with add-1 over V=3
    got(0)._2 shouldBe math.exp(-math.log(1.0 / 3.0)) +- 1e-9
    // known (a,b): p = 4/6 -> typical text has LOW perplexity
    got(1)._2 shouldBe 6.0 / 4.0 +- 1e-9
    got(1)._2 should be < got(0)._2
  }

  it should "omit docs with fewer than 2 tokens" in {
    val df = Seq((1L, "solo"), (2L, ""), (3L, "two tokens")).toDF("id", "text")
    Importance.bigramPerplexity(df, "id", "text")
      .select("id").as[Long].collect() shouldBe Array(3L)
  }
}
