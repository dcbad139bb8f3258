package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  behavior of "quality signals"

  it should "compute token/char counts and ratios" in {
    val df = Seq((1L, "The quick brown fox, it jumps!")).toDF("id", "text")
    val r = TextAnalysis.qualitySignals(df, "text").head()
    r.getAs[Int]("n_chars") shouldBe 30
    r.getAs[Long]("n_tokens") shouldBe 6L
    r.getAs[Double]("punct_ratio") shouldBe (2.0 / 30.0) +- 1e-9
    r.getAs[Double]("dup_token_ratio") shouldBe 0.0
    r.getAs[Double]("quality_score") should (be >= 0.0 and be <= 1.0)
  }

  it should "flag repetitive text via dup_token_ratio" in {
    val df = Seq((1L, "spam spam spam spam spam")).toDF("id", "text")
    TextAnalysis.qualitySignals(df, "text").head()
      .getAs[Double]("dup_token_ratio") shouldBe 0.8 +- 1e-9
  }

  behavior of "gopherSignals"

  it should "trip each rule independently and keep clean prose" in {
    // 60 distinct clean words incl. >= 2 required stopwords
    val clean = (1 to 56).map(i => s"word$i").mkString(
      "the quick and careful fox ", " ", "") // 5 + 56 = 61 words
    val bullets = "- one\n- two\n- three"
    val ellipses = "so then...\nand more...\nthe end"
    val symbols = ("the and " + Seq.fill(20)("#tag").mkString(" ")) +
      " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val numeric = "the and " + (1 to 60).map(_.toString).mkString(" ")
    val df = Seq((1L, clean), (2L, bullets), (3L, ellipses),
      (4L, symbols), (5L, numeric), (6L, "")).toDF("id", "text")
    val got = TextAnalysis.gopherSignals(df, "text")
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    got(1L) shouldBe true
    got(2L) shouldBe false // 100% bullet lines (and too few words)
    got(3L) shouldBe false // 2/3 ellipsis lines
    got(4L) shouldBe false // symbol ratio 20/62 > 0.1
    got(5L) shouldBe false // alpha-word fraction 2/62 < 0.8
    got(6L) shouldBe false // empty
    val r = TextAnalysis.gopherSignals(df.filter($"id" === 1), "text").head()
    r.getAs[Long]("word_count") shouldBe 61L
    r.getAs[Long]("stopword_hits") shouldBe 2L // the, and
    r.getAs[Double]("alpha_word_frac") shouldBe 1.0
    TextAnalysis.gopherFilter(df, "text").select("id").as[Long]
      .collect() shouldBe Array(1L)
  }

  it should "curate a non-English corpus end-to-end with a custom profile" in {
    // Spanish prose: zero hits on the English required-word list, so the
    // paper profile rejects it; a Spanish stopword profile keeps it and
    // still rejects the same doc drowned in symbols
    val esStops = Seq("de", "la", "que", "el", "en", "y", "los", "una")
    val prose = "la casa de mi abuela tiene una puerta grande y " +
      (1 to 48).map(i => s"palabra$i").mkString(" ") // 57 words
    val spam = prose + " " + Seq.fill(20)("#etiqueta").mkString(" ")
    val df = Seq((1L, prose), (2L, spam)).toDF("id", "text")
    TextAnalysis.gopherFilter(df, "text").count() shouldBe 0L // English profile
    TextAnalysis.gopherFilter(df, "text", stopwords = esStops)
      .select("id").as[Long].collect() shouldBe Array(1L)
    val sig = TextAnalysis.gopherSignals(df.filter($"id" === 1), "text",
      stopwords = esStops).head()
    sig.getAs[Long]("stopword_hits") shouldBe 4L // de, la, y, una
  }

  it should "pin stopword_hits to 0 on an empty stopword list" in {
    val df = Seq((1L, "plain text with enough words here")).toDF("id", "text")
    val sig = TextAnalysis.gopherSignals(df, "text",
      stopwords = Seq.empty).head()
    sig.getAs[Long]("stopword_hits") shouldBe 0L
    // rule disabled: minStopwordHits = 0 lets the doc through that gate
    TextAnalysis.gopherSignals(df, "text", minWords = 3L,
        minStopwordHits = 0L, stopwords = Seq.empty)
      .select("keep").as[Boolean].head() shouldBe true
  }

  behavior of "languageId"

  it should "identify marker-word languages and fall back to und" in {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der Hund und die Katze ist nicht da"),
      (3L, "xyzzy plugh qwerty")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.languageId(col("text")).as("l"))
      .orderBy("id").as[(Long, String)].collect()
    got shouldBe Array((1L, "en"), (2L, "de"), (3L, "und"))
  }

  behavior of "fingerprint"

  it should "be whitespace/case-normalized and content-sensitive" in {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds"))
      .toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).as[Long].collect()
    fps(0) shouldBe fps(1)
    fps(0) should not be fps(2)
  }

  behavior of "approxBpeTokenCount"

  it should "count word pieces plus punctuation runs" in {
    val df = Seq((1L, "hello, extraordinary!")).toDF("id", "text")
    // hello->2 pieces, extraordinary(13)->4, punct 2
    df.select(TextAnalysis.approxBpeTokenCount(col("text"))).as[Long].head() shouldBe 8L
  }

  behavior of "redact"

  it should "replace emails, urls, and phone runs with placeholders" in {
    val df = Seq(
      "mail a.b@x.co.uk now",
      "see https://ex.com/p?q=1 and http://a.b",
      "call +1-650-555-0199 ok",
      "plain text").toDF("text")
    df.select(TextAnalysis.redact(col("text"))).as[String].collect() shouldBe Array(
      "mail <EMAIL> now",
      "see <URL> and <URL>",
      "call <PHONE> ok",
      "plain text")
  }

  it should "leave categories disabled by flag untouched" in {
    Seq("a@b.io and https://x.y").toDF("text")
      .select(TextAnalysis.redact(col("text"), urls = false)).as[String].head() shouldBe
      "<EMAIL> and https://x.y"
  }

  behavior of "commonNgramFraction"

  it should "score shared boilerplate high and unique text low" in {
    val docs = Seq(
      (1L, "shared boilerplate header text"),
      (2L, "shared boilerplate header text"),
      (3L, "shared boilerplate header text"),
      (4L, "zq"), // shorter than n -> null
      (5L, "xxqjvzzwkpy unique gibberish qqq"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.commonNgramFraction(docs, "doc_id", "text",
        n = 5, minDocFreq = 3)
      .orderBy("doc_id").collect()
    // docs 1-3 are identical: every 5-gram appears in 3 docs
    got(0).getDouble(1) shouldBe 1.0
    got(1).getDouble(1) shouldBe 1.0
    got(2).getDouble(1) shouldBe 1.0
    got(3).isNullAt(1) shouldBe true
    got(4).getDouble(1) shouldBe 0.0
  }

  behavior of "dupLineRatio"

  behavior of "stripBoilerplate"

  it should "remove corpus-frequent segments and keep order, repeats, and empties" in {
    val df = Seq(
      (1L, "NAV. unique one. NAV. unique two"),
      (2L, "NAV. something else"),
      (3L, "NAV. third doc"),
      (4L, "only original content here")).toDF("id", "text")
    val got = TextAnalysis.stripBoilerplate(df, "text", ". ", minDocFreq = 3)
      .orderBy("id").select("text").as[String].collect().toSeq
    got shouldBe Seq(
      "unique one. unique two", // both NAV copies removed, order kept
      "something else", "third doc", "only original content here")
  }

  it should "return the empty string for an all-boilerplate doc and null for null" in {
    val df = Seq((1L, "SPAM"), (2L, "SPAM"), (3L, "SPAM"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val got = TextAnalysis.stripBoilerplate(df, "text", ". ", minDocFreq = 3)
      .orderBy("id").select("text").collect().map(r => Option(r.getString(0))).toSeq
    got shouldBe Seq(Some(""), Some(""), Some(""), None)
  }

  it should "pass the corpus through untouched when nothing is frequent" in {
    val df = Seq((1L, "alpha. beta"), (2L, "gamma. delta")).toDF("id", "text")
    val got = TextAnalysis.stripBoilerplate(df, "text", ". ", minDocFreq = 2)
      .orderBy("id").select("text").as[String].collect().toSeq
    got shouldBe Seq("alpha. beta", "gamma. delta")
  }

  it should "treat the delimiter literally, not as a regex" in {
    // '.' would match any char as a regex; segments here contain 'x'
    val df = Seq((1L, "ax b. c"), (2L, "q. c"), (3L, "z. c")).toDF("id", "text")
    val got = TextAnalysis.stripBoilerplate(df, "text", ". ", minDocFreq = 3)
      .orderBy("id").select("text").as[String].collect().toSeq
    got shouldBe Seq("ax b", "q", "z") // 'c' stripped; 'ax b' survives intact
  }

  behavior of "benchmark decontamination"

  it should "flag and drop docs sharing an n-gram with the benchmark" in {
    val bench = Seq((100L, "the secret benchmark answer sequence here")).toDF("bid", "btext")
    val corpus = Seq(
      (1L, "completely unrelated prose about weather patterns today"),
      (2L, "prefix junk then the secret benchmark answer sequence here trailing"),
      (3L, "short"),
      (4L, "another clean document with its own distinct wording entirely"))
      .toDF("doc_id", "text")
    val flagged = TextAnalysis.flagContaminated(corpus, "doc_id", "text",
        bench, "btext", n = 20)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    flagged shouldBe Map(1L -> false, 2L -> true, 3L -> false, 4L -> false)
    // the filtering form keeps exactly the unflagged rows, columns intact
    val kept = TextAnalysis.decontaminate(corpus, "doc_id", "text",
      bench, "btext", n = 20)
    kept.columns.toSeq shouldBe Seq("doc_id", "text")
    kept.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 3L, 4L)
  }

  it should "treat an empty benchmark as contaminating nothing" in {
    val corpus = Seq((1L, "some document text here okay")).toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("bid", "btext")
    TextAnalysis.decontaminate(corpus, "doc_id", "text", bench, "btext", n = 10)
      .count() shouldBe 1L
    TextAnalysis.flagContaminated(corpus, "doc_id", "text", bench, "btext", n = 10)
      .select("contaminated").as[Boolean].collect() shouldBe Array(false)
  }

  it should "catch contamination through case and whitespace differences on both paths" in {
    // shingleHashes normalizes (lowercase, squeezed whitespace) before
    // hashing; the broadcast probe must normalize identically or a doc
    // quoting the benchmark with different case/spacing slips through
    val bench = Seq((1L, "The Secret Benchmark Answer Sequence Here")).toDF("bid", "btext")
    val corpus = Seq(
      (1L, "prefix the secret benchmark answer sequence here suffix"), // case-diff
      (2L, "x THE  SECRET\tBENCHMARK ANSWER\nSEQUENCE HERE y"), // case+ws-diff
      (3L, "totally unrelated clean document body words"))
      .toDF("doc_id", "text")
    for (cap <- Seq(4 << 20, 0)) { // broadcast probe AND join fallback
      val flagged = TextAnalysis.flagContaminated(corpus, "doc_id", "text",
          bench, "btext", n = 20, maxBenchGrams = cap)
        .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
      flagged shouldBe Map(1L -> true, 2L -> true, 3L -> false)
    }
  }

  it should "report per-benchmark contamination counts, zero for clean rows" in {
    val bench = Seq((100L, "the secret benchmark answer sequence here"),
      (101L, "a completely unleaked benchmark item nothing shares"))
      .toDF("bid", "btext")
    val corpus = Seq(
      (1L, "prefix the secret benchmark answer sequence here suffix"),
      (2L, "again the secret benchmark answer sequence here wrapped"),
      (3L, "clean document with its own words entirely"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.contaminationReport(corpus, "doc_id", "text",
        bench, "bid", "btext", n = 20)
      .orderBy("bid").as[(Long, Long)].collect().toSeq
    got shouldBe Seq(100L -> 2L, 101L -> 0L)
  }

  it should "produce identical results on the broadcast and join probe paths" in {
    val bench = Seq((100L, "the secret benchmark answer sequence here"),
      (101L, "zz overlap window zz")).toDF("bid", "btext")
    val corpus = Seq(
      (1L, "completely unrelated prose about weather patterns today"),
      (2L, "prefix junk then the secret benchmark answer sequence here trailing"),
      (3L, (null: String)),
      (4L, "mid zz overlap window zz mid"),
      (5L, "short"))
      .toDF("doc_id", "text")
    // maxBenchGrams = 0 forces the distributed explode + semi-join path;
    // the default takes the broadcast rolling-hash probe — same answers
    for (op <- Seq(
        (cap: Int) => TextAnalysis.flagContaminated(corpus, "doc_id", "text",
          bench, "btext", n = 10, maxBenchGrams = cap)
          .select("doc_id", "contaminated"),
        (cap: Int) => TextAnalysis.decontaminate(corpus, "doc_id", "text",
          bench, "btext", n = 10, maxBenchGrams = cap).select("doc_id"))) {
      val fast = op(4 << 20).orderBy("doc_id").collect().toSeq
      val join = op(0).orderBy("doc_id").collect().toSeq
      fast shouldBe join
    }
  }

  behavior of "fuzzy decontamination"

  private def editedCopy(t: String): String =
    // break every long exact gram while keeping shingle-Jaccard high: an
    // inserted '@' every 20 chars caps unbroken runs at 20 chars (no
    // 30-gram survives) but perturbs only ~9 of every ~20 5-char shingles
    t.grouped(20).mkString("@")

  it should "flag lightly-edited benchmark copies the exact probe misses" in {
    val benchText = "the canonical benchmark answer passage with plenty of " +
      "running words to shingle across forty tokens or so in total length here"
    val bench = Seq(benchText).toDF("btext")
    val corpus = Seq(
      (1L, editedCopy(benchText)), // fuzzy leak: no long exact gram survives
      (2L, benchText),             // verbatim leak
      (3L, "a fully unrelated document about glacier formation dynamics"),
      (4L, (null: String)))
      .toDF("doc_id", "text")
    val flagged = TextAnalysis.flagContaminatedFuzzy(corpus, "doc_id", "text",
        bench, "btext", threshold = 0.5, numHashes = 64, bands = 32)
      .select("doc_id", "contaminated_fuzzy").as[(Long, Boolean)].collect().toMap
    flagged shouldBe Map(1L -> true, 2L -> true, 3L -> false, 4L -> false)
    // the exact 30-gram probe cannot see the edited copy — the contrast
    // this operator exists for
    TextAnalysis.flagContaminated(corpus.filter($"doc_id" === 1L), "doc_id",
        "text", bench, "btext", n = 30)
      .select("contaminated").as[Boolean].collect() shouldBe Array(false)
    // filtering form keeps exactly the unflagged rows, columns intact
    val kept = TextAnalysis.decontaminateFuzzy(corpus, "doc_id", "text",
      bench, "btext", threshold = 0.5, numHashes = 64, bands = 32)
    kept.columns.toSeq shouldBe Seq("doc_id", "text")
    kept.select("doc_id").as[Long].collect().sorted shouldBe Array(3L, 4L)
  }

  it should "flag nothing against an empty benchmark and keep column order" in {
    val corpus = Seq((1L, "some document text here okay"))
      .toDF("doc_id", "text").withColumn("extra", lit(7))
    val bench = Seq.empty[String].toDF("btext")
    val out = TextAnalysis.flagContaminatedFuzzy(corpus, "doc_id", "text",
      bench, "btext")
    out.columns.toSeq shouldBe Seq("doc_id", "text", "extra", "contaminated_fuzzy")
    out.select("contaminated_fuzzy").as[Boolean].collect() shouldBe Array(false)
    TextAnalysis.decontaminateFuzzy(corpus, "doc_id", "text", bench, "btext")
      .count() shouldBe 1L
  }

  it should "report per-benchmark fuzzy leak counts, zero for clean rows" in {
    val leakText = "the canonical benchmark answer passage with plenty of " +
      "running words to shingle across forty tokens or so in total length here"
    val bench = Seq((100L, leakText),
      (101L, "an unleaked benchmark item that nothing in the corpus echoes"))
      .toDF("bid", "btext")
    val corpus = Seq(
      (1L, editedCopy(leakText)),   // fuzzy leak of 100
      (2L, leakText),               // verbatim leak of 100
      (3L, "a fully unrelated document about glacier formation dynamics"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.contaminationReportFuzzy(corpus, "doc_id", "text",
        bench, "bid", "btext", threshold = 0.5, numHashes = 64, bands = 32)
      .orderBy("bid").as[(Long, Long)].collect().toSeq
    got shouldBe Seq(100L -> 2L, 101L -> 0L)
  }

  it should "respect the threshold: a mild edit passes a strict threshold" in {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi"
    val bench = Seq(benchText).toDF("btext")
    // heavy edit: keep only the first half — Jaccard ≈ 0.5, far under 0.9
    val corpus = Seq((1L, benchText.take(benchText.length / 2)))
      .toDF("doc_id", "text")
    TextAnalysis.flagContaminatedFuzzy(corpus, "doc_id", "text",
        bench, "btext", threshold = 0.9, numHashes = 64, bands = 32)
      .select("contaminated_fuzzy").as[Boolean].collect() shouldBe Array(false)
    TextAnalysis.flagContaminatedFuzzy(corpus, "doc_id", "text",
        bench, "btext", threshold = 0.3, numHashes = 64, bands = 32)
      .select("contaminated_fuzzy").as[Boolean].collect() shouldBe Array(true)
  }

  it should "roll the window hash bit-exactly like the ShingleHashes expression" in {
    import graft.functions.{ShingleHashes => SH}
    val texts = Seq("abcdefghij", "aaaaaaa", "xy", "", "unicode ✓ fläck テスト padding",
      "the quick brown fox jumps over the lazy dog")
    for (t <- texts; n <- Seq(1, 3, 7); seed <- Seq(0L, 42L)) {
      // direct O(len·n) Horner re-hash per window — the original contract
      val expect: Array[Long] =
        if (t.length < n) null
        else {
          val hs = (0 to t.length - n).map { i =>
            var h = seed
            var j = 0
            while (j < n) { h = h * 31L + t.charAt(i + j); j += 1 }
            graft.functions.Mix.mix64(h)
          }
          hs.distinct.sorted.toArray
        }
      SH.sortedDistinct(t, n, seed) shouldBe expect
      // the streaming probe visits the same multiset of hashes in order
      if (t.length >= n) {
        val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
        SH.anyWindow(t, n, seed) { h => seen += h; false }
        seen.toSet shouldBe expect.toSet
        seen.size shouldBe (t.length - n + 1)
      }
    }
  }

  behavior of "global keep-first segment dedup"

  it should "keep only each segment's least (id, pos) occurrence" in {
    val docs = Seq(
      (1L, "alpha. beta. alpha"), // within-doc repeat: 2nd alpha drops
      (2L, "beta. gamma"), // beta lost to doc 1
      (3L, "delta"),
      (4L, "gamma. delta. own"), // both lost to docs 2/3
      (5L, (null: String)), // null text unchanged
      (6L, "alpha")) // all segments duplicate -> empty string
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupSegmentsKeepFirst(docs, "doc_id", "text", ". ")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    out shouldBe Seq(
      1L -> "alpha. beta",
      2L -> "gamma",
      3L -> "delta",
      4L -> "own",
      5L -> null,
      6L -> "")
    // column set and order of untouched docs preserved
    TextAnalysis.dedupSegmentsKeepFirst(docs, "doc_id", "text", ". ")
      .columns.toSeq shouldBe Seq("doc_id", "text")
  }

  it should "never treat empty segments as duplicates" in {
    // trailing/consecutive delimiters on docs that share NO content:
    // empty segments are not dedup candidates, so the texts pass through
    val docs = Seq((1L, "alpha. "), (2L, "beta. "), (3L, "x. . y"))
      .toDF("doc_id", "text")
    TextAnalysis.dedupSegmentsKeepFirst(docs, "doc_id", "text", ". ")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq shouldBe Seq(
      1L -> "alpha. ", 2L -> "beta. ", 3L -> "x. . y")
  }

  behavior of "corpusReport"

  it should "summarize counts, mass, and duplicate fraction per group" in {
    val docs = Seq(
      ("en", "one two three"), ("en", "one two three"), ("en", "four"),
      ("en", (null: String)), ("de", ""), ("de", "fünf sechs"))
      .toDF("lang", "text")
    val got = TextAnalysis.corpusReport(docs, "text", Seq("lang"))
      .orderBy("lang")
      .select("lang", "n_docs", "n_empty", "n_chars", "n_tokens",
        "mean_tokens", "n_distinct", "dup_frac")
      .as[(String, Long, Long, Long, Long, Double, Long, Double)]
      .collect().toSeq
    got shouldBe Seq(
      // de: empty + "fünf sechs" -> 2 distinct non-null, no dups
      ("de", 2L, 1L, 10L, 2L, 1.0, 2L, 0.0),
      // en: 2 copies + 1 unique + 1 null -> 2 distinct of 3 non-null
      ("en", 4L, 1L, 30L, 7L, 2.333333, 2L, 0.333333))
    // ungrouped: one global row
    TextAnalysis.corpusReport(docs, "text").count() shouldBe 1L
  }

  it should "measure the duplicate-line fraction" in {
    val df = Seq("a\nb\na\na", "x\ny").toDF("text")
    df.select(round(TextAnalysis.dupLineRatio(col("text")), 2)).as[Double].collect() shouldBe
      Array(0.5, 0.0) // 4 lines, 2 distinct -> 0.5; all distinct -> 0.0
  }

  behavior of "topKeywords"

  private lazy val kwDocs = Seq(
    (0L, "spark spark spark engine engine common common"),
    (1L, "duck duck engine common common"),
    (2L, "goose common engine")).toDF("doc_id", "text")

  it should "rank terms by tf-idf with hapax pruned and ties by term" in {
    // df: spark 1 (pruned at minDocFreq=2), engine 3, common 3, duck 1
    // (pruned), goose 1 (pruned); N=3 -> idf(engine)=idf(common)=ln(1)=0
    // at logIdf — use linear idf (N/df = 1) so scores are tf alone
    val got = TextAnalysis.topKeywords(kwDocs, "doc_id", "text",
        k = 2, minDocFreq = 2, logIdf = false)
      .orderBy("id", "rank")
      .select("id", "term", "rank", "score")
      .as[(Long, String, Int, Double)].collect()
    got shouldBe Array(
      (0L, "common", 1, 2.0), (0L, "engine", 2, 2.0), // tf 2 & 2: term asc
      (1L, "common", 1, 2.0), (1L, "engine", 2, 1.0), // tf 2 and 1
      (2L, "common", 1, 1.0), (2L, "engine", 2, 1.0)) // tie -> term asc
  }

  it should "compute log idf and never use a window" in {
    val q = TextAnalysis.topKeywords(kwDocs, "doc_id", "text",
      k = 1, minDocFreq = 1)
    q.queryExecution.executedPlan.toString should not include "Window"
    // doc 0's top log-idf keyword: spark (tf 3, df 1 -> 3*ln(3)), beats
    // common (tf 2, idf 0) and engine (tf 1, idf 0)
    val top0 = q.filter(col("id") === 0L).select("term", "score")
      .as[(String, Double)].head()
    top0._1 shouldBe "spark"
    top0._2 shouldBe 3.0 * math.log(3.0) +- 1e-12
  }

  behavior of "repetitionSignals"

  it should "compute dup-line and top-ngram char fractions exactly" in {
    // lines: two copies of "a b a b c" + "x"; one paragraph (no blank line)
    val df = Seq((1L, "a b a b c\na b a b c\nx")).toDF("id", "text")
    val r = TextAnalysis.repetitionSignals(df, "text").head()
    r.getAs[Double]("dup_line_frac") shouldBe (1.0 - 2.0 / 3.0)
    r.getAs[Double]("dup_line_char_frac") shouldBe (18.0 / 19.0)
    r.getAs[Double]("dup_para_frac") shouldBe 0.0
    r.getAs[Double]("dup_para_char_frac") shouldBe 0.0
    // words a,b,a,b,c,a,b,a,b,c,x; "a b" occurs 4x, len 3; text len 21
    r.getAs[Double]("top_2gram_char_frac") shouldBe (12.0 / 21.0)
    // 3-gram tie at count 2, all len 5 -> 10/21
    r.getAs[Double]("top_3gram_char_frac") shouldBe (10.0 / 21.0)
  }

  it should "break top-gram count ties by the longest tied gram" in {
    val df = Seq((1L, "one two three")).toDF("id", "text")
    val r = TextAnalysis.repetitionSignals(df, "text").head()
    // both 2-grams occur once; tie -> longest ("two three", 9 chars) / 13
    r.getAs[Double]("top_2gram_char_frac") shouldBe (9.0 / 13.0)
    // 3 words: no 5-gram exists -> null, not zero
    r.isNullAt(r.fieldIndex("dup_5gram_char_frac")) shouldBe true
  }

  it should "cap overlapping dup-ngram coverage at 1.0" in {
    // "p q r s t u" twice: two 5-grams each occur twice, 2*9+2*9=36 > 23 chars
    val df = Seq((1L, "p q r s t u p q r s t u")).toDF("id", "text")
    val r = TextAnalysis.repetitionSignals(df, "text").head()
    r.getAs[Double]("dup_5gram_char_frac") shouldBe 1.0
    // six 6-grams, "p q r s t u" twice -> 2*11=22 of 23 chars
    r.getAs[Double]("dup_6gram_char_frac") shouldBe (22.0 / 23.0)
  }

  it should "count code points, not UTF-16 units" in {
    // an astral emoji is 2 UTF-16 chars but 1 code point: fractions must
    // come out in code points on both engines
    val df = Seq((1L, "\ud83d\ude00 a \ud83d\ude00")).toDF("id", "text")
    val r = TextAnalysis.repetitionSignals(df, "text").head()
    r.getAs[Double]("top_2gram_char_frac") shouldBe (3.0 / 5.0)
  }

  it should "null out signals with no qualifying units and let rep_keep pass them" in {
    val df = Seq((1L, ""), (2L, "short text"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val rows = TextAnalysis.repetitionSignals(df, "text").orderBy("id").collect()
    rows(0).isNullAt(rows(0).fieldIndex("dup_line_frac")) shouldBe true
    rows(0).getAs[Boolean]("rep_keep") shouldBe true
    // 2 words: 2-gram exists, 3-gram does not
    rows(1).isNullAt(rows(1).fieldIndex("top_2gram_char_frac")) shouldBe false
    rows(1).isNullAt(rows(1).fieldIndex("top_3gram_char_frac")) shouldBe true
    rows(2).getAs[Boolean]("rep_keep") shouldBe true
  }

  it should "reject repetitious docs via rep_keep and keep clean prose" in {
    val spammy = (1 to 40).map(_ => "buy cheap pills now").mkString(" ")
    // long enough that the longest unique 4-gram stays under 16% of chars
    // (Gopher's repetition rules presume web-document lengths)
    val clean = (1 to 100).map(i => s"distinct$i token$i").mkString(" ")
    val df = Seq((1L, spammy), (2L, clean)).toDF("id", "text")
    val out = TextAnalysis.repetitionSignals(df, "text").orderBy("id").collect()
    out(0).getAs[Boolean]("rep_keep") shouldBe false
    out(1).getAs[Boolean]("rep_keep") shouldBe true
    TextAnalysis.repetitionFilter(df, "text").columns.toSeq shouldBe Seq("id", "text")
    TextAnalysis.repetitionFilter(df, "text").select("id").as[Long].collect() shouldBe Array(2L)
  }

  it should "treat empty lines and paragraphs as structure, not duplicates" in {
    // blank lines repeat but must not count as duplicated content
    val df = Seq((1L, "alpha\n\nbeta\n\ngamma")).toDF("id", "text")
    val r = TextAnalysis.repetitionSignals(df, "text").head()
    r.getAs[Double]("dup_line_frac") shouldBe 0.0
    r.getAs[Double]("dup_para_frac") shouldBe 0.0
  }

  behavior of "compressionRatio"

  it should "score repetitive text far below near-random text" in {
    val rep = "spam spam spam spam spam spam spam spam spam spam " * 10
    val rnd = new scala.util.Random(5)
    val noisy = (1 to 500).map(_ => ('!' + rnd.nextInt(90)).toChar).mkString
    val df = Seq((1L, rep), (2L, noisy), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val r = df.select(col("id"),
        TextAnalysis.compressionRatio(col("text")).as("cr"))
      .orderBy("id").collect()
    val repRatio = r(0).getAs[Double]("cr")
    val rndRatio = r(1).getAs[Double]("cr")
    repRatio should be < 0.2
    rndRatio should be > 0.7
    r(2).isNullAt(1) shouldBe true
    r(3).isNullAt(1) shouldBe true
  }

  it should "compose marks even when a control byte splits the pair" in {
    // strip must run BEFORE NFC: a BEL between base and combining mark
    // blocks composition, and the two byte-variants must normalize equal
    val df = Seq((1L, "e\u0007\u0301"), (2L, "\u00e9")).toDF("id", "text")
    val out = df.select(TextAnalysis.normalizeText(col("text")))
      .as[String].collect()
    out(0) shouldBe "\u00e9"
    out(0) shouldBe out(1)
  }

  it should "strictly improve when content duplicates (the gate invariant)" in {
    val df = Seq((1L, "a modest sentence with ordinary words in it"))
      .toDF("id", "text")
    val r = df.select(
      TextAnalysis.compressionRatio(col("text")).as("r1"),
      TextAnalysis.compressionRatio(
        concat(col("text"), col("text"), col("text"), col("text"))).as("r4"))
      .head()
    r.getAs[Double]("r4") should be < r.getAs[Double]("r1")
  }

  behavior of "normalizeText"

  it should "fold combining marks, strip noise controls, keep structure" in {
    val decomposed = "cafe\u0301 menu"         // e + combining acute
    val noisy = "a\u0007b\u0000c\nd\te"     // BEL + NUL stripped, \n \t kept
    val df = Seq((1L, decomposed), (2L, noisy), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.normalizeText(col("text")).as("n")).orderBy("id").collect()
    out(0).getString(1) shouldBe "caf\u00e9 menu"
    out(0).getString(1).length shouldBe 9      // composed: one code unit fewer
    out(1).getString(1) shouldBe "abc\nd\te"
    out(2).isNullAt(1) shouldBe true
    // idempotent: normalizing normalized text is the identity
    val again = df.limit(2).select(
      TextAnalysis.normalizeText(TextAnalysis.normalizeText(col("text"))).as("n"))
      .collect().map(_.getString(0))
    again shouldBe out.take(2).map(_.getString(1))
  }
}
