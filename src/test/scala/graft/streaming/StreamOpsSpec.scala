package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming operators driven through MemoryStream micro-batches. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  behavior of "streaming hash sample"

  it should "match the batch hash sample decision for the same records" in {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    val sampled = StreamOps.hashSample(input.toDF(), 0.3, Seq("value"))
    val q = sampled.writeStream.format("memory").queryName("s_sample").start()
    input.addData(1L to 2000L)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_sample").as[Long].collect().sorted
    val batch = StreamOps.hashSample((1L to 2000L).toDF("value"), 0.3, Seq("value"))
      .as[Long].collect().sorted
    streamed shouldBe batch
    streamed.length.toDouble shouldBe 600.0 +- 120.0
  }

  it should "select the exact multiset the batch BigSampler selects over the same slice" in {
    // the cohort-consistency invariant (reference BigSamplerTest.scala:
    // 52-62 — the same record hashes in or out everywhere): a stream fed
    // real lineitem rows across two micro-batches must select EXACTLY the
    // rows the batch BigSampler.Hashed arm selects from the same slice
    implicit val sc = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"))
      .limit(3000).as[(Long, Long)].collect().toSeq
    val input = MemoryStream[(Long, Long)]
    val sampled = StreamOps.hashSample(
      input.toDF().toDF("l_orderkey", "l_linenumber"), 0.25,
      Seq("l_orderkey", "l_linenumber"))
    val q = sampled.writeStream.format("memory").queryName("s_cohort").start()
    input.addData(rows.take(1500))
    q.processAllAvailable()
    input.addData(rows.drop(1500))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_cohort").as[(Long, Long)].collect().sorted
    val batch = graft.sampling.BigSampler.sample(
        rows.toDF("l_orderkey", "l_linenumber"), 0.25,
        graft.sampling.BigSampler.Hashed(Seq("l_orderkey", "l_linenumber")))
      .as[(Long, Long)].collect().sorted
    streamed shouldBe batch
    streamed.length should be > 0
  }

  behavior of "streaming leakage-safe split"

  it should "assign stream rows the batch assignment via a static components join" in {
    // the serving-time pattern: near-dup components are computed offline
    // (batch clusterNearDups / a persisted DedupIndex) and the STREAM
    // gets the same group-atomic split through a stream-static left join
    // + the pure splitLabel expression — a doc and its near-dup arriving
    // in different micro-batches still land in the same split
    implicit val sc = spark.sqlContext
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val comps = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "component") // 2 clusters; 3/4 singletons
    val input = MemoryStream[Long]
    val labeled = graft.ext.Split.leakageSafeSplitByComponents(
      input.toDF().toDF("doc_id"), "doc_id", comps, fracs)
    val q = labeled.writeStream.format("memory").queryName("s_split").start()
    input.addData(1L, 3L, 5L)   // first batch
    q.processAllAvailable()
    input.addData(2L, 4L, 6L)   // near-dups arrive a batch later
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_split")
      .select("doc_id", "cluster", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    val batch = graft.ext.Split.leakageSafeSplitByComponents(
        Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id"), "doc_id", comps, fracs)
      .select("doc_id", "cluster", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    streamed shouldBe batch // stream == batch, row for row
    val m = streamed.map(t => t._1 -> t._3).toMap
    m(2L) shouldBe m(1L) // cross-batch pair, same split
    m(6L) shouldBe m(5L)
  }

  behavior of "streaming content dedup"

  it should "keep first arrivals per fingerprint within the watermark" in {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamOps.dedupByContent(
      input.toDF().toDF("id", "ts", "text"), "text", "ts", "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("s_dedup")
      .outputMode("append").start()
    input.addData((1L, ts(1), "alpha beta"), (2L, ts(2), "ALPHA   beta"),
      (3L, ts(3), "gamma delta"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("s_dedup").select("id").as[Long].collect().sorted
    got shouldBe Array(1L, 3L) // id 2 is a normalized duplicate of id 1
  }

  behavior of "windowed quality"

  it should "aggregate quality per tumbling window" in {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = StreamOps.windowedQuality(
      input.toDF().toDF("ts", "text"), "ts", "text", "10 seconds", "0 seconds")
    val q = agg.writeStream.format("memory").queryName("s_quality")
      .outputMode("complete").start()
    input.addData((ts(1), "the quick brown fox"), (ts(5), "jumps over dogs"),
      (ts(15), "entirely different window"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("s_quality").orderBy("window_start").collect()
    rows.length shouldBe 2
    rows.map(_.getAs[Long]("n_docs")).toSeq shouldBe Seq(2L, 1L)
    all(rows.map(_.getAs[Double]("mean_quality")).toSeq) should (be >= 0.0 and be <= 1.0)
  }

  behavior of "windowed frequent terms"

  it should "surface planted heavy terms per window with the undercount bound honored" in {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val tele = StreamOps.windowedFrequentTerms(
      input.toDF().toDF("ts", "text"), "ts", "text",
      "10 seconds", "0 seconds", k = 8)
    val q = tele.writeStream.format("memory").queryName("s_freq")
      .outputMode("complete").start()
    // window 1: "spam" dominates (24 of 44 tokens); window 2: "ham"
    val w1 = (0 until 8).map(i =>
      (ts(i % 9 + 1), "spam spam spam filler" + i % 4 + " other" + i))
    val w2 = (0 until 6).map(i => (ts(11 + i % 8), "ham ham unique" + i))
    input.addData(w1: _*)
    q.processAllAvailable()
    input.addData(w2: _*) // second trigger: state crosses batches
    q.processAllAvailable(); q.stop()
    val rows = spark.table("s_freq")
      .select("window_start", "item", "est", "max_undercount")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byWindow = rows.groupBy(_._1).toSeq.sortBy(_._1.getTime)
    byWindow.length shouldBe 2
    // planted majority terms survive any merge order (count > n/(k+1))
    byWindow.head._2.map(_._2) should contain("spam")
    byWindow.last._2.map(_._2) should contain("ham")
    // one-sided guarantee: est <= true count, undercount within bound
    val spam = byWindow.head._2.find(_._2 == "spam").get
    spam._3 should be <= 24L
    spam._3 should be >= 24L - spam._4
    val ham = byWindow.last._2.find(_._2 == "ham").get
    ham._3 should be <= 12L
    ham._3 should be >= 12L - ham._4
  }

  behavior of "constraint telemetry"

  it should "emit per-window verdicts equal to the batch check on each window slice" in {
    import graft.ext.Profile
    implicit val sc = spark.sqlContext
    val cs = Seq(
      Profile.NotNull("name"),
      Profile.CompletenessAtLeast("name", 0.9),
      Profile.InRange("v", 0.0, 100.0),
      Profile.ApproxDistinctBetween("name", 1L, 10L))
    val input = MemoryStream[(Timestamp, String, Double)]
    val tele = StreamOps.constraintTelemetry(
      input.toDF().toDF("ts", "name", "v"), "ts", cs, "10 seconds", "0 seconds")
    val q = tele.writeStream.format("memory").queryName("s_constraints")
      .outputMode("complete").start()
    val w1 = Seq((ts(1), "alpha", 5.0), (ts(3), null, 50.0), (ts(8), "beta", 99.0))
    val w2 = Seq((ts(12), "gamma", 150.0), (ts(15), "gamma", -3.0))
    input.addData(w1 ++ w2: _*)
    q.processAllAvailable(); q.stop()

    val got = spark.table("s_constraints")
      .select("window_start", "constraint", "col", "observed", "passed")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getBoolean(4))).toSet

    // batch oracle: Profile.check per window slice
    import spark.implicits._
    def batchOf(rows: Seq[(Timestamp, String, Double)], start: Timestamp) =
      Profile.check(rows.toDF("ts", "name", "v"), cs).collect()
        .map(r => (start, r.getString(0), r.getString(1),
          r.getDouble(2), r.getBoolean(3))).toSet
    got shouldBe (batchOf(w1, ts(0)) ++ batchOf(w2, ts(10)))

    // sanity on the interesting verdicts: window 1 fails not_null,
    // window 2 fails in_range
    got should contain((ts(0), "not_null", "name", 1.0, false))
    got should contain((ts(10), "in_range", "v", 2.0, false))
  }

  it should "reject Unique constraints (unbounded state)" in {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    an[IllegalArgumentException] should be thrownBy
      StreamOps.constraintTelemetry(input.toDF().toDF("ts", "name"), "ts",
        Seq(graft.ext.Profile.Unique(Seq("name"))), "10 seconds", "0 seconds")
  }

  behavior of "gap sessions"

  it should "close the same sessions the batch sessionize finds on real events" in {
    import graft.ext.Temporal
    implicit val sc = spark.sqlContext
    // real event rows (unit-aware read -> micros -> Timestamp), 3 users;
    // the scoped reader keeps the session conf untouched
    val rows = graft.sources.GraftIO
      .readParquetTsAsMicros(spark, "/root/testdata/sf0.001/events.parquet")
      .filter(col("user_id") < 3)
      .select(col("user_id"),
        expr("timestamp_micros(ts)").cast("timestamp").as("ts"))
      .as[(Long, Timestamp)].collect().toSeq
    rows.length should be > 50

    val input = MemoryStream[(Long, Timestamp)]
    val sessions = StreamOps.gapSessions(
      input.toDF().toDF("user_id", "ts"), Seq("user_id"), "ts",
      gap = "1 hour", watermark = "1 second")
    val q = sessions.writeStream.format("memory").queryName("s_sessions")
      .outputMode("append").start()
    input.addData(rows)
    q.processAllAvailable()
    // two sentinel batches push the watermark past every real session's
    // end (append emits a session only once the watermark closes it)
    val far = new Timestamp(rows.map(_._2.getTime).max + 30L * 86400_000L)
    input.addData((-1L, far))
    q.processAllAvailable()
    input.addData((-1L, new Timestamp(far.getTime + 1000L)))
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("s_sessions").filter(col("user_id") >= 0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .as[(Long, Long, Long)].collect().toSet

    val batch = Temporal.sessionize(rows.toDF("user_id", "ts"),
        Seq("user_id"), "ts", gap = 3600.0) // cast-to-double => seconds
      .groupBy("user_id", "session_id").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("cnt").as("n_events"))
      .as[(Long, Long, Long)].collect().toSet

    streamed shouldBe batch
  }

  behavior of "stateful duplicate counts"

  it should "emit a running count per content fingerprint across micro-batches" in {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val counts = StreamOps.duplicateCounts(
      input.toDF().toDF("id", "ts", "text"), "text", "ts", "10 seconds")
    val q = counts.writeStream.format("memory").queryName("s_dupcounts")
      .outputMode("update").start()
    input.addData((1L, ts(1), "alpha beta"), (2L, ts(2), "gamma delta"))
    q.processAllAvailable()
    // second batch: one normalized dup of "alpha beta", one new doc
    input.addData((3L, ts(3), "ALPHA   beta"), (4L, ts(4), "epsilon zeta"))
    q.processAllAvailable(); q.stop()
    val byFp = spark.table("s_dupcounts")
      .groupBy("fingerprint").agg(max("n_seen").as("n_seen"))
      .select("n_seen").as[Long].collect().sorted
    // three distinct contents: alpha-beta seen twice, the others once
    byFp shouldBe Array(1L, 1L, 2L)
  }

  behavior of "streaming decontamination"

  it should "flag the same docs as the batch operator over the same corpus" in {
    import graft.ext.TextAnalysis
    implicit val sc = spark.sqlContext
    val bench = Seq((100L, "the secret benchmark answer sequence here"))
      .toDF("bid", "btext")
    val corpus = Seq(
      (1L, "completely unrelated prose about weather patterns today"),
      (2L, "prefix junk then the secret benchmark answer sequence here trailing"),
      (3L, "short"),
      (4L, "another clean document with its own distinct wording entirely"))
    // the stateless column form: benchmark grams collected once, the
    // per-row flag lifts onto the stream with no join/distinct/state
    val grams = TextAnalysis.benchmarkGramHashes(bench, "btext", n = 20)
    val input = MemoryStream[(Long, String)]
    val flagged = input.toDF().toDF("doc_id", "text")
      .withColumn("contaminated",
        TextAnalysis.contaminationFlag(col("text"), grams, n = 20))
    val q = flagged.writeStream.format("memory").queryName("s_decon").start()
    input.addData(corpus.take(2))
    q.processAllAvailable()
    input.addData(corpus.drop(2))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_decon")
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    val batch = TextAnalysis.flagContaminated(corpus.toDF("doc_id", "text"),
        "doc_id", "text", bench, "btext", n = 20)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    streamed shouldBe batch
    streamed(2L) shouldBe true
  }

  behavior of "streaming mixture sampling"

  it should "select the identical per-domain multiset as the batch filter" in {
    import graft.GraftFunctions._
    implicit val sc = spark.sqlContext
    val rows = (1L to 400L).map(i => (i, if (i % 3 == 0) "code" else "web"))
    val fracs = Map("code" -> 0.8)
    val input = MemoryStream[(Long, String)]
    val sampled = StreamOps.mixtureSample(
      input.toDF().toDF("id", "domain"), "domain", Seq("id"), fracs, 0.25)
    val q = sampled.writeStream.format("memory").queryName("s_mix").start()
    input.addData(rows.take(200)); q.processAllAvailable()
    input.addData(rows.drop(200)); q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_mix").select("id").as[Long].collect().sorted
    val batch = rows.toDF("id", "domain")
      .filter(hashDice(Seq(col("id"))) <
        when(col("domain") === "code", 0.8).otherwise(0.25))
      .select("id").as[Long].collect().sorted
    streamed shouldBe batch
    // both domains were actually sampled at distinct rates
    val got = spark.table("s_mix").groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    got("code").toDouble / rows.count(_._2 == "code") shouldBe 0.8 +- 0.15
    got("web").toDouble / rows.count(_._2 == "web") shouldBe 0.25 +- 0.15
  }

  behavior of "streaming drift telemetry"

  it should "page on a window whose docs stop resembling the reference" in {
    import java.sql.Timestamp
    implicit val sc = spark.sqlContext
    val ref = Seq(
      (0L, "gradient descent model training epochs", true),
      (1L, "salt pepper butter recipe oven", false),
      (2L, "butter recipe oven salt pepper", false)).toDF("doc_id", "text", "tgt")
    val lm = graft.ext.Importance.trainHashedLm(ref, "text", col("tgt"))
    def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    // window 1: reference-like traffic; window 2: drifted traffic
    val events = Seq(
      (ts(1), "gradient descent training"), (ts(2), "model training epochs"),
      (ts(31), "butter salt pepper"), (ts(32), "recipe oven butter"))
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamOps.driftTelemetry(
        input.toDF().toDF("ts", "text"), "ts", "text", lm,
        windowLen = "30 minutes", watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("s_drift").start()
    input.addData(events)
    q.processAllAvailable()
    // advance the watermark past both windows so they close and emit
    input.addData(Seq((Timestamp.valueOf("2026-01-01 12:00:00"), "flush")))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("s_drift")
      .select("window_start", "n_docs", "mean_score")
      .as[(Timestamp, Long, Double)].collect().sortBy(_._1.getTime)
    rows.length should be >= 2
    val w1 = rows.find(_._1 == Timestamp.valueOf("2026-01-01 10:00:00")).get
    val w2 = rows.find(_._1 == Timestamp.valueOf("2026-01-01 10:30:00")).get
    w1._2 shouldBe 2L
    w2._2 shouldBe 2L
    w1._3 should be > 0.0 // reference-like window scores positive
    w2._3 should be < 0.0 // drifted window scores negative
    // stream aggregates match the batch computation over the same slice
    val batch = StreamOps.importanceScore(
        events.toDF("ts", "text"), "text", lm)
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(avg("imp_logratio").as("m"))
      .select(col("window.start"), col("m"))
      .as[(Timestamp, Double)].collect().toMap
    w1._3 shouldBe batch(w1._1) +- 1e-12
    w2._3 shouldBe batch(w2._1) +- 1e-12
  }

  behavior of "streaming curation filter"

  it should "keep exactly the rows the batch Gopher+repetition pass keeps" in {
    import graft.ext.TextAnalysis
    implicit val sc = spark.sqlContext
    val clean = "the quick and careful fox " +
      (1 to 56).map(i => s"word$i").mkString(" ")
    val spammy = "the fox " +
      (1 to 30).map(_ => "of and that have with be").mkString(" ")
    val corpus = Seq((1L, clean), (2L, spammy), (3L, ""), (4L, clean + " tail"))
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.curationFilter(input.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("s_curate").start()
    input.addData(corpus.take(2))
    q.processAllAvailable()
    input.addData(corpus.drop(2))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_curate").select("doc_id")
      .as[Long].collect().sorted
    val batch = TextAnalysis.repetitionFilter(
        TextAnalysis.gopherFilter(corpus.toDF("doc_id", "text"), "text"), "text")
      .select("doc_id").as[Long].collect().sorted
    streamed shouldBe batch
    streamed should contain(1L)
    streamed should not contain 2L
  }

  behavior of "streaming BPE tokenization"

  it should "tokenize arriving docs identically to the batch encode" in {
    implicit val sc = spark.sqlContext
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cats sat on the mats"),
      (3L, "totally unseen vocabulary zqx"))
    val model = graft.ext.Bpe.train(
      corpus.take(2).toDF("doc_id", "text"), "text", numMerges = 30)
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.bpeTokenize(
        input.toDF().toDF("doc_id", "text"), model, "text")
      .writeStream.format("memory").queryName("s_bpe").start()
    input.addData(corpus.take(1))
    q.processAllAvailable()
    input.addData(corpus.drop(1))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_bpe")
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    corpus.foreach { case (id, t) =>
      streamed(id) shouldBe model.encode(t).toSeq
    }
    // frequent word collapsed; unseen word falls back to chars
    streamed(1L) should contain("the" + graft.ext.Bpe.Marker)
    streamed(3L).count(_ == "z") should be >= 1
  }

  behavior of "streaming incremental dedup"

  it should "flag every batch-dropped row and pass only definitely-new rows" in {
    import graft.ext.Dedup
    implicit val sc = spark.sqlContext
    val existing = (1L to 20L).map(i => (i, s"doc body number ${i % 10}")) // 10 distinct
      .toDF("doc_id", "text")
    val incoming = (100L to 130L).map(i =>
      (i, if (i % 3 == 0) s"doc body number ${i % 10}" else s"fresh content $i"))
    val bloom = Dedup.corpusBloom(existing, "text")
    val input = MemoryStream[(Long, String)]
    val flagged = input.toDF().toDF("doc_id", "text")
      .withColumn("maybe_dup", Dedup.maybeDuplicateFlag(col("text"), bloom))
    val q = flagged.writeStream.format("memory").queryName("s_incdedup").start()
    input.addData(incoming.take(15))
    q.processAllAvailable()
    input.addData(incoming.drop(15))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_incdedup")
      .select("doc_id", "maybe_dup").as[(Long, Boolean)].collect().toMap
    val batchNew = Dedup.newAgainst(existing, incoming.toDF("doc_id", "text"), "text")
      .select("doc_id").as[Long].collect().toSet
    val dropped = incoming.map(_._1).toSet -- batchNew
    // no false negatives: every row the exact batch op dropped is flagged
    dropped.foreach(id => streamed(id) shouldBe true)
    // unflagged rows are exactly-new (a subset of the batch keep set)
    streamed.collect { case (id, false) => id }.toSet subsetOf batchNew shouldBe true
    dropped should not be empty
  }

  it should "flag near-duplicate candidates on a stream with no false negatives" in {
    import graft.ext.Dedup
    implicit val sc = spark.sqlContext
    val existing = (0L until 30L).map { i =>
      (i, (0 until 40).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" "))
    }.toDF("doc_id", "text")
    // near-copies (drop last 2 words) interleaved with novel rows
    val incoming = (0L until 30L).map { i =>
      if (i % 2 == 0)
        (i + 500L, (0 until 38).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" "))
      else (i + 500L, s"novel ${i} content ${i * 13} unseen ${i * 29}")
    }
    val bloom = Dedup.nearDupBloom(existing, "doc_id", "text",
      numHashes = 64, bands = 32, bloomFpp = 0.0001)
    val input = MemoryStream[(Long, String)]
    val flagged = input.toDF().toDF("doc_id", "text")
      .withColumn("maybe_near", Dedup.maybeNearDuplicateFlag(col("text"), bloom,
        numHashes = 64, bands = 32))
    val q = flagged.writeStream.format("memory").queryName("s_neardup").start()
    input.addData(incoming.take(15))
    q.processAllAvailable()
    input.addData(incoming.drop(15))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_neardup")
      .select("doc_id", "maybe_near").as[(Long, Boolean)].collect().toMap
    streamed.size shouldBe 30
    val paired = Dedup.minhashNewAgainst(existing, incoming.toDF("doc_id", "text"),
        "doc_id", "text", numHashes = 64, bands = 32, threshold = 0.5)
      .select("id_new").as[Long].collect().toSet
    // every exact-operator near-dup was flagged on the stream
    paired.foreach(id => streamed(id) shouldBe true)
    paired.size should be >= 14
    // and the definitive-false contract holds on the novel side
    streamed.collect { case (id, false) => id }.toSet
      .intersect(paired) shouldBe Set.empty
  }

  behavior of "streaming chunking and splitting"

  it should "emit the same chunks as the batch chunker over the same docs" in {
    import graft.ext.TextAnalysis
    implicit val sc = spark.sqlContext
    val docs = (1L to 50L).map(i => (i, ("word" + i + " ") * i.toInt))
    val input = MemoryStream[(Long, String)]
    val chunked = TextAnalysis.chunkDocs(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      size = 40, overlap = 10)
    val q = chunked.writeStream.format("memory").queryName("s_chunks").start()
    input.addData(docs.take(25))
    q.processAllAvailable()
    input.addData(docs.drop(25))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_chunks")
      .as[(Long, Long, Long, String)].collect().sorted
    val batch = TextAnalysis.chunkDocs(docs.toDF("doc_id", "text"),
        "doc_id", "text", size = 40, overlap = 10)
      .as[(Long, Long, Long, String)].collect().sorted
    streamed shouldBe batch
    streamed.length should be > 50
  }

  it should "keep the same rows as the batch Gopher filter" in {
    // gopherFilter is a stateless narrow pass (PlanSpec: zero exchanges),
    // so it lifts to streams unchanged — prove output equality anyway
    import graft.ext.TextAnalysis
    implicit val sc = spark.sqlContext
    val docs = (1L to 60L).map { i =>
      val body = (1 to 60).map(j => s"word$j").mkString(" ")
      (i, if (i % 3 == 0) s"the quick and careful fox $body" else "- a\n- b")
    }
    val input = MemoryStream[(Long, String)]
    val kept = TextAnalysis.gopherFilter(
      input.toDF().toDF("doc_id", "text"), "text")
    val q = kept.writeStream.format("memory").queryName("s_gopher").start()
    input.addData(docs)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_gopher").select("doc_id").as[Long].collect().sorted
    val batch = TextAnalysis.gopherFilter(docs.toDF("doc_id", "text"), "text")
      .select("doc_id").as[Long].collect().sorted
    streamed shouldBe batch
    streamed.length shouldBe 20
  }

  it should "assign the same split labels as the batch splitter" in {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    val labeled = graft.ext.Split.hashSplit(
      input.toDF().toDF("id"), Seq("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val q = labeled.writeStream.format("memory").queryName("s_split").start()
    input.addData(1L to 1000L)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_split").as[(Long, String)].collect().toMap
    val batch = graft.ext.Split.hashSplit((1L to 1000L).toDF("id"),
        Seq("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    streamed shouldBe batch
  }

  behavior of "stream-stream interval join"

  it should "match the batch range join across out-of-order micro-batches" in {
    implicit val sc = spark.sqlContext
    // clicks land in purchase windows [pts, pts + 10s]; deliver each side
    // across two micro-batches with the LATER batch carrying earlier
    // timestamps, so buffered state on both sides must produce the match
    val clicks = Seq((1L, 100L, ts(15)), (2L, 100L, ts(25)),
      (3L, 200L, ts(8)), (4L, 100L, ts(5)), (5L, 300L, ts(40)))
    val purchases = Seq((10L, 100L, ts(10)), (11L, 200L, ts(5)),
      (12L, 100L, ts(20)), (13L, 400L, ts(40)))
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamOps.intervalJoin(
      lIn.toDF().toDF("click_id", "user_id", "cts"),
      rIn.toDF().toDF("purchase_id", "user_id", "pts"),
      Seq("user_id"), "cts", "pts",
      watermark = "1 hour", lower = "0 seconds", upper = "10 seconds")
    val q = joined.writeStream.format("memory").queryName("s_ivj")
      .outputMode("append").start()
    lIn.addData(clicks.take(2)); rIn.addData(purchases.take(2))
    q.processAllAvailable()
    lIn.addData(clicks.drop(2)); rIn.addData(purchases.drop(2))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_ivj")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().sorted
    val batch = graft.ext.Temporal.rangeJoin(
        clicks.toDF("click_id", "user_id", "cts")
          .selectExpr("click_id", "user_id", "unix_micros(cts) AS ctu"),
        purchases.toDF("purchase_id", "user_id", "pts")
          .selectExpr("purchase_id", "user_id", "unix_micros(pts) AS w_start",
            "unix_micros(pts) + 10000000 AS w_end"),
        Seq("user_id"), "ctu", "w_start", "w_end", binWidth = 10e6)
      .select("click_id", "purchase_id").as[(Long, Long)].collect().sorted
    streamed shouldBe batch
    streamed.length should be > 0
  }

  it should "flush unmatched left rows null-extended once the watermark passes (left_outer)" in {
    implicit val sc = spark.sqlContext
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamOps.intervalJoin(
      lIn.toDF().toDF("click_id", "user_id", "cts"),
      rIn.toDF().toDF("purchase_id", "user_id", "pts"),
      Seq("user_id"), "cts", "pts",
      watermark = "5 seconds", lower = "0 seconds", upper = "10 seconds",
      how = "left_outer")
    val q = joined.writeStream.format("memory").queryName("s_ivj_outer")
      .outputMode("append").start()
    // click 1 matches purchase 10; click 2 (user 999) can never match
    lIn.addData((1L, 100L, ts(15)), (2L, 999L, ts(15)))
    rIn.addData((10L, 100L, ts(10)))
    q.processAllAvailable()
    // the unmatched row flushes only once the watermark provably passes
    // its match window: advance event time far beyond cts + upper + delay
    lIn.addData((99L, 1L, ts(1000))); rIn.addData((98L, 1L, ts(1000)))
    q.processAllAvailable()
    lIn.addData((97L, 1L, ts(2000))); rIn.addData((96L, 1L, ts(2000)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("s_ivj_outer")
      .select("click_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    got(1L) shouldBe Some(10L)
    got(2L) shouldBe None // null-extended after the watermark passed
  }

  it should "importance-score a stream exactly like the batch frozen-LM path" in {
    implicit val sc = spark.sqlContext
    val ref = Seq(
      (0L, "gradient descent model training", true),
      (1L, "salt pepper butter recipe", false),
      (2L, "butter recipe oven salt", false)).toDF("doc_id", "text", "tgt")
    val lm = graft.ext.Importance.trainHashedLm(ref, "text", col("tgt"))
    val docs = Seq((10L, "gradient model"), (11L, "butter salt"),
      (12L, "never seen words"))
    val input = MemoryStream[(Long, String)]
    val scored = StreamOps.importanceScore(
      input.toDF().toDF("doc_id", "text"), "text", lm)
    val q = scored.writeStream.format("memory").queryName("s_imp").start()
    input.addData(docs)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_imp")
      .select("doc_id", "imp_logratio").as[(Long, Double)].collect().toMap
    val batch = StreamOps.importanceScore(docs.toDF("doc_id", "text"),
        "text", lm)
      .select("doc_id", "imp_logratio").as[(Long, Double)].collect().toMap
    streamed shouldBe batch
    streamed(10L) should be > 0.0 // target-speak
    streamed(11L) should be < 0.0 // raw-speak
  }

  behavior of "streaming index sinks"

  it should "append micro-batches to persisted indexes exactly-once under batchId keys" in {
    implicit val sc = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .sortBy(_._1).take(200)
    val base = graft.SparkSpec.tempDir("graft_idx_sink").toString
    val dpath = s"$base/didx"; val tpath = s"$base/tidx"
    graft.ext.DedupIndex.build(docs.take(0).toDF("doc_id", "text"),
      "doc_id", "text", dpath, numHashes = 64, bands = 32)
    graft.ext.Retrieval.buildTextIndex(docs.take(0).toDF("doc_id", "text"),
      "doc_id", "text", tpath, buckets = 16)
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val sinkD = StreamOps.dedupIndexSink(dpath, "doc_id", "text")
    val sinkT = StreamOps.textIndexSink(tpath, "doc_id", "text")
    val q = stream.writeStream
      .option("checkpointLocation", s"$base/cp")
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => {
        sinkD(df, id); sinkT(df, id)
      })
      .start()
    input.addData(docs.take(100)); q.processAllAvailable()
    input.addData(docs.drop(100)); q.processAllAvailable(); q.stop()
    // the retry a recovered stream performs: SAME batchId, same data —
    // both artifacts must absorb it without double-writing
    sinkD(docs.drop(100).toDF("doc_id", "text"), 1L)
    sinkT(docs.drop(100).toDF("doc_id", "text"), 1L)
    spark.read.parquet(s"$dpath/fingerprints").count() shouldBe 200L
    // dedup artifact == clean batch build, search-for-search
    val clean = s"$base/didx_clean"
    graft.ext.DedupIndex.build(docs.toDF("doc_id", "text"),
      "doc_id", "text", clean, numHashes = 64, bands = 32)
    val probes = docs.take(20)
      .map { case (i, t) => (i + 900000L, t) }.toDF("doc_id", "text")
    def pairs(p: String) = graft.ext.DedupIndex
      .minhashNewAgainst(spark, p, probes, "doc_id", "text", threshold = 0.9)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    pairs(dpath) shouldBe pairs(clean)
    // text artifact: summed stats exact, search equals the direct BM25
    spark.read.parquet(s"$tpath/stats")
      .agg(sum("n_docs")).as[Long].head() shouldBe 200L
    val q2 = Seq((1L, "spark join filter")).toDF("qid", "qtext")
    val served = graft.ext.Retrieval.searchTextIndex(spark, tpath, q2,
        "qid", "qtext", k = 5, roundScoresTo = Some(9))
      .select("doc_id", "rank").as[(Long, Int)].collect().sorted
    val direct = graft.ext.Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", q2, "qid", "qtext", k = 5, roundScoresTo = Some(9))
      .select("doc_id", "rank").as[(Long, Int)].collect().sorted
    served shouldBe direct
  }

  it should "auto-compact every N triggers and absorb post-compact replays" in {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .sortBy(_._1).take(120)
    val base = graft.SparkSpec.tempDir("graft_idx_ce").toString
    val tpath = s"$base/tidx"
    graft.ext.Retrieval.buildTextIndex(docs.take(0).toDF("doc_id", "text"),
      "doc_id", "text", tpath, buckets = 8)
    val sink = StreamOps.textIndexSink(tpath, "doc_id", "text",
      compactEvery = 2)
    // four triggers of 30 docs; compaction fires after triggers 1 and 3
    (0 until 4).foreach { i =>
      sink(docs.slice(i * 30, (i + 1) * 30).toDF("doc_id", "text"), i.toLong)
    }
    // triggers 0-3 all folded into ONE compact batch (+ the empty init's
    // stats): partition count stays bounded however long the stream runs
    val batches = new java.io.File(s"$tpath/postings").listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch="))
    batches.count(_.startsWith("compact-")) shouldBe 1
    batches.count(_.startsWith("stream-")) shouldBe 0
    // a recovered stream replaying trigger 3 AFTER its batch was folded:
    // the ledger makes it a no-op, stats stay exact
    sink(docs.slice(90, 120).toDF("doc_id", "text"), 3L)
    spark.read.parquet(s"$tpath/stats")
      .agg(sum("n_docs")).as[Long].head() shouldBe 120L
    // and the compacted artifact still serves exactly the direct BM25
    val q2 = Seq((1L, "spark join filter")).toDF("qid", "qtext")
    val served = graft.ext.Retrieval.searchTextIndex(spark, tpath, q2,
        "qid", "qtext", k = 5, roundScoresTo = Some(9))
      .select("doc_id", "rank").as[(Long, Int)].collect().sorted
    val direct = graft.ext.Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", q2, "qid", "qtext", k = 5, roundScoresTo = Some(9))
      .select("doc_id", "rank").as[(Long, Int)].collect().sorted
    served shouldBe direct
  }
}
