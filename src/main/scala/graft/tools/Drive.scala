package graft.tools

import graft.diffy.{BigDiffy, DiffOptions}
import graft.ext.{Dedup, Similarity}
import graft.sampling.BigSampler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end drive of recently changed operators against the
  * driver-generated testdata. Not part of the library surface. */
object Drive {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    println(s"== docs rows: ${docs.count()}")

    // near-dup corpus: originals + truncated copies (high Jaccard)
    val dups = docs.select((col("doc_id") + 100000).as("doc_id"),
      expr("substring(text, 1, greatest(length(text) - 15, 20))").as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(dups)

    println("== minhashNearDups (expect pairs (i, i+100000)):")
    val mh = Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.7)
    mh.orderBy("id_a").show(5, false)
    println(s"minhash pair count: ${mh.count()}")

    println("== simhashNearDups:")
    val sh = Dedup.simhashNearDups(corpus, "doc_id", "text", maxHamming = 3)
    sh.orderBy("id_a").show(5, false)
    println(s"simhash pair count: ${sh.count()}")

    println("== exact stratified sample of lineitem by l_returnflag, f=0.1:")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val strata = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = BigSampler.sample(li, 0.1,
      BigSampler.Hashed(Seq("l_orderkey", "l_linenumber")),
      BigSampler.Stratified(Seq("l_returnflag")), exact = true)
    val got = sampled.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    strata.toSeq.sortBy(_._1).foreach { case (s, n) =>
      val want = math.ceil(n * 0.1).toLong
      println(s"  stratum $s: n=$n want=$want got=${got.getOrElse(s, 0L)} " +
        (if (got.getOrElse(s, 0L) == want) "OK" else "MISMATCH"))
    }

    println("== exact global (NoDistribution) sample, f=0.05:")
    val n = li.count()
    val g = BigSampler.sample(li, 0.05, BigSampler.Hashed(Seq("l_orderkey", "l_linenumber")),
      BigSampler.NoDistribution, exact = true).count()
    println(s"  total=$n want=${math.ceil(n * 0.05).toLong} got=$g")

    println("== diff with NaN deltas + fieldStats(ignoreNan):")
    val lhs = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
    val rhs = Seq((1L, Double.NaN), (2L, 4.0), (3L, 5.0)).toDF("k", "v")
    val res = BigDiffy.diff(lhs, rhs, Seq("k"))
    res.fieldStats(ignoreNan = false).show(false)
    res.fieldStats(ignoreNan = true).show(false)

    println("== type-mismatch leaf (v: double lhs, string rhs):")
    val rhs2 = Seq((1L, "1.0"), (2L, "oops")).toDF("k", "v")
    BigDiffy.diff(lhs.filter($"k" <= 2), rhs2, Seq("k")).deltas.show(false)

    println("== duplicate-key enforcement (guard fires on first action):")
    val dup = Seq((1L, 1.0), (1L, 2.0)).toDF("k", "v")
    try {
      BigDiffy.diff(dup, lhs, Seq("k")).globalStats.head()
      println("  NO ERROR — BUG")
    } catch {
      case e: Exception if e.getMessage != null &&
          e.getMessage.contains("keys must be unique") =>
        println("  OK: dup-key guard raised")
      case e: Exception if Option(e.getCause).exists(c =>
          Option(c.getMessage).exists(_.contains("keys must be unique"))) =>
        println("  OK: dup-key guard raised (wrapped)")
    }

    println("== LSH topK with bucket cap on embeddings:")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val queries = emb.filter(col("vec_id") < 5)
    val ann = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 3, dim = dim)
    ann.orderBy("query_id", "rank").show(20, false)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
    println(s"  brute-force rows: ${bf.count()}, lsh rows: ${ann.count()}")

    println("== IVF topK (k-means quantizer) vs brute force:")
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 4)
    val bfSet = bf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfSet = ivf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    println(s"  ivf rows: ${ivfSet.size}, recall vs bf: ${(bfSet & ivfSet).size}/${bfSet.size}")

    println("== CLI --row-restriction on bigSampler (expect exactly the k%4==0 rows):")
    val cliBase = java.nio.file.Files.createTempDirectory("drive_cli").toString
    li.limit(400).write.mode("overwrite").parquet(s"$cliBase/in")
    graft.cli.Graft.run(Seq("bigSampler", s"--input=$cliBase/in",
      s"--output=$cliBase/out", "--sample=1.0", "--fields=l_orderkey",
      "--row-restriction=l_orderkey % 4 = 0"), spark)
    val restrictedWant = spark.read.parquet(s"$cliBase/in")
      .filter(col("l_orderkey") % 4 === 0).count()
    val restrictedGot = spark.read.parquet(s"$cliBase/out").count()
    println(s"  want=$restrictedWant got=$restrictedGot " +
      (if (restrictedWant == restrictedGot) "OK" else "MISMATCH"))

    println("== real ImageIO decode (3x2 PNG, expect w=3 h=2 c=3 mean=95.0):")
    val prow = graft.ext.Multimodal.decodeImages(
        Seq((1L, graft.ext.MultimodalFixtures.encodedImage("png")))
          .toDF("id", "payload"), "payload")
      .select("img.width", "img.height", "img.channels", "img.mean_intensity")
      .head()
    println(s"  got w=${prow.getInt(0)} h=${prow.getInt(1)} c=${prow.getInt(2)} " +
      s"mean=${prow.getDouble(3)} " +
      (if (prow.getInt(0) == 3 && prow.getInt(1) == 2 && prow.getInt(2) == 3 &&
        math.abs(prow.getDouble(3) - 95.0) < 1e-9) "OK" else "MISMATCH"))

    println("== salted join equals plain join on a skewed key:")
    val fact = spark.range(5000)
      .select(when(col("id") % 5 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dimT = (1L to 500L).map(k => (k, s"n_$k")).toDF("k", "name")
    val plainN = fact.join(dimT, Seq("k")).count()
    val saltN = graft.ext.Skew.saltedJoin(fact, dimT, Seq("k"), salt = 8).count()
    println(s"  plain=$plainN salted=$saltN " + (if (plainN == saltN) "OK" else "MISMATCH"))

    println("== decontamination drops planted benchmark copies only:")
    val bench7 = docs.filter(col("doc_id") === 7).select("doc_id", "text")
    val withPlant = docs.select("doc_id", "text").unionByName(
      bench7.select((col("doc_id") + 5000).as("doc_id"),
        concat(lit("xx "), col("text")).as("text")))
    val deconKept = graft.ext.TextAnalysis.decontaminate(
      withPlant, "doc_id", "text", bench7, "text", n = 40)
    val plantGone = deconKept.filter(col("doc_id") === 5007).count() == 0
    val benchGone = deconKept.filter(col("doc_id") === 7).count() == 0
    println(s"  kept=${deconKept.count()}/${withPlant.count()} plantGone=$plantGone " +
      s"benchGone=$benchGone " + (if (plantGone && benchGone) "OK" else "MISMATCH"))

    println("== exact top-fraction + token budget vs global-sort oracle:")
    val scored = graft.ext.TextAnalysis.qualitySignals(docs, "text")
    val top = graft.ext.ScoreFilter.keepTopFraction(
      scored, "quality_score", 0.3, tieBreak = Seq("doc_id"))
    val wantN = math.ceil(scored.count() * 0.3).toLong
    val oracleIds = scored.orderBy(col("quality_score").desc, col("doc_id"))
      .limit(wantN.toInt).select("doc_id").as[Long].collect().sorted
    val gotIds = top.select("doc_id").as[Long].collect().sorted
    println(s"  top30%: got=${gotIds.length} want=$wantN " +
      (if (gotIds.toSeq == oracleIds.toSeq) "OK" else "MISMATCH"))
    val budgeted = graft.ext.ScoreFilter.keepTopByBudget(
      scored, "quality_score", "n_tokens", 500L, tieBreak = Seq("doc_id"))
    val spent = budgeted.agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
    println(s"  budget500: rows=${budgeted.count()} tokens=$spent " +
      (if (spent <= 500L) "OK" else "MISMATCH"))

    println("== sequence packing: spans tile sequences, mass preserved:")
    val toks = docs.select(col("doc_id"),
      graft.ext.TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
    val packed = graft.ext.Pack.packSequences(toks, "doc_id", "nt", 256L)
    val totTok = toks.agg(sum(when(col("nt") > 0, col("nt")).otherwise(0L)))
      .head().getLong(0)
    val totSpan = packed.agg(sum("span_len")).head().getLong(0)
    val fullSeqs = packed.groupBy("seq_id").agg(sum("span_len").as("f"))
      .filter(col("seq_id") < totTok / 256L && col("f") =!= 256L).count()
    println(s"  tokens=$totTok spans=$totSpan underfull_nonfinal=$fullSeqs " +
      (if (totTok == totSpan && fullSeqs == 0) "OK" else "MISMATCH"))

    println("== greedy bins: capacity respected, docs whole:")
    val bins = graft.ext.Pack.greedyPackWithinPartitions(toks, "doc_id", "nt", 512L)
    val overfullMulti = bins.groupBy("bin_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("c"))
      .filter(col("t") > 512L && col("c") > 1).count()
    println(s"  bins=${bins.select("bin_id").distinct().count()} " +
      s"overfullMulti=$overfullMulti " +
      (if (overfullMulti == 0) "OK" else "MISMATCH"))

    println("== chunking covers every char with the declared overlap:")
    val chunks = graft.ext.TextAnalysis.chunkDocs(docs, "doc_id", "text", 100, 20)
    val chCover = chunks.groupBy("doc_id")
      .agg(max(col("chunk_start") + length(col("chunk"))).as("covered"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      .filter(col("covered") =!= col("len")).count()
    println(s"  chunks=${chunks.count()} uncovered_docs=$chCover " +
      (if (chCover == 0) "OK" else "MISMATCH"))

    println("== leakage-safe split: clusters never straddle splits:")
    val comps = Dedup.connectedComponents(mh)
    val clustered = corpus.join(comps, corpus("doc_id") === comps("id"), "left")
      .withColumn("cluster_id", coalesce(col("component"), col("doc_id")))
    val straddlers = graft.ext.Split.hashSplit(clustered, Seq("cluster_id"),
        Seq("train" -> 0.9, "test" -> 0.1))
      .groupBy("cluster_id").agg(countDistinct("split").as("ns"))
      .filter(col("ns") =!= 1).count()
    println(s"  straddling_clusters=$straddlers " +
      (if (straddlers == 0) "OK" else "MISMATCH"))

    println("== int8 quantized cosine tracks exact cosine:")
    val embQ = emb.select(col("vec_id"),  col("embedding"),
      graft.ext.Embeddings.quantizeInt8(col("embedding")).getField("q").as("q"))
    val qerr = embQ.as("a").join(embQ.as("b"),
        col("b.vec_id") === col("a.vec_id") + 1)
      .select(abs((lit(1.0) - graft.GraftFunctions.cosineDistance(
          col("a.embedding"), col("b.embedding"))) -
        graft.ext.Embeddings.quantizedCosine(col("a.q"), col("b.q"))).as("e"))
      .agg(max("e")).head().getDouble(0)
    println(f"  max |cos_q - cos| = $qerr%.5f " +
      (if (qerr < 0.02) "OK" else "MISMATCH"))

    println("== keep-first segment dedup: second copy of a segment drops:")
    val segDocs = docs.select(col("doc_id"),
      concat(lit("HDR. "), col("text")).as("text"))
    val segOut = graft.ext.TextAnalysis
      .dedupSegmentsKeepFirst(segDocs, "doc_id", "text", ". ")
    val hdrLeft = segOut.filter(col("text").contains("HDR")).count()
    println(s"  docs_still_carrying_header=$hdrLeft " +
      (if (hdrLeft == 1) "OK" else "MISMATCH"))

    println("== incremental dedup equals plain anti join:")
    val exSide = corpus.filter(col("doc_id") % 2 === 0)
    val inSide = corpus.filter(col("doc_id") % 2 === 1).unionByName(
      exSide.limit(7).select((col("doc_id") + 900000).as("doc_id"), col("text")))
    val incGot = Dedup.newAgainst(exSide, inSide, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val incWant = inSide.join(exSide.select("text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    println(s"  got=${incGot.size} want=${incWant.size} " +
      (if (incGot == incWant && incGot.count(_ >= 900000L) == 0) "OK" else "MISMATCH"))

    println("== PQ top-k recall vs brute force (k=5, m=16):")
    val pqQ = emb.filter(col("vec_id") < 5)
    val pqBf = graft.ext.Similarity.bruteForceTopK(emb, pqQ, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pqGot = graft.ext.Similarity.pqTopK(emb, pqQ, "vec_id", "embedding", 5,
        m = 16, codebookSize = 32, rerankFactor = 10, maxIter = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pqRecall = (pqBf & pqGot).size.toDouble / pqBf.size
    println(f"  recall=$pqRecall%.2f " + (if (pqRecall >= 0.6) "OK" else "MISMATCH"))

    println("== rolling trailing window matches a per-key scan:")
    val ev = Seq((1L, 0L, 1.0), (1L, 500L, 2.0), (1L, 900L, 4.0), (1L, 2000L, 8.0))
      .toDF("k", "ts", "x")
    val roll = graft.ext.Temporal.rollingAgg(ev, Seq("k"), "ts", 1000L, "x")
      .orderBy("ts").select("roll_count", "roll_sum").as[(Long, Double)].collect().toSeq
    val rollOk = roll == Seq((1L, 1.0), (2L, 3.0), (3L, 7.0), (1L, 8.0))
    println(s"  $roll " + (if (rollOk) "OK" else "MISMATCH"))

    println("== corpus report: doc count conservation across groups:")
    val rep = graft.ext.TextAnalysis.corpusReport(docs, "text", Seq("lang"))
    val repDocs = rep.agg(sum("n_docs")).head().getLong(0)
    println(s"  sum(n_docs)=$repDocs total=${docs.count()} " +
      (if (repDocs == docs.count()) "OK" else "MISMATCH"))

    println("== mixture resample: exact per-key quotas:")
    val mixIn = docs.withColumn("score",
      ((col("doc_id") * 1103515245L + 12345L) % 1000003L).cast("double"))
    val mixOut = graft.ext.ScoreFilter.keepTopFractionPerKey(mixIn, Seq("lang"),
      "score", Map("en" -> 0.5), 0.2, Seq("doc_id"))
    val quotasBad = mixIn.groupBy("lang").count()
      .join(mixOut.groupBy("lang").agg(count(lit(1)).as("kept")), "lang")
      .filter(col("kept") =!= ceil(col("count") *
        when(col("lang") === "en", 0.5).otherwise(0.2)).cast("long")).count()
    println(s"  keys_off_quota=$quotasBad " + (if (quotasBad == 0) "OK" else "MISMATCH"))

    println("== GIF frame sampling (5 uniform frames, n=3 -> 0/2/4 @ 10/30/50):")
    val frameRows = graft.ext.Multimodal.sampleFrameFeatures(
        Seq((1L, graft.ext.MultimodalFixtures.animatedGif(Seq(10, 20, 30, 40, 50), 4, 3)))
          .toDF("id", "payload"), "payload", 3)
      .select(explode(col("frames")).as("f"))
      .select("f.frame_idx", "f.mean_intensity").as[(Int, Double)].collect().sortBy(_._1)
    val framesOk = frameRows.toSeq == Seq((0, 10.0), (2, 30.0), (4, 50.0))
    println(s"  frames=${frameRows.mkString(",")} " + (if (framesOk) "OK" else "MISMATCH"))

    spark.stop()
  }
}
