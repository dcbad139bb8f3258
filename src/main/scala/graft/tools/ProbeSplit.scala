package graft.tools

import graft.ext.{Dedup, Split}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the leakage-safe-split pipeline: where
  * does the gate's wall go — pair generation, component labeling, the
  * corpus re-join, or the split's own aggregates? Run:
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProbeSplit"
  * }}} */
object ProbeSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-split] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val off = docs.agg(max(col("doc_id")) + 1).first().getLong(0)
    val corpus = docs.unionByName(
      docs.select((col("doc_id") + off).as("doc_id"), col("text")))

    // light mode (SPARK_GRAFT_PROBE_LIGHT=1): estimates + the r=4
    // operator only — the r=2 join is priced, not paid (at 100k docs the
    // estimate alone says billions of candidates)
    if (sys.env.get("SPARK_GRAFT_PROBE_LIGHT").contains("1")) {
      println(s"[probe-split] corpus rows = ${corpus.count()}")
      println(s"[probe-split] est candidates r=2: " +
        Dedup.estimateMinhashCandidates(corpus, "doc_id", "text",
          numHashes = 64, bands = 32))
      println(s"[probe-split] est candidates r=4: " +
        Dedup.estimateMinhashCandidates(corpus, "doc_id", "text",
          numHashes = 64, bands = 16))
      time("whole operator, bands=16 (r=4)") {
        Split.leakageSafeSplit(corpus, "doc_id", "text",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          threshold = 0.5, bands = 16).count()
      }
      spark.stop()
      return
    }

    time("raw shingle+minhash pass") {
      import graft.GraftFunctions._
      corpus.select(col("doc_id"),
          minhash(shingleHashes(col("text"), 5), 64, 0).as("mh"))
        .agg(sum(size(col("mh")))).collect()
    }
    time("sorted shingle sets pass") {
      import graft.GraftFunctions._
      corpus.select(col("doc_id"),
          array_sort(array_distinct(shingleHashes(col("text"), 5))).as("sh"))
        .agg(sum(size(col("sh")))).collect()
    }
    locally {
      import graft.GraftFunctions._
      val sh = time("stage: sh pin") {
        corpus.select(col("doc_id").as("id"),
            shingleHashes(col("text"), 5).as("sh"))
          .filter(size(col("sh")) > 0).localCheckpoint(true)
      }
      val banded = time("stage: banded pin") {
        val sig = sh.withColumn("sig", minhash(col("sh"), 64, 0))
        val bandStructs = (0 until 32).map { b =>
          struct(lit(b).as("band"), farmHash64(slice(col("sig"), b * 2 + 1, 2)).as("bsig"))
        }
        sig.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
          .select(col("id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
          .localCheckpoint(true)
      }
      val pairsP = time("stage: candidate pairs pin") {
        val bucketSizes = banded.groupBy("band", "bsig").count()
          .filter(col("count") <= 1000 && col("count") > 1)
        val a = banded.select(col("band"), col("bsig"), col("id").as("id_a"))
        val b = banded.select(col("band"), col("bsig"), col("id").as("id_b"))
        a.join(bucketSizes, Seq("band", "bsig")).join(b, Seq("band", "bsig"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
          .localCheckpoint(true)
      }
      println(s"[probe-split] candidates = ${pairsP.count()}")
      time("stage: broadcast verify") {
        def side(n: String) =
          broadcast(sh.select(col("id").as(n), col("sh").as(s"shh_$n")))
        pairsP.join(side("id_a"), "id_a").join(side("id_b"), "id_b")
          .filter(least(size(col("shh_id_a")), size(col("shh_id_b"))) >=
            lit(0.5) * greatest(size(col("shh_id_a")), size(col("shh_id_b"))))
          .withColumn("jaccard", jaccardSorted(col("shh_id_a"), col("shh_id_b")))
          .filter(col("jaccard") >= 0.5).count()
      }
    }
    // reference corpus: the truncated-copy construction minhash_recall
    // uses — same row count, near-identical shingle volume
    val truncCorpus = docs.unionByName(docs.select(
      (col("doc_id") + off).as("doc_id"),
      expr("substring(text, 1, greatest(length(text) - 10, 20))").as("text")))
    time("nearDups on TRUNC corpus") {
      Dedup.minhashNearDups(truncCorpus, "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.5).count()
    }
    time("nearDups on EXACT corpus, shuffle verify") {
      Dedup.minhashNearDups(corpus, "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.5,
        broadcastVerify = Some(false)).count()
    }
    val pairs = time("minhashNearDups (pinned)") {
      Dedup.minhashNearDups(corpus, "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.5).localCheckpoint(true)
    }
    println(s"[probe-split] pairs = ${pairs.count()}")
    val comp = time("connectedComponents") {
      Dedup.connectedComponents(pairs).localCheckpoint(true)
    }
    println(s"[probe-split] labeled vertices = ${comp.count()}")
    val labeled = time("corpus re-join + label") {
      val c = comp.select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
      corpus.join(c, corpus("doc_id") === col("__cc_id"), "left")
        .withColumn("cluster", coalesce(col("__cc_comp"), corpus("doc_id")))
        .drop("__cc_id", "__cc_comp")
        .localCheckpoint(true)
    }
    val split = time("splitLabel + pin") {
      labeled.withColumn("split",
          Split.splitLabel(Seq(col("cluster")),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
        .localCheckpoint(true)
    }
    time("gate aggregates") {
      val a = split.select(col("doc_id").as("ida"), col("split").as("sa"),
        col("cluster").as("ca"))
      val b = split.select(col("doc_id").as("idb"), col("split").as("sb"),
        col("cluster").as("cb"))
      val planted = a.join(b, col("idb") === col("ida") + off)
      val atomic = split.groupBy("cluster")
        .agg(countDistinct(col("split")).as("nsp"))
      val fracs = split.select(col("cluster"), col("split")).distinct()
      split.agg(count(lit(1)).as("n_rows")).crossJoin(
          planted.agg(sum(when(col("sa") === col("sb") &&
            col("ca") === col("cb"), 1L).otherwise(0L))
            .as("n_planted_same_split")))
        .crossJoin(atomic.agg((max(col("nsp")) === 1L).as("clusters_atomic")))
        .crossJoin(fracs.agg(
          (countDistinct(col("split")) === 3L).as("splits_cover"),
          (abs(avg(when(col("split") === "train", 1.0).otherwise(0.0)) - 0.8)
            <= 0.05).as("train_frac_ok")))
        .collect()
    }
    val whole = time("whole operator, bands=32 (r=2)") {
      Split.leakageSafeSplit(corpus, "doc_id", "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        threshold = 0.5, bands = 32).count()
    }
    println(s"[probe-split] operator rows = $whole")
    println(s"[probe-split] est candidates r=2: " +
      Dedup.estimateMinhashCandidates(corpus, "doc_id", "text",
        numHashes = 64, bands = 32))
    println(s"[probe-split] est candidates r=4: " +
      Dedup.estimateMinhashCandidates(corpus, "doc_id", "text",
        numHashes = 64, bands = 16))
    time("whole operator, bands=16 (r=4)") {
      Split.leakageSafeSplit(corpus, "doc_id", "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        threshold = 0.5, bands = 16).count()
    }
    spark.stop()
  }
}
