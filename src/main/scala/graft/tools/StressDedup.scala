package graft.tools

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stress probe for the three shuffle-heaviest dedup operators (VERDICT r8
  * #8): the REAL sf0.1 documents table concatenated `copies` times (each
  * copy id-shifted and lightly perturbed, so the corpus is near-dup-heavy
  * like a crawl), through minhash near-dups, duplicated spans, and global
  * segment dedup. Prints wall time per operator plus a per-stage task-skew
  * report (max/mean shuffle-read and input bytes) — the empirical check
  * that the bucket/cap design keeps every task near the mean at scale. */
object StressDedup {
  private[tools] class SkewListener extends SparkListener {
    val stages = TrieMap.empty[Int, ArrayBuffer[(Long, Long)]]
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        // append via the buffer getOrElseUpdate returned — a concurrent
        // reset() can clear the map between calls, and a re-lookup would
        // then throw inside the listener bus
        val buf = stages.getOrElseUpdate(te.stageId, ArrayBuffer.empty)
        buf.synchronized {
          buf += ((m.inputMetrics.bytesRead,
            m.shuffleReadMetrics.totalBytesRead))
        }
      }
    }
    def reset(): Unit = stages.clear()
    /** Worst max/mean ratio over stages with >= 8 tasks and >= 1 MiB total. */
    def report(): String = {
      val lines = stages.toSeq.flatMap { case (sid, tasks) =>
        if (tasks.size < 8) None
        else {
          val sh = tasks.map(_._2)
          val in = tasks.map(_._1)
          val (tot, kind, xs) =
            if (sh.sum >= (1L << 20)) (sh.sum, "shuffle", sh)
            else if (in.sum >= (1L << 20)) (in.sum, "input", in)
            else (0L, "", sh)
          if (tot == 0L) None
          else {
            val mean = xs.sum.toDouble / xs.size
            Some((xs.max / mean,
              f"stage $sid%4d $kind%7s tasks=${xs.size}%4d " +
                f"total=${tot / 1048576.0}%8.1f MiB max/mean=${xs.max / mean}%5.2f"))
          }
        }
      }
      lines.sortBy(-_._1).take(3).map(_._2).mkString("\n")
    }
  }

  /** The RETIRED minhash_new_against STRESS shape, kept as a probe: an
    * incoming side of ⅔ of the corpus (truncated near-copies of
    * doc_id%3==0 + reversed %3==1) against the full corpus — the shape
    * the r15 gate measured, where verification dominates both arms
    * because most of the corpus arrives as candidates. The gate now
    * measures the shipped small-batch append regime (1/15 incoming);
    * SURVEY §8 quotes this probe's constant for the stress envelope.
    * Usage: runMain graft.tools.StressDedup newagainst [sfDir] */
  private def stressNewAgainst(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val off = docs.agg(coalesce(max(col("doc_id")) + 1, lit(0L)))
      .first().getLong(0)
    val planted = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + off).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 10, 20))").as("text"))
    val novel = docs.filter(col("doc_id") % 3 === 1)
      .select((col("doc_id") + off).as("doc_id"),
        reverse(col("text")).as("text"))
    val incoming = planted.unionByName(novel).localCheckpoint(true)
    val t0 = System.nanoTime()
    val n = graft.ext.Dedup.minhashNewAgainst(docs, incoming, "doc_id",
      "text", numHashes = 64, bands = 32, threshold = 0.7).count()
    println(f"[stress] new_against_2of3  ${(System.nanoTime - t0) / 1e9}%7.1f s" +
      s" -> $n pairs (sf=$sfDir)")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("newagainst")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      stressNewAgainst(spark,
        args.lift(1).getOrElse("/root/testdata/sf0.1"))
      spark.stop()
      return
    }
    val copies = args.headOption.map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val skew = new SkewListener
    spark.sparkContext.addSparkListener(skew)

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    // copy c shifts ids by c*10^7 and appends a short copy tag to the text
    // (near-dup, not byte-identical — crawl-shaped), except copy 0
    val corpus = (0 until copies).map { c =>
      if (c == 0) base
      else base.select((col("doc_id") + c * 10000000L).as("doc_id"),
        concat(col("text"), lit(s" rev$c")).as("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[stress] corpus: ${corpus.count()} docs (${copies}x sf0.1)")

    def tm(name: String)(f: => Any): Unit = {
      // listener events deliver asynchronously: drain before reset so the
      // previous operator's stragglers aren't counted against this one
      Thread.sleep(500)
      skew.reset(); System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name%-18s ${(System.nanoTime - t0) / 1e9}%7.1f s -> $r")
      Thread.sleep(500)
      println(skew.report())
    }

    tm("minhash_neardups")(
      graft.ext.Dedup.minhashNearDups(corpus, "doc_id", "text",
        numHashes = 64, bands = 16, shingleLen = 5).count())
    tm("duplicated_spans")(
      graft.ext.Dedup.duplicatedSpans(corpus, "doc_id", "text", minLen = 100)
        .count())
    tm("segment_dedup")(
      graft.ext.TextAnalysis.dedupSegmentsKeepFirst(corpus, "doc_id", "text", ". ")
        .agg(sum(length(col("text")))).head())
    spark.stop()
  }
}
