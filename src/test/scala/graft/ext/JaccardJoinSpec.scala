package graft.ext

import graft.SparkSpec
import graft.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** jaccardJoinExact must equal brute force EXACTLY (pair-set equality,
  * not recall) — that is the operator's whole contract. */
class JaccardJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(df: DataFrame, shingleLen: Int,
                         threshold: Double): Set[(Long, Long, Double)] = {
    val sh = df.select(col("doc_id").as("id"),
      shingleHashes(col("text"), shingleLen).as("sh"))
      .filter(org.apache.spark.sql.functions.size(col("sh")) > 0)
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def run(df: DataFrame, shingleLen: Int,
                  threshold: Double): Set[(Long, Long, Double)] =
    Dedup.jaccardJoinExact(df, "doc_id", "text", shingleLen, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** Random corpus with planted near-dups and shared boilerplate — the
    * shapes that stress prefix filtering (frequent tokens, skewed overlap). */
  private def corpus(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    val boiler = "copyright notice all rights reserved "
    val base = (0 until n).map { i =>
      val body = Seq.fill(8 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
        .mkString(" ")
      val text = if (i % 3 == 0) boiler + body else body
      (i.toLong, text)
    }
    val dups = base.filter(_._1 % 4 == 0).map { case (id, text) =>
      (id + 10000L, text.dropRight(6)) // near-copy
    }
    val exact = base.filter(_._1 % 7 == 0).map { case (id, text) =>
      (id + 20000L, text) // exact copy
    }
    (base ++ dups ++ exact).toDF("doc_id", "text")
  }

  behavior of "Dedup.jaccardJoinExact"

  it should "equal brute force at multiple thresholds on a mixed corpus" in {
    val df = corpus(60, seed = 1)
    Seq(0.3, 0.5, 0.8, 0.95).foreach { t =>
      withClue(s"threshold $t: ") {
        run(df, 5, t) shouldBe bruteForce(df, 5, t)
      }
    }
  }

  it should "equal brute force at threshold 1.0 (exact copies only)" in {
    val df = corpus(40, seed = 2)
    val got = run(df, 5, 1.0)
    got shouldBe bruteForce(df, 5, 1.0)
    got.foreach { case (_, _, j) => j shouldBe 1.0 }
    got should not be empty // the %7 exact copies
  }

  it should "equal brute force on short shingles (heavier token collisions)" in {
    val df = corpus(50, seed = 3)
    run(df, 3, 0.5) shouldBe bruteForce(df, 3, 0.5)
  }

  it should "handle degenerate inputs" in {
    val df = Seq(
      (1L, "identical text here padded to shingle length"),
      (2L, "identical text here padded to shingle length"),
      (3L, ""), // empty: no shingles, excluded
      (4L, "ab"), // shorter than shingleLen: no shingles
      (5L, "completely different content with nothing shared at all"))
      .toDF("doc_id", "text")
    val got = run(df, 5, 0.5)
    got shouldBe Set((1L, 2L, 1.0))
  }

  it should "reject out-of-range thresholds" in {
    val df = corpus(5, seed = 4)
    an[IllegalArgumentException] should be thrownBy
      Dedup.jaccardJoinExact(df, "doc_id", "text", 5, 0.0)
    an[IllegalArgumentException] should be thrownBy
      Dedup.jaccardJoinExact(df, "doc_id", "text", 5, 1.1)
  }

  it should "never plan a cartesian product or a window" in {
    val plan = Dedup.jaccardJoinExact(corpus(20, seed = 5),
      "doc_id", "text", 5, 0.8).queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "Window"
  }

  behavior of "jaccardJoinExact pre-flight estimator"

  it should "predict the prefix join's pre-filter row count exactly" in {
    // the estimator is Σ_tok |small-prefix| × |prefix| over the SAME
    // df-ranked prefix relation the join consumes — by the inner join's
    // construction that equals its output row count before any filter.
    // Recompute the joined volume independently here and assert equality
    // (stronger than the ±2× accuracy ask).
    for ((n, seed, t) <- Seq((60, 11, 0.8), (40, 12, 0.5), (80, 13, 0.9))) {
      val df = corpus(n, seed)
      val est = Dedup.estimateJaccardJoinCandidates(df, "doc_id", "text", 5, t)
      val sh = df.select(col("doc_id").as("id"),
          shingleHashes(col("text"), 5).as("sh"))
        .filter(org.apache.spark.sql.functions.size(col("sh")) > 0)
      val toks = sh.select(col("id"), explode(col("sh")).as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      val ordered = toks.join(freq, "tok").groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ft"))
        .withColumn("len", org.apache.spark.sql.functions.size(col("ft")))
      val prefix = ordered
        .withColumn("p", (col("len") - ceil(lit(t) * col("len")) + 1).cast("int"))
        .withColumn("p_mid",
          (col("len") - ceil(lit(2 * t / (1 + t)) * col("len")) + 1).cast("int"))
        .select(col("id"), col("p_mid"),
          posexplode(slice(col("ft"), lit(1), col("p"))).as(Seq("pos", "e")))
        .select(col("e.tok").as("tok"), col("id"), col("pos"), col("p_mid"))
      val joined = prefix.filter(col("pos") < col("p_mid"))
        .select(col("tok"), col("id").as("id_a"))
        .join(prefix.select(col("tok"), col("id").as("id_b")), "tok")
        .count()
      withClue(s"corpus($n, $seed) t=$t: ") { est shouldBe joined }
    }
  }

  it should "fail fast past maxCandidates with the minhash recommendation" in {
    val df = corpus(60, seed = 14)
    val est = Dedup.estimateJaccardJoinCandidates(df, "doc_id", "text", 5, 0.8)
    est should be > 0L
    // at the cap: runs (and still equals brute force)
    Dedup.jaccardJoinExact(df, "doc_id", "text", 5, 0.8,
      maxCandidates = est).count() should be > 0L
    // below the estimate: pre-flight refuses before any join work
    val ex = the[IllegalStateException] thrownBy
      Dedup.jaccardJoinExact(df, "doc_id", "text", 5, 0.8,
        maxCandidates = est - 1)
    ex.getMessage should include("minhashNearDups")
    ex.getMessage should include(est.toString)
  }

  it should "estimate zero for an empty or degenerate corpus" in {
    Dedup.estimateJaccardJoinCandidates(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", 5, 0.8) shouldBe 0L
    Dedup.estimateJaccardJoinCandidates(
      Seq((1L, ""), (2L, (null: String))).toDF("doc_id", "text"),
      "doc_id", "text", 5, 0.8) shouldBe 0L
  }
}
