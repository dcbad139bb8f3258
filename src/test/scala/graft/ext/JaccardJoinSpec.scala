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
}
