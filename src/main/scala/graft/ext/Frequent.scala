package graft.ext

import graft.GraftFunctions._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) extraction at corpus scale.
  *
  * The classic two-pass shape (Misra–Gries '82; mergeability per Agarwal
  * et al. '12 "Mergeable summaries"): pass 1 runs a k-counter Misra–Gries
  * sketch as a map-side-combined aggregation — each task carries at most k
  * counters, and only those O(k) buffers cross the wire — which yields a
  * GUARANTEED superset of every item above the frequency threshold; pass 2
  * counts just the candidate items exactly (broadcast semi-join, map-side
  * partial counts, ≤ k groups). Output is therefore EXACT, deterministic,
  * and never shuffles raw item traffic: the only full-width work is two
  * sequential scans, which is also the lower bound for exact heavy hitters
  * in bounded memory. (Reference role: ratatool's sumByKey/countByKey pair
  * counting, SamplerSCollectionFunctions.scala:220 — re-expressed as the
  * sketch+verify idiom a 100 TB corpus needs.)
  */
object Frequent {

  /** Mergeable Misra–Gries sketch over strings: at most `k` counters.
    *
    * Guarantee: any item with true count > N/(k+1) is present in the final
    * sketch, and each kept estimate undercounts by at most N/(k+1).
    * `reduce` is the textbook decrement-all step (amortized O(1) per
    * element: a decrement event erases k+1 units that k+1 increments paid
    * for); `merge` sums two sketches and, when over k counters, subtracts
    * the (k+1)-th largest value from all — the Agarwal et al. merge that
    * preserves the error bound, so partial buffers combine associatively
    * in any order Spark picks. */
  class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"MisraGries needs k >= 1, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
      if (x == null) m
      else m.get(x) match {
        case Some(c) => m.updated(x, c + 1L)
        case None if m.size < k => m.updated(x, 1L)
        case None =>
          // decrement all k counters, dropping exhausted ones
          m.iterator.collect { case (s, c) if c > 1L => (s, c - 1L) }.toMap
      }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (s, c)) =>
        m.updated(s, m.getOrElse(s, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything
        val cut = sum.valuesIterator.toArray.sortWith(_ > _).apply(k)
        sum.iterator.collect { case (s, c) if c > cut => (s, c - cut) }.toMap
      }
    }

    override def finish(m: Map[String, Long]): Map[String, Long] = m

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact items whose frequency is at least `minFreqPpm` parts-per-million
    * of the column's non-null count, with their exact counts.
    *
    * `slack` scales the sketch (k = slack × ⌈10⁶/ppm⌉). With slack ≥ 2 the
    * superset guarantee is unconditional: an item at the threshold has
    * count ≥ ppm·N/10⁶ > N/(k+1), so pass 1 cannot drop it, and pass 2's
    * exact integer comparison (cnt·10⁶ ≥ ppm·N — no floating point) makes
    * the final set independent of sketch nondeterminism (partition merge
    * order may vary the CANDIDATES, never the verified output).
    *
    * Returns (item, cnt), exact. Two scans of `df`; the sketch pass
    * shuffles O(k) buffer entries per task, the count pass broadcast-joins
    * the ≤ k candidates and map-side-combines to ≤ k groups. */
  def heavyHitters(df: DataFrame, itemCol: String, minFreqPpm: Long,
                   slack: Int = 2): DataFrame = {
    require(minFreqPpm >= 1 && minFreqPpm <= 1000000L,
      s"minFreqPpm must be in [1, 1e6], got $minFreqPpm")
    require(slack >= 2, s"slack < 2 voids the superset guarantee, got $slack")
    val k = slack * ((1000000L + minFreqPpm - 1) / minFreqPpm).toInt
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    val first = items.agg(mg(col("item")).as("sketch"),
      count(lit(1)).as("n")).head()
    val n = first.getAs[Long]("n")
    val cand = first.getAs[Map[String, Long]]("sketch").keys.toSeq
    if (n == 0L || cand.isEmpty)
      return items.groupBy("item").agg(count(lit(1)).as("cnt")).limit(0)
    val candDf = cand.toDF("item")
    items.join(broadcast(candDf), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(1000000L) >= lit(minFreqPpm) * lit(n))
  }

  /** Single-pass APPROXIMATE frequent items: the raw Misra–Gries summary
    * with its per-item guarantee made explicit — `est` never exceeds the
    * true count and undercounts by at most `max_undercount` = ⌈N/(k+1)⌉
    * (one corpus-wide constant). Use when a second scan is too expensive
    * and a bounded estimate suffices; [[heavyHitters]] is the exact
    * two-pass form. The candidate SET can vary with partition merge order;
    * the bound holds for every returned item regardless. */
  def approxTopK(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1, s"approxTopK needs k >= 1, got $k")
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    items.agg(mg(col("item")).as("sketch"), count(lit(1)).as("n"))
      .select(explode(col("sketch")).as(Seq("item", "est")), col("n"))
      .withColumn("max_undercount",
        ceil(col("n").cast("double") / (k + 1)).cast("long"))
      .drop("n")
  }

  /** [[heavyHitters]] over a text corpus's script-aware words
    * ([[graft.GraftFunctions.scriptTokens]] — whitespace words plus
    * per-code-point CJK/Thai tokens): the corpus's frequent vocabulary
    * with exact counts — stopword discovery, boilerplate tokens,
    * tokenizer seeding. The explode is narrow (no shuffle); both passes
    * stay scan-shaped. */
  def heavyWords(df: DataFrame, textCol: String, minFreqPpm: Long,
                 slack: Int = 2): DataFrame =
    heavyHitters(
      df.select(explode(scriptTokens(col(textCol))).as("word")),
      "word", minFreqPpm, slack)
}
