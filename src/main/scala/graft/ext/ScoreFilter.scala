package graft.ext

import graft.GraftFunctions.doubleOrderBits
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact "keep the top fraction by score" selection — the thresholding
  * step after quality scoring in a curation pipeline ("train on the best
  * 20% by quality_score"). Selection is EXACT (exactly ceil(n × fraction)
  * rows, the globally highest-scored ones) without ever sorting the
  * corpus globally.
  *
  * Scale shape (the range-bucket trick of BigSampler's exact arms,
  * hardened for arbitrary score distributions): scores are bucketed on
  * the HIGH BITS of an order-preserving IEEE-754 double→long key
  * ([[graft.GraftFunctions.doubleOrderBits]]) — sign/exponent/mantissa-
  * prefix slices, exponentially spaced, needing NO data-dependent
  * [min, max] scaling. That buys two things over linear range buckets:
  * the histogram pass is the FIRST pass (no separate min/max scan of
  * the corpus), and a single extreme outlier cannot stretch the range
  * until the whole corpus collapses into one bucket. The per-bucket
  * counts — at most 2^20 groups, typically a few hundred (scores
  * occupy few octaves) — are collected to the driver to locate the
  * bucket containing the cut; everything strictly above that bucket
  * passes with a narrow filter, and ONLY the boundary bucket (≈ 1/256
  * of an octave of the score distribution) is rank-sorted. Nothing
  * funnels the corpus through one task. Degenerate case: a
  * heavily-discrete score (many rows carrying the exact cut value)
  * concentrates ties into the boundary bucket, whose sort is then
  * larger — ties are broken deterministically by `tieBreak`, matching
  * a global ORDER BY score DESC, tieBreak.
  */
object ScoreFilter {

  /** 64 − 20: bucket on the top 20 bits of the order key — 1 sign + 11
    * exponent + 8 mantissa bits, i.e. 256 slices per power of two. */
  private val BucketShift = 44

  /** Ascending-bucket = descending-score key, so the driver walk below
    * reads "best bucket first". */
  private def descBucket(s: org.apache.spark.sql.Column) =
    -shiftright(doubleOrderBits(s), BucketShift)

  /** Keep exactly ceil(n × fraction) highest-`scoreCol` rows of `df`.
    * Rows with a null/NaN score are excluded from both n and the result.
    * `tieBreak` columns (ascending) make equal-score selection at the
    * cut deterministic; with no tie-break, the kept COUNT is still exact
    * but which equal-scored boundary rows pass is arbitrary. */
  def keepTopFraction(df: DataFrame, scoreCol: String, fraction: Double,
                      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0,1], got $fraction")
    val s = col(scoreCol).cast("double")
    val scored = df.filter(s.isNotNull && !isnan(s))
    val counts = scored.groupBy(descBucket(s).as("__bkt")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    if (n == 0) return scored.limit(0)
    val t = math.ceil(n * fraction).toLong
    var cum = 0L; var cutBkt = Long.MaxValue; var rem = 0L
    val it = counts.iterator
    while (it.hasNext && cutBkt == Long.MaxValue) {
      val (b, c) = it.next()
      if (cum + c >= t) { cutBkt = b; rem = t - cum } else cum += c
    }
    val withB = scored.withColumn("__bkt", descBucket(s))
    val pass = withB.filter(col("__bkt") < cutBkt)
    val w = Window.partitionBy("__bkt")
      .orderBy(s.desc +: tieBreak.map(col(_).asc): _*)
    val boundary = withB.filter(col("__bkt") === cutBkt)
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= rem)
      .drop("__rank")
    pass.unionByName(boundary).drop("__bkt")
  }

  /** Keep the maximal score-descending PREFIX of `df` whose total
    * `weightCol` stays within `budget` — "train on the best documents
    * until the token budget is full", the data-mixing step downstream of
    * quality scoring. Prefix semantics, not knapsack: rows are taken
    * strictly in (score desc, tieBreak) order and selection stops at the
    * first row that would overflow the budget, even if a lighter
    * lower-scored row would still fit. Rows with null/NaN score or a
    * null/negative weight are excluded.
    *
    * Same scale shape as [[keepTopFraction]] — a distribution-free
    * per-bucket WEIGHT histogram as the first and only driver-bound
    * pass, a narrow filter for every bucket strictly above the cut, and
    * a running-sum rank over ONLY the boundary bucket. */
  def keepTopByBudget(df: DataFrame, scoreCol: String, weightCol: String,
                      budget: Long, tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val s = col(scoreCol).cast("double")
    val wt = col(weightCol).cast("long")
    val scored = df.filter(s.isNotNull && !isnan(s) && wt.isNotNull && wt >= 0)
    if (budget == 0L) return scored.limit(0)
    // decimal accumulation: a 100 TB corpus's total token count can pass
    // Long.MaxValue only adversarially, but ANSI mode would then fail the
    // job — decimal(38,0) cannot
    val weights = scored.groupBy(descBucket(s).as("__bkt"))
      .agg(sum(wt).cast("decimal(38,0)").as("__w"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).sortBy(_._1)
    if (weights.isEmpty) return scored.limit(0)
    val budgetBd = java.math.BigDecimal.valueOf(budget)
    val total = weights.map(_._2).reduce(_.add(_))
    if (total.compareTo(budgetBd) <= 0) return scored
    var cum = java.math.BigDecimal.ZERO
    var cutBkt = Long.MaxValue; var remBudget = java.math.BigDecimal.ZERO
    val it = weights.iterator
    while (it.hasNext && cutBkt == Long.MaxValue) {
      val (b, bw) = it.next()
      if (cum.add(bw).compareTo(budgetBd) > 0) {
        cutBkt = b; remBudget = budgetBd.subtract(cum)
      } else cum = cum.add(bw)
    }
    val withB = scored.withColumn("__bkt", descBucket(s))
    val pass = withB.filter(col("__bkt") < cutBkt)
    val w = Window.partitionBy("__bkt")
      .orderBy(s.desc +: tieBreak.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = withB.filter(col("__bkt") === cutBkt)
      .withColumn("__cw", sum(wt).over(w))
      .filter(col("__cw") <= remBudget.longValueExact())
      .drop("__cw")
    pass.unionByName(boundary).drop("__bkt")
  }
}
