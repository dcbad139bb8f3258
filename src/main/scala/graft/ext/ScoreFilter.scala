package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact "keep the top fraction by score" selection — the thresholding
  * step after quality scoring in a curation pipeline ("train on the best
  * 20% by quality_score"). Selection is EXACT (exactly ceil(n × fraction)
  * rows, the globally highest-scored ones) without ever sorting the
  * corpus globally.
  *
  * Scale shape (the same range-bucket trick as BigSampler's exact arms,
  * generalized from uniform [0,1) coins to an arbitrary score range):
  * one aggregate finds (count, min, max); scores are linearly bucketed
  * into `buckets` slices whose per-bucket counts — at most `buckets`
  * rows — are collected to the driver to locate the bucket containing
  * the cut; everything strictly above that bucket passes with a narrow
  * filter, and ONLY the boundary bucket (≈ n/buckets rows for a
  * continuous score) is rank-sorted. Nothing funnels the corpus through
  * one task. Degenerate case: a heavily-discrete score (many rows with
  * the exact cut value) concentrates ties into the boundary bucket,
  * whose sort is then larger — ties are broken deterministically by
  * `tieBreak`, matching a global ORDER BY score DESC, tieBreak.
  */
object ScoreFilter {

  /** Keep exactly ceil(n × fraction) highest-`scoreCol` rows of `df`.
    * Rows with a null score are excluded from both n and the result.
    * `tieBreak` columns (ascending) make equal-score selection at the
    * cut deterministic; with no tie-break, the kept COUNT is still exact
    * but which equal-scored boundary rows pass is arbitrary. */
  def keepTopFraction(df: DataFrame, scoreCol: String, fraction: Double,
                      tieBreak: Seq[String] = Seq.empty,
                      buckets: Int = 2048): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0,1], got $fraction")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val s = col(scoreCol).cast("double")
    val scored = df.filter(s.isNotNull && !isnan(s))
    val stats = scored.agg(count(lit(1)), min(s), max(s)).head()
    val n = stats.getLong(0)
    if (n == 0) return scored.limit(0)
    val t = math.ceil(n * fraction).toLong
    val (lo, hi) = (stats.getDouble(1), stats.getDouble(2))
    if (lo == hi) {
      // single distinct score: the whole corpus IS the boundary bucket.
      // Count-exact; deterministic membership only under a tie-break.
      val w = Window.orderBy(tieBreak.map(col): _*)
      return if (tieBreak.isEmpty) scored.limit(t.min(Int.MaxValue).toInt)
      else scored.withColumn("__rank", row_number().over(w))
        .filter(col("__rank") <= t).drop("__rank")
    }
    // bucket 0 = highest scores; keep ascending buckets until t is met
    val bkt = least(floor((lit(hi) - s) / (lit(hi) - lit(lo)) * buckets),
      lit(buckets - 1)).cast("int")
    val counts = scored.groupBy(bkt.as("__bkt")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var cum = 0L; var cutBkt = buckets; var rem = 0L
    val it = counts.iterator
    while (it.hasNext && cutBkt == buckets) {
      val (b, c) = it.next()
      if (cum + c >= t) { cutBkt = b; rem = t - cum } else cum += c
    }
    val withB = scored.withColumn("__bkt", bkt)
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
    * Same scale shape as [[keepTopFraction]] — one stats pass, a
    * per-bucket WEIGHT histogram (≤ `buckets` rows to the driver), a
    * narrow filter for every bucket strictly above the cut, and a
    * running-sum rank over ONLY the boundary bucket. */
  def keepTopByBudget(df: DataFrame, scoreCol: String, weightCol: String,
                      budget: Long, tieBreak: Seq[String] = Seq.empty,
                      buckets: Int = 2048): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val s = col(scoreCol).cast("double")
    val wt = col(weightCol).cast("long")
    val scored = df.filter(s.isNotNull && !isnan(s) && wt.isNotNull && wt >= 0)
    if (budget == 0L) return scored.limit(0)
    val stats = scored
      .agg(count(lit(1)), min(s), max(s), sum(wt).cast("decimal(38,0)")).head()
    val n = stats.getLong(0)
    if (n == 0) return scored.limit(0)
    val total = stats.getDecimal(3)
    if (total.compareTo(java.math.BigDecimal.valueOf(budget)) <= 0) return scored
    val (lo, hi) = (stats.getDouble(1), stats.getDouble(2))
    // single distinct score (or all ties): the corpus IS the boundary
    val bkt =
      if (lo == hi) lit(0)
      else least(floor((lit(hi) - s) / (lit(hi) - lit(lo)) * buckets),
        lit(buckets - 1)).cast("int")
    val weights = scored.groupBy(bkt.as("__bkt"))
      .agg(sum(wt).cast("decimal(38,0)").as("__w"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).sortBy(_._1)
    var cum = java.math.BigDecimal.ZERO
    val budgetBd = java.math.BigDecimal.valueOf(budget)
    var cutBkt = buckets; var remBudget = java.math.BigDecimal.ZERO
    val it = weights.iterator
    while (it.hasNext && cutBkt == buckets) {
      val (b, bw) = it.next()
      if (cum.add(bw).compareTo(budgetBd) > 0) { cutBkt = b; remBudget = budgetBd.subtract(cum) }
      else cum = cum.add(bw)
    }
    // every bucket fit (possible when total > budget only via excluded
    // rows — cannot happen here, but guard): keep everything scored
    if (cutBkt == buckets) return scored
    val withB = scored.withColumn("__bkt", bkt)
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
