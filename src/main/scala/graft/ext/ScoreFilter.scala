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

  /** Per-key [[keepTopFraction]]: exactly ceil(n_k × fraction) best-
    * scored rows WITHIN each key (top 20% of every domain, rather than
    * top 20% globally — which would starve weak domains). Same single
    * (key, bucket) histogram + broadcast cut table + boundary-only rank
    * shape as [[keepTopByBudgetPerKey]], and the same stringified-key
    * aliasing caveat documented there. */
  def keepTopFractionPerKey(df: DataFrame, keyCols: Seq[String],
                            scoreCol: String, fraction: Double,
                            tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0,1], got $fraction")
    keepTopFractionPerKey(df, keyCols, scoreCol,
      Map.empty[String, Double], fraction, tieBreak)
  }

  /** Per-key FRACTIONS — the mixture-weights form of
    * [[keepTopFractionPerKey]] (resample each domain at its own rate:
    * DoReMi-style target mixtures, language rebalancing): `fractions`
    * maps the stringified key (multi-column keys join with "\u0000", nulls
    * render "null") to its keep fraction; absent keys use
    * `defaultFraction`, and a fraction of 0.0 drops the domain
    * entirely. With a deterministic hash as `scoreCol` this is an exact
    * deterministic per-domain subsample; with a quality score it is
    * per-domain quality selection at domain-specific intensities. Same
    * histogram + broadcast cut table + boundary-only rank shape (and
    * stringified-key caveat) as the single-fraction form. */
  def keepTopFractionPerKey(df: DataFrame, keyCols: Seq[String],
                            scoreCol: String, fractions: Map[String, Double],
                            defaultFraction: Double,
                            tieBreak: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    (fractions.valuesIterator ++ Iterator.single(defaultFraction)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fractions must be in [0,1], got $f"))
    val s = col(scoreCol).cast("double")
    val key = concat_ws("\u0000",
      keyCols.map(k => coalesce(col(k).cast("string"), lit("null"))): _*)
    val scored = df.filter(s.isNotNull && !isnan(s))
    val hist = scored.groupBy(key.as("__key"), descBucket(s).as("__bkt"))
      .count().limit(MaxDriverGroups + 1).collect()
    if (hist.length > MaxDriverGroups)
      throw new IllegalStateException(
        s"per-key selection collected more than $MaxDriverGroups (key, " +
          "bucket) groups on the driver: the per-key form assumes all " +
          "distinct keys fit in memory; reduce key cardinality")
    val cuts = hist.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.map { case (k, rows) =>
        val t = math.ceil(rows.map(_._3).sum *
          fractions.getOrElse(k, defaultFraction)).toLong
        var cum = 0L; var cutBkt = Long.MaxValue; var rem = 0L
        val it = rows.sortBy(_._2).iterator
        while (it.hasNext && cutBkt == Long.MaxValue) {
          val (_, b, c) = it.next()
          if (cum + c >= t) { cutBkt = b; rem = t - cum } else cum += c
        }
        (k, cutBkt, rem)
      }
    val spark = df.sparkSession
    import spark.implicits._
    val cut = broadcast(cuts.toDF("__key", "__cutbkt", "__rem"))
    val withB = scored.withColumn("__key", key).withColumn("__bkt", descBucket(s))
      .join(cut, "__key")
    val pass = withB.filter(col("__bkt") < col("__cutbkt"))
    val w = Window.partitionBy("__key", "__bkt")
      .orderBy(s.desc +: tieBreak.map(col(_).asc): _*)
    val boundary = withB.filter(col("__bkt") === col("__cutbkt"))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= col("__rem"))
      .drop("__rank")
    pass.unionByName(boundary).drop("__key", "__bkt", "__cutbkt", "__rem")
  }

  /** Per-key [[keepTopByBudget]] — the DOMAIN-MIXING form: each key (a
    * domain, language, source…) gets its own token budget, and within
    * each key the best-scored prefix fills it. `budgets` maps the
    * stringified key (multi-column keys join with "\u0000", nulls render
    * "null") to its budget; keys absent from the map keep `defaultBudget`
    * (0 drops them).
    *
    * One (key, bucket) weight histogram — strata × occupied-buckets rows
    * to the driver, under the same "all strata fit in memory" contract
    * as BigSampler's exact arms (guarded) — then ONE narrow pass filter
    * and ONE boundary rank partitioned by (key, boundary-bucket), so
    * every domain's cut resolves in the same two jobs regardless of how
    * many domains there are.
    *
    * Multi-column keys join with NUL (`"\u0000"` — near-impossible in
    * real key values, unlike the `_` BigSampler's strata key and the
    * reference's MultiKey use); a key value that does embed NUL can still
    * alias, so pre-concatenate such keys yourself. */
  def keepTopByBudgetPerKey(df: DataFrame, keyCols: Seq[String],
                            scoreCol: String, weightCol: String,
                            budgets: Map[String, Long],
                            defaultBudget: Long = 0L,
                            tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(budgets.values.forall(_ >= 0L) && defaultBudget >= 0L,
      "budgets must be >= 0")
    val s = col(scoreCol).cast("double")
    val wt = col(weightCol).cast("long")
    val key = concat_ws("\u0000",
      keyCols.map(k => coalesce(col(k).cast("string"), lit("null"))): _*)
    val scored = df.filter(s.isNotNull && !isnan(s) && wt.isNotNull && wt >= 0)
    val hist = scored.groupBy(key.as("__key"), descBucket(s).as("__bkt"))
      .agg(sum(wt).cast("decimal(38,0)").as("__w"))
      .limit(MaxDriverGroups + 1).collect()
    if (hist.length > MaxDriverGroups)
      throw new IllegalStateException(
        s"per-key budget selection collected more than $MaxDriverGroups " +
          "(key, bucket) groups on the driver: the per-key form assumes " +
          "all distinct keys fit in memory; reduce key cardinality")
    // per key: walk ascending buckets (descending score) to the cut
    val cuts = hist.map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .groupBy(_._1).toSeq.map { case (k, rows) =>
        val budgetBd = java.math.BigDecimal.valueOf(
          budgets.getOrElse(k, defaultBudget))
        var cum = java.math.BigDecimal.ZERO
        var cutBkt = Long.MaxValue
        var remBudget = java.math.BigDecimal.ZERO
        val it = rows.sortBy(_._2).iterator
        while (it.hasNext && cutBkt == Long.MaxValue) {
          val (_, b, bw) = it.next()
          if (cum.add(bw).compareTo(budgetBd) > 0) {
            cutBkt = b; remBudget = budgetBd.subtract(cum)
          } else cum = cum.add(bw)
        }
        // cutBkt == MaxValue: the whole key fits its budget — keep all
        (k, cutBkt, if (cutBkt == Long.MaxValue) Long.MaxValue
          else remBudget.longValueExact())
      }
    val spark = df.sparkSession
    import spark.implicits._
    val cut = broadcast(cuts.toDF("__key", "__cutbkt", "__rem"))
    val withB = scored.withColumn("__key", key).withColumn("__bkt", descBucket(s))
      .join(cut, "__key")
    val pass = withB.filter(col("__bkt") < col("__cutbkt"))
    val w = Window.partitionBy("__key", "__bkt")
      .orderBy(s.desc +: tieBreak.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = withB.filter(col("__bkt") === col("__cutbkt"))
      .withColumn("__cw", sum(wt).over(w))
      .filter(col("__cw") <= col("__rem"))
      .drop("__cw")
    pass.unionByName(boundary).drop("__key", "__bkt", "__cutbkt", "__rem")
  }

  /** Temperature-smoothed mixture weights over domain counts — the
    * standard way to COMPUTE the per-domain fractions the selection
    * operators above consume (Conneau & Lample '19 α-sampling; GPT-3/
    * XLM-R style rebalancing): weight_d ∝ n_d^alpha, normalized. alpha=1
    * reproduces the natural distribution, alpha=0 is uniform, and the
    * usual 0.2–0.7 range up-weights low-resource domains.
    *
    * Returns the key columns + `n` (exact count) + `weight` (normalized,
    * sums to 1) + `fraction`: the per-domain KEEP fraction that realizes
    * the weights on `sampleBudget` output rows (min(1, budget·w/n)) —
    * feed it straight into [[keepTopFractionPerKey]]'s fractions map.
    * One map-side-combined count aggregation plus a 1-row scalar
    * broadcast; domain cardinality is the only driver-side quantity. */
  def temperatureFractions(df: DataFrame, keyCols: Seq[String], alpha: Double,
                           sampleBudget: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(sampleBudget >= 0L, s"sampleBudget must be >= 0, got $sampleBudget")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val powed = counts.withColumn("__w",
      pow(col("n").cast("double"), lit(alpha)))
    val tot = powed.agg(sum(col("__w")).as("__tot"))
    powed.crossJoin(broadcast(tot))
      .withColumn("weight", col("__w") / col("__tot"))
      .withColumn("fraction",
        least(lit(1.0), lit(sampleBudget.toDouble) * col("weight") /
          col("n").cast("double")))
      .drop("__w", "__tot")
  }

  /** Driver-collect cap for the per-key histogram (mirrors
    * BigSampler.MaxDriverGroups and the same strata-in-memory contract). */
  private val MaxDriverGroups = 4000000
}
