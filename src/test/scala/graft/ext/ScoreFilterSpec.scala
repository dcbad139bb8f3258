package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact top-fraction selection: count exactness, membership vs a global
  * sort, deterministic tie-breaking, and degenerate inputs. */
class ScoreFilterSpec extends SparkSpec {
  import spark.implicits._

  behavior of "keepTopFraction"

  it should "keep exactly ceil(n*f) rows and match a global sort" in {
    // scores deliberately non-uniform (quadratic) so bucket occupancy is
    // skewed — the boundary-bucket rank must still cut exactly
    val df = (1L to 1000L).map(i => (i, (i * i % 997).toDouble)).toDF("id", "s")
    val got = ScoreFilter.keepTopFraction(df, "s", 0.1, tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted
    got.length shouldBe 100
    val want = df.orderBy(col("s").desc, col("id"))
      .limit(100).select("id").as[Long].collect().sorted
    got shouldBe want
  }

  it should "break boundary ties deterministically by the tie-break key" in {
    // 50 rows share score 5.0 with only 30 slots left after the 2.0-pass:
    // ceil(80*0.5)=40; ten distinct-high rows pass, the 30 smallest ids
    // among the tied rows fill the rest
    val df = ((1L to 50L).map(i => (i, 5.0)) ++ (51L to 80L).map(i => (i, 9.0)))
      .toDF("id", "s")
    val got = ScoreFilter.keepTopFraction(df, "s", 0.5, tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted
    got.length shouldBe 40
    got shouldBe ((1L to 10L) ++ (51L to 80L)).toArray.sorted
  }

  it should "exclude null and NaN scores from n and the result" in {
    val df = Seq((1L, Some(3.0)), (2L, None), (3L, Some(1.0)),
      (4L, Some(Double.NaN)), (5L, Some(2.0))).toDF("id", "s")
    // n = 3 scored rows, ceil(3*0.5) = 2: ids 1 and 5
    ScoreFilter.keepTopFraction(df, "s", 0.5, tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted shouldBe Array(1L, 5L)
  }

  it should "handle a single distinct score via pure tie-break rank" in {
    val df = (1L to 20L).map(i => (i, 7.0)).toDF("id", "s")
    ScoreFilter.keepTopFraction(df, "s", 0.25, tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted shouldBe (1L to 5L).toArray
  }

  it should "stay exact when an extreme outlier stretches the score range" in {
    // one 1e300 among [0,1) scores: linear [min,max] bucketing would
    // collapse every real score into one bucket and rank the whole
    // corpus in a single task; exponent-spaced bit-buckets don't care
    val df = ((1L to 1000L).map(i => (i, i / 1000.0)) :+ (9999L, 1e300))
      .toDF("id", "s")
    val got = ScoreFilter.keepTopFraction(df, "s", 0.1, tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted
    val want = df.orderBy(col("s").desc, col("id")).limit(101)
      .select("id").as[Long].collect().sorted
    got shouldBe want
  }

  it should "order correctly across negative, zero, and subnormal scores" in {
    val df = Seq((1L, -5.0), (2L, 0.0), (3L, 5.0), (4L, -0.0),
      (5L, Double.MinPositiveValue), (6L, -1e-310)).toDF("id", "s")
    // desc: 5.0 > minpos > +0.0 > -0.0 > -1e-310 > -5.0 -> top 3
    ScoreFilter.keepTopFraction(df, "s", 0.5, tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted shouldBe Array(2L, 3L, 5L)
  }

  behavior of "keepTopByBudget"

  it should "keep the maximal score-desc prefix within the weight budget" in {
    // score = id, weight = 10 each: budget 45 fits the top 4 (40), the
    // 5th would overflow at 50 — prefix stops there
    val df = (1L to 20L).map(i => (i, i.toDouble, 10L)).toDF("id", "s", "w")
    ScoreFilter.keepTopByBudget(df, "s", "w", 45L, tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted shouldBe Array(17L, 18L, 19L, 20L)
    // prefix, NOT knapsack: a lighter lower-scored row after the first
    // overflow does not sneak in
    val mixed = Seq((1L, 9.0, 30L), (2L, 8.0, 30L), (3L, 7.0, 1L))
      .toDF("id", "s", "w")
    ScoreFilter.keepTopByBudget(mixed, "s", "w", 40L, tieBreak = Seq("id"))
      .select("id").as[Long].collect() shouldBe Array(1L)
  }

  it should "match a global running-sum rank on skewed scores and weights" in {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map(i => (i, (i * i % 389).toDouble, rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "s", "w")
    val got = ScoreFilter.keepTopByBudget(df, "s", "w", 3000L, tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted
    // oracle: running sum over a global sort
    val want = rows.sortBy { case (id, s, _) => (-s, id) }
      .scanLeft((0L, 0L)) { case ((_, cw), (id, _, w)) => (id, cw + w) }
      .drop(1).takeWhile(_._2 <= 3000L).map(_._1).sorted
    got shouldBe want.toArray
  }

  behavior of "keepTopFractionPerKey"

  it should "keep exactly ceil(n_k * f) per key, matching per-key sorts" in {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 600L).map { i =>
      (i, s"d${i % 4}", rnd.nextInt(1000).toDouble / 7.0)
    }
    val df = rows.toDF("id", "dom", "s")
    val got = ScoreFilter.keepTopFractionPerKey(df, Seq("dom"), "s", 0.25,
        tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted
    val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val t = math.ceil(rs.size * 0.25).toLong
      rs.sortBy { case (id, _, s) => (-s, id) }.take(t.toInt).map(_._1)
    }.toArray.sorted
    got shouldBe want
    // every key contributes: a global cut would starve low-score domains
    ScoreFilter.keepTopFractionPerKey(df, Seq("dom"), "s", 0.25, Seq("id"))
      .select("dom").distinct().count() shouldBe 4L
  }

  behavior of "keepTopByBudgetPerKey"

  it should "fill each domain's budget best-first, independently" in {
    // domain a: budget 25 -> ids with top scores until 25 weight; domain
    // b: budget 10; domain c unlisted -> default 0 -> dropped entirely
    val rows = (1L to 30L).map { i =>
      val dom = if (i <= 10) "a" else if (i <= 20) "b" else "c"
      (i, dom, i.toDouble, 5L)
    }
    val df = rows.toDF("id", "dom", "s", "w")
    val got = ScoreFilter.keepTopByBudgetPerKey(df, Seq("dom"), "s", "w",
        Map("a" -> 25L, "b" -> 10L), tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted
    // a: top-5 of 1..10 = 6..10; b: top-2 of 11..20 = 19,20; c: none
    got shouldBe Array(6L, 7L, 8L, 9L, 10L, 19L, 20L)
  }

  it should "match per-key running-sum oracles on mixed weights and null keys" in {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map { i =>
      val dom: java.lang.Long = if (i % 5 == 0) null else (i % 3): java.lang.Long
      (i, dom, (i * 37 % 101).toDouble, rnd.nextInt(20).toLong)
    }
    val df = rows.toDF("id", "dom", "s", "w")
    val budgets = Map("0" -> 300L, "1" -> 150L, "null" -> 100L)
    val got = ScoreFilter.keepTopByBudgetPerKey(df, Seq("dom"), "s", "w",
        budgets, defaultBudget = 50L, tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted
    val want = rows.groupBy(r => Option(r._2).map(_.toString).getOrElse("null"))
      .flatMap { case (k, rs) =>
        val b = budgets.getOrElse(k, 50L)
        rs.sortBy { case (id, _, s, _) => (-s, id) }
          .scanLeft((0L, 0L)) { case ((_, cw), (id, _, _, w)) => (id, cw + w) }
          .drop(1).takeWhile(_._2 <= b).map(_._1)
      }.toArray.sorted
    got shouldBe want
  }

  it should "keep everything under budget and nothing at budget zero" in {
    val df = (1L to 10L).map(i => (i, i.toDouble, 5L)).toDF("id", "s", "w")
    ScoreFilter.keepTopByBudget(df, "s", "w", 100L).count() shouldBe 10L
    ScoreFilter.keepTopByBudget(df, "s", "w", 0L).count() shouldBe 0L
    // null/negative weights are excluded from selection and the budget
    val bad = Seq((1L, 2.0, Some(5L)), (2L, 1.0, None), (3L, 3.0, Some(-1L)))
      .toDF("id", "s", "w")
    ScoreFilter.keepTopByBudget(bad, "s", "w", 100L)
      .select("id").as[Long].collect() shouldBe Array(1L)
  }

  it should "return everything at fraction 1.0 and nothing on empty input" in {
    val df = (1L to 17L).map(i => (i, i.toDouble)).toDF("id", "s")
    ScoreFilter.keepTopFraction(df, "s", 1.0, tieBreak = Seq("id"))
      .count() shouldBe 17L
    ScoreFilter.keepTopFraction(df.limit(0), "s", 0.5).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      ScoreFilter.keepTopFraction(df, "s", 0.0)
  }

  behavior of "keepTopFractionPerKey with per-key fractions"

  it should "resample each key at its own rate, default elsewhere, 0 drops" in {
    // 20 'a' rows, 10 'b' rows, 8 'c' rows with a deterministic score
    val rows = ((1L to 20L).map(i => (i, "a", (i * 7 % 23).toDouble)) ++
      (21L to 30L).map(i => (i, "b", (i * 11 % 19).toDouble)) ++
      (31L to 38L).map(i => (i, "c", i.toDouble)))
    val df = rows.toDF("id", "k", "s")
    val got = ScoreFilter.keepTopFractionPerKey(df, Seq("k"), "s",
        fractions = Map("a" -> 0.5, "c" -> 0.0), defaultFraction = 0.3,
        tieBreak = Seq("id"))
      .select("id").as[Long].collect().sorted
    val want = rows.groupBy(_._2).flatMap { case (k, rs) =>
      val f = Map("a" -> 0.5, "c" -> 0.0).getOrElse(k, 0.3)
      rs.sortBy { case (id, _, sc) => (-sc, id) }
        .take(math.ceil(rs.size * f).toInt).map(_._1)
    }.toArray.sorted
    got shouldBe want
    got.count(_ > 30L) shouldBe 0 // fraction 0 dropped every 'c' row
    // single-fraction form == map form with only a default
    ScoreFilter.keepTopFractionPerKey(df, Seq("k"), "s", 0.3, Seq("id"))
      .select("id").as[Long].collect().sorted shouldBe
      ScoreFilter.keepTopFractionPerKey(df, Seq("k"), "s",
        Map.empty[String, Double], 0.3, Seq("id"))
        .select("id").as[Long].collect().sorted
  }

  behavior of "temperatureFractions"

  it should "smooth domain weights by alpha and derive feasible fractions" in {
    val df = ((1 to 90).map(i => (i.toLong, "big")) ++
      (1 to 10).map(i => (100L + i, "small"))).toDF("id", "k")
    // alpha=1: natural distribution
    val nat = ScoreFilter.temperatureFractions(df, Seq("k"), 1.0, 50L)
      .select("k", "weight").as[(String, Double)].collect().toMap
    nat("big") shouldBe 0.9 +- 1e-12
    nat("small") shouldBe 0.1 +- 1e-12
    // alpha=0: uniform regardless of counts
    val uni = ScoreFilter.temperatureFractions(df, Seq("k"), 0.0, 50L)
      .select("k", "weight").as[(String, Double)].collect().toMap
    uni("big") shouldBe 0.5 +- 1e-12
    uni("small") shouldBe 0.5 +- 1e-12
    // alpha=0.5 up-weights the small domain; fractions realize the budget
    val t = ScoreFilter.temperatureFractions(df, Seq("k"), 0.5, 50L)
      .select("k", "n", "weight", "fraction")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val wBig = math.sqrt(90.0) / (math.sqrt(90.0) + math.sqrt(10.0))
    t("big")._3 shouldBe wBig +- 1e-12
    t("big")._4 shouldBe (50.0 * wBig / 90.0) +- 1e-12
    // small domain: budget share exceeds the domain -> fraction caps at 1
    t("small")._4 shouldBe math.min(1.0, 50.0 * (1 - wBig) / 10.0) +- 1e-12
    // weights always sum to 1
    t.values.map(_._3).sum shouldBe 1.0 +- 1e-12
  }
}
