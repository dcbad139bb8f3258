package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some("alpha"), Some(10.0)),
    (2L, Some("beta"), Some(20.0)),
    (3L, None, Some(30.0)),
    (4L, Some("gamma"), None),
    (5L, Some("alpha"), Some(40.0)))
  private lazy val df = rows.toDF("id", "name", "score")

  behavior of "Profile.profile"

  it should "compute exact per-column metrics on a hand-checked fixture" in {
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    p.keySet shouldBe Set("id", "name", "score")

    val id = p("id")
    id.getLong(1) shouldBe 5L // n_rows
    id.getLong(2) shouldBe 5L // n_nonnull
    id.getDouble(3) shouldBe 1.0 // completeness
    id.getLong(4) shouldBe 5L // approx_distinct (sparse = exact)
    id.getDouble(5) shouldBe 1.0 // min
    id.getDouble(6) shouldBe 5.0 // max
    id.getDouble(7) shouldBe 3.0 // mean
    math.abs(id.getDouble(8) - math.sqrt(2.5)) should be < 1e-12 // stddev_samp
    id.isNullAt(9) shouldBe true // avg_len
    id.isNullAt(10) shouldBe true // max_len

    val name = p("name")
    name.getLong(2) shouldBe 4L
    name.getDouble(3) shouldBe 0.8
    name.getLong(4) shouldBe 3L // alpha, beta, gamma
    name.isNullAt(5) shouldBe true
    name.getDouble(9) shouldBe (5 + 4 + 5 + 5) / 4.0
    name.getLong(10) shouldBe 5L

    val score = p("score")
    score.getLong(2) shouldBe 4L
    score.getDouble(5) shouldBe 10.0
    score.getDouble(6) shouldBe 40.0
    score.getDouble(7) shouldBe 25.0
  }

  it should "restrict to requested columns and reject unknown ones" in {
    Profile.profile(df, Seq("id")).collect().map(_.getString(0)).toSeq shouldBe
      Seq("id")
    an[IllegalArgumentException] should be thrownBy
      Profile.profile(df, Seq("nope"))
  }

  it should "plan as one aggregation: a single exchange, no join, no window" in {
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).size shouldBe 1
    plan should not include "Join"
    plan should not include "Window"
  }

  behavior of "Profile.check"

  it should "evaluate every constraint kind on a hand-checked fixture" in {
    import Profile._
    val got = check(df, Seq(
      NotNull("id"), NotNull("name"),
      CompletenessAtLeast("name", 0.75),
      CompletenessAtLeast("name", 0.9),
      InRange("score", 0.0, 35.0),
      InRange("score", 0.0, 100.0),
      MatchesRegex("name", "[a-z]+", 1.0),
      MatchesRegex("name", "al.*", 0.4),
      Unique(Seq("id")),
      Unique(Seq("name")),
      ApproxDistinctBetween("id", 4L, 6L)))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))

    got should contain(("not_null", "id", 0.0, true))
    got should contain(("not_null", "name", 1.0, false))
    got should contain(("completeness_at_least", "name", 0.8, true))
    got.count { case (l, c, _, p) =>
      l == "completeness_at_least" && c == "name" && !p } shouldBe 1
    got should contain(("in_range", "score", 1.0, false)) // 40 > 35
    got should contain(("in_range", "score", 0.0, true))
    got should contain(("matches_regex", "name", 1.0, true))
    got should contain(("matches_regex", "name", 0.5, true)) // 2 of 4 alpha
    got should contain(("unique", "id", 0.0, true))
    got should contain(("unique", "name", 1.0, false)) // alpha twice
    got should contain(("approx_distinct_between", "id", 5.0, true))
  }

  it should "return real booleans on empty input" in {
    import Profile._
    val empty = df.filter(lit(false))
    val got = check(empty, Seq(
      NotNull("id"), CompletenessAtLeast("name", 0.9),
      InRange("score", 0.0, 1.0), MatchesRegex("name", "x", 0.5),
      Unique(Seq("id"))))
      .collect().map(r => (r.getString(0), r.getBoolean(3)))
    got.foreach { case (label, passed) =>
      withClue(s"$label: ") { passed shouldBe true } // all vacuous passes
    }
  }

  it should "treat null regex values as non-matching, not failing" in {
    import Profile._
    val got = check(df, Seq(MatchesRegex("name", "alpha|beta|gamma", 0.99)))
      .collect().head
    got.getDouble(2) shouldBe 1.0 // 4 of 4 non-null match; null row excluded
    got.getBoolean(3) shouldBe true
  }
}
