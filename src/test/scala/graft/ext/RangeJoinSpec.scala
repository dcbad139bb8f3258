package graft.ext

import graft.SparkSpec
// guard pins live at the bottom of this suite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Temporal.rangeJoin]] / [[Temporal.intervalOverlapJoin]] vs a
  * brute-force cross-join oracle on randomized data, the degenerate-input
  * contract, and the plan shape (an equi-join on (key, bin), never a
  * nested loop over the range predicate). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // randomized but seeded corpus: ~40 keys, points and intervals spread
  // over [0, 1000) with interval lengths 0..~60 (some spanning many
  // 16-wide bins, some empty via end < start)
  private val rnd = new scala.util.Random(1234)
  private lazy val pts = (1 to 400).map { i =>
    (i.toLong, (rnd.nextInt(40) + 1).toLong, rnd.nextDouble() * 1000)
  }.toDF("pid", "k", "t")
  private lazy val ivs = (1 to 300).map { i =>
    val s = rnd.nextDouble() * 1000
    val len = rnd.nextDouble() * 60 - 5 // ~8% empty (end < start)
    (i.toLong, (rnd.nextInt(40) + 1).toLong, s, s + len)
  }.toDF("iid", "k", "s", "e")

  private def bruteRange(how: String): DataFrame = {
    val j = pts.crossJoin(ivs.select(col("iid"), col("k").as("k2"),
        col("s"), col("e")))
      .filter(col("k") === col("k2") && col("t") >= col("s") && col("t") <= col("e"))
      .select(col("pid"), col("iid"))
    if (how == "inner") j
    else pts.select("pid").join(j, Seq("pid"), "left")
  }

  private def sortedPairs(df: DataFrame): Seq[(Long, Any)] =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getLong(1))).toSeq.sortBy(p =>
      (p._1, if (p._2 == null) Long.MinValue else p._2.asInstanceOf[Long]))

  behavior of "Temporal.rangeJoin"

  it should "match the brute-force oracle exactly (inner), for several bin widths" in {
    for (w <- Seq(1.0, 16.0, 500.0, 5000.0)) {
      val got = Temporal.rangeJoin(pts, ivs, Seq("k"), "t", "s", "e", w)
        .select("pid", "iid")
      withClue(s"binWidth=$w: ") {
        sortedPairs(got) shouldBe sortedPairs(bruteRange("inner"))
      }
    }
  }

  it should "match the brute-force oracle exactly (left): unmatched points survive once" in {
    val got = Temporal.rangeJoin(pts, ivs, Seq("k"), "t", "s", "e", 16.0, "left")
      .select("pid", "iid")
    sortedPairs(got) shouldBe sortedPairs(bruteRange("left"))
  }

  it should "never match null keys, null/NaN endpoints, or empty intervals — but keep them under left" in {
    val p = Seq(
      (1L, Option(1L), Option(5.0)),       // in-range of interval 10
      (2L, None, Option(5.0)),             // null key
      (3L, Option(1L), None),              // null ts
      (4L, Option(1L), Option(Double.NaN)) // NaN ts
    ).toDF("pid", "k", "t")
    val i = Seq(
      (10L, Option(1L), Option(0.0), Option(10.0)),  // the only live interval
      (11L, None, Option(0.0), Option(10.0)),        // null key
      (12L, Option(1L), None, Option(10.0)),         // null start
      (13L, Option(1L), Option(10.0), Option(0.0)),  // empty (end < start)
      (14L, Option(1L), Option(Double.NaN), Option(10.0)) // NaN start
    ).toDF("iid", "k", "s", "e")
    val inner = Temporal.rangeJoin(p, i, Seq("k"), "t", "s", "e", 4.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    inner shouldBe Set((1L, 10L))
    val left = Temporal.rangeJoin(p, i, Seq("k"), "t", "s", "e", 4.0, "left")
      .select("pid", "iid")
    sortedPairs(left) shouldBe Seq((1L, 10L), (2L, null), (3L, null), (4L, null))
  }

  it should "include both inclusive boundaries" in {
    val p = Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 9.999), (4L, 1L, 20.001))
      .toDF("pid", "k", "t")
    val i = Seq((7L, 1L, 10.0, 20.0)).toDF("iid", "k", "s", "e")
    Temporal.rangeJoin(p, i, Seq("k"), "t", "s", "e", 3.0)
      .select("pid").as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  it should "plan an equi-join on (key, bin) — no nested loop, no cartesian" in {
    val plan = Temporal.rangeJoin(pts, ivs, Seq("k"), "t", "s", "e", 16.0)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  behavior of "Temporal.intervalOverlapJoin"

  private def bruteOverlap: Seq[(Long, Any)] = sortedPairs(
    ivs.select(col("iid").as("a_iid"), col("k"), col("s").as("a_s"), col("e").as("a_e"))
      .crossJoin(ivs.select(col("iid").as("b_iid"), col("k").as("k2"),
        col("s").as("b_s"), col("e").as("b_e")))
      .filter(col("k") === col("k2") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("a_s") <= col("a_e") && col("b_s") <= col("b_e") &&
        col("a_iid") < col("b_iid"))
      .select(col("a_iid"), col("b_iid")))

  it should "emit every overlapping pair exactly once (self-overlap, several bin widths)" in {
    val a = ivs
    val b = ivs.select(col("iid").as("b_iid"), col("k"),
      col("s").as("b_s"), col("e").as("b_e"))
    for (w <- Seq(2.0, 16.0, 900.0)) {
      val got = Temporal.intervalOverlapJoin(a, b, Seq("k"),
          "s", "e", "b_s", "b_e", w)
        .filter(col("iid") < col("b_iid"))
        .select(col("iid"), col("b_iid"))
      withClue(s"binWidth=$w: ") { sortedPairs(got) shouldBe bruteOverlap }
    }
  }

  it should "plan an equi-join on (key, bin) for the overlap form too" in {
    val b = ivs.select(col("iid").as("b_iid"), col("k"),
      col("s").as("b_s"), col("e").as("b_e"))
    val plan = Temporal.intervalOverlapJoin(ivs, b, Seq("k"),
        "s", "e", "b_s", "b_e", 16.0)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  it should "route oversized intervals around the explode and stay exact" in {
    // tiny bin width + a low cap: most random intervals (len up to ~60)
    // now touch > 4 one-wide bins and take the broadcast side path;
    // parity with brute force must be unaffected for inner AND left
    for (how <- Seq("inner", "left")) {
      val got = Temporal.rangeJoin(pts, ivs, Seq("k"), "t", "s", "e",
          binWidth = 1.0, how = how, maxBinsPerInterval = 4L)
        .select("pid", "iid")
      withClue(s"how=$how: ") {
        sortedPairs(got) shouldBe sortedPairs(bruteRange(how))
      }
    }
    // a single pathological interval spanning 1e7 bins must not
    // materialize 1e7 copies: with the cap it joins the points' distinct
    // bins instead — the query completes instantly and matches brute force
    // the +Infinity / huge-endpoint rows are the overflow regression: bin()
    // saturates at Long.MaxValue there, and a LONG bin-count would
    // overflow negative and dodge the guard straight into the explode
    val monster = ivs.unionByName(
      Seq((9999L, 1L, -5e6, 5e6),
        (9998L, 2L, 0.0, Double.PositiveInfinity),
        (9997L, 3L, -1e300, 1e300)).toDF("iid", "k", "s", "e"))
    val got = Temporal.rangeJoin(pts, monster, Seq("k"), "t", "s", "e",
        binWidth = 1.0, maxBinsPerInterval = 64L)
      .select("pid", "iid")
    val brute = pts.crossJoin(monster.select(col("iid"), col("k").as("k2"),
        col("s"), col("e")))
      .filter(col("k") === col("k2") && col("t") >= col("s") &&
        col("t") <= col("e"))
      .select(col("pid"), col("iid"))
    sortedPairs(got) shouldBe sortedPairs(brute)
  }

  it should "route oversized intervals in the overlap join exactly once" in {
    // cap low enough that some random intervals are 'big' on either side,
    // plus one monster on each side: pair responsibility must still emit
    // every overlapping pair exactly once
    val a = ivs.unionByName(Seq((8888L, 2L, -1e6, 1e6)).toDF("iid", "k", "s", "e"))
    val b0 = a.select(col("iid").as("b_iid"), col("k"),
      col("s").as("b_s"), col("e").as("b_e"))
    val got = Temporal.intervalOverlapJoin(a, b0, Seq("k"),
        "s", "e", "b_s", "b_e", binWidth = 1.0, maxBinsPerInterval = 8L)
      .filter(col("iid") < col("b_iid"))
      .select(col("iid"), col("b_iid"))
    val brute = a.crossJoin(a.select(col("iid").as("jid"), col("k").as("k2"),
        col("s").as("s2"), col("e").as("e2")))
      .filter(col("k") === col("k2") && col("s") <= col("e2") &&
        col("s2") <= col("e") &&
        col("s") <= col("e") && col("s2") <= col("e2") && // valid only
        col("iid") < col("jid"))
      .select(col("iid"), col("jid"))
    sortedPairs(got) shouldBe sortedPairs(brute)
  }

  it should "reject reserved scratch column names on either side" in {
    import spark.implicits._
    val pts = Seq((1L, 5.0, 7L)).toDF("k", "t", "__ib")
    val ivsBad = Seq((1L, 0.0, 10.0)).toDF("k", "s", "e")
    val e1 = intercept[IllegalArgumentException] {
      Temporal.rangeJoin(pts, ivsBad, Seq("k"), "t", "s", "e", 16.0)
    }
    e1.getMessage should include("__ib")
    val lBad = Seq((1L, 0.0, 10.0, 2L)).toDF("k", "s", "e", "__rb")
    val r = Seq((1L, 0.0, 10.0)).toDF("k", "b_s", "b_e")
    val e2 = intercept[IllegalArgumentException] {
      Temporal.intervalOverlapJoin(lBad, r, Seq("k"), "s", "e",
        "b_s", "b_e", 16.0)
    }
    e2.getMessage should include("__rb")
  }
}
