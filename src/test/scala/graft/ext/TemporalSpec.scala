package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join vs a brute-force per-row oracle; sessionize vs hand-counted
  * sessions. Bucket widths are chosen so cases span MANY buckets (carry-in
  * must cross empty buckets) and ONE bucket (pure in-bucket resolution). */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // left: (id, key, ts); right: (key, ts, v)
  private lazy val left = Seq(
    (1L, "a", 100.0), (2L, "a", 250.0), (3L, "a", 999.0),
    (4L, "b", 50.0), (5L, "b", 51.0),
    (6L, "c", 10.0) // key with no right rows at all
  ).toDF("id", "k", "ts")
  private lazy val right = Seq(
    ("a", 100.0, 1.0),  // equal-ts: inclusive backward must match it
    ("a", 240.0, 2.0), ("a", 260.0, 3.0),
    ("b", 50.5, 4.0), ("b", 50.5, 9.0), // duplicate (key, ts): max payload wins
    ("d", 1.0, 5.0)    // right-only key
  ).toDF("k", "ts", "v")

  private def matches(width: Double): Map[Long, (Option[Double], Option[Double])] =
    Temporal.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"), width)
      .collect()
      .map(r => r.getLong(r.fieldIndex("id")) -> (
        (if (r.isNullAt(r.fieldIndex("asof_ts"))) None else Some(r.getDouble(r.fieldIndex("asof_ts")))),
        (if (r.isNullAt(r.fieldIndex("asof_v"))) None else Some(r.getDouble(r.fieldIndex("asof_v"))))))
      .toMap

  private val expected = Map(
    1L -> (Some(100.0), Some(1.0)),  // ts == right ts: inclusive
    2L -> (Some(240.0), Some(2.0)),  // skips the later 260
    3L -> (Some(260.0), Some(3.0)),  // carried across many empty buckets
    4L -> (None, None),              // right row exists but only LATER
    5L -> (Some(50.5), Some(9.0)),   // dup (key, ts) reduced to max payload
    6L -> (None, None)               // key never appears on the right
  )

  behavior of "Temporal.asofJoin"

  it should "match the brute-force backward join with many small buckets" in {
    matches(width = 10.0) shouldBe expected
  }

  it should "match with one giant bucket (degenerate per-key window)" in {
    matches(width = 1e9) shouldBe expected
  }

  it should "keep every left row exactly once (left-outer)" in {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"), 10.0)
    out.count() shouldBe left.count()
    out.select(countDistinct(col("id"))).head().getLong(0) shouldBe left.count()
  }

  it should "carry all original left columns through unchanged" in {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"), 10.0)
    out.columns.toSeq shouldBe Seq("id", "k", "ts", "asof_ts", "asof_v")
    out.select("id", "k", "ts").exceptAll(left.select("id", "k", "ts"))
      .count() shouldBe 0L
  }

  it should "never match null keys, regardless of bucket width" in {
    // a null-key left row sharing a bucket with a null-key right row is
    // the trap: Window.partitionBy pools nulls, SQL equality doesn't
    val l = Seq((1L, Option("a"), 100.0), (2L, Option.empty[String], 100.0))
      .toDF("id", "k", "ts")
    val r = Seq((Option("a"), 50.0, 1.0), (Option.empty[String], 50.0, 2.0))
      .toDF("k", "ts", "v")
    for (width <- Seq(10.0, 1e9)) {
      val out = Temporal.asofJoin(l, r, Seq("k"), "ts", "ts", Seq("v"), width)
        .collect().map(x => x.getLong(0) ->
          (if (x.isNullAt(x.fieldIndex("asof_v"))) None
           else Some(x.getDouble(x.fieldIndex("asof_v"))))).toMap
      out shouldBe Map(1L -> Some(1.0), 2L -> None)
    }
  }

  behavior of "Temporal.sessionize"

  it should "assign gap-delimited 1-based session ids per key" in {
    val df = Seq(
      ("u1", 0.0), ("u1", 10.0), ("u1", 100.0), ("u1", 101.0),
      ("u2", 5.0)
    ).toDF("u", "ts")
    val got = Temporal.sessionize(df, Seq("u"), "ts", gap = 30.0)
      .select("u", "ts", "session_id").as[(String, Double, Long)]
      .collect().toSet
    got shouldBe Set(
      ("u1", 0.0, 1L), ("u1", 10.0, 1L),   // 10 <= 30 continues
      ("u1", 100.0, 2L), ("u1", 101.0, 2L),
      ("u2", 5.0, 1L))
  }

  it should "continue the session on an exactly-gap pause and split past it" in {
    val df = Seq(("u", 0.0), ("u", 30.0), ("u", 60.1)).toDF("u", "ts")
    val ids = Temporal.sessionize(df, Seq("u"), "ts", gap = 30.0)
      .orderBy("ts").select("session_id").as[Long].collect().toSeq
    ids shouldBe Seq(1L, 1L, 2L) // 30.0 == gap continues; 30.1 > gap splits
  }

  it should "give equal-timestamp rows the same session" in {
    val df = Seq(("u", 0.0), ("u", 0.0), ("u", 1000.0)).toDF("u", "ts")
    val ids = Temporal.sessionize(df, Seq("u"), "ts", gap = 1.0)
      .select("session_id").as[Long].collect().sorted.toSeq
    ids shouldBe Seq(1L, 1L, 2L)
  }

  behavior of "Temporal.rollingAgg"

  it should "aggregate the trailing range per key with equal-ts peers shared" in {
    val df = Seq(
      ("u", 0L, 1.0), ("u", 50L, 2.0), ("u", 100L, 4.0), ("u", 100L, 8.0),
      ("u", 201L, 16.0), ("v", 100L, 32.0))
      .toDF("u", "ts", "x")
    val got = Temporal.rollingAgg(df, Seq("u"), "ts", span = 100L, "x")
      .select("u", "ts", "x", "roll_count", "roll_sum")
      .as[(String, Long, Double, Long, Double)].collect().toSet
    got shouldBe Set(
      ("u", 0L, 1.0, 1L, 1.0),
      ("u", 50L, 2.0, 2L, 3.0), // [.-50, 50] -> ts 0, 50
      ("u", 100L, 4.0, 4L, 15.0), // [0,100] incl BOTH ts=100 peers
      ("u", 100L, 8.0, 4L, 15.0), // peer shares the result
      ("u", 201L, 16.0, 1L, 16.0), // [101, 201]: both ts=100 rows fall outside
      ("v", 100L, 32.0, 1L, 32.0))
  }
}
