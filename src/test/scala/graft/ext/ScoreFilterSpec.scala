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

  it should "return everything at fraction 1.0 and nothing on empty input" in {
    val df = (1L to 17L).map(i => (i, i.toDouble)).toDF("id", "s")
    ScoreFilter.keepTopFraction(df, "s", 1.0, tieBreak = Seq("id"))
      .count() shouldBe 17L
    ScoreFilter.keepTopFraction(df.limit(0), "s", 0.5).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      ScoreFilter.keepTopFraction(df, "s", 0.0)
  }
}
