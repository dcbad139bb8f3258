package graft.diffy

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden per-operator diff tests, mirroring the reference's
  * AvroDiffyTest.scala:38-242 / TableRowDiffyTest.scala:30-260. */
class DeltaSpec extends SparkSpec {
  import spark.implicits._

  /** (key, field, left, delta_type, delta) rows, ordered. */
  private def deltasOf(res: DiffResult): Seq[(String, String, String, String, Option[Double])] =
    res.deltas.orderBy("key", "field").collect().toSeq.map { r =>
      (r.getString(0), r.getString(1), Option(r.get(2)).map(_.toString).orNull,
        r.getString(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }

  behavior of "BigDiffy deltas"

  it should "emit NUMERIC deltas y - x for numeric leaves" in {
    val l = Seq((1L, 10.0), (2L, 5.0)).toDF("k", "v")
    val r = Seq((1L, 12.5), (2L, 5.0)).toDF("k", "v")
    val d = deltasOf(BigDiffy.diff(l, r, Seq("k")))
    d shouldBe Seq(("1", "v", "10.0", "NUMERIC", Some(2.5)))
  }

  it should "emit Levenshtein STRING deltas, but NUMERIC for numeric-parsing strings" in {
    val l = Seq((1L, "kitten", "1"), (2L, "same", "2")).toDF("k", "s", "n")
    val r = Seq((1L, "sitting", "3"), (2L, "same", "2")).toDF("k", "s", "n")
    val d = deltasOf(BigDiffy.diff(l, r, Seq("k")))
    d should contain theSameElementsAs Seq(
      ("1", "n", "1", "NUMERIC", Some(2.0)),
      ("1", "s", "kitten", "STRING", Some(3.0)))
  }

  it should "diff nested struct leaves with dotted paths" in {
    val l = Seq((1L, (10L, "a"))).toDF("k", "rec")
    val r = Seq((1L, (11L, "a"))).toDF("k", "rec")
    val d = deltasOf(BigDiffy.diff(l, r, Seq("k")))
    d shouldBe Seq(("1", "rec._1", "10", "NUMERIC", Some(1.0)))
  }

  it should "emit VECTOR cosine deltas for equal-size numeric arrays, UNKNOWN for size mismatch" in {
    val l = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 2.0))).toDF("k", "v")
    val r = Seq((1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 2.0, 3.0))).toDF("k", "v")
    val d = deltasOf(BigDiffy.diff(l, r, Seq("k")))
    d.map(t => (t._1, t._4)) should contain theSameElementsAs
      Seq(("1", "VECTOR"), ("2", "UNKNOWN"))
    d.find(_._1 == "1").get._5.get shouldBe 1.0 +- 1e-12
  }

  it should "treat unordered arrays as multisets sorted by string rendering" in {
    val l = Seq((1L, Seq("b", "a")), (2L, Seq("x", "y"))).toDF("k", "v")
    val r = Seq((1L, Seq("a", "b")), (2L, Seq("y", "z"))).toDF("k", "v")
    val res = BigDiffy.diff(l, r, Seq("k"), DiffOptions(unordered = Set("v")))
    val d = deltasOf(res)
    d.map(_._1) shouldBe Seq("2") // key 1 equal after sorting
  }

  it should "match keyed arrays-of-structs by subfield with field[key] labels" in {
    val l = Seq((1L, Seq((10L, 1.0), (20L, 2.0)))).toDF("k", "arr")
    val r = Seq((1L, Seq((20L, 2.5), (10L, 1.0), (30L, 9.9)))).toDF("k", "arr")
    val res = BigDiffy.diff(l, r, Seq("k"),
      DiffOptions(unorderedFieldKeys = Map("arr" -> "_1")))
    val d = deltasOf(res)
    d.map(t => (t._2, t._4)) should contain theSameElementsAs Seq(
      ("arr[20]._2", "NUMERIC"), ("arr[30]", "UNKNOWN"))
    d.find(_._2 == "arr[20]._2").get._5 shouldBe Some(0.5)
  }

  it should "diff maps per key over the union of key sets with path[key] labels" in {
    val l = Seq((1L, Map("a" -> 1.0, "b" -> 2.0))).toDF("k", "m")
    val r = Seq((1L, Map("a" -> 1.0, "b" -> 3.5, "c" -> 7.0))).toDF("k", "m")
    val d = deltasOf(BigDiffy.diff(l, r, Seq("k")))
    d.map(t => (t._2, t._4, t._5)) should contain theSameElementsAs Seq(
      ("m[b]", "NUMERIC", Some(1.5)),
      ("m[c]", "UNKNOWN", None))
  }

  it should "ignore requested fields and their subtrees" in {
    val l = Seq((1L, 1.0, "x")).toDF("k", "v", "s")
    val r = Seq((1L, 9.0, "y")).toDF("k", "v", "s")
    val res = BigDiffy.diff(l, r, Seq("k"), DiffOptions(ignore = Set("v")))
    deltasOf(res).map(_._2) shouldBe Seq("s")
  }

  it should "render binary leaves as uppercase hex" in {
    val l = Seq((1L, Array[Byte](1, 2))).toDF("k", "b")
    val r = Seq((1L, Array[Byte](1, -1))).toDF("k", "b")
    val d = BigDiffy.diff(l, r, Seq("k")).deltas
      .select("left", "right").head()
    d shouldBe Row("0102", "01FF")
  }
}

/** Regressions from the round-3 review: null-vs-empty maps, one-sided
  * keyed arrays, merged-schema nullability. */
class DeltaRegressionSpec extends graft.SparkSpec {
  import spark.implicits._

  it should "report a null map vs a present map as DIFFERENT (whole-map UNKNOWN)" in {
    val l = Seq((1L, Some(Map.empty[String, Double])), (2L, Some(Map("k" -> 1.0))))
      .toDF("k", "m")
    val r = Seq((1L, Option.empty[Map[String, Double]]), (2L, Some(Map("k" -> 1.0))))
      .toDF("k", "m")
    val res = BigDiffy.diff(l, r, Seq("k"))
    res.keyStats.orderBy("key").as[(String, String)].collect() shouldBe
      Array(("1", "DIFFERENT"), ("2", "SAME"))
    val d = res.deltas.head()
    (d.getString(1), d.getString(4)) shouldBe (("m", "UNKNOWN"))
  }

  it should "degrade a one-sided unorderedFieldKeys field to UNKNOWN instead of failing" in {
    val l = Seq((1L, Seq((10L, 1.0)))).toDF("k", "arr")
    val r = Seq((1L, "not an array")).toDF("k", "arr")
    val res = BigDiffy.diff(l, r, Seq("k"),
      DiffOptions(unorderedFieldKeys = Map("arr" -> "_1")))
    res.deltas.head().getString(4) shouldBe "UNKNOWN"
    val r2 = Seq(Tuple1(1L)).toDF("k") // rhs lacks arr entirely
    BigDiffy.diff(l, r2, Seq("k"),
      DiffOptions(unorderedFieldKeys = Map("arr" -> "_1")))
      .deltas.head().getString(4) shouldBe "UNKNOWN"
  }

  it should "mark one-sided merged fields nullable" in {
    import org.apache.spark.sql.types._
    val m = graft.core.SchemaPaths.mergeSchemas(
      StructType(Seq(StructField("a", LongType, nullable = false),
        StructField("only_l", StringType, nullable = false))),
      StructType(Seq(StructField("a", LongType, nullable = false),
        StructField("only_r", BooleanType, nullable = false))))
    m("a").nullable shouldBe false
    m("only_l").nullable shouldBe true
    m("only_r").nullable shouldBe true
    // shared-field nullability now gates canRead
    graft.core.SchemaPaths.canRead(
      StructType(Seq(StructField("a", LongType, nullable = false))),
      StructType(Seq(StructField("a", LongType, nullable = true)))) shouldBe false
  }
}
