package graft.diffy

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Protobuf message-presence semantics through the generic Row differ,
  * without a protobuf runtime: the schema of the reference's TestRecord
  * (optional_nested_field message + repeated_fields message) is modeled as
  * nullable structs, proto2 `hasField` presence as struct nullability, and
  * `DiffOptions(messagePresence = true)` reproduces the goldens of
  * ProtoBufDiffyTest.scala:31-133 (primitive / nested / repeated /
  * cleared-message cases) — the D4 semantics with a descriptor-shaped
  * fixture instead of generated proto classes. */
class ProtoSemanticsSpec extends SparkSpec {
  import ProtoFixture._
  import spark.implicits._

  private val popts = DiffOptions(messagePresence = true)

  private def onr(i32: Int, i64: Long, s: String) = Some(Onr(Some(i32), Some(i64), Some(s)))
  private val rep0 = Some(Rep(Seq(10, 11), Seq(20L, 21L), Seq("hello", "world")))

  behavior of "proto message-presence semantics"

  it should "reproduce the primitive + nested goldens" in {
    val lhs = Seq(
      Rec("nested_same", onr(10, 20L, "hello"), None),
      Rec("nested_diff", onr(10, 20L, "hello"), None),
      Rec("nested_missing_rhs", onr(10, 20L, "hello"), None),
      Rec("nested_missing_both", None, rep0)).toDS.toDF
    val rhs = Seq(
      Rec("nested_same", onr(10, 20L, "hello"), None),
      Rec("nested_diff", onr(10, 200L, "Hello"), None),
      Rec("nested_missing_rhs", None, None),
      Rec("nested_missing_both", None, rep0)).toDS.toDF
    val res = BigDiffy.diff(lhs, rhs, Seq("k"), popts)
    val deltas = res.deltas.orderBy("key", "field")
      .select("key", "field", "left", "right", "delta_type", "delta")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), Option(r.get(5))))

    // ProtoBufDiffyTest "support nested fields": changed leaves surface
    // per-field; a message cleared on ONE side is a single delta at the
    // message path (NOT three leaf UNKNOWNs); cleared on both sides is SAME
    deltas.toSeq shouldBe Seq(
      ("nested_diff", "optional_nested_field.int64_field", "20", "200",
        "NUMERIC", Some(180.0)),
      ("nested_diff", "optional_nested_field.string_field", "hello", "Hello",
        "STRING", Some(1.0)),
      ("nested_missing_rhs", "optional_nested_field",
        """{"int32_field":10,"int64_field":20,"string_field":"hello"}""",
        null, "UNKNOWN", None))

    res.keyStats.as[(String, String)].collect().toMap shouldBe Map(
      "nested_same" -> "SAME", "nested_diff" -> "DIFFERENT",
      "nested_missing_rhs" -> "DIFFERENT", "nested_missing_both" -> "SAME")
  }

  it should "reproduce the repeated-field goldens" in {
    val lhs = Seq(Rec("repeated_diff", None, rep0)).toDS.toDF
    val rhs = Seq(Rec("repeated_diff", None,
      Some(Rep(Seq(10, 11), Seq(-20L, -21L), Seq("Hello", "World"))))).toDS.toDF
    val deltas = BigDiffy.diff(lhs, rhs, Seq("k"), popts)
      .deltas.orderBy("field")
      .select("field", "left", "right", "delta_type", "delta")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), Option(r.get(4))))
    // "support repeated fields": numeric arrays → VECTOR 1−cos (= 2.0 for
    // an exact sign flip), string arrays → UNKNOWN; unchanged arrays silent
    deltas.toSeq shouldBe Seq(
      ("repeated_fields.int64_field", "[20,21]", "[-20,-21]", "VECTOR", Some(2.0)),
      ("repeated_fields.string_field", """["hello","world"]""",
        """["Hello","World"]""", "UNKNOWN", None))
  }

  it should "honor ignore and unordered through message presence" in {
    val lhs = Seq(
      Rec("ignored_diff", onr(10, 20L, "hello"), None),
      Rec("unordered_eq", None, Some(Rep(Seq(), Seq(20L, 21L), Seq())))).toDS.toDF
    val rhs = Seq(
      Rec("ignored_diff", onr(10, 20L, "HELLO"), None),
      Rec("unordered_eq", None, Some(Rep(Seq(), Seq(21L, 20L), Seq())))).toDS.toDF
    val res = BigDiffy.diff(lhs, rhs, Seq("k"), popts.copy(
      ignore = Set("optional_nested_field.string_field"),
      unordered = Set("repeated_fields.int64_field")))
    res.deltas.count() shouldBe 0L
    res.keyStats.as[(String, String)].collect().toMap.values.toSet shouldBe Set("SAME")
  }

  it should "suppress an ignored message node entirely" in {
    // ignoring the message path must drop BOTH its presence delta and its
    // leaves — the reference filters on field-path prefix after recursion
    val lhs = Seq(Rec("a", onr(1, 2L, "x"), None)).toDS.toDF
    val rhs = Seq(Rec("a", None, None)).toDS.toDF
    val res = BigDiffy.diff(lhs, rhs, Seq("k"), popts.copy(
      ignore = Set("optional_nested_field")))
    res.deltas.count() shouldBe 0L
  }

  behavior of "descriptor-shaped generation (the G3 role without a runtime)"

  // The reference's protobufOf[TestRecord] + amend combinators
  // (ratatool-scalacheck ProtoBufGeneratorTest.scala) exist to fabricate
  // presence-tracked records for diff/sampler tests. RowGen over the
  // descriptor-shaped schema carries that role here: nullable structs ARE
  // the presence dimension, so schema-driven generation produces records
  // with and without each message, and amend pins fields exactly like the
  // reference's `protoBufOf[TestRecord].amend(...)`.
  it should "generate presence-varied records and drive the presence differ" in {
    import graft.gen.{Gen, RowGen}
    val schema = implicitly[org.apache.spark.sql.Encoder[Rec]].schema
    val g0 = RowGen.of(schema, noneFraction = 0.4, maxArrayLen = 3)
    // amend the key to a bounded id so lhs/rhs correlate (amend2 shared key)
    val pair = RowGen.amend2(g0, schema, g0, schema)(
      ("k", "k", Gen.choose(0, 200).map(i => s"key_$i")))
    val samples = (1 to 300).map(i => pair.sample(i.toLong))
    // presence actually varies on the message field
    val present = samples.count(_._1.getStruct(1) != null)
    present should be > 30
    present should be < 270
    val lhs = spark.createDataFrame(
      spark.sparkContext.parallelize(samples.map(_._1).distinct), schema)
      .dropDuplicates("k")
    val rhs = spark.createDataFrame(
      spark.sparkContext.parallelize(samples.map(_._2).distinct), schema)
      .dropDuplicates("k")
    val res = BigDiffy.diff(lhs, rhs, Seq("k"), popts)
    // the differ consumes generated presence-tracked rows end-to-end: the
    // global view accounts for every key exactly once
    val g = res.globalStats.first()
    val total = g.getAs[Long]("num_same") + g.getAs[Long]("num_diff") +
      g.getAs[Long]("num_missing_lhs") + g.getAs[Long]("num_missing_rhs")
    val keys = lhs.select("k").unionByName(rhs.select("k")).distinct().count()
    total shouldBe keys
    // both-null message rows never contribute a presence delta
    val bothNull = lhs.filter(col("optional_nested_field").isNull)
      .join(rhs.filter(col("optional_nested_field").isNull), "k")
      .select("k").as[String].collect().toSet
    val presenceDeltaKeys = res.deltas
      .filter(col("field") === "optional_nested_field")
      .select("key").as[String].collect().toSet
    presenceDeltaKeys.intersect(bothNull) shouldBe empty
  }
}
