package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import ProtoWire._

/** proto3 semantics (no-presence defaults, packed-by-default repeated
  * primitives, open enums), `map<,>` fields, and `oneof` groups — all
  * against the public encoding spec's golden bytes where the spec gives
  * them, plus source-text parsing and a distributed Spark round trip. */
class Proto3Spec extends SparkSpec {

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xFF}%02x").mkString(" ")

  private def norm(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case r: Row => Row.fromSeq(r.toSeq.map(norm))
    case s: scala.collection.Seq[_] => s.map(norm)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => norm(k) -> norm(mv) }.toMap
    case other => other
  }

  behavior of "proto3 no-presence fields"

  private val implicitMsg = PMessage("M", Seq(
    PField(1, "i", PImplicit, PInt32),
    PField(2, "s", PImplicit, PString),
    PField(3, "b", PImplicit, PBool),
    PField(4, "d", PImplicit, PDouble),
    PField(5, "by", PImplicit, PBytes),
    PField(6, "e", PImplicit, PEnum("E", Map("ZERO" -> 0, "ONE" -> 1), open = true))))

  it should "omit default values on the wire and decode absence as the default" in {
    val allDefault = Row(0, "", false, 0.0, Array.emptyByteArray, "ZERO")
    toBytes(allDefault, implicitMsg).length shouldBe 0
    val back = fromBytes(Array.emptyByteArray, implicitMsg)
    back.getInt(0) shouldBe 0
    back.getString(1) shouldBe ""
    back.getBoolean(2) shouldBe false
    back.getDouble(3) shouldBe 0.0
    back.getAs[Array[Byte]](4).length shouldBe 0
    back.getString(5) shouldBe "ZERO"
  }

  it should "round-trip non-default values and keep -0.0 on the wire (raw bits)" in {
    val row = Row(7, "x", true, -0.0, Array[Byte](1), "ONE")
    val bytes = toBytes(row, implicitMsg)
    bytes.length should be > 0
    val back = fromBytes(bytes, implicitMsg)
    norm(back) shouldBe norm(row)
    // -0.0 == 0.0 by value but NOT by raw bits: it must survive the trip
    java.lang.Double.doubleToRawLongBits(back.getDouble(3)) should not be 0L
  }

  it should "mark no-presence columns non-nullable in the Spark schema" in {
    val s = sparkSchema(implicitMsg)
    s.fields.map(_.nullable).toSeq shouldBe Seq.fill(6)(false)
  }

  behavior of "packed encoding"

  it should "emit the spec's canonical packed run for repeated int32" in {
    // docs example: field 4, values [3, 270, 86942] → 22 06 03 8e 02 9e a7 05
    val m = PMessage("M", Seq(
      PField(4, "d", PRepeated, PInt32, packed = true)))
    hex(toBytes(Row(Seq(3, 270, 86942)), m)) shouldBe "22 06 03 8e 02 9e a7 05"
    // and an empty packed field is absent entirely
    toBytes(Row(Seq.empty[Int]), m).length shouldBe 0
  }

  it should "round-trip every packable type through its packed form" in {
    val e = PEnum("E", Map("A" -> 0, "B" -> 3))
    val m = PMessage("M", Seq(
      PField(1, "i32", PRepeated, PInt32, packed = true),
      PField(2, "si", PRepeated, PSInt64, packed = true),
      PField(3, "f32", PRepeated, PFixed32, packed = true),
      PField(4, "d", PRepeated, PDouble, packed = true),
      PField(5, "bl", PRepeated, PBool, packed = true),
      PField(6, "en", PRepeated, e, packed = true)))
    val row = Row(Seq(-1, 0, 150), Seq(-75L, 1L), Seq(7, -7), Seq(1.5, -0.0),
      Seq(true, false), Seq("B", "A"))
    norm(fromBytes(toBytes(row, m), m)) shouldBe norm(row)
    // a packed string field never packs (strings are not packable):
    // the flag is ignored and the unpacked form is emitted
    val s = PMessage("S", Seq(PField(1, "s", PRepeated, PString, packed = true)))
    hex(toBytes(Row(Seq("ab")), s)) shouldBe "0a 02 61 62"
  }

  behavior of "open enums"

  it should "preserve unknown numbers as decimal strings and encode them back" in {
    val open = PEnum("E", Map("ZERO" -> 0, "ONE" -> 1), open = true)
    val m = PMessage("M", Seq(
      PField(1, "e", POptional, open),
      PField(2, "es", PRepeated, open)))
    // wire: field 1 = 77 (unknown), field 2 = [1, 99]
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x08, 77, 0x10, 0x01, 0x10, 99))
    val back = fromBytes(out.toByteArray, m)
    back.getString(0) shouldBe "77"
    back.getSeq[String](1) shouldBe Seq("ONE", "99")
    // and the decimal-string symbols encode back to the same numbers
    norm(fromBytes(toBytes(back, m), m)) shouldBe norm(back)
    // a closed enum still drops the unknown number as an unknown field
    val closed = PEnum("E", Map("ZERO" -> 0, "ONE" -> 1))
    val mc = PMessage("M", Seq(PField(1, "e", POptional, closed)))
    fromBytes(Array[Byte](0x08, 77), mc).isNullAt(0) shouldBe true
  }

  behavior of "map fields"

  it should "emit the entry-message wire form" in {
    // map<int32,int32> at field 7, {1 → 2}: tag 3a, len 4, 08 01 10 02
    val m = PMessage("M", Seq(
      PField(7, "g", PRepeated, PMap(PInt32, PInt32))))
    hex(toBytes(Row(Map(1 -> 2)), m)) shouldBe "3a 04 08 01 10 02"
  }

  it should "apply last-key-wins and default missing sides" in {
    val m = PMessage("M", Seq(
      PField(1, "g", PRepeated, PMap(PString, PInt32))))
    // two entries with the same key "a" (5 then 9), one entry with a
    // missing value (defaults to 0), one with a missing key (defaults "")
    val out = new java.io.ByteArrayOutputStream()
    def entry(bytes: Array[Byte]): Unit = {
      out.write(0x0a); out.write(bytes.length); out.write(bytes)
    }
    entry(Array[Byte](0x0a, 1, 'a'.toByte, 0x10, 5))
    entry(Array[Byte](0x0a, 1, 'a'.toByte, 0x10, 9))
    entry(Array[Byte](0x0a, 1, 'b'.toByte)) // no value
    entry(Array[Byte](0x10, 3)) // no key
    val got = fromBytes(out.toByteArray, m).getMap[String, Int](0)
    got shouldBe Map("a" -> 9, "b" -> 0, "" -> 3)
  }

  it should "round-trip message-valued maps (missing value = empty message)" in {
    val inner = PMessage("I", Seq(
      PField(1, "x", POptional, PInt32),
      PField(2, "y", POptional, PString)))
    val m = PMessage("M", Seq(
      PField(1, "g", PRepeated, PMap(PInt64, PMsg(inner)))))
    val row = Row(Map(1L -> Row(5, "a"), 2L -> Row(null, null)))
    norm(fromBytes(toBytes(row, m), m)) shouldBe norm(row)
    // an entry with no value field decodes to the EMPTY message, not null
    val bytes = Array[Byte](0x0a, 2, 0x08, 3) // one entry: key=3, no value
    val got = fromBytes(bytes, m).getMap[Long, Row](0)
    got(3L) shouldBe Row(null, null)
  }

  it should "reject float, message, and map keys at descriptor build" in {
    intercept[IllegalArgumentException](PMap(PFloat, PInt32))
    intercept[IllegalArgumentException](PMap(PBytes, PInt32))
    intercept[IllegalArgumentException](
      PMap(PString, PMap(PString, PInt32)))
  }

  behavior of "oneof groups"

  private val oneofMsg = PMessage("M", Seq(
    PField(1, "name", POptional, PString, oneof = Some("id")),
    PField(2, "num", POptional, PInt64, oneof = Some("id")),
    PField(3, "other", POptional, PBool)))

  it should "apply last-member-seen-wins across the group on decode" in {
    // wire: name="a" then num=5 → only num survives
    val bytes = Array[Byte](0x0a, 1, 'a'.toByte, 0x10, 5)
    val back = fromBytes(bytes, oneofMsg)
    back.isNullAt(0) shouldBe true
    back.getLong(1) shouldBe 5L
    // reversed order: name survives
    val rev = fromBytes(Array[Byte](0x10, 5, 0x0a, 1, 'a'.toByte), oneofMsg)
    rev.getString(0) shouldBe "a"
    rev.isNullAt(1) shouldBe true
  }

  it should "refuse to encode a row with two members of one group set" in {
    intercept[IllegalArgumentException](
      toBytes(Row("a", 5L, null), oneofMsg))
      .getMessage should include("oneof 'id'")
    // one member (or none) is fine, and fields outside the group don't count
    norm(fromBytes(toBytes(Row("a", null, true), oneofMsg), oneofMsg)) shouldBe
      norm(Row("a", null, true))
    toBytes(Row(null, null, null), oneofMsg).length shouldBe 0
  }

  behavior of "proto3 source parsing"

  private val proto3Text = """
    |syntax = "proto3";
    |package demo;
    |
    |message Event {
    |  int64 id = 1;                  // implicit: no presence
    |  string kind = 2;
    |  optional string note = 3;      // explicit presence
    |  repeated int32 codes = 4;      // packed by default
    |  repeated string tags = 5;      // strings never pack
    |  map<string, int64> counts = 6;
    |  Level level = 7;
    |  oneof target {
    |    string url = 8;
    |    int64 user_id = 9;
    |  }
    |}
    |
    |enum Level { UNKNOWN = 0; LOW = 1; HIGH = 2; }
    |""".stripMargin

  it should "parse proto3 labels, maps, oneofs, and open enums" in {
    val msg = parseProto(proto3Text)("Event")
    val f = msg.fields.map(x => x.name -> x).toMap
    f("id").label shouldBe PImplicit
    f("kind").label shouldBe PImplicit
    f("note").label shouldBe POptional
    f("codes").label shouldBe PRepeated
    f("codes").packed shouldBe true
    f("tags").packed shouldBe true // set, but ignored for strings at encode
    f("counts").ptype shouldBe PMap(PString, PInt64)
    f("level").ptype.asInstanceOf[PEnum].open shouldBe true
    f("level").label shouldBe PImplicit
    f("url").oneof shouldBe Some("target")
    f("user_id").oneof shouldBe Some("target")
    f("url").label shouldBe POptional
    // schema: implicit scalars non-null, map non-null MapType, oneof nullable
    val s = sparkSchema(msg)
    s("id").nullable shouldBe false
    s("note").nullable shouldBe true
    s("counts").dataType shouldBe MapType(StringType, LongType, false)
    s("url").nullable shouldBe true
    // full wire round trip through the parsed descriptor
    val row = Row(9L, "click", null, Seq(1, 270), Seq("a"),
      Map("x" -> 3L), "HIGH", "http://e", null)
    norm(fromBytes(toBytes(row, msg), msg)) shouldBe norm(row)
    // defaults vanish from the wire: id=0, kind="", empty collections
    toBytes(Row(0L, "", null, Seq.empty[Int], Seq.empty[String],
      Map.empty[String, Long], "UNKNOWN", null, null), msg).length shouldBe 0
  }

  it should "enforce proto3 rules loudly" in {
    intercept[IllegalArgumentException](
      parseProto("syntax = \"proto3\"; message M { required int32 a = 1; }"))
      .getMessage should include("proto2-only")
    intercept[IllegalArgumentException](
      parseProto("syntax = \"proto3\"; enum E { ONE = 1; }"))
      .getMessage should include("zero")
    // a message-typed implicit field keeps explicit presence
    val m = parseProto(
      "syntax = \"proto3\"; message A { B b = 1; } message B { int32 x = 1; }")
    m("A").fields.head.label shouldBe POptional
  }

  it should "honor proto2 [packed = true] and keep proto2 fields unpacked otherwise" in {
    val m = parseProto("""
      |syntax = "proto2";
      |message M {
      |  repeated int32 a = 1 [packed = true];
      |  repeated int32 b = 2;
      |  map<int32, string> c = 3;
      |  oneof k { int32 x = 4; string y = 5; }
      |}
      |""".stripMargin)("M")
    val f = m.fields.map(x => x.name -> x).toMap
    f("a").packed shouldBe true
    f("b").packed shouldBe false
    f("c").ptype shouldBe PMap(PInt32, PString)
    f("x").oneof shouldBe Some("k")
    // packed bytes for field 1 decode back (and unpacked field 2 too)
    val row = Row(Seq(3, 270), Seq(1, 2), Map(1 -> "a"), null, "y")
    norm(fromBytes(toBytes(row, m), m)) shouldBe norm(row)
  }

  behavior of "distributed proto3 round trip"

  it should "write and scan wire files with maps, oneofs, and implicit fields" in {
    val msg = parseProto(proto3Text)("Event")
    val schema = sparkSchema(msg)
    val rows = (0 until 200).map { i =>
      Row(i.toLong, s"kind$i", if (i % 3 == 0) s"note$i" else null,
        Seq(i, i * 2), Seq(s"t$i"), Map(s"k$i" -> i.toLong, "c" -> 1L),
        if (i % 2 == 0) "LOW" else "HIGH",
        if (i % 2 == 0) s"http://$i" else null,
        if (i % 2 == 1) i.toLong else null)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val dir = graft.SparkSpec.tempDir("proto3").toString + "/out"
    writeDelimited(df, msg, dir)
    val back = readDelimited(spark, dir, msg)
    back.count() shouldBe 200L
    // set ops reject MapType: compare the map as sorted entry structs
    def key(d: org.apache.spark.sql.DataFrame) = d.select(struct(
      col("id"), col("kind"), col("note"), col("codes"), col("tags"),
      array_sort(map_entries(col("counts"))).as("counts_e"),
      col("level"), col("url"), col("user_id")).as("k"))
    key(df).exceptAll(key(back)).count() shouldBe 0L
    key(back).exceptAll(key(df)).count() shouldBe 0L
  }
}
