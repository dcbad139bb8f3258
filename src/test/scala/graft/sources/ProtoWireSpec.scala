package graft.sources

import graft.SparkSpec
import graft.gen.{Gen, RowGen}
import java.util.SplittableRandom
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import ProtoWire._

/** Pure-Scala protobuf wire format: spec goldens from the public
  * encoding documentation, round-trip invariants replaying
  * ProtoBufGeneratorTest.scala:28-70 (generate → wire bytes → parse →
  * equality), proto2 merge/last-wins/unknown-field semantics, and the
  * distributed delimited-file scan. */
class ProtoWireSpec extends SparkSpec {

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xFF}%02x").mkString(" ")

  /** Row equality that sees through Array[Byte] nested inside Seqs
    * (Spark's Row.equals only special-cases top-level byte arrays). */
  private def norm(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case r: Row => Row.fromSeq(r.toSeq.map(norm))
    case s: scala.collection.Seq[_] => s.map(norm)
    case other => other
  }

  behavior of "wire primitives"

  it should "reproduce the spec's canonical example bytes" in {
    // the protobuf docs' Test1: field 1 (int32) = 150 → 08 96 01
    val m = PMessage("Test1", Seq(PField(1, "a", POptional, PInt32)))
    hex(toBytes(Row(150), m)) shouldBe "08 96 01"
    // Test2: field 2 (string) = "testing" → 12 07 74 65 73 74 69 6e 67
    val m2 = PMessage("Test2", Seq(PField(2, "b", POptional, PString)))
    hex(toBytes(Row("testing"), m2)) shouldBe "12 07 74 65 73 74 69 6e 67"
  }

  it should "sign-extend negative int32 to ten varint bytes" in {
    val m = PMessage("M", Seq(PField(1, "a", PRequired, PInt32)))
    hex(toBytes(Row(-1), m)) shouldBe
      "08 ff ff ff ff ff ff ff ff ff 01"
    fromBytes(toBytes(Row(-1), m), m) shouldBe Row(-1)
  }

  it should "zigzag sint32/sint64 per the spec table" in {
    zigzag32(0) shouldBe 0
    zigzag32(-1) shouldBe 1
    zigzag32(1) shouldBe 2
    zigzag32(-2) shouldBe 3
    zigzag32(2147483647) shouldBe -2 // unsigned 4294967294 in int bits
    zigzag32(Int.MinValue) shouldBe -1 // unsigned 4294967295
    unzigzag32(zigzag32(Int.MinValue)) shouldBe Int.MinValue
    zigzag64(-1L) shouldBe 1L
    unzigzag64(zigzag64(Long.MinValue)) shouldBe Long.MinValue
    val m = PMessage("M", Seq(PField(1, "a", PRequired, PSInt32)))
    hex(toBytes(Row(-1), m)) shouldBe "08 01" // 1 byte, not 10
  }

  behavior of "message round trip"

  it should "round-trip every generated TestRecord through real wire bytes" in {
    // the ProtoBufGeneratorTest round-trip invariant: parseFrom(toByteArray)
    // is identity — 200 schema-driven random records
    val schema = sparkSchema(Schemas.TestRecord)
    val gen = RowGen.of(schema, noneFraction = 0.3)
    val rnd = new SplittableRandom(4242L)
    (0 until 200).foreach { _ =>
      val row = gen(rnd)
      val bytes = toBytes(row, Schemas.TestRecord)
      val back = fromBytes(bytes, Schemas.TestRecord)
      norm(back) shouldBe norm(row)
      // and the bytes themselves are stable through a second trip
      hex(toBytes(back, Schemas.TestRecord)) shouldBe hex(bytes)
    }
  }

  it should "round-trip deeply repeated messages" in {
    val rec = Row(Seq(Row(Seq(1, 2, 3), "a"), Row(Seq.empty[Int], "b")))
    val back = fromBytes(toBytes(rec, Schemas.DeeplyRepeatedRecord),
      Schemas.DeeplyRepeatedRecord)
    norm(back) shouldBe norm(rec)
  }

  behavior of "proto2 decode semantics"

  it should "treat a missing optional field as absent (null), not default" in {
    val m = PMessage("M", Seq(
      PField(1, "a", POptional, PInt32),
      PField(2, "b", POptional, PString)))
    val back = fromBytes(toBytes(Row(7, null), m), m)
    back.getInt(0) shouldBe 7
    back.isNullAt(1) shouldBe true // presence, the messagePresence differ's input
  }

  it should "take the LAST occurrence of a duplicated scalar" in {
    val m = PMessage("M", Seq(PField(1, "a", POptional, PInt32)))
    val twice = toBytes(Row(1), m) ++ toBytes(Row(2), m)
    fromBytes(twice, m) shouldBe Row(2)
  }

  it should "MERGE duplicated message fields" in {
    val inner = PMessage("I", Seq(
      PField(1, "x", POptional, PInt32),
      PField(2, "y", POptional, PString),
      PField(3, "r", PRepeated, PInt32)))
    val m = PMessage("M", Seq(PField(1, "msg", POptional, PMsg(inner))))
    val first = toBytes(Row(Row(1, null, Seq(10))), m)
    val second = toBytes(Row(Row(null, "hi", Seq(20))), m)
    // concatenated serializations == merged message (public spec):
    // scalars last-wins across chunks, repeated concatenates
    norm(fromBytes(first ++ second, m)) shouldBe norm(Row(Row(1, "hi", Seq(10, 20))))
  }

  it should "skip unknown fields of every wire type" in {
    val full = PMessage("F", Seq(
      PField(1, "a", PRequired, PInt32),
      PField(2, "d", POptional, PDouble),
      PField(3, "s", POptional, PString),
      PField(4, "f32", POptional, PFixed32),
      PField(5, "keep", POptional, PString)))
    val subset = PMessage("F", Seq(
      PField(1, "a", PRequired, PInt32),
      PField(5, "keep", POptional, PString)))
    val bytes = toBytes(Row(9, 2.5, "drop", 77, "kept"), full)
    fromBytes(bytes, subset) shouldBe Row(9, "kept")
  }

  it should "decode PACKED repeated primitives (proto3 writers)" in {
    val m = PMessage("M", Seq(PField(4, "r", PRepeated, PInt32)))
    // spec example: packed [3, 270, 86942] → 22 06 03 8e 02 9e a7 05
    val packed = Array(0x22, 0x06, 0x03, 0x8e, 0x02, 0x9e, 0xa7, 0x05)
      .map(_.toByte)
    norm(fromBytes(packed, m)) shouldBe norm(Row(Seq(3, 270, 86942)))
    // while our own encoder emits the unpacked proto2 form
    hex(toBytes(Row(Seq(3, 270, 86942)), m)) shouldBe
      "20 03 20 8e 02 20 9e a7 05"
  }

  it should "fail loudly on a missing required field" in {
    val m = PMessage("M", Seq(
      PField(1, "a", POptional, PInt32),
      PField(2, "req", PRequired, PString)))
    val onlyA = toBytes(Row(5, "x"), PMessage("M",
      Seq(PField(1, "a", POptional, PInt32),
        PField(3, "other", POptional, PString))))
    val ex = intercept[IllegalArgumentException](fromBytes(onlyA, m))
    ex.getMessage should include("required field missing")
  }

  it should "fail loudly on truncated input" in {
    val m = PMessage("M", Seq(PField(1, "s", POptional, PString)))
    val good = toBytes(Row("hello world"), m)
    intercept[IllegalArgumentException](
      fromBytes(good.take(good.length - 3), m))
  }

  behavior of "enums"

  it should "carry symbols in rows and numbers on the wire" in {
    val e = PEnum("Color", Map("RED" -> 0, "GREEN" -> 5, "BLUE" -> 9))
    val m = PMessage("M", Seq(
      PField(1, "c", POptional, e),
      PField(2, "cs", PRepeated, e)))
    val bytes = toBytes(Row("GREEN", Seq("RED", "BLUE")), m)
    hex(bytes) shouldBe "08 05 10 00 10 09" // numbers, not strings
    norm(fromBytes(bytes, m)) shouldBe norm(Row("GREEN", Seq("RED", "BLUE")))
    intercept[IllegalArgumentException](toBytes(Row("MAUVE", Seq()), m))
  }

  it should "decode unknown enum numbers to null/absent" in {
    val small = PEnum("C", Map("A" -> 0))
    val m = PMessage("M", Seq(
      PField(1, "c", POptional, small),
      PField(2, "cs", PRepeated, small)))
    // field 1 = 7 (unknown), field 2 = [0, 7]
    val wire = Array(0x08, 0x07, 0x10, 0x00, 0x10, 0x07).map(_.toByte)
    val back = fromBytes(wire, m)
    back.isNullAt(0) shouldBe true
    norm(back.getSeq[String](1)) shouldBe Seq("A")
  }

  behavior of "proto text parser"

  // the reference test schema's shapes, as proto2 source — parsing it
  // must reproduce the hand-built descriptors EXACTLY
  private val schemaText = """
    |syntax = "proto2";
    |option java_package = "example.protos";
    |
    |message TestRecord {
    |    required OptionalNestedRecord optional_fields = 1;
    |    required RequiredNestedRecord required_fields = 2;
    |    required RepeatedNestedRecord repeated_fields = 3;
    |    optional OptionalNestedRecord optional_nested_field = 4;
    |    repeated OptionalNestedRecord repeated_nested_field = 5; // comment
    |}
    |
    |message OptionalNestedRecord {
    |    optional double double_field = 1;
    |    optional float float_field = 2;
    |    optional int32 int32_field = 3;
    |    optional int64 int64_field = 4;
    |    optional uint32 uint32_field = 5;
    |    optional uint64 uint64_field = 6;
    |    optional sint32 sint32_field = 7;
    |    optional sint64 sint64_field = 8;
    |    optional fixed32 fixed32_field = 9;
    |    optional fixed64 fixed64_field = 10;
    |    optional sfixed32 sfixed32_field = 11;
    |    optional sfixed64 sfixed64_field = 12;
    |    optional bool bool_field = 13;
    |    optional string string_field = 14;
    |    optional bytes bytes_field = 15;
    |    optional string upper_string_field = 16;
    |}
    |
    |message RequiredNestedRecord {
    |    required double double_field = 1;
    |    required float float_field = 2;
    |    required int32 int32_field = 3;
    |    required int64 int64_field = 4;
    |    required uint32 uint32_field = 5;
    |    required uint64 uint64_field = 6;
    |    required sint32 sint32_field = 7;
    |    required sint64 sint64_field = 8;
    |    required fixed32 fixed32_field = 9;
    |    required fixed64 fixed64_field = 10;
    |    required sfixed32 sfixed32_field = 11;
    |    required sfixed64 sfixed64_field = 12;
    |    required bool bool_field = 13;
    |    required string string_field = 14;
    |    required bytes bytes_field = 15;
    |}
    |
    |message RepeatedNestedRecord {
    |    repeated double double_field = 1;
    |    repeated float float_field = 2;
    |    repeated int32 int32_field = 3;
    |    repeated int64 int64_field = 4;
    |    repeated uint32 uint32_field = 5;
    |    repeated uint64 uint64_field = 6;
    |    repeated sint32 sint32_field = 7;
    |    repeated sint64 sint64_field = 8;
    |    repeated fixed32 fixed32_field = 9;
    |    repeated fixed64 fixed64_field = 10;
    |    repeated sfixed32 sfixed32_field = 11;
    |    repeated sfixed64 sfixed64_field = 12;
    |    repeated bool bool_field = 13;
    |    repeated string string_field = 14;
    |    repeated bytes bytes_field = 15;
    |}
    |""".stripMargin

  it should "reproduce the hand-built reference descriptors from source text" in {
    val parsed = parseProto(schemaText)
    parsed("TestRecord") shouldBe Schemas.TestRecord
    parsed("OptionalNestedRecord") shouldBe Schemas.OptionalNestedRecord
    parsed("RequiredNestedRecord") shouldBe Schemas.RequiredNestedRecord
    parsed("RepeatedNestedRecord") shouldBe Schemas.RepeatedNestedRecord
  }

  it should "handle nested messages, enums, options and block comments" in {
    val parsed = parseProto("""
      |/* block
      |   comment */
      |message Outer {
      |  enum Mode { OFF = 0; ON = 1; }
      |  message Inner { required int32 x = 1 [deprecated = true]; }
      |  optional Mode mode = 1;
      |  repeated Inner inners = 2;
      |  option deprecated = true;
      |}
      |""".stripMargin)
    val outer = parsed("Outer")
    outer.fields.map(_.name) shouldBe Seq("mode", "inners")
    outer.fields.head.ptype shouldBe
      PEnum("Outer.Mode", Map("OFF" -> 0, "ON" -> 1))
    val inner = outer.fields(1).ptype.asInstanceOf[PMsg].msg
    inner.fields.head.name shouldBe "x"
    // round-trip through the parsed descriptor
    val row = Row("ON", Seq(Row(7), Row(-1)))
    norm(fromBytes(toBytes(row, outer), outer)) shouldBe norm(row)
  }

  it should "fail loudly outside the supported subset" in {
    intercept[IllegalArgumentException](
      parseProto("message M { group G = 1 { optional int32 a = 2; } }"))
      .getMessage should include("subset")
    intercept[IllegalArgumentException](
      parseProto("message M { extend N { optional int32 a = 100; } }"))
      .getMessage should include("subset")
    intercept[IllegalArgumentException](
      parseProto("message M { int32 a = 1; }")) // proto3 implicit label
      .getMessage should include("proto2")
    intercept[IllegalArgumentException](
      parseProto("message M { required Missing x = 1; }"))
      .getMessage should include("unknown type")
  }

  behavior of "recursive messages (bounded unroll)"

  private val treeText = """
    |syntax = "proto3";
    |message Tree {
    |  int32 v = 1;
    |  repeated Tree kids = 2;
    |}
    |""".stripMargin

  it should "accept a self-recursive schema and round-trip data at the bound" in {
    val tree = parseProto(treeText, maxRecursionDepth = 3)("Tree")
    // three nested Tree levels exist; the third cuts the recursive field
    val l3 = tree.fields(1).ptype.asInstanceOf[PMsg].msg
      .fields(1).ptype.asInstanceOf[PMsg].msg
    l3.fields.map(_.name) shouldBe Seq("v")
    l3.truncated shouldBe Map(2 -> "Tree")
    // depth-3 data round-trips through real wire bytes
    // leaf rows at the cut level carry only `v` — their schema has no
    // kids column at all
    val row = Row(1, Seq(Row(2, Seq(Row(3), Row(4))), Row(5, Seq.empty)))
    norm(fromBytes(toBytes(row, tree), tree)) shouldBe norm(row)
    // the default bound accepts the source too
    parseProto(treeText)("Tree").fields.map(_.name) shouldBe Seq("v", "kids")
  }

  it should "fail loudly on wire data deeper than the unroll bound" in {
    val deep = parseProto(treeText, maxRecursionDepth = 4)("Tree")
    val shallow = parseProto(treeText, maxRecursionDepth = 3)("Tree")
    // a depth-4 document encoded under the deeper descriptor...
    val d4 = Row(1, Seq(Row(2, Seq(Row(3, Seq(Row(4)))))))
    val bytes = toBytes(d4, deep)
    norm(fromBytes(bytes, deep)) shouldBe norm(d4)
    // ...must NOT silently lose its deepest level under the shallow one
    intercept[IllegalArgumentException](fromBytes(bytes, shallow))
      .getMessage should include("unroll depth")
    // depth-3 data decodes fine under the shallow descriptor
    val d3 = Row(1, Seq(Row(2, Seq(Row(3))))) // level 3 is the cut level
    norm(fromBytes(toBytes(d3, shallow), shallow)) shouldBe norm(d3)
  }

  it should "unroll mutual recursion and cap it per ancestor chain" in {
    val parsed = parseProto("""
      |message A { required int32 x = 1; optional B b = 2; }
      |message B { required int32 y = 1; optional A a = 2; }
      |""".stripMargin, maxRecursionDepth = 2)
    val a = parsed("A")
    // A → B → A → B, then the second B's back-reference to A is cut
    // (two A and two B occurrences on the chain)
    val a2 = a.fields(1).ptype.asInstanceOf[PMsg].msg
      .fields(1).ptype.asInstanceOf[PMsg].msg
    val b2 = a2.fields(1).ptype.asInstanceOf[PMsg].msg
    b2.fields.map(_.name) shouldBe Seq("y")
    b2.truncated shouldBe Map(2 -> "A")
    val row = Row(1, Row(2, Row(3, Row(4)))) // the cut B has only `y`
    norm(fromBytes(toBytes(row, a), a)) shouldBe norm(row)
  }

  it should "fail loudly instead of exploding on wide recursive schemas" in {
    // k recursive fields unroll to ~k^depth descriptor nodes; the node
    // cap keeps this a fast loud error, not a driver OOM
    val wide = "message N { " +
      (1 to 6).map(i => s"optional N f$i = $i;").mkString(" ") +
      " required int32 v = 7; }"
    intercept[IllegalArgumentException](parseProto(wide))
      .getMessage should include("descriptor nodes")
    // the same schema parses fine at a depth its branching can afford
    parseProto(wide, maxRecursionDepth = 3)("N")
      .fields.length shouldBe 7
  }

  it should "keep non-recursive sharing canonical (cache correctness)" in {
    // a diamond: both references to Leaf (directly and through Mid) must
    // resolve to the identical full descriptor regardless of build order
    val parsed = parseProto("""
      |message Root { required Mid m = 1; required Leaf l = 2; }
      |message Mid { required Leaf l = 1; }
      |message Leaf { required int32 x = 1; }
      |""".stripMargin, maxRecursionDepth = 2)
    val root = parsed("Root")
    val viaMid = root.fields(0).ptype.asInstanceOf[PMsg].msg
      .fields(0).ptype.asInstanceOf[PMsg].msg
    val direct = root.fields(1).ptype.asInstanceOf[PMsg].msg
    viaMid shouldBe direct
    viaMid.truncated shouldBe empty
  }

  behavior of "delimited Spark IO"

  it should "round-trip a distributed dataframe through wire files" in {
    val schema = sparkSchema(Schemas.RepeatedRecord)
    val gen = RowGen.of(schema, noneFraction = 0.0)
    val df = RowGen.distributed(spark, gen, schema, rows = 500, shards = 7,
      seed = 99L)
    val dir = graft.SparkSpec.tempDir("protowire").toString + "/out"
    writeDelimited(df, Schemas.RepeatedRecord, dir)
    // one file per input partition, named by the Hadoop committer
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".pb"))
    files.length shouldBe 7
    val back = readDelimited(spark, dir, Schemas.RepeatedRecord)
    back.count() shouldBe 500L
    // value-exact multiset equality both ways
    val key = struct(col("string_field"), col("nested_repeated_field"))
    df.select(key).exceptAll(back.select(key)).count() shouldBe 0L
    back.select(key).exceptAll(df.select(key)).count() shouldBe 0L
  }

  it should "replace the output directory on rewrite like AvroIO.write" in {
    val schema = sparkSchema(Schemas.RepeatedRecord)
    val gen = RowGen.of(schema, noneFraction = 0.0)
    val dir = graft.SparkSpec.tempDir("protowire").toString + "/out"
    writeDelimited(RowGen.distributed(spark, gen, schema, 50, 2, 1L),
      Schemas.RepeatedRecord, dir)
    writeDelimited(RowGen.distributed(spark, gen, schema, 30, 2, 2L),
      Schemas.RepeatedRecord, dir)
    readDelimited(spark, dir, Schemas.RepeatedRecord).count() shouldBe 30L
  }
}
