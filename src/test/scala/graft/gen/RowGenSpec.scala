package graft.gen

import graft.SparkSpec
import graft.diffy.BigDiffy
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generator round-trip/validity, mirroring the reference's
  * AvroGeneratorTest.scala:42-169 + distributed generation
  * (DataGenAvro.scala:36-63) — and using generated fixtures to drive the
  * diff, like the reference's own test strategy (SURVEY §5). */
class RowGenSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("attrs", MapType(StringType, DoubleType), nullable = true),
    StructField("nested", StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", DecimalType(10, 2), nullable = true))), nullable = false),
    StructField("blob", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  behavior of "RowGen"

  /** Value-based rendering (Array[Byte].toString is identity-based). */
  private def render(row: org.apache.spark.sql.Row): String =
    row.toSeq.map {
      case b: Array[Byte] => b.toSeq.toString
      case x => String.valueOf(x)
    }.mkString("|")

  it should "generate schema-conformant rows, reproducibly by seed" in {
    val g = RowGen.of(schema)
    val a = g.sample(7L); val b = g.sample(7L); val c = g.sample(8L)
    render(a) shouldBe render(b)
    render(a) should not be render(c)
    a.length shouldBe schema.length
    // conformance: Spark accepts the rows under the schema
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(a, c)), schema)
    df.count() shouldBe 2
    df.schema shouldBe schema
  }

  it should "amend fields and keep others intact" in {
    val g = RowGen.amend(RowGen.of(schema), schema)("id", Gen.const(99L))
    val rows = (1 to 20).map(i => g.sample(i.toLong))
    all(rows.map(_.getLong(0))) shouldBe 99L
    rows.map(_.toString).distinct.size should be > 1
  }

  it should "generate correlated pairs via amend2 (shared key)" in {
    val pair = RowGen.amend2(RowGen.of(schema), schema, RowGen.of(schema), schema)(
      ("id", "id", Gen.choose(0, 1000)))
    val (l, r) = pair.sample(3L)
    l.getLong(0) shouldBe r.getLong(0)
    l.toString should not be r.toString
  }

  it should "generate distributed DataFrames deterministically with distinct streams per shard" in {
    val df1 = RowGen.distributed(spark, RowGen.of(schema), schema, 1000, shards = 8)
    val df2 = RowGen.distributed(spark, RowGen.of(schema), schema, 1000, shards = 8)
    df1.count() shouldBe 1000
    // ANSI-safe checksum (full-range longs overflow sum())
    val chk1 = df1.select(sum(expr("id % 1000000"))).head().getLong(0)
    val chk2 = df2.select(sum(expr("id % 1000000"))).head().getLong(0)
    chk1 shouldBe chk2
    // regression: shard seeds must not alias SplittableRandom's gamma —
    // aliased shards emit the same stream shifted by one draw
    df1.select(countDistinct(col("id"))).head().getLong(0) shouldBe 1000L
  }

  it should "drive the differ with generated correlated fixtures" in {
    val base = RowGen.of(schema, noneFraction = 0.3)
    // full-range random ids: collision-free w.h.p. and unique across shards
    // (mutable driver counters do NOT survive closure shipping)
    val keyed = RowGen.amend(base, schema)("id", Gen.long.map(identity[Any]))
    val df = RowGen.distributed(spark, keyed, schema, 500, shards = 4)
    // identical sides -> all SAME, via the full diff pipeline
    val g = BigDiffy.diff(df, df, Seq("id")).globalStats.head()
    (g.getLong(0), g.getLong(1)) shouldBe ((500L, 500L))
  }
}

/** withGen harness behavior (reference GenTestUtils). */
class GenTestSpec extends graft.SparkSpec {
  it should "replay failing cases with the reported seed" in {
    val gen = Gen.chooseInt(0, 1000)
    val err = intercept[AssertionError] {
      GenTest.withGen(gen, n = 200, seed = 7L) { v => assert(v < 990) }
    }
    err.getMessage should include("replay with seed=")
    // the reported seed reproduces the same failing value
    val seed = err.getMessage.split("seed=")(1).split(')')(0).toLong
    val replayed = gen.sample(seed)
    err.getMessage should include(replayed.toString)
    replayed should be >= 990
  }

  it should "pass clean properties over all cases" in {
    noException should be thrownBy
      GenTest.withGen(Gen.alphaNumString(10), n = 500) { s =>
        assert(s.length <= 10)
      }
  }
}
