package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro round-trips, mirroring the reference's AvroIOTest. */
class AvroIOSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("attrs", MapType(StringType, LongType), nullable = true),
    StructField("nested", StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", DoubleType, nullable = true))), nullable = true),
    StructField("blob", BinaryType, nullable = true)))

  private val rows = Seq(
    Row(1L, "x", Seq("t1", "t2"), Map("k" -> 9L), Row(1, 2.5), Array[Byte](1, 2)),
    Row(2L, null, Seq("t3"), null, Row(3, null), null),
    Row(3L, "z", Seq.empty[String], Map.empty[String, Long], null, Array[Byte]()))

  behavior of "AvroIO"

  it should "round-trip rows through a local container file" in {
    val f = graft.SparkSpec.tempDir("avro").resolve("data.avro").toString
    AvroIO.writeLocal(rows, schema, f)
    val (got, st) = AvroIO.readLocal(f)
    st shouldBe schema
    got.map(_.getLong(0)).sorted shouldBe Seq(1L, 2L, 3L)
    val r1 = got.find(_.getLong(0) == 1).get // schemaless Rows: index access
    r1.getMap[String, Long](3) shouldBe Map("k" -> 9L)
    r1.getStruct(4) shouldBe Row(1, 2.5)
    r1.get(5).asInstanceOf[Array[Byte]].toSeq shouldBe Seq[Byte](1, 2)
    got.find(_.getLong(0) == 2).get.isNullAt(1) shouldBe true
  }

  it should "round-trip a DataFrame through the distributed sink and scan" in {
    val dir = graft.SparkSpec.tempDir("avrodist").toString + "/out"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    back.count() shouldBe 3
    back.select("id", "name").orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "x"), (2L, null), (3L, "z"))
    back.select(explode(col("tags"))).count() shouldBe 3
    // schema sniff works on written shards
    AvroConverters.toStructType(AvroIO.sniffSchema(dir)) shouldBe schema
  }

  it should "honor the output-exists short circuit" in {
    val dir = graft.SparkSpec.tempDir("guard").toString + "/out"
    val df = Seq((1L, "a")).toDF("id", "v")
    var runs = 0
    GraftIO.unlessDone(dir) { runs += 1; df.write.parquet(dir) } shouldBe true
    GraftIO.unlessDone(dir) { runs += 1; df.write.mode("overwrite").parquet(dir) } shouldBe false
    runs shouldBe 1
  }

  it should "round-trip JSON lines" in {
    val dir = graft.SparkSpec.tempDir("json").toString + "/out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    GraftIO.writeJsonLines(df, dir)
    GraftIO.readJsonLines(spark, dir).count() shouldBe 2
    // JSON sources force nullable fields: compare names and types only
    GraftIO.readJsonLines(spark, dir, Some(df.schema)).schema
      .fields.map(f => (f.name, f.dataType)) shouldBe
      df.schema.fields.map(f => (f.name, f.dataType))
  }

  it should "read external timestamp shapes leniently while keeping micro fidelity" in {
    // the reader deliberately pins NO custom timestamp format: Spark's
    // default parser is lenient (space separator, 1-9 fraction digits)
    // AND micro-capable — an externally-produced feed with odd shapes
    // must keep parsing, and this engine's own 6-digit output must
    // round-trip micros exactly. A custom pattern would break one or
    // the other; this spec locks both.
    val dir = graft.SparkSpec.tempDir("json_ts").toString + "/in"
    val lines = Seq(
      """{"id":1,"ts":"2024-03-05T06:07:08.123456"}""", // own output shape
      """{"id":2,"ts":"2024-03-05 06:07:08"}""",        // space separator
      """{"id":3,"ts":"2024-03-05T06:07:08.1"}""",      // 1 fraction digit
      """{"id":4,"ts":"2024-03-05T06:07:08.123"}""")    // legacy 3-digit
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampNTZType)))
    val got = GraftIO.readJsonLines(spark, dir, Some(schema))
      .orderBy("id").select("ts").collect().map(_.get(0))
    all(got.map(_ != null)) shouldBe true
    got(0).toString should include("06:07:08.123456")
    got(1).toString should include("06:07:08")
    got(2).toString should include("06:07:08.1")
  }

  /** parquet-mr fixture: a single-file parquet with an INT64 `ts` column
    * carrying the given timestamp logical-type unit — Spark itself cannot
    * write NANOS/MILLIS, so the fixture goes through the example writer. */
  private def writeTsFixture(
      unit: org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit,
      values: Seq[Long]): String = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val dir = graft.SparkSpec.tempDir("ts_fixture").toString
    val file = s"$dir/part-00000.parquet"
    val schema: MessageType = Types.buildMessage()
      .addField(Types.primitive(PrimitiveTypeName.INT64,
          org.apache.parquet.schema.Type.Repetition.REQUIRED)
        .as(LogicalTypeAnnotation.timestampType(false, unit)).named("ts"))
      .addField(Types.primitive(PrimitiveTypeName.INT64,
          org.apache.parquet.schema.Type.Repetition.REQUIRED).named("user_id"))
      .named("event")
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file))
      .withType(schema)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try values.zipWithIndex.foreach { case (v, i) =>
      val g = factory.newGroup()
      g.add("ts", v); g.add("user_id", i.toLong)
      writer.write(g)
    } finally writer.close()
    file
  }

  it should "read NANOS parquet as long without touching the session conf" in {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val nanos = Seq(1706657176220708000L, 1500000000123456789L)
    val events = writeTsFixture(TimeUnit.NANOS, nanos)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val df = GraftIO.readParquetNanosAsLong(spark, events)
    df.schema("ts").dataType shouldBe org.apache.spark.sql.types.LongType
    df.select("ts").as[Long].collect().sorted shouldBe nanos.sorted.toArray
    // the legacy conf must still be off: a default read still rejects NANOS
    spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .getOrElse("false") shouldBe "false"
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      spark.read.parquet(events).schema
  }

  it should "normalize every parquet timestamp unit to epoch micros" in {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val baseUs = 1706657176220708L
    // NANOS truncates sub-micro digits; MILLIS scales up; MICROS is raw
    val cases = Seq(
      (TimeUnit.NANOS, Seq(baseUs * 1000L + 999L, 123456789L), Seq(baseUs, 123456L)),
      (TimeUnit.MICROS, Seq(baseUs, 42L), Seq(baseUs, 42L)),
      (TimeUnit.MILLIS, Seq(baseUs / 1000L, 7L), Seq(baseUs / 1000L * 1000L, 7000L)))
    for ((unit, in, want) <- cases) {
      val file = writeTsFixture(unit, in)
      val df = GraftIO.readParquetTsAsMicros(spark, file)
      df.schema("ts").dataType shouldBe org.apache.spark.sql.types.LongType
      df.select("ts").as[Long].collect().sorted shouldBe want.sorted.toArray
    }
    // session conf untouched throughout
    spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .getOrElse("false") shouldBe "false"
  }

  it should "read the real (MICROS) events table as micros longs" in {
    val events = "/root/testdata/sf0.001/events.parquet"
    val df = GraftIO.readParquetTsAsMicros(spark, events)
    df.schema("ts").dataType shouldBe org.apache.spark.sql.types.LongType
    // cross-check against Spark's own timestamp decode of the same file
    val viaTs = spark.read.parquet(events)
      .select(org.apache.spark.sql.functions
        .expr("max(unix_micros(cast(ts as timestamp)))")).first().getLong(0)
    df.agg(org.apache.spark.sql.functions.max("ts")).first().getLong(0) shouldBe viaTs
  }

  it should "refuse INT96 timestamps with a clear message instead of mis-scaling" in {
    // Spark's legacy INT96 parquet timestamps carry NO unit annotation —
    // scaling one silently would corrupt every downstream epoch-math
    // gate, so the reader must fail loudly (the ScaleUp lesson: a tool
    // writing with the INT96 default broke 8 gates until pinned to
    // TIMESTAMP_MICROS)
    val dir = graft.SparkSpec.tempDir("int96_fix").toString + "/out"
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try Seq(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      .toDF("ts").write.parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val e = intercept[IllegalArgumentException] {
      GraftIO.readParquetTsAsMicros(spark, dir)
    }
    e.getMessage should include("INT96")
  }

  it should "round-trip decimals via the Avro decimal logical type" in {
    val dir = graft.SparkSpec.tempDir("avro_dec").toString + "/out"
    val df = Seq("12345.67", "-0.01", "0.00")
      .toDF("s").select(col("s").cast("decimal(10,2)").as("d"))
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    back.schema("d").dataType shouldBe org.apache.spark.sql.types.DecimalType(10, 2)
    back.select(col("d").cast("string")).as[String].collect().sorted shouldBe
      Array("-0.01", "0.00", "12345.67")
  }
}
