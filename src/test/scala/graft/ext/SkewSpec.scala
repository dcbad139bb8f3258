package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted-join equivalence: same result multiset as the plain join, with
  * the hot key spread across salt buckets in the shuffle. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on one hot key — the classic skew shape
  private lazy val fact =
    spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      .cache()
  private lazy val dim =
    (1L to 1000L).map(k => (k, s"name_$k")).toDF("k", "name").cache()

  behavior of "Skew.saltedJoin"

  it should "produce exactly the plain inner join's rows" in {
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salt = 8)
      .select("k", "payload", "name")
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }

  it should "preserve unmatched large-side rows in a left join" in {
    val factWithOrphans = fact.union(Seq((99999L, -1L)).toDF("k", "payload"))
    val salted = Skew.saltedJoin(factWithOrphans, dim, Seq("k"),
      salt = 8, joinType = "left")
    salted.filter(col("k") === 99999L).count() shouldBe 1L
    salted.filter(col("k") === 99999L).select("name").head().isNullAt(0) shouldBe true
    salted.count() shouldBe factWithOrphans.count()
  }

  it should "spread the hot key across all salt buckets, even for exact-duplicate rows" in {
    val salts = fact.filter(col("k") === 1L)
      .withColumn("__salt", Skew.saltExpr(fact, Seq("k"), 8))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    salts shouldBe 8L
    // the pre-dedup shape: the hot key's rows are FULL duplicates — a
    // whole-row hash would collapse them onto one salt
    val dupFact = spark.range(1000).select(lit(1L).as("k"), lit(42L).as("payload"))
    val dupSalts = dupFact
      .withColumn("__salt", Skew.saltExpr(dupFact, Seq("k"), 8))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    dupSalts shouldBe 8L
    // correctness under duplicates: every duplicate row joins
    Skew.saltedJoin(dupFact, dim, Seq("k"), salt = 8).count() shouldBe 1000L
  }

  it should "tolerate map-typed payload columns on the large side" in {
    val withMap = fact.withColumn("attrs", map(lit("a"), col("payload")))
    Skew.saltedJoin(withMap, dim, Seq("k"), salt = 4).count() shouldBe
      fact.join(dim, Seq("k")).count()
  }

  it should "reject unsupported join types" in {
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(fact, dim, Seq("k"), joinType = "full_outer")
  }

  behavior of "Skew.keySkewReport"

  it should "surface the hot key with its share" in {
    val top = Skew.keySkewReport(fact, Seq("k"), topN = 1).head()
    top.getLong(0) shouldBe 1L
    top.getDouble(2) should be > 0.85
  }
}
