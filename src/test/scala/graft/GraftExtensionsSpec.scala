package graft

import com.google.common.hash.Hashing
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** SQL registration of the custom expression family via the late-
  * registration path (the shared test session already exists, so the
  * session-construction extension route can't apply here — registerAll
  * exercises the same builder list). */
class GraftExtensionsSpec extends AnyFlatSpec with Matchers {

  private lazy val spark: SparkSession = {
    val s = SparkSpec.session
    GraftExtensions.registerAll(s)
    s
  }

  behavior of "GraftExtensions SQL functions"

  it should "evaluate farm_hash64 identically to guava" in {
    val got = spark.sql("SELECT farm_hash64('hello world')").head().getLong(0)
    got shouldBe Hashing.farmHashFingerprint64()
      .newHasher().putString("hello world", UTF_8).hash().asLong()
  }

  it should "preserve double ordering through double_order_bits" in {
    val r = spark.sql(
      """SELECT double_order_bits(CAST(-1.5 AS DOUBLE)) AS a,
        |       double_order_bits(CAST(0.0 AS DOUBLE)) AS b,
        |       double_order_bits(CAST(2.25 AS DOUBLE)) AS c""".stripMargin).head()
    (r.getLong(0) < r.getLong(1)) shouldBe true
    (r.getLong(1) < r.getLong(2)) shouldBe true
  }

  it should "compose shingle_hashes -> minhash -> jaccard_sorted in SQL" in {
    val r = spark.sql(
      """SELECT jaccard_sorted(shingle_hashes('the quick brown fox', 5),
        |                      shingle_hashes('the quick brown cat', 5)) AS j,
        |       size(minhash(shingle_hashes('the quick brown fox', 5), 32)) AS m,
        |       simhash('the quick brown fox') AS s,
        |       cosine_distance(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c
        |""".stripMargin).head()
    r.getDouble(0) should (be > 0.3 and be < 1.0)
    r.getInt(1) shouldBe 32
    r.isNullAt(2) shouldBe false
    r.getDouble(3) shouldBe 1.0 +- 1e-12
  }

  it should "segment mixed-script text through script_tokens in SQL" in {
    val r = spark.sql(
      "SELECT script_tokens('Hello 你好 world') AS t").head()
    r.getSeq[String](0) shouldBe Seq("Hello", "你", "好", "world")
  }

  it should "reject non-literal parameters with a clear error" in {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash(shingle_hashes('x', 5), id) FROM range(1)").collect()
    }
    e.getMessage should include("numHashes must be an integer literal")
  }
}
