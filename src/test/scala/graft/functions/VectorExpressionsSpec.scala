package graft.functions

import graft.SparkSpec
import graft.GraftFunctions.{cosineDistance, lshSignBits, nearestCells, projectPlanes}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Codegen-path coverage for [[CosineDistance.doGenCode]]: the same cases
  * are run with the factory pinned to CODEGEN_ONLY (a Janino error in the
  * generated loop fails loudly instead of silently falling back to the
  * interpreted path) and to NO_CODEGEN, and the two paths must agree
  * bit-for-bit — including every null-producing edge (empty, length
  * mismatch, null element, zero norm, null input). */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "CosineDistance codegen"

  private def withFactoryMode[A](mode: String)(f: => A): A = {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try f
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  private val doubleCases: Seq[(Option[Seq[Option[Double]]], Option[Seq[Option[Double]]])] = Seq(
    (Some(Seq(Some(1.0), Some(2.0), Some(3.0))), Some(Seq(Some(1.0), Some(2.0), Some(3.0)))),
    (Some(Seq(Some(1.0), Some(0.0))), Some(Seq(Some(0.0), Some(1.0)))),
    (Some(Seq(Some(1.0), Some(-2.0), Some(0.5))), Some(Seq(Some(-3.0), Some(0.25), Some(7.0)))),
    (Some(Seq.empty), Some(Seq.empty)),                       // empty -> null
    (Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0)))),  // length mismatch -> null
    (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))), // null element -> null
    (Some(Seq(Some(0.0), Some(0.0))), Some(Seq(Some(1.0), Some(2.0)))), // zero norm -> null
    (None, Some(Seq(Some(1.0)))),                             // null input -> null
  )

  private def collectBoth(run: => Array[Row]): (Seq[Any], Seq[Any]) = {
    val gen  = withFactoryMode("CODEGEN_ONLY")(run).map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    val interp = withFactoryMode("NO_CODEGEN")(run).map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    (gen, interp)
  }

  it should "agree bit-for-bit with the interpreted path on double arrays" in {
    val df = doubleCases.toDF("l", "r")
    val (gen, interp) = collectBoth(
      df.select(cosineDistance(col("l"), col("r"))).collect())
    gen shouldBe interp
    // spot-check the identical-vector case is exactly 0 distance
    gen.head.asInstanceOf[Double] shouldBe 0.0 +- 1e-12
    // orthogonal vectors -> distance 1
    gen(1).asInstanceOf[Double] shouldBe 1.0 +- 1e-12
    // the five null-producing edges really are null on BOTH paths
    gen.drop(3).foreach(v => assert(v == null))
  }

  it should "agree across mixed element types (float vs int arrays)" in {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(3, 2, 1)),
      (Seq(0.5f, -1.5f), Seq(2, 4)),
    ).toDF("l", "r")
    val (gen, interp) = collectBoth(
      df.select(cosineDistance(col("l"), col("r"))).collect())
    gen shouldBe interp
    gen.foreach(v => assert(v != null))
  }

  it should "survive inside a whole-stage-codegen'd join filter (the SemDedup pair shape)" in {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .limit(200)
    def pairCount(): Long = withFactoryMode("CODEGEN_ONLY") {
      val a = vecs.select(col("vec_id").as("ida"), col("embedding").as("va"))
      val b = vecs.select(col("vec_id").as("idb"), col("embedding").as("vb"))
      a.crossJoin(b)
        .filter(col("ida") < col("idb"))
        .filter(lit(1.0) - cosineDistance(col("va"), col("vb")) >= 0.8)
        .count()
    }
    val interp = withFactoryMode("NO_CODEGEN") {
      val a = vecs.select(col("vec_id").as("ida"), col("embedding").as("va"))
      val b = vecs.select(col("vec_id").as("idb"), col("embedding").as("vb"))
      a.crossJoin(b)
        .filter(col("ida") < col("idb"))
        .filter(lit(1.0) - cosineDistance(col("va"), col("vb")) >= 0.8)
        .count()
    }
    pairCount() shouldBe interp
  }

  behavior of "LshSignBits / NearestCells codegen"

  private lazy val realVecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  it should "produce identical LSH buckets on both paths (incl. null rows)" in {
    val rnd = new scala.util.Random(7)
    val planes = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val degenerate = Seq((-1L, null: Seq[Float]), (-2L, Seq.empty[Float]))
      .toDF("vec_id", "embedding")
    val df = realVecs.unionByName(degenerate)
    def run = df.select(col("vec_id"), lshSignBits(col("embedding"), planes))
      .orderBy("vec_id").collect().toSeq
    withFactoryMode("CODEGEN_ONLY")(run) shouldBe withFactoryMode("NO_CODEGEN")(run)
  }

  it should "project identically on both paths and match the hand matvec" in {
    val rnd = new scala.util.Random(13)
    val planes = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val degenerate = Seq((-1L, null: Seq[Float]), (-2L, Seq.empty[Float]))
      .toDF("vec_id", "embedding")
    val df = realVecs.unionByName(degenerate)
    def run = df.select(col("vec_id"), projectPlanes(col("embedding"), planes))
      .orderBy("vec_id").collect().toSeq
    val gen = withFactoryMode("CODEGEN_ONLY")(run)
    gen shouldBe withFactoryMode("NO_CODEGEN")(run)
    // hand matvec on one real row
    val row = realVecs.orderBy("vec_id").head()
    val v = row.getAs[scala.collection.Seq[Float]]("embedding")
    val expected = planes.map(p => v.zip(p).map { case (x, y) => x * y }.sum)
    val got = gen.find(_.getLong(0) == row.getLong(0)).get
      .getAs[scala.collection.Seq[Double]](1)
    got.zip(expected).foreach { case (a, b) => a shouldBe b +- 1e-6 }
    // null and empty degrade to null
    gen.find(_.getLong(0) == -1L).get.isNullAt(1) shouldBe true
  }

  it should "produce identical cell assignments on both paths (cosine and l2, incl. degenerate rows)" in {
    val rnd = new scala.util.Random(11)
    val cents = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val degenerate = Seq(
      (-1L, null: Seq[Float]),             // null -> null
      (-2L, Seq.empty[Float]),             // empty -> null
      (-3L, Seq.fill(64)(0.0f)),           // zero norm -> null (cosine) / cell (l2)
      (-4L, Seq(1.0f, 2.0f)),              // dim mismatch -> null
      (-5L, Seq.fill(64)(Float.NaN)),      // non-finite -> null
    ).toDF("vec_id", "embedding")
    val df = realVecs.unionByName(degenerate)
    for (metric <- Seq("cosine", "l2")) {
      def run = df.select(col("vec_id"),
          nearestCells(col("embedding"), cents, 3, metric))
        .orderBy("vec_id").collect().toSeq
      withClue(s"metric=$metric: ") {
        withFactoryMode("CODEGEN_ONLY")(run) shouldBe withFactoryMode("NO_CODEGEN")(run)
      }
    }
  }
}
