package graft.ext

import graft.SparkSpec
import graft.GraftFunctions.cosineDistance
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  behavior of "Embeddings.l2Normalize"

  it should "produce unit vectors and preserve direction" in {
    val n = emb.select(col("vec_id"),
        Embeddings.l2Norm(Embeddings.l2Normalize(col("embedding"))).as("nn"),
        cosineDistance(col("embedding"),
          Embeddings.l2Normalize(col("embedding"))).as("cd"))
      .agg(max(abs(col("nn") - 1.0)).as("unit_err"),
        max(abs(col("cd"))).as("dir_err"))
      .head()
    n.getDouble(0) should be < 1e-9
    n.getDouble(1) should be < 1e-9
  }

  it should "return null for zero and null vectors" in {
    val df = Seq((1L, Some(Array(0f, 0f))), (2L, None))
      .toDF("id", "v")
    df.select(Embeddings.l2Normalize(col("v"))).collect()
      .foreach(_.isNullAt(0) shouldBe true)
  }

  behavior of "Embeddings.randomProject"

  it should "approximately preserve pairwise squared distances (JL) and be deterministic" in {
    val dim = emb.head().getAs[scala.collection.Seq[Float]]("embedding").size
    val pts = emb.filter(col("vec_id") < 40)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"),
        Embeddings.randomProject(col("embedding"), dim, 32).as("p"))
      .collect()
      .map(r => (r.getAs[scala.collection.Seq[Double]]("v").toArray,
        r.getAs[scala.collection.Seq[Double]]("p").toArray))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- pts.indices; j <- pts.indices if i < j
      orig = d2(pts(i)._1, pts(j)._1) if orig > 1e-9
    } yield d2(pts(i)._2, pts(j)._2) / orig
    // E[ratio] = 1, per-pair var = 2/outDim: the mean over ~780 pairs
    // concentrates hard, and individual pairs stay within a loose band
    val mean = ratios.sum / ratios.size
    mean shouldBe 1.0 +- 0.15
    ratios.count(r => r > 0.3 && r < 2.5).toDouble / ratios.size should be >= 0.99
    // deterministic: same seed, same projection; different seed differs
    val a = emb.select(Embeddings.randomProject(col("embedding"), dim, 16).as("p"))
      .agg(sum(expr("aggregate(p, 0D, (acc, x) -> acc + x)"))).head().getDouble(0)
    val b = emb.select(Embeddings.randomProject(col("embedding"), dim, 16).as("p"))
      .agg(sum(expr("aggregate(p, 0D, (acc, x) -> acc + x)"))).head().getDouble(0)
    a shouldBe b
    val c = emb.select(Embeddings.randomProject(col("embedding"), dim, 16, seed = 9).as("p"))
      .agg(sum(expr("aggregate(p, 0D, (acc, x) -> acc + x)"))).head().getDouble(0)
    c should not be a
  }

  behavior of "Embeddings.quantizeInt8"

  it should "roundtrip within one quantization step per dimension" in {
    val q = emb.select(col("embedding").as("v"),
      Embeddings.quantizeInt8(col("embedding")).as("qs"))
    // |x - q*scale| <= scale/2 per dimension (round-to-nearest)
    val err = q.select(aggregate(
        zip_with(col("v"), Embeddings.dequantizeInt8(col("qs")),
          (a, b) => abs(a.cast("double") - b)),
        lit(0.0), (m, x) => greatest(m, x)).as("maxerr"),
      col("qs.scale").as("scale"))
    err.filter(col("maxerr") > col("scale") * 0.5 + 1e-12)
      .count() shouldBe 0L
    // codes bounded
    q.select(aggregate(col("qs.q"), lit(0),
        (m, x) => greatest(m, abs(x.cast("int")))).as("mx"))
      .agg(max("mx")).head().getInt(0) should be <= 127
  }

  it should "quantize the zero vector to scale 0 with zero codes" in {
    val r = Seq(Tuple1(Array(0f, 0f, 0f))).toDF("v")
      .select(Embeddings.quantizeInt8(col("v")).as("qs"))
      .select(col("qs.scale"), col("qs.q")).head()
    r.getDouble(0) shouldBe 0.0
    r.getSeq[Byte](1) shouldBe Seq[Byte](0, 0, 0)
  }

  behavior of "Embeddings.quantizedCosine"

  it should "approximate exact cosine within 2e-2 across real pairs" in {
    val q = emb.select(col("vec_id"), col("embedding"),
      Embeddings.quantizeInt8(col("embedding")).getField("q").as("q"))
    val a = q.select(col("vec_id").as("ida"), col("embedding").as("va"),
      col("q").as("qa"))
    val b = q.select(col("vec_id").as("idb"), col("embedding").as("vb"),
      col("q").as("qb"))
    val pairs = a.join(b, col("idb") === col("ida") + 1)
    val maxErr = pairs.select(abs(
        (lit(1.0) - cosineDistance(col("va"), col("vb"))) -
          Embeddings.quantizedCosine(col("qa"), col("qb"))).as("e"))
      .agg(max("e")).head().getDouble(0)
    maxErr should be < 0.02
  }

  it should "be null on length mismatch and zero vectors" in {
    val df = Seq(
      (Seq[Byte](1, 2), Seq[Byte](1, 2, 3)),
      (Seq[Byte](0, 0), Seq[Byte](1, 2))
    ).toDF("a", "b")
    df.select(Embeddings.quantizedCosine(col("a"), col("b"))).collect()
      .foreach(_.isNullAt(0) shouldBe true)
  }

  behavior of "PQ storage codec"

  it should "round-trip with high reconstruction cosine on real embeddings" in {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val books = Embeddings.pqCodebooks(emb, "embedding", m = 16, codebookSize = 32,
      maxIter = 5)
    books.length shouldBe 16
    val coded = emb.withColumn("codes", Embeddings.pqEncode(col("embedding"), books))
      .withColumn("recon", Embeddings.pqDecode(col("codes"), books))
    // codes are m small ints; reconstruction matches the vector dim
    coded.select(array_size(col("codes"))).distinct().as[Int].collect() shouldBe Array(16)
    coded.select(array_size(col("recon"))).distinct().as[Int].collect() shouldBe
      coded.select(array_size(col("embedding"))).distinct().as[Int].collect()
    // storage-fidelity: mean cosine(original, reconstruction) is high
    val meanCos = coded.select(avg(lit(1.0) -
        graft.GraftFunctions.cosineDistance(col("embedding"), col("recon"))))
      .as[Double].head()
    meanCos should be >= 0.75
    // deterministic: same seed -> identical codebooks
    val again = Embeddings.pqCodebooks(emb, "embedding", m = 16, codebookSize = 32,
      maxIter = 5)
    books.map(_.toSeq.map(_.toSeq)).toSeq shouldBe again.map(_.toSeq.map(_.toSeq)).toSeq
  }

  it should "return empty codebooks for an empty corpus" in {
    val empty = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(lit(false))
    Embeddings.pqCodebooks(empty, "embedding").length shouldBe 0
  }
}
