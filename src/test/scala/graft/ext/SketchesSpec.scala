package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val K = 256

  private def flip(h: Long): Long = h ^ Long.MinValue

  // driver-side reference: the k smallest flipped hashes of the distinct set
  private def reference(hashes: Seq[Long], k: Int): Array[Long] =
    hashes.map(flip).distinct.sorted.take(k).toArray

  behavior of "kmvInsert"

  it should "keep a sorted, distinct, k-capped array" in {
    val rnd = new scala.util.Random(7)
    var buf = Array.emptyLongArray
    val vals = Seq.fill(2000)(rnd.nextLong() % 500) // force duplicates
    vals.foreach(v => buf = Sketches.kmvInsert(buf, 64, v))
    buf.toSeq shouldBe buf.toSeq.sorted
    buf.toSeq.distinct.size shouldBe buf.length
    buf.length shouldBe 64
    buf.toSeq shouldBe vals.distinct.sorted.take(64)
  }

  it should "return the same reference when the value is present or too large" in {
    val buf = Array(1L, 5L, 9L)
    (Sketches.kmvInsert(buf, 3, 5L) eq buf) shouldBe true
    (Sketches.kmvInsert(buf, 3, 99L) eq buf) shouldBe true
    Sketches.kmvInsert(buf, 3, 0L).toSeq shouldBe Seq(0L, 1L, 5L)
  }

  behavior of "kmvMerge"

  it should "merge to the k smallest distinct values" in {
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(300)(rnd.nextLong() % 1000).distinct.sorted.toArray
    val b = Seq.fill(300)(rnd.nextLong() % 1000).distinct.sorted.toArray
    val m = Sketches.kmvMerge(a, b, 100)
    m.toSeq shouldBe (a ++ b).distinct.sorted.take(100)
  }

  behavior of "the KMV aggregation"

  it should "be partitioning-independent: exactly the k smallest distinct hashes" in {
    val rnd = new scala.util.Random(3)
    val hashes = Seq.fill(5000)(rnd.nextLong())
    val want = reference(hashes, K).toSeq
    Seq(1, 3, 16).foreach { parts =>
      val got = hashes.toDF("h").repartition(parts)
        .agg(Sketches.kmvSketch(col("h"), K).as("sk"))
        .first().getSeq[Long](0)
      withClue(s"parts=$parts: ") { got shouldBe want }
    }
  }

  it should "skip null inputs" in {
    val got = Seq[java.lang.Long](1L, null, 2L, null, 1L).toDF("h")
      .agg(Sketches.kmvSketch(col("h"), K))
      .first().getSeq[Long](0)
    got shouldBe Seq(1L, 2L).map(flip).sorted
  }

  behavior of "estimate"

  it should "be exact below k" in {
    val sk = reference(Seq.tabulate(100)(i => i.toLong * 7919), K)
    Sketches.estimate(sk, K) shouldBe 100.0
  }

  it should "land within 5 relative-standard-errors on 50k distinct values" in {
    // hash the ids so values are uniform on the long line (KMV's premise)
    val n = 50000
    val hashes = (0 until n).map(i =>
      com.google.common.hash.Hashing.farmHashFingerprint64()
        .hashLong(i.toLong).asLong())
    val sk = reference(hashes, K)
    val est = Sketches.estimate(sk, K)
    val rse = 1.0 / math.sqrt(K - 2.0)
    math.abs(est - n) should be <= 5.0 * rse * n
  }

  behavior of "overlap"

  it should "be exact when both sketches are unfilled" in {
    def hs(ids: Seq[Int]) = ids.map(i =>
      com.google.common.hash.Hashing.farmHashFingerprint64()
        .hashLong(i.toLong).asLong())
    val a = reference(hs(0 until 100), K)
    val b = reference(hs(60 until 160), K)
    val (inter, j, uni) = Sketches.overlap(a, b, K)
    uni shouldBe 160.0
    inter shouldBe 40.0
    j shouldBe (40.0 / 160.0)
  }

  it should "estimate a planted 50% overlap within tolerance at 20k per set" in {
    def hs(ids: Seq[Int]) = ids.map(i =>
      com.google.common.hash.Hashing.farmHashFingerprint64()
        .hashLong(i.toLong).asLong())
    val a = reference(hs(0 until 20000), 1024)
    val b = reference(hs(10000 until 30000), 1024)
    val (inter, j, uni) = Sketches.overlap(a, b, 1024)
    math.abs(uni - 30000.0) should be <= 3000.0
    math.abs(inter - 10000.0) should be <= 2000.0
    math.abs(j - 1.0 / 3.0) should be <= 0.06
  }

  it should "stay exact when both sketches are unfilled but their union exceeds k" in {
    // the sf0.001 regression shape: |A|=983 < k, |B|=736 < k, |A∪B| > k
    def hs(ids: Seq[Int]) = ids.map(i =>
      com.google.common.hash.Hashing.farmHashFingerprint64()
        .hashLong(i.toLong).asLong())
    val k = 1024
    val a = reference(hs(0 until 983), k)
    val b = reference(hs(492 until 1228), k)
    val (inter, j, uni) = Sketches.overlap(a, b, k)
    uni shouldBe 1228.0
    inter shouldBe 491.0
    j shouldBe (491.0 / 1228.0)
  }

  it should "handle empty sketches" in {
    Sketches.overlap(Array.emptyLongArray, Array.emptyLongArray, K) shouldBe
      ((0.0, 0.0, 0.0))
    val one = Array(flip(42L))
    val (inter, j, uni) = Sketches.overlap(one, Array.emptyLongArray, K)
    inter shouldBe 0.0
    j shouldBe 0.0
    uni shouldBe 1.0
  }
}
