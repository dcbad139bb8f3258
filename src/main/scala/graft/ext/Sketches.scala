package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketches — the mergeable sketch family
  * member HLL cannot replace: because a KMV sketch IS a uniform sample of
  * the distinct-hash space, two sketches support set INTERSECTION and
  * Jaccard estimates, not just union. The 100 TB use case is corpus
  * overlap: "how many documents does today's crawl share with last
  * month's?" — two fixed-size sketches built in one scan each, compared
  * in microseconds, where the exact answer is a full distinct-join of
  * both corpora.
  *
  * Representation: the k smallest SIGN-FLIPPED (h ^ Long.MinValue) 64-bit
  * hashes of the distinct values, sorted ascending — flipping makes
  * signed order equal unsigned order, so the array is uniform on
  * [Long.Min, Long.Max] and estimation arithmetic stays in signed longs.
  * A sketch holding fewer than k values is the EXACT distinct hash set
  * (estimators below return exact counts in that regime).
  *
  * Error: a full sketch estimates distinct counts with relative standard
  * error ~ 1/sqrt(k-2) (k=1024 → ~3.1%); intersection error scales with
  * 1/(J*sqrt(k)) for Jaccard J. All estimators are DETERMINISTIC given
  * the data — the only randomness is the hash function.
  *
  * Scale shape: the aggregation is a standard map-side-combined hash agg
  * whose partial states are ≤ k longs; a full-table scan shuffles only
  * O(k × partitions) values regardless of row count.
  */
object Sketches {

  /** Insert `v` (flipped-hash space) into sorted ascending `buf`, keeping
    * at most k values and dropping duplicates. Returns `buf` unchanged
    * (same reference) when v is already present or too large. */
  private[ext] def kmvInsert(buf: Array[Long], k: Int, v: Long): Array[Long] = {
    val n = buf.length
    if (n >= k && v >= buf(n - 1)) return buf
    val i = java.util.Arrays.binarySearch(buf, v)
    if (i >= 0) return buf // already present
    val ins = -i - 1
    val outLen = math.min(n + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = v
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  /** Merge two sorted distinct arrays, keeping the k smallest. */
  private[ext] def kmvMerge(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    var last = 0L; var any = false
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (!any || v != last) { out(o) = v; o += 1; last = v; any = true }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** KMV aggregator over pre-hashed longs (null inputs skipped — feed it
    * `when(cond, hash)` for conditional sketches in a single pass). */
  class KmvAgg(k: Int) extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    require(k >= 16, s"KMV needs k >= 16 for a usable estimate, got $k")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], in: java.lang.Long): Array[Long] =
      if (in == null) buf
      else kmvInsert(buf, k, in.longValue() ^ Long.MinValue)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      kmvMerge(a, b, k)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Aggregate column: KMV sketch (sorted long array) of the distinct
    * values of `hashCol`, which must already be a 64-bit hash (use
    * [[graft.GraftFunctions.fieldHash]] / `xxhash64`). */
  def kmvSketch(hashCol: Column, k: Int = 1024): Column =
    udaf(new KmvAgg(k), Encoders.LONG).apply(hashCol)

  /** Distinct-count estimate. Exact when the sketch never filled. */
  def estimate(sketch: Array[Long], k: Int): Double = {
    val n = sketch.length
    if (n < k) n.toDouble
    else {
      // kth smallest normalized to (0,1]: u = (v - Long.Min) / 2^64
      val u = (sketch(k - 1).toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      (k - 1).toDouble / u
    }
  }

  /** Union sketch of two sketches built with the same k. */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
    kmvMerge(a, b, k)

  /** (intersection estimate, jaccard estimate, union estimate) from two
    * sketches built with the same k and hash.
    *
    * Method: the k' = min(k, |a∪b|) smallest union hashes are a uniform
    * sample X of A∪B; J ≈ |{x ∈ X present in both}| / |X| and
    * |A∩B| ≈ J·|A∪B|. When both sketches are unfilled they are exact
    * hash sets and so are the answers. */
  def overlap(a: Array[Long], b: Array[Long], k: Int): (Double, Double, Double) = {
    // An unfilled sketch IS its side's exact hash set; with both sides
    // exact the union must be merged UNCAPPED (capping at k would
    // silently truncate a >k exact union — the membership counts below
    // would still be right, but the union size would not be).
    val bothExact = a.length < k && b.length < k
    val x =
      if (bothExact) kmvMerge(a, b, a.length + b.length)
      else kmvMerge(a, b, k)
    val kx = x.length
    if (kx == 0) return (0.0, 0.0, 0.0)
    // Membership of x in each side's sketch is sound: x among the k
    // smallest of the union and x ∈ A implies x is no larger than A's
    // kth-smallest hash (k elements of A below it would displace it
    // from the union's k smallest), so a full sketch never misses it.
    var c = 0
    var i = 0
    while (i < kx) {
      val v = x(i)
      if (java.util.Arrays.binarySearch(a, v) >= 0 &&
        java.util.Arrays.binarySearch(b, v) >= 0) c += 1
      i += 1
    }
    val unionEst =
      if (bothExact) kx.toDouble
      else {
        // at least one side was full, so the merge filled: kx == k
        val u = (x(kx - 1).toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
        (kx - 1).toDouble / u
      }
    val j = c.toDouble / kx
    (j * unionEst, j, unionEst)
  }
}
