package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing vs a driver-side reference packer; greedy bins vs
  * their invariants (capacity, coverage, in-order contiguity). */
class PackSpec extends SparkSpec {
  import spark.implicits._

  // (id, n_tokens); ids deliberately unsorted, sizes exercise multi-seq
  // spans, exact-boundary fits, and sub-sequence docs
  private lazy val docs = Seq(
    (5L, 3L), (1L, 10L), (3L, 7L), (2L, 16L), (4L, 1L), (6L, 8L), (7L, 0L),
    (8L, 5L)
  ).toDF("id", "n")

  /** Driver-side reference: lay docs end-to-end in id order, cut every L. */
  private def referenceMap(L: Long): Set[(Long, Long, Long, Long, Long)] = {
    var off = 0L
    Seq((1L, 10L), (2L, 16L), (3L, 7L), (4L, 1L), (5L, 3L), (6L, 8L), (8L, 5L))
      .flatMap { case (id, n) =>
        val spans = (off / L) to ((off + n - 1) / L)
        val rows = spans.map { s =>
          val lo = math.max(s * L, off); val hi = math.min((s + 1) * L, off + n)
          (id, s, math.max(0L, s * L - off), math.max(0L, off - s * L), hi - lo)
        }
        off += n; rows
      }.toSet
  }

  behavior of "Pack.packSequences"

  it should "match the sequential reference packer exactly" in {
    for (l <- Seq(8L, 16L, 64L); parts <- Seq(1, 3)) {
      val got = Pack.packSequences(docs, "id", "n", l, numPartitions = parts)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      withClue(s"seqLen=$l parts=$parts: ") { got shouldBe referenceMap(l) }
    }
  }

  it should "cover every token exactly once with no overlap per sequence" in {
    val l = 8L
    val out = Pack.packSequences(docs, "id", "n", l, numPartitions = 4)
    // total span length == total tokens of non-empty docs
    out.agg(sum("span_len")).head().getLong(0) shouldBe 50L
    // per sequence: spans tile [0, seqLen) (last sequence: [0, tail))
    val bySeq = out.groupBy("seq_id")
      .agg(sum("span_len").as("filled"), min("start_in_seq").as("mn"),
        max(col("start_in_seq") + col("span_len")).as("mx"))
      .orderBy("seq_id")
      .as[(Long, Long, Long, Long)].collect()
    bySeq.init.foreach { case (_, filled, mn, mx) =>
      filled shouldBe l; mn shouldBe 0L; mx shouldBe l
    }
    val (lastSeq, lastFill, lastMn, _) = bySeq.last
    lastSeq shouldBe (50L - 1) / l
    lastFill shouldBe 50L - lastSeq * l
    lastMn shouldBe 0L
  }

  it should "drop zero and null token counts" in {
    val withNull = docs.unionByName(
      Seq((9L, Option.empty[Long])).toDF("id", "n"))
    Pack.packSequences(withNull, "id", "n", 8L)
      .filter(col("id").isin(7L, 9L)).count() shouldBe 0L
  }

  it should "return an empty frame for an empty corpus" in {
    val out = Pack.packSequences(docs.filter(col("n") < 0), "id", "n", 8L)
    out.columns.toSeq shouldBe
      Seq("id", "seq_id", "start_in_doc", "start_in_seq", "span_len")
    out.count() shouldBe 0L
  }

  behavior of "Pack.greedyPackWithinPartitions"

  it should "respect capacity, keep docs whole, and number bins in order" in {
    val out = Pack.greedyPackWithinPartitions(docs, "id", "n", 16L,
      numPartitions = 2)
    val rows = out.as[(Long, Long, Long, Long, Boolean)].collect()
    // every positive-token doc appears exactly once, whole
    rows.map(_._1).sorted shouldBe Array(1L, 2L, 3L, 4L, 5L, 6L, 8L)
    rows.foreach { case (_, n, _, _, over) => over shouldBe (n > 16L) }
    // no bin exceeds capacity unless it holds a single oversized doc
    val byBin = rows.groupBy(_._3).values
    byBin.foreach { bs =>
      val total = bs.map(_._2).sum
      if (total > 16L) { bs.length shouldBe 1; bs.head._2 should be > 16L }
    }
    // within a partition, bin ids are assigned to contiguous id runs:
    // sort by id within each partition prefix and bins never interleave
    rows.groupBy(_._3 >> 32).values.foreach { part =>
      val sorted = part.sortBy(_._1)
      val binSeq = sorted.map(_._3)
      binSeq.zip(binSeq.tail).foreach { case (a, b) => a should be <= b }
    }
  }

  it should "fill bins by the running next-fit sum" in {
    // single partition => exactly sequential next-fit over id order
    val out = Pack.greedyPackWithinPartitions(docs, "id", "n", 16L,
        numPartitions = 1)
      .orderBy("id").as[(Long, Long, Long, Long, Boolean)].collect()
    // id order: 1(10) 2(16) 3(7) 4(1) 5(3) 6(8) 8(5)
    // bins: [1]=10; 2 doesn't fit -> [2]=16; [3,4,5]=11; 6 fits (11+8>16
    // -> no) -> [6,8]=13
    out.map(r => (r._1, r._3 & 0xffffffffL, r._4)).toSeq shouldBe Seq(
      (1L, 0L, 10L), (2L, 1L, 16L), (3L, 2L, 7L), (4L, 2L, 8L),
      (5L, 2L, 11L), (6L, 3L, 8L), (8L, 3L, 13L))
  }

  behavior of "TextAnalysis.chunkDocs"

  it should "produce overlapping chunks that reassemble to the text" in {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz"), (2L, "short"),
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("id", "text")
    val got = TextAnalysis.chunkDocs(df, "id", "text", size = 10, overlap = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    // doc 1: 26 chars, step 7 -> starts 0,7,14,21
    got.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)).toSeq shouldBe Seq(
      (0L, 0L, "abcdefghij"), (1L, 7L, "hijklmnopq"),
      (2L, 14L, "opqrstuvwx"), (3L, 21L, "vwxyz"))
    // short doc: one chunk; empty/null: none
    got.filter(_._1 == 2L).map(_._4).toSeq shouldBe Seq("short")
    got.count(r => r._1 == 3L || r._1 == 4L) shouldBe 0
    // consecutive chunks overlap by exactly `overlap` chars
    got.filter(_._1 == 1L).sliding(2).foreach {
      case Array(a, b) => a._4.takeRight(3) shouldBe b._4.take(3)
      case _ =>
    }
  }

  it should "cover every character of every doc" in {
    val df = (1 to 40).map(i => (i.toLong, "x" * i)).toDF("id", "text")
    val chunks = TextAnalysis.chunkDocs(df, "id", "text", size = 7, overlap = 2)
      .as[(Long, Long, Long, String)].collect()
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val covered = cs.flatMap(c => c._3 until (c._3 + c._4.length)).toSet
      covered shouldBe (0L until id).toSet
      // every chunk is at most `size` and only the last may be shorter
      val sorted = cs.sortBy(_._2)
      sorted.init.foreach(_._4.length shouldBe 7)
      sorted.last._4.length should be <= 7
    }
  }
}
