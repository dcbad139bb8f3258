package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring (duplicated span) dedup: winnowing kernels and the
  * distributed detect/strip operators. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  behavior of "winnowAnchors kernel"

  it should "honor the winnowing guarantee on seeded random copies" in {
    val rnd = new scala.util.Random(17)
    def randText(len: Int): String =
      Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
    val gram = 8
    val w = 20
    for (_ <- 0 until 40) {
      val span = randText(w + gram - 1 + rnd.nextInt(50)) // >= guarantee length
      val a = randText(rnd.nextInt(80)) + span + randText(rnd.nextInt(80))
      val b = randText(rnd.nextInt(80)) + span + randText(rnd.nextInt(80))
      val ha = SpanKernels.winnowAnchors(a, gram, w).map(_._1).toSet
      val hb = SpanKernels.winnowAnchors(b, gram, w).map(_._1).toSet
      (ha intersect hb) should not be empty
    }
    // anchors are deterministic and positions valid
    val t = randText(200)
    val an = SpanKernels.winnowAnchors(t, gram, w)
    an shouldBe SpanKernels.winnowAnchors(t, gram, w)
    an.foreach { case (_, p) => p should (be >= 0 and be <= t.length - gram) }
    SpanKernels.winnowAnchors(null, gram, w) shouldBe empty
    SpanKernels.winnowAnchors("ab", gram, w) shouldBe empty
  }

  behavior of "extendMatch kernel"

  it should "extend to the maximal common substring and reject collisions" in {
    //          0123456789            0123456789
    val ta = "xxABCDEFGHyy"
    val tb = "zzzABCDEFGHw"
    // seed gram=4 at ABCD (ta pos 2, tb pos 3): extends right to ...GH
    SpanKernels.extendMatch(ta, tb, 2, 3, 4) shouldBe ((2, 3, 8))
    // seed mid-span extends LEFT too
    SpanKernels.extendMatch(ta, tb, 6, 7, 4) shouldBe ((2, 3, 8))
    // hash-collision style mismatch: seeds differ -> null
    SpanKernels.extendMatch(ta, tb, 0, 0, 4) shouldBe null
    SpanKernels.extendMatch(ta, tb, 100, 0, 4) shouldBe null
  }

  behavior of "cutRanges kernel"

  it should "merge overlaps and clamp bounds" in {
    SpanKernels.cutRanges("abcdefghij", Array((2, 3), (4, 2))) shouldBe "abgh" + "ij"
    SpanKernels.cutRanges("abcdefghij", Array((8, 10))) shouldBe "abcdefgh"
    // a negative start clips to the intersection with [0, n): [-5, -2) is empty
    SpanKernels.cutRanges("abcdefghij", Array((-5, 3))) shouldBe "abcdefghij"
    SpanKernels.cutRanges("abcdefghij", Array((-2, 5))) shouldBe "defghij"
    SpanKernels.cutRanges("abc", Array.empty[(Int, Int)]) shouldBe "abc"
  }

  behavior of "duplicatedSpans"

  private def randWords(seed: Long, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)("w" + rnd.nextInt(100000)).mkString(" ")
  }

  it should "find exactly the planted cross-doc spans with maximal bounds" in {
    val span = "the exact same long duplicated passage that appears in two documents verbatim and exceeds the threshold"
    span.length should be >= 100
    val docs = Seq(
      (1L, randWords(1, 40) + " " + span + " " + randWords(2, 40)),
      (2L, randWords(3, 40) + " " + span + " " + randWords(4, 40)),
      (3L, randWords(5, 60)),
      (4L, randWords(6, 60)))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", minLen = 100, gram = 16)
      .collect()
    spans.length shouldBe 1
    val r = spans.head
    r.getAs[Long]("id_a") shouldBe 1L
    r.getAs[Long]("id_b") shouldBe 2L
    // maximal span includes the surrounding spaces (both sides agree there)
    r.getAs[Int]("span_len") should be >= span.length
    val ta = docs.filter(col("doc_id") === 1).head().getString(1)
    ta.substring(r.getAs[Int]("start_a"),
      r.getAs[Int]("start_a") + r.getAs[Int]("span_len")) should include(span)
  }

  it should "drop anchors past the occurrence cap and spans under minLen" in {
    val common = "shared boilerplate fragment that is everywhere " * 4
    val docs = (1L to 20L).map(i => (i, randWords(i, 30) + " " + common))
      .toDF("doc_id", "text")
    // cap 5 << 20 docs: the ubiquitous anchor set is dropped entirely
    Dedup.duplicatedSpans(docs, "doc_id", "text", minLen = 100, gram = 16,
      maxAnchorOccurrences = 5).count() shouldBe 0L
    // a short shared span (< minLen) never surfaces
    val short = Seq((1L, randWords(1, 30) + " tiny shared bit " + randWords(2, 30)),
      (2L, randWords(3, 30) + " tiny shared bit " + randWords(4, 30)))
      .toDF("doc_id", "text")
    Dedup.duplicatedSpans(short, "doc_id", "text", minLen = 100).count() shouldBe 0L
  }

  behavior of "withinDocRepeats"

  it should "find intra-doc repeats with no shuffle and respect the pair cap" in {
    val span = "a long passage repeated within one single document to trigger the intra doc detector over threshold!"
    span.length should be >= 100
    val docs = Seq(
      (1L, randWords(1, 30) + " " + span + " " + randWords(2, 30) + " " + span),
      (2L, randWords(3, 80)))
      .toDF("doc_id", "text")
    val got = Dedup.withinDocRepeats(docs, "doc_id", "text", minLen = 100, gram = 16)
      .collect()
    got.map(_.getAs[Long]("doc_id")).distinct.toSeq shouldBe Seq(1L)
    val r = got.head
    val t1 = docs.filter(col("doc_id") === 1).head().getString(1)
    (r.getAs[Int]("start_a") < r.getAs[Int]("start_b")) shouldBe true
    t1.substring(r.getAs[Int]("start_b"),
      r.getAs[Int]("start_b") + r.getAs[Int]("span_len")) should include(span)
    // the plan is one narrow generate pass: no exchange anywhere
    val p = Dedup.withinDocRepeats(docs, "doc_id", "text", minLen = 100)
      .queryExecution.executedPlan.toString
    p should not include "Exchange"
    // a pathologically periodic doc is bounded by the pair cap
    val periodic = Seq((9L, ("repeat me forever and ever again " * 40)))
      .toDF("doc_id", "text")
    noException should be thrownBy
      Dedup.withinDocRepeats(periodic, "doc_id", "text", minLen = 100,
        maxPairsPerDoc = 50).count()
  }

  it should "strip later intra-doc occurrences through the removal form" in {
    val span = "a long passage repeated within one single document to trigger the intra doc detector over threshold!"
    val t1 = randWords(1, 30) + " " + span + " " + randWords(2, 30) + " " + span
    val docs = Seq((1L, t1)).toDF("doc_id", "text")
    val reps = Dedup.withinDocRepeats(docs, "doc_id", "text", minLen = 100, gram = 16)
    val out = Dedup.stripWithinDocRepeats(docs, "doc_id", "text", reps)
      .head().getString(1)
    // first occurrence survives, the later copy is gone
    out should include(span)
    out.indexOf(span) shouldBe out.lastIndexOf(span)
  }

  behavior of "stripDuplicatedSpans"

  it should "cut spans from the later doc only, keep-first" in {
    val span = "the exact same long duplicated passage that appears in two documents verbatim and exceeds the threshold"
    val a = randWords(1, 40) + " " + span + " " + randWords(2, 40)
    val b = randWords(3, 40) + " " + span + " " + randWords(4, 40)
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", minLen = 100, gram = 16)
    val out = Dedup.stripDuplicatedSpans(docs, "doc_id", "text", spans)
      .orderBy("doc_id").as[(Long, String)].collect()
    out(0)._2 shouldBe a // first occurrence untouched
    out(1)._2 should not include span
    out(1)._2.length shouldBe (b.length - spans.head().getAs[Int]("span_len"))
  }
}
