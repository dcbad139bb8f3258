package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich's worked example, weights chosen so the first merges are
  // hand-checkable: es(9) -> est(9) -> est¶(9) -> lo(7)
  private val classicTypes = Array(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  behavior of "mergeLoop"

  it should "reproduce the classic worked example's first merges" in {
    val merges = Bpe.mergeLoop(classicTypes, 4, minPairCount = 1L)
    merges(0) shouldBe ("e", "s")
    merges(1) shouldBe ("es", "t")
    merges(2) shouldBe ("est", Bpe.Marker)
    merges(3) shouldBe ("l", "o")
  }

  it should "stop early when the best pair drops below minPairCount" in {
    val merges = Bpe.mergeLoop(Array(("ab", 1L), ("cd", 1L)), 10, minPairCount = 2L)
    merges shouldBe empty
  }

  it should "be deterministic regardless of input order" in {
    val r = new Random(3)
    val a = Bpe.mergeLoop(classicTypes, 10, 1L)
    val b = Bpe.mergeLoop(r.shuffle(classicTypes.toSeq).toArray, 10, 1L)
    a shouldBe b
  }

  behavior of "Model.encode"

  it should "apply merges greedily by rank" in {
    val model = Bpe.Model(Bpe.mergeLoop(classicTypes, 4, 1L))
    model.encodeWord("newest").toSeq shouldBe Seq("n", "e", "w", "est" + Bpe.Marker)
    model.encodeWord("lowest").toSeq shouldBe Seq("lo", "w", "est" + Bpe.Marker)
    // unseen chars stay single-char tokens
    model.encodeWord("zap!").toSeq shouldBe Seq("z", "a", "p", "!", Bpe.Marker)
  }

  it should "roundtrip arbitrary whitespace-normalized text" in {
    val model = Bpe.Model(Bpe.mergeLoop(classicTypes, 8, 1L))
    val r = new Random(17)
    (1 to 50).foreach { _ =>
      val words = (1 to (1 + r.nextInt(6))).map { _ =>
        (1 to (1 + r.nextInt(8))).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      }
      val text = words.mkString(" ")
      model.decode(model.encode(text).toSeq) shouldBe text
    }
    model.encode("") shouldBe empty
    model.encode(null) shouldBe empty
  }

  it should "handle astral code points as single base symbols" in {
    val model = Bpe.Model(IndexedSeq.empty)
    val smile = new String(Character.toChars(0x1F600))
    model.encodeWord(smile + "a").toSeq shouldBe Seq(smile, "a", Bpe.Marker)
  }

  behavior of "train"

  it should "learn merges distributed and tokenize a corpus map-side" in {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cats sat on the mats"),
      (3L, "the hat and the bat and the rat")).toDF("id", "text")
    val model = Bpe.train(docs, "text", numMerges = 30, minPairCount = 2L)
    model.merges should not be empty
    // "the" occurs 7 times: it must become a single token
    model.encodeWord("the").toSeq shouldBe Seq("the" + Bpe.Marker)
    // distributed encode roundtrips every doc
    val bad = docs
      .select(col("text"), model.encodeCol(col("text")).as("toks"))
      .as[(String, Seq[String])].collect()
      .count { case (t, toks) =>
        model.decode(toks) != t.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      }
    bad shouldBe 0
    // token counts agree with per-row encode
    val counts = docs.select(model.tokenCountCol(col("text"))).as[Long].collect()
    counts shouldBe docs.select(col("text")).as[String].collect()
      .map(t => model.encode(t).length.toLong)
  }

  it should "emit only vocab tokens for training-corpus text" in {
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the cats sat on the mats")).toDF("id", "text")
    val model = Bpe.train(docs, "text", numMerges = 10)
    val v = model.vocab
    v should contain(Bpe.Marker)
    docs.as[(Long, String)].collect().foreach { case (_, t) =>
      model.encode(t).foreach(tok => v should contain(tok))
    }
  }

  it should "rebuild an identical tokenizer from a saved merges table" in {
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the cats sat on the mats")).toDF("id", "text")
    val model = Bpe.train(docs, "text", numMerges = 15)
    val table = model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }.toDF("rank", "left", "right")
    // shuffle row order: rank must drive the rebuild, not row order
    val reloaded = Bpe.fromMergesTable(table.orderBy(col("left")))
    reloaded.merges shouldBe model.merges
    docs.as[(Long, String)].collect().foreach { case (_, t) =>
      reloaded.encode(t).toSeq shouldBe model.encode(t).toSeq
    }
  }

  it should "respect the word-type cap" in {
    val docs = (1 to 100).map(i => (i.toLong, s"unique$i common common"))
      .toDF("id", "text")
    // cap keeps only the most frequent type ("common", 200 occurrences)
    val model = Bpe.train(docs, "text", numMerges = 50, maxWordTypes = 1,
      minPairCount = 2L)
    model.encodeWord("common").toSeq shouldBe Seq("common" + Bpe.Marker)
  }

  it should "train deterministically across repartitionings" in {
    val docs = (1 to 60).map(i => (i.toLong, s"alpha beta gamma delta word$i"))
      .toDF("id", "text")
    val a = Bpe.train(docs.repartition(13), "text", 20)
    val b = Bpe.train(docs.repartition(3), "text", 20)
    a.merges shouldBe b.merges
  }
}
