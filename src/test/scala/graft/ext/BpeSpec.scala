package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val M = Bpe.Marker

  // Sennrich's worked example, weights chosen so the first merges are
  // hand-checkable: es(9) -> est(9) -> est¶(9) -> lo(7). Word units carry
  // the end-of-word marker in the unit string (every whitespace word is
  // boundary-final).
  private val classicTypes = Array(
    ("low" + M, 5L), ("lower" + M, 2L), ("newest" + M, 6L), ("widest" + M, 3L))

  behavior of "mergeLoop"

  it should "reproduce the classic worked example's first merges" in {
    val merges = Bpe.mergeLoop(classicTypes, 4, minPairCount = 1L)
    merges(0) shouldBe ("e", "s")
    merges(1) shouldBe ("es", "t")
    merges(2) shouldBe ("est", M)
    merges(3) shouldBe ("l", "o")
  }

  it should "reproduce the classic first merges in byte space" in {
    // pure-ASCII words: UTF-8 bytes == latin-1 chars, so the byte-level
    // merge sequence matches the code-point sequence exactly
    val merges = Bpe.mergeLoop(classicTypes, 4, 1L, byteLevel = true)
    merges(0) shouldBe ("e", "s")
    merges(1) shouldBe ("es", "t")
    merges(2) shouldBe ("est", M)
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

  it should "never emit a merge pair twice and always match encoder replay" in {
    // adversarial two-letter alphabet: repeated-char words maximize the
    // chance a later merge re-creates an earlier pair's adjacency (the
    // round-9 advice finding). The contract: merges are duplicate-free,
    // and the TRAINING end-state of every type equals what the greedy
    // encoder produces — the cascade invariant.
    val r = new Random(41)
    (1 to 5).foreach { trial =>
      val types = (1 to 120).map { _ =>
        val w = (1 to (1 + r.nextInt(10)))
          .map(_ => if (r.nextBoolean()) 'a' else 'b').mkString
        (w + M, (1 + r.nextInt(9)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val (merges, table) =
        Bpe.mergeLoopWithTable(types, 80, minPairCount = 1L)
      withClue(s"trial $trial: ") {
        merges.distinct.length shouldBe merges.length
        val model = Bpe.Model(merges)
        types.foreach { case (w, _) =>
          model.encodeWord(w).toSeq shouldBe table(w).toSeq
        }
      }
    }
  }

  behavior of "Model.encode"

  it should "apply merges greedily by rank" in {
    val model = Bpe.Model(Bpe.mergeLoop(classicTypes, 4, 1L))
    model.encodeWord("newest" + M).toSeq shouldBe Seq("n", "e", "w", "est" + M)
    model.encodeWord("lowest" + M).toSeq shouldBe Seq("lo", "w", "est" + M)
    // unseen chars stay single-char tokens
    model.encodeWord("zap!" + M).toSeq shouldBe Seq("z", "a", "p", "!", M)
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

  it should "roundtrip no-whitespace-script text byte-exactly" in {
    val model = Bpe.Model(IndexedSeq.empty)
    // CJK characters are separate word units WITHOUT markers between
    // adjacent ones, so decode re-concatenates them with no spaces —
    // including at script boundaries and across real spaces
    val samples = Seq(
      "你好世界", "これはテストです", "สวัสดี",
      "Hello你好world", "mixed 你好 text", "你好 世界")
    samples.foreach { t =>
      model.decode(model.encode(t).toSeq) shouldBe t
    }
    // byte-level mode roundtrips the same corpus through UTF-8 bytes
    val bl = Bpe.Model(IndexedSeq.empty, Bpe.ByteAlphabet, byteLevel = true)
    samples.foreach { t =>
      bl.decode(bl.encode(t).toSeq) shouldBe t
    }
  }

  it should "handle astral code points as single base symbols" in {
    val model = Bpe.Model(IndexedSeq.empty)
    val smile = new String(Character.toChars(0x1F600))
    model.encodeWord(smile + "a" + M).toSeq shouldBe Seq(smile, "a", M)
    // byte-level: the same word is its 5 UTF-8 bytes (4 + 'a') + marker byte
    val bl = Bpe.Model(IndexedSeq.empty, Bpe.ByteAlphabet, byteLevel = true)
    val toks = bl.encodeWord(smile + "a" + M)
    toks.length shouldBe 6
    bl.decode(toks.toSeq) shouldBe smile + "a"
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
    model.encodeWord("the" + M).toSeq shouldBe Seq("the" + M)
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

  it should "train byte-level with a full 256-symbol base and no OOV" in {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cats sat on the mats"),
      (3L, "你好 世界 你好 世界 你好")).toDF("id", "text")
    val model = Bpe.train(docs, "text", numMerges = 20, minPairCount = 2L,
      byteLevel = true)
    model.byteLevel shouldBe true
    model.baseSymbols shouldBe Bpe.ByteAlphabet
    // every emitted token decomposes into byte symbols — no OOV possible,
    // even for text whose code points were never seen at training
    val v = model.vocab
    model.encode("Ωμέγα unseen 漢字").foreach { tok =>
      tok.foreach(c => (c & 0xffff) should be <= 0xff)
      v should contain allElementsOf tok.map(_.toString)
    }
    // "the" trains to a single byte-level token (7 occurrences incl. docs)
    model.encodeWord("the" + M).toSeq shouldBe Seq("the" + M)
    // roundtrip through UTF-8 bytes is exact
    docs.as[(Long, String)].collect().foreach { case (_, t) =>
      model.decode(model.encode(t).toSeq) shouldBe
        t.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
    }
  }

  it should "emit only vocab tokens for training-corpus text" in {
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the cats sat on the mats")).toDF("id", "text")
    val model = Bpe.train(docs, "text", numMerges = 10)
    val v = model.vocab
    v should contain(M)
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
    // cap keeps only the most frequent type ("common" + marker, 200
    // occurrences)
    val model = Bpe.train(docs, "text", numMerges = 50, maxWordTypes = 1,
      minPairCount = 2L)
    model.encodeWord("common" + M).toSeq shouldBe Seq("common" + M)
  }

  it should "segment no-whitespace scripts into bounded word units" in {
    // a CJK corpus must NOT memorize whole sentences as single types:
    // word units are per-code-point, so the type table is the character
    // inventory (plus marker variants), not the sentence inventory
    val docs = (1 to 50).map(i =>
      (i.toLong, "你好世界" * (1 + i % 3))).toDF("id", "text")
    val types = Bpe.wordTypes(docs, "text", 1000).collect()
    types.length should be <= 8 // 4 chars × (marker / no-marker)
    val model = Bpe.train(docs, "text", numMerges = 10, minPairCount = 2L)
    // merges learn the frequent character adjacencies
    model.merges should not be empty
    docs.as[(Long, String)].collect().foreach { case (_, t) =>
      model.decode(model.encode(t).toSeq) shouldBe t
    }
  }

  it should "train deterministically across repartitionings" in {
    val docs = (1 to 60).map(i => (i.toLong, s"alpha beta gamma delta word$i"))
      .toDF("id", "text")
    val a = Bpe.train(docs.repartition(13), "text", 20)
    val b = Bpe.train(docs.repartition(3), "text", 20)
    a.merges shouldBe b.merges
  }
}
