package graft.ext

import graft.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned byte-pair-encoding tokenizer (Sennrich et al. '16) — the real
  * thing, not the chars/4 estimate ([[TextAnalysis.approxBpeTokenCount]]):
  * train merge rules from corpus statistics, then tokenize any corpus
  * map-side.
  *
  * Scale shape: training reduces the corpus to its WORD-TYPE table with one
  * map-side-combined count aggregation (only distinct words cross the
  * wire), takes the top `maxWordTypes` types by a bounded per-partition
  * top-k (TakeOrderedAndProject — never a global sort), and runs the merge
  * loop on that bounded table driver-side with incrementally-maintained
  * pair counts — the same bounded-driver-table judgment as the PQ/IVF
  * codebook training: corpus size enters the aggregation, never the loop.
  * Encoding broadcasts the rank table in the task closure and runs as a
  * pure per-row UDF — zero shuffle, scan speed, with a per-executor
  * word-type memo (Zipf makes the hit rate ~word-type coverage).
  *
  * Word units are SCRIPT-AWARE boundary tokens
  * ([[graft.functions.ScriptTokens.splitWithBoundaries]]): whitespace
  * words, with every Han/Hiragana/Katakana/Thai code point its own unit —
  * so a no-whitespace-script corpus trains on a bounded character-level
  * type table instead of memorizing whole sentences as single types. The
  * end-of-word marker is '\n' and is part of the word-unit STRING itself:
  * a unit carries the trailing marker iff it was followed by whitespace
  * (or ended the text). No token can contain '\n' otherwise (whitespace
  * never enters a token), so decode needs no escaping, and adjacent
  * marker-less units (consecutive CJK characters) re-concatenate WITHOUT
  * a space — byte-exact round trip on every script, up to whitespace-run
  * normalization. On whitespace-script corpora the unit table is
  * identical to the previous whitespace-word form (every word is
  * boundary-final), so saved models replay unchanged.
  *
  * `byteLevel = true` switches the base alphabet to UTF-8 BYTES (GPT-2
  * style): symbols are single latin-1 chars 0x00-0xFF, so any text is
  * coverable with a 256-symbol base vocabulary and out-of-vocabulary
  * code points cannot exist. The '\n' marker IS byte 0x0A, so marker
  * handling is unchanged. Byte symbols include non-printable chars —
  * persist byte-level merges via parquet (binary-safe), not CSV.
  */
object Bpe {

  val Marker = "\n"

  /** The 256-symbol byte-level base alphabet (latin-1 chars 0x00-0xFF). */
  private[ext] val ByteAlphabet: Set[String] =
    (0 until 256).map(b => b.toChar.toString).toSet

  /** Word unit → base symbols. Code-point mode: one symbol per CODE POINT
    * (surrogate-pair aware) — the trailing '\n' marker, when the unit has
    * one, is itself a code point and becomes the final symbol. Byte mode:
    * one symbol per UTF-8 byte, each mapped to the latin-1 char of its
    * value (the marker is byte 0x0A and falls out identically). Shared by
    * training and encoding so the two can never desynchronize on Unicode
    * edges. */
  private[ext] def toSymbols(word: String,
                             byteLevel: Boolean = false): Array[String] = {
    val b = Array.newBuilder[String]
    if (byteLevel) {
      val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < bytes.length) {
        b += (bytes(i) & 0xff).toChar.toString
        i += 1
      }
    } else {
      var i = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        b += word.substring(i, i + n)
        i += n
      }
    }
    b.result()
  }

  /** Replace every adjacent (a, b) with a+b, left to right — the single
    * merge-application kernel used by both the training loop and the
    * greedy encoder (identical replay is the BPE correctness contract). */
  private[ext] def mergePair(s: Array[String], a: String,
                             b: String): Array[String] = {
    val nb = Array.newBuilder[String]
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
        nb += a + b; j += 2
      } else { nb += s(j); j += 1 }
    }
    nb.result()
  }

  /** A trained tokenizer: ordered merge rules plus the base symbol set
    * seen at training (code points of the word-type table — what `vocab`
    * needs to be a complete emittable-token table; empty when a model is
    * built from bare merges; the full 256-char byte alphabet in byte
    * mode). `ranks` drives greedy encoding (lowest rank merges first —
    * training order; first occurrence wins by construction, the merge
    * loop never emits a pair twice). */
  case class Model(merges: IndexedSeq[(String, String)],
                   baseSymbols: Set[String] = Set.empty,
                   byteLevel: Boolean = false) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.foldLeft(
        Map.empty[(String, String), Int]) { case (m, (p, i)) =>
        if (m.contains(p)) m else m.updated(p, i)
      }

    // per-executor encode memo; word types are Zipf-bounded so a flat cap
    // keeps memory O(100k strings) while serving nearly every lookup
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private val MemoCap = 100000

    /** Greedy BPE apply: repeatedly merge the lowest-rank adjacent pair
      * (left-to-right within a rank), exactly the training replay. */
    def encodeWord(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      val hit = memo.get(word)
      if (hit != null) return hit
      var syms = toSymbols(word, byteLevel)
      var done = false
      while (!done && syms.length > 1) {
        var best = Int.MaxValue
        var at = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) { best = r; at = i }
          i += 1
        }
        if (at < 0) done = true
        else {
          val (a, b) = merges(best)
          syms = mergePair(syms, a, b)
        }
      }
      if (memo.size < MemoCap) memo.put(word, syms)
      syms
    }

    /** Tokenize text over script-aware boundary word units; a unit's last
      * token ends with the marker iff the unit was whitespace-final, so
      * the stream decodes unambiguously — including space-free adjacency
      * of no-space-script characters. */
    def encode(text: String): Array[String] =
      if (text == null) Array.empty
      else graft.functions.ScriptTokens.splitWithBoundaries(text)
        .iterator.flatMap(encodeWord).toArray

    /** Inverse of [[encode]] up to whitespace-run normalization: marker
      * positions (trailing marker dropped) are exactly the single-space
      * word boundaries; adjacent marker-less tokens re-concatenate. */
    def decode(tokens: Seq[String]): String = {
      val joined = tokens.mkString("")
      val text =
        if (byteLevel)
          new String(joined.toCharArray.map(_.toByte),
            java.nio.charset.StandardCharsets.UTF_8)
        else joined
      val words = text.split(Marker, -1)
      // interior empties (consecutive markers) are impossible by
      // construction; a trailing marker yields one trailing empty
      (if (words.nonEmpty && words.last.isEmpty) words.dropRight(1)
       else words).mkString(" ")
    }

    /** Every token string this model can emit for text whose code points
      * were seen at training: the base symbols (incl. the marker) plus all
      * merge operands and products. For out-of-vocabulary code points the
      * encoder falls back to single-code-point tokens outside this set. */
    def vocab: Set[String] = {
      val fromMerges = merges.iterator.flatMap { case (a, b) =>
        Iterator(a, b, a + b) }.toSet
      baseSymbols ++ fromMerges + Marker
    }

    /** Column form: `array<string>` of tokens — the rank table rides the
      * task closure (broadcast-sized: numMerges entries). */
    def encodeCol(text: Column): Column = {
      val f = udf { t: String => encode(t) }
      f(text)
    }

    /** Column form: learned-BPE token count. */
    def tokenCountCol(text: Column): Column = {
      val f = udf { t: String => if (t == null) 0L else encode(t).length.toLong }
      f(text)
    }
  }

  /** Learn `numMerges` merge rules from a corpus.
    *
    * Deterministic: the word-count aggregation is exact; type selection
    * orders by (count desc, word asc); each iteration merges the
    * highest-count pair with ties broken lexicographically — same corpus,
    * same model, on any cluster. Pair counts are maintained incrementally
    * (only words CONTAINING the merged pair are revisited), so the loop is
    * O(numMerges × touched-words), not O(numMerges × table).
    *
    * `minPairCount` stops early once the best pair drops below it (2 by
    * default: merging hapax pairs just memorizes the tail). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWordTypes: Int = 1 << 16, minPairCount: Long = 2L,
            byteLevel: Boolean = false): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWordTypes >= 1, s"maxWordTypes must be >= 1, got $maxWordTypes")
    val spark = df.sparkSession
    import spark.implicits._
    val types: Array[(String, Long)] =
      wordTypes(df, textCol, maxWordTypes).as[(String, Long)].collect()
    val base =
      if (byteLevel) ByteAlphabet
      else types.iterator.flatMap { case (w, _) =>
        toSymbols(w).iterator }.toSet + Marker
    Model(mergeLoop(types, numMerges, minPairCount, byteLevel), base, byteLevel)
  }

  /** The training word-type selection as a plan: map-side-combined count
    * aggregation + per-partition top-k (orderBy+limit plans as
    * TakeOrderedAndProject — each task keeps its own top `maxWordTypes`
    * and the driver merges heaps; a global Sort here would be the
    * corpus-vocabulary straggler). Exposed so the plan shape is
    * spec-lockable and so callers can persist the type table. */
  def wordTypes(df: DataFrame, textCol: String,
                maxWordTypes: Int): DataFrame = df
    .select(explode(boundaryTokens(col(textCol))).as("w"))
    .groupBy("w").agg(count(lit(1)).as("c"))
    .orderBy(desc("c"), asc("w")).limit(maxWordTypes)

  /** The BPE word-unit tokenization as a codegen'd column (Catalyst twin
    * of [[graft.functions.ScriptTokens.splitWithBoundaries]]): collapse
    * every whitespace run to a single '\n', append a terminal '\n', and
    * extract script tokens that absorb an optional trailing '\n' — the
    * end-of-word marker rides inside the unit string. */
  def boundaryTokens(text: Column): Column =
    regexp_extract_all(
      concat(regexp_replace(text, "\\s+", Marker), lit(Marker)),
      lit(graft.functions.ScriptTokens.JavaBoundaryPattern), lit(0))

  /** Rebuild a [[Model]] from a saved (rank, left, right) merge table —
    * the inverse of the CLI's `--merges-output`, closing the
    * train-once-reuse-everywhere loop: tokenize tomorrow's corpus with
    * yesterday's tokenizer without retraining. The table is numMerges rows
    * (driver-sized by construction). Base symbols are recovered from the
    * single-code-point merge operands; pass `baseSymbols` when the full
    * emittable-vocab table matters. */
  def fromMergesTable(df: DataFrame,
                      baseSymbols: Set[String] = Set.empty,
                      byteLevel: Boolean = false): Model = {
    val merges = df.select(col("rank").cast("int").as("rank"),
        col("left"), col("right")).collect()
      .map { r =>
        require(!r.isNullAt(0), "fromMergesTable: null rank row")
        (r.getInt(0), r.getString(1), r.getString(2))
      }
      .sortBy(_._1)
      .map { case (_, a, b) => (a, b) }
      .toIndexedSeq
    val recovered =
      if (byteLevel) ByteAlphabet
      else if (baseSymbols.nonEmpty) baseSymbols
      else merges.iterator.flatMap { case (a, b) => Iterator(a, b) }
        .filter(s => s.codePointCount(0, s.length) == 1).toSet
    Model(merges, recovered, byteLevel)
  }

  /** The Sennrich merge loop over a (word, freq) table. Exposed for specs
    * and for re-training from a saved word-count table.
    *
    * WORD-TABLE CONTRACT: the loop adds NO end-of-word marker of its own —
    * each `types` word must already carry its trailing '\n' marker iff the
    * unit was whitespace-final, exactly as [[wordUnits]] produces them
    * (see the object scaladoc). Feeding marker-less words trains a model
    * whose merges never see the boundary symbol, and the greedy encoder
    * (which DOES receive marked units) will then diverge from training on
    * every whitespace-final word. Re-train from a saved table only if the
    * table was saved marker-inclusive.
    *
    * A later merge can RE-CREATE an already-merged pair's adjacency (word
    * [a,x,y] where x+y == b re-creates (a,b)); emitting it again would
    * waste a merge slot and leave a duplicate whose replay priority is
    * ambiguous. The loop therefore never re-emits: a best pair that was
    * already emitted is APPLIED to the re-created adjacencies (keeping
    * the type table consistent with what the greedy encoder — which
    * re-merges any re-created pair at its original rank — produces)
    * without consuming a merge slot or appearing twice in `merges`. */
  def mergeLoop(types: Array[(String, Long)], numMerges: Int,
                minPairCount: Long,
                byteLevel: Boolean = false): IndexedSeq[(String, String)] =
    mergeLoopWithTable(types, numMerges, minPairCount, byteLevel)._1

  /** [[mergeLoop]] plus the final per-type symbol table — the training
    * end-state the greedy encoder must replay exactly (what the
    * cascade invariant guarantees; specs assert it). */
  private[ext] def mergeLoopWithTable(
      types: Array[(String, Long)], numMerges: Int, minPairCount: Long,
      byteLevel: Boolean = false)
      : (IndexedSeq[(String, String)], Map[String, Array[String]]) = {
    // symbol sequences, mutable per word
    val words: Array[Array[String]] =
      types.map { case (w, _) => toSymbols(w, byteLevel) }
    val freqs: Array[Long] = types.map(_._2)

    val pairCounts = collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords =
      collection.mutable.HashMap.empty[(String, String),
        collection.mutable.BitSet]
    def addWord(wi: Int, sign: Long): Unit = {
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = pairCounts.getOrElse(p, 0L) + sign * freqs(wi)
        if (c <= 0L) pairCounts.remove(p) else pairCounts.update(p, c)
        if (sign > 0)
          pairWords.getOrElseUpdate(p, collection.mutable.BitSet.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    val emittedRanks = collection.mutable.HashMap.empty[(String, String), Int]
    // after every step no word contains an adjacency of an EMITTED pair:
    // re-apply emitted merges lowest-rank-first until fixpoint — exactly
    // the greedy encoder's loop, so the training table always equals what
    // encodeWord produces, and a re-created pair can never re-enter the
    // selection (ranks stay unique, no slot is wasted)
    def cascade(s0: Array[String]): Array[String] = {
      var s = s0
      var done = false
      while (!done && s.length > 1) {
        var best = Int.MaxValue
        var i = 0
        while (i < s.length - 1) {
          val r = emittedRanks.getOrElse((s(i), s(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = merges(best)
          s = mergePair(s, a, b)
        }
      }
      s
    }
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      if (pairCounts.isEmpty) exhausted = true
      else {
        // highest count, ties to the lexicographically smallest pair
        val best = pairCounts.iterator.reduce { (x, y) =>
          val c = java.lang.Long.compare(x._2, y._2)
          if (c > 0) x else if (c < 0) y
          else {
            val p = Ordering[(String, String)].compare(x._1, y._1)
            if (p <= 0) x else y
          }
        }
        if (best._2 < minPairCount) exhausted = true
        else {
          val (a, b) = best._1
          merges += best._1
          emittedRanks.update(best._1, m)
          val touched = pairWords.getOrElse(best._1, collection.mutable.BitSet.empty)
          touched.foreach { wi =>
            val s = words(wi)
            var has = false
            var i = 0
            while (!has && i < s.length - 1) {
              has = s(i) == a && s(i + 1) == b; i += 1
            }
            if (has) {
              addWord(wi, -1L)
              words(wi) = cascade(mergePair(s, a, b))
              addWord(wi, 1L)
            }
          }
          pairCounts.remove(best._1)
          pairWords.remove(best._1)
          m += 1
        }
      }
    }
    (merges.toIndexedSeq,
      types.iterator.map(_._1).zip(words.iterator).toMap)
  }
}
