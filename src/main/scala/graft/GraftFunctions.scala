package graft

import graft.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Public Column-level API over the engine's custom Catalyst expressions.
  *
  * Mirrors the callable surface of the reference's hashing/sampling kernels
  * (ratatool-sampling/.../util/Util.scala:89-98, BigSampler.scala:59-90) as
  * composable `Column`s, so every operator built on them stays inside
  * Catalyst (pushdown, pruning, codegen around the expression).
  */
object GraftFunctions {

  private def expr2col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def col2expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(c)

  /** Multi-field deterministic fingerprint (guava funnel protocol; see
    * [[graft.functions.FieldHash]]). algo ∈ {farm, murmur}. */
  def fieldHash(cols: Seq[Column], algo: String = "farm", seed: Option[Int] = None,
                encoding: ByteEncoding = ByteEncoding.Raw): Column =
    expr2col(FieldHash(cols.map(col2expr), algo, seed, encoding))

  /** FarmHash fingerprint64 — BigQuery FARM_FINGERPRINT-compatible on
    * string/bytes input (ratatool-sampling/README.md contract). */
  def farmHash64(cols: Column*): Column = fieldHash(cols, "farm", None)

  /** Seeded guava murmur3_128 (low 64 bits). */
  def murmur128(seed: Int, cols: Column*): Column = fieldHash(cols, "murmur", Some(seed))

  /** Affine map Long → [0, 1], the reference's `boundLong`
    * (BigSampler.scala:74-75). Pure column arithmetic — codegen'd. */
  def boundLong(hash: Column): Column =
    (hash.cast("double") - lit(Long.MinValue.toDouble)) /
      lit(Long.MaxValue.toDouble - Long.MinValue.toDouble)

  /** Deterministic dice in [0,1] from hashed fields: the composition the
    * reference calls `diceElement` (BigSampler.scala:83-90). */
  def hashDice(fields: Seq[Column], algo: String = "farm", seed: Option[Int] = None,
               encoding: ByteEncoding = ByteEncoding.Raw): Column =
    boundLong(fieldHash(fields, algo, seed, encoding))

  /** Cosine distance 1 − cos_sim over two numeric arrays
    * (reference Diffy.scala:168-184). Null on length mismatch/zero norm. */
  def cosineDistance(l: Column, r: Column): Column =
    expr2col(CosineDistance(col2expr(l), col2expr(r)))

  /** Order-preserving double → long sort key (IEEE-754 bit trick; see
    * [[graft.functions.DoubleOrderBits]]): monotone in the input, its
    * high bits are a distribution-free histogram key. */
  def doubleOrderBits(c: Column): Column =
    expr2col(DoubleOrderBits(col2expr(c)))

  /** MinHash signature over shingles (array<string>, or array<long> of
    * pre-hashed shingles from [[shingleHashes]]) → array<long>. */
  def minhash(shingles: Column, numHashes: Int = 64, seed: Int = 0): Column =
    expr2col(MinHashSignature(col2expr(shingles), numHashes, seed))

  /** Sorted distinct n-gram shingle hashes of a normalized string:
    * string → array<long>. Lowercases and squeezes whitespace first. One
    * pass, no string arrays anywhere — composes with [[minhash]] and
    * [[jaccardSorted]]. */
  def shingleHashes(text: Column, n: Int = 5, seed: Long = 0L): Column =
    expr2col(ShingleHashes(
      col2expr(lower(regexp_replace(text, "\\s+", " "))), n, seed))

  /** 64-bit SimHash: array<string> of tokens, or a raw string (one-pass
    * whitespace tokenize+hash+vote fast path) → long. */
  def simhash(tokens: Column, seed: Int = 0): Column =
    expr2col(SimHash64(col2expr(tokens), seed))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(l: Column, r: Column): Column = bit_count(l.bitwiseXOR(r))

  /** LSH sign-pattern bucket id of a numeric vector under the given
    * hyperplanes: one pass over the vector for all bits. */
  def lshSignBits(vec: Column, planes: Array[Array[Double]]): Column =
    expr2col(LshSignBits(col2expr(vec), planes.map(_.toSeq).toSeq))

  /** Dot products of a numeric array against a driver-embedded plane
    * table (`array<double>` out) — the JL random-projection kernel. */
  def projectPlanes(vec: Column, planes: Array[Array[Double]]): Column =
    expr2col(ProjectPlanes(col2expr(vec), planes.map(_.toSeq).toSeq))

  /** Exact Jaccard of two sorted distinct long arrays (one-pass merge). */
  def jaccardSorted(l: Column, r: Column): Column =
    expr2col(JaccardSorted(col2expr(l), col2expr(r)))

  /** [[jaccardSorted]] with EARLY ABANDONMENT against a threshold: the
    * exact Jaccard when ≥ `tau`, NULL otherwise — the walk stops the
    * moment the pair can no longer reach `tau`. The verification kernel
    * for high-volume exact SSJoin, where almost every candidate is a
    * non-match that abandons within the first few steps. */
  def jaccardSortedAtLeast(l: Column, r: Column, tau: Double): Column =
    expr2col(JaccardSortedAtLeast(col2expr(l), col2expr(r),
      org.apache.spark.sql.catalyst.expressions.Literal(tau)))

  /** The `nprobe` nearest centroid indices of a vector, most-similar
    * first. "cosine" (IVF coarse assignment) or "l2" (Euclidean argmin —
    * the PQ codebook metric; zero vectors assign instead of nulling). */
  def nearestCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int,
                   metric: String = "cosine"): Column =
    expr2col(NearestCells(col2expr(vec), centroids.map(_.toSeq).toSeq, nprobe, metric))

  /** Sorted distinct 64-bit hashes of an array of strings — the compact
    * set representation `jaccardSorted` consumes. Built from codegen'd
    * built-ins (xxhash64 inside transform). */
  def hashedSet(arr: Column): Column =
    array_sort(array_distinct(transform(arr, s => xxhash64(s))))

  /** Character n-gram shingles of a normalized string: string → array<string>.
    * Lowercases and squeezes whitespace first so near-dup shingling is
    * robust to formatting. Built entirely from codegen'd built-ins. */
  def shingles(text: Column, n: Int = 5): Column = {
    val norm = lower(regexp_replace(text, "\\s+", " "))
    val ids = sequence(lit(0), greatest(length(norm) - n, lit(0)))
    array_distinct(transform(ids, i => substring(norm, i + lit(1), lit(n))))
  }

  /** Whitespace tokens of a string: string → array<string>. Blind to
    * no-whitespace scripts (a CJK document is ONE token) — curation
    * operators use [[scriptTokens]]; this stays for callers that want the
    * raw whitespace semantics. */
  def whitespaceTokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Script-aware tokens ([[graft.functions.ScriptTokens]]): whitespace
    * tokens, with every Han/Hiragana/Katakana/Thai code point further
    * emitted as its own token (character-unigram segmentation — the
    * standard heuristic for scripts written without inter-word spaces).
    * Identical to [[whitespaceTokens]] on text containing none of those
    * scripts. A fused one-pass codegen'd expression
    * ([[graft.functions.ScriptTokensExpr]]) — token-identical to
    * `regexp_extract_all(text, ScriptTokens.JavaPattern, 0)` without the
    * regex engine's per-row cost. */
  def scriptTokens(text: Column): Column =
    expr2col(graft.functions.ScriptTokensExpr(col2expr(text)))
}
