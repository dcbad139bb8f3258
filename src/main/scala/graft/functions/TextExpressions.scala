package graft.functions

import com.google.common.hash.Hashing
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a bag of shingles: `array<string> -> array<long>`.
  *
  * Each shingle is hashed ONCE with murmur3_128; the two 64-bit halves
  * (a, b) generate the `numHashes` families as affine combinations
  * `h_k = a + (k+1)·b` with b forced odd (Carter-Wegman style universal
  * family — the standard one-hash MinHash construction, ~64× cheaper in
  * the scan than per-family re-hashing; cf. Broder '97). Partition-local,
  * no shuffle: the LSH dedup built on top groups by BAND hash, never
  * comparing all pairs. Null/empty input -> null signature.
  *
  * This is an engine extension beyond the reference (which has no dedup);
  * designed per the brief's shingle→minhash→band→bucket-join pipeline.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType | LongType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType | LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"numHashes must be positive, got $numHashes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash expects array<string> or array<bigint>, got ${other.catalogString}")
  }

  @transient private lazy val elementIsLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  import Mix.mix64

  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])

  /** The signature kernel, shared verbatim by eval and the generated
    * code (referenced through `this`): the per-row loop is a JVM kernel
    * either way — the codegen win is keeping the enclosing scan stage
    * fused (no CodegenFallback row boxing of the shingle arrays). */
  private[functions] def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        var a = 0L; var b = 0L
        if (elementIsLong) {
          // pre-hashed shingles (ShingleHashes): derive the affine pair by
          // remixing — no byte hashing at all
          a = mix64(arr.getLong(i) ^ (seed * 0x9e3779b97f4a7c15L))
          b = mix64(a)
        } else {
          val bytes = arr.getUTF8String(i).getBytes
          val h = Hashing.murmur3_128(seed).hashBytes(bytes).asBytes()
          var j = 0
          while (j < 8) { // little-endian halves of the 128-bit digest
            a |= (h(j) & 0xffL) << (8 * j)
            b |= (h(j + 8) & 0xffL) << (8 * j)
            j += 1
          }
        }
        b |= 1L // odd multiplier => full-period affine family mod 2^64
        var k = 0
        var hk = a
        while (k < numHashes) {
          hk += b
          if (hk < sig(k)) sig(k) = hk
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("minhash", this,
      "graft.functions.MinHashSignature")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $self.kernel($c);
      |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a bag of tokens: `array<string> | string -> long`.
  *
  * Classic Charikar '02 scheme: each token's 64-bit hash votes +1/-1 per
  * bit position; the sign of each accumulated position forms the
  * fingerprint. Near-duplicate docs differ in few bits (small Hamming
  * distance). Partition-local; candidate pairing at scale is done by
  * banding the 64 bits into chunks and grouping on chunk equality
  * (pigeonhole).
  *
  * STRING input is the fast path: whitespace tokenization, hashing
  * (mult-31 fold + splitmix64 finalizer), and voting happen in ONE pass
  * over the characters — no token array materialization, no per-token
  * allocations. ARRAY input keeps the original murmur-per-token semantics
  * for callers that tokenize themselves; the two paths produce different
  * (both valid) fingerprint families.
  */
case class SimHash64(child: Expression, seed: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<string> or string, got ${other.catalogString}")
  }

  @transient private lazy val stringInput: Boolean = child.dataType == StringType

  import Mix.mix64

  private def vote(votes: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
  }

  private def collapse(votes: Array[Int]): Long = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any =
    if (stringInput) evalString(v.asInstanceOf[UTF8String].toString)
    else evalArray(v.asInstanceOf[ArrayData])

  /** Boxed-result kernels for the generated code (null = no tokens);
    * same bodies as eval, referenced through `this`. */
  private[functions] def kernelString(s: UTF8String): java.lang.Long =
    evalString(s.toString).asInstanceOf[java.lang.Long]
  private[functions] def kernelArray(a: ArrayData): java.lang.Long =
    evalArray(a).asInstanceOf[java.lang.Long]

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("simhash", this, "graft.functions.SimHash64")
    val kernel = if (stringInput) "kernelString" else "kernelArray"
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("simhashBoxed")
      s"""
         |java.lang.Long $tmp = $self.$kernel($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  private def evalString(s: String): Any = {
    val votes = new Array[Int](64)
    val seedMix = seed.toLong * 0x9e3779b97f4a7c15L
    var h = 0L
    var tokLen = 0
    var tokens = 0
    var i = 0
    while (i <= s.length) {
      val ws = i == s.length || Character.isWhitespace(s.charAt(i))
      if (ws) {
        if (tokLen > 0) { vote(votes, mix64(h ^ seedMix)); tokens += 1 }
        h = 0L; tokLen = 0
      } else {
        h = h * 31L + s.charAt(i); tokLen += 1
      }
      i += 1
    }
    if (tokens == 0) null else collapse(votes)
  }

  private def evalArray(arr: ArrayData): Any = {
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        vote(votes, Hashing.murmur3_128(seed)
          .hashBytes(arr.getUTF8String(i).getBytes).asLong())
      }
      i += 1
    }
    collapse(votes)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact Jaccard similarity of two SORTED distinct long arrays:
  * `array<long> × array<long> -> double`, one-pass merge walk — far cheaper
  * than generic array_intersect/array_union on string arrays when pair
  * volume is high (near-dup verification at scale). Inputs are expected
  * sorted ascending and duplicate-free (array_sort ∘ array_distinct);
  * null input -> null; two empty arrays -> null.
  */
case class JaccardSorted(left: Expression, right: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted expects two array<bigint>, got ${l.catalogString} / ${r.catalogString}")
    }

  override def eval(input: InternalRow): Any = {
    val lv = left.eval(input)
    if (lv == null) return null
    val rv = right.eval(input)
    if (rv == null) return null
    JaccardSorted.kernel(lv.asInstanceOf[ArrayData], rv.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val lG = left.genCode(ctx); val rG = right.genCode(ctx)
    val tmp = ctx.freshName("jacBoxed")
    // right evaluated only under left's non-null guard, matching eval's
    // short-circuit; the merge walk itself stays a static JVM kernel —
    // the codegen win is keeping the pair-verify stage fused
    ev.copy(code = code"""
      |${lG.code}
      |boolean ${ev.isNull} = true;
      |double ${ev.value} = 0.0;
      |if (!${lG.isNull}) {
      |  ${rG.code}
      |  if (!${rG.isNull}) {
      |    java.lang.Double $tmp =
      |      graft.functions.JaccardSorted.kernel(${lG.value}, ${rG.value});
      |    if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp.doubleValue(); }
      |  }
      |}
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object JaccardSorted {
  /** One-pass merge walk; null for two empty arrays (the expression's
    * null contract), boxed so the generated code can branch on it. */
  def kernel(la: ArrayData, ra: ArrayData): java.lang.Double = {
    val n = la.numElements(); val m = ra.numElements()
    if (n == 0 && m == 0) return null
    var i = 0; var j = 0; var inter = 0L
    while (i < n && j < m) {
      val x = la.getLong(i); val y = ra.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(inter.toDouble / (n + m - inter).toDouble)
  }
}

/** Threshold-aware [[JaccardSorted]]: `array<long> × array<long> ->
  * double?`, returning the exact Jaccard when it is ≥ `threshold` and
  * NULL otherwise — with EARLY ABANDONMENT inside the merge walk. At
  * every step the best still-reachable intersection is
  * `inter + min(remaining_l, remaining_r)`; once it drops below the
  * minimum intersection that can reach the threshold, the walk stops.
  * On high-volume verification (70M+ candidate pairs of which <0.1%
  * qualify, the exact-SSJoin regime) most walks abandon in the first
  * ~(1−τ)·|A| steps instead of walking both arrays to the end — the
  * difference between verification being the bottleneck and not.
  * Exactness: the integer abandonment bound `minInter` is calibrated
  * against the SAME double comparison `inter/(n+m−inter) ≥ τ` the
  * unabandoned walk would finish with, so (filter on non-null result)
  * ≡ (jaccardSorted ≥ τ) row for row. `threshold` must be a foldable
  * non-null double in [0, 1]. */
case class JaccardSortedAtLeast(left: Expression, right: Expression,
                                threshold: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(left, right, threshold)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType, threshold.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), DoubleType)
        if threshold.foldable => TypeCheckResult.TypeCheckSuccess
      case (l, r, t) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted_at_least expects two array<bigint> and a foldable " +
          s"double threshold, got ${l.catalogString} / ${r.catalogString} / " +
          s"${t.catalogString}${if (!threshold.foldable) " (non-foldable)" else ""}")
    }

  @transient private lazy val tau: Double = {
    val v = threshold.eval(null)
    require(v != null, "jaccard_sorted_at_least threshold must be non-null")
    val d = v.asInstanceOf[Double]
    require(d >= 0.0 && d <= 1.0,
      s"jaccard_sorted_at_least threshold must be in [0,1], got $d")
    d
  }

  override def eval(input: InternalRow): Any = {
    val lv = left.eval(input)
    if (lv == null) return null
    val rv = right.eval(input)
    if (rv == null) return null
    kernel(lv.asInstanceOf[ArrayData], rv.asInstanceOf[ArrayData])
  }

  /** The abandoning walk, shared by eval and the generated code (boxed
    * result: null = below threshold / null contract). */
  private[functions] def kernel(la: ArrayData, ra: ArrayData): java.lang.Double = {
    val n = la.numElements(); val m = ra.numElements()
    if (n == 0 && m == 0) return null
    // smallest integer intersection that satisfies the double-precision
    // acceptance test inter/(n+m-inter) >= tau — derived algebraically,
    // then nudged so it agrees with the EXACT comparison the plain walk
    // uses (double rounding at the boundary must not flip a verdict)
    var minInter = math.ceil(tau * (n + m) / (1.0 + tau)).toLong
    while (minInter > 0 &&
      (minInter - 1).toDouble / (n + m - (minInter - 1)).toDouble >= tau)
      minInter -= 1
    while (minInter <= math.min(n, m) &&
      minInter.toDouble / (n + m - minInter).toDouble < tau)
      minInter += 1
    if (minInter > math.min(n, m)) return null // size-incompatible
    var i = 0; var j = 0; var inter = 0L
    while (i < n && j < m) {
      if (inter + math.min(n - i, m - j) < minInter) return null // abandon
      val x = la.getLong(i); val y = ra.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (inter >= minInter)
      java.lang.Double.valueOf(inter.toDouble / (n + m - inter).toDouble)
    else null
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("jaccardAtLeast", this,
      "graft.functions.JaccardSortedAtLeast")
    val lG = left.genCode(ctx); val rG = right.genCode(ctx)
    val tmp = ctx.freshName("jacBoxed")
    // threshold is foldable and folded into the instance's lazy tau; the
    // generated code never evaluates it as a child
    ev.copy(code = code"""
      |${lG.code}
      |boolean ${ev.isNull} = true;
      |double ${ev.value} = 0.0;
      |if (!${lG.isNull}) {
      |  ${rG.code}
      |  if (!${rG.isNull}) {
      |    java.lang.Double $tmp = $self.kernel(${lG.value}, ${rG.value});
      |    if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp.doubleValue(); }
      |  }
      |}
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1),
      threshold = newChildren(2))
}

/** Character n-gram shingle hashes: `string -> array<long>`, SORTED and
  * DISTINCT. One pass over the string: each n-char window is folded with a
  * multiplicative hash and finalized with the splitmix64 mixer; the hash
  * set is dedup'd by sort+unique, so the output composes directly with
  * [[JaccardSorted]] and [[MinHashSignature]] without any string-array
  * array_distinct (which is O(n²) per row for non-primitive element types).
  * Input is expected pre-normalized (lowercase, squeezed whitespace) by the
  * caller. Null input or strings shorter than n -> null.
  */
case class ShingleHashes(child: Expression, n: Int, seed: Long)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"n must be positive, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.fromUTF8(v.asInstanceOf[UTF8String], n, seed)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    // a static call like ScriptTokensExpr: the rolling-hash kernel is JVM
    // code either way, the win is the fused scan stage (shingling anchors
    // every minhash/banding pass over the corpus)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.ShingleHashes.fromUTF8($c, $n, ${seed}L);
      |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** JVM-side kernels sharing [[ShingleHashes]]'s exact hash arithmetic, so
  * driver/executor code (broadcast-set membership probes, UDF rewrites)
  * can interoperate bit-for-bit with columns the expression produced.
  * The window hash is maintained by the base-31 ROLLING recurrence —
  * O(len) total instead of O(len·n) re-hashing per position — which is
  * bit-exact with the Horner loop because both evaluate the same
  * polynomial `seed·31^n + Σ c_i·31^k` in wrapping Long arithmetic.
  */
object ShingleHashes {
  import Mix.mix64

  /** [[sortedDistinct]] wrapped for the expression contract (ArrayData or
    * null) — the form both eval and the generated code call. */
  def fromUTF8(s: UTF8String, n: Int, seed: Long): ArrayData = {
    val hs = sortedDistinct(s.toString, n, seed)
    if (hs == null) null else new GenericArrayData(hs)
  }

  /** Streams the mix64'd hash of every n-char window of `s` to `f` in
    * text order, short-circuiting as soon as `f` returns true; returns
    * whether any call did. Null/short input streams nothing. */
  def anyWindow(s: String, n: Int, seed: Long)(f: Long => Boolean): Boolean = {
    if (s == null) return false
    val len = s.length
    if (len < n) return false
    var pm1 = 1L // 31^(n-1), wrapping
    var j = 0
    while (j < n - 1) { pm1 *= 31L; j += 1 }
    val sn = seed * pm1 * 31L // the constant seed·31^n term of every window
    var h = seed
    j = 0
    while (j < n) { h = h * 31L + s.charAt(j); j += 1 }
    if (f(mix64(h))) return true
    var p = h - sn // char-polynomial part, rolled forward window by window
    val m = len - n + 1
    var i = 1
    while (i < m) {
      p = (p - s.charAt(i - 1) * pm1) * 31L + s.charAt(i + n - 1)
      if (f(mix64(sn + p))) return true
      i += 1
    }
    false
  }

  /** All window hashes of `s`, SORTED and DISTINCT (the expression's
    * output contract). Null/short input -> null. */
  def sortedDistinct(s: String, n: Int, seed: Long): Array[Long] = {
    if (s == null || s.length < n) return null
    val m = s.length - n + 1
    val hs = new Array[Long](m)
    var idx = 0
    anyWindow(s, n, seed) { h => hs(idx) = h; idx += 1; false }
    java.util.Arrays.sort(hs)
    var out = 1
    var k = 1
    while (k < m) {
      if (hs(k) != hs(k - 1)) { hs(out) = hs(k); out += 1 }
      k += 1
    }
    java.util.Arrays.copyOf(hs, out)
  }
}

/** Script-aware tokenization `string -> array<string>`: whitespace words,
  * with every Han/Hiragana/Katakana/Thai code point further emitted as its
  * own token (character-unigram segmentation — the standard heuristic for
  * scripts written without inter-word spaces; see
  * [[graft.functions.ScriptTokens]]).
  *
  * Token-for-token identical to
  * `regexp_extract_all(text, ScriptTokens.JavaPattern, 0)` — the form it
  * replaced in the curation hot path — but runs the fused one-pass scan
  * ([[ScriptTokens.fusedSplit]]) instead of the regex engine: ASCII
  * corpora return to whitespace-split speed, CJK keeps exact semantics.
  * Generates real code (a static call), so the surrounding whole-stage
  * codegen span stays intact — no CodegenFallback row boxing.
  */
case class ScriptTokensExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"script_tokens expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ScriptTokens.fusedArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ScriptTokens.fusedArray($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
