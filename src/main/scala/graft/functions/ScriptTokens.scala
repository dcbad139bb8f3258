package graft.functions

/** Script-aware word segmentation shared by every curation operator.
  *
  * Whitespace splitting silently breaks on scripts written WITHOUT
  * inter-word whitespace — a Chinese/Japanese/Thai document is ONE
  * "word" under `split('\s+')`, so word-count filters reject it, BPE
  * memorizes whole sentences as single types, and unigram LMs collapse.
  * The standard heuristic fix (CCNet / multilingual corpus tooling) is
  * character-unigram segmentation for those scripts: split on
  * whitespace as before, and additionally emit every Han / Hiragana /
  * Katakana / Thai CODE POINT as its own token. On text containing none
  * of those scripts the result is exactly the whitespace tokenization,
  * so ASCII corpora see bit-identical behavior.
  *
  * One regex, two engines: the pattern alternates "one no-space-script
  * code point" with "a maximal run of anything else that is not
  * whitespace and not a no-space-script code point". `JavaPattern` (Java
  * `\p{IsXxx}` script classes) drives the Catalyst `regexp_extract_all`
  * and the JVM-side splitter below — the SAME java.util.regex engine, so
  * they cannot diverge. `Re2Pattern` is the RE2 twin (`\p{Xxx}`) a SQL
  * oracle uses; both engines implement Unicode script properties, and
  * the `cjk_curation` gate proves value-equality on mixed-script text.
  */
object ScriptTokens {

  private val JavaNoSpace =
    "\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsThai}"
  private val Re2NoSpace =
    "\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Thai}"

  /** Java-regex form — used by Catalyst `regexp_extract_all` and
    * [[split]]. */
  val JavaPattern: String = s"[$JavaNoSpace]|[^\\s$JavaNoSpace]+"

  /** RE2 form of [[JavaPattern]] for SQL oracles. */
  val Re2Pattern: String = s"[$Re2NoSpace]|[^\\s$Re2NoSpace]+"

  /** [[JavaPattern]] with an optional trailing `\n` captured into the
    * token — the BPE word-unit form. Run it over [[normalizeForBpe]]'d
    * text (whitespace runs collapsed to single `\n`, one appended at the
    * end): a token that absorbed a `\n` was followed by whitespace (or
    * ended the text), so the end-of-word marker becomes part of the word
    * STRING and decoding reproduces exactly the original word
    * boundaries — including the absence of spaces between adjacent
    * no-space-script tokens. */
  val JavaBoundaryPattern: String =
    s"(?:[$JavaNoSpace]|[^\\s$JavaNoSpace]+)\\n?"

  /** RE2 form of [[JavaBoundaryPattern]]. */
  val Re2BoundaryPattern: String =
    s"(?:[$Re2NoSpace]|[^\\s$Re2NoSpace]+)\\n?"

  private val compiled = java.util.regex.Pattern.compile(JavaPattern)
  private val compiledBoundary =
    java.util.regex.Pattern.compile(JavaBoundaryPattern)

  private def findAll(p: java.util.regex.Pattern,
                      s: String): Array[String] = {
    if (s == null) return null
    val m = p.matcher(s)
    val b = Array.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** JVM twin of the Catalyst `regexp_extract_all(text, JavaPattern)`:
    * same engine, same pattern, bit-identical tokens. Null in, null out. */
  def split(s: String): Array[String] = findAll(compiled, s)

  /** Whitespace-run collapse + terminal marker for the BPE word-unit
    * tokenization (JVM twin of the Catalyst form in
    * [[graft.ext.Bpe.boundaryTokens]]). */
  def normalizeForBpe(s: String): String =
    if (s == null) null else s.replaceAll("\\s+", "\n") + "\n"

  /** BPE word units of a text: script tokens where each token carries a
    * trailing `\n` marker iff it was followed by whitespace or ended the
    * text. Null in, null out; whitespace-only in, empty out. */
  def splitWithBoundaries(s: String): Array[String] =
    findAll(compiledBoundary, normalizeForBpe(s))

  // ---------------------------------------------------------------------
  // Fused single-pass splitter — the regex-free twin of [[JavaPattern]].
  //
  // `regexp_extract_all` over the alternation costs a java.util.regex
  // backtracking scan plus one Matcher group per token; on ASCII corpora
  // (the overwhelming hot path) that taxed every curation operator
  // 2–3× vs the whitespace split it replaced. The pattern's semantics,
  // though, are a trivial one-pass state machine: a match starting at a
  // no-space-script code point is that single code point; a match
  // starting anywhere else is the maximal run of non-whitespace,
  // non-no-space-script code points; whitespace separates matches. This
  // hand-rolled scan reproduces the regex token-for-token (spec-locked
  // against `split` on mixed corpora, incl. supplementary-plane Han) at
  // memchr-like speed, and `ScriptTokensExpr.doGenCode` calls it from
  // inside whole-stage codegen.
  // ---------------------------------------------------------------------

  /** Java-regex `\s` under default flags: ASCII whitespace only
    * (`[ \t\n\x0B\f\r]` = 0x09–0x0D plus space). Unicode spaces such as
    * U+00A0 are NOT whitespace to the pattern, and so not here. */
  @inline private def isAsciiWs(cp: Int): Boolean =
    cp == ' ' || (cp >= '\t' && cp <= '\r')

  /** One code point of `[\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsThai}]`.
    * Consults the same `Character.UnicodeScript` tables java.util.regex's
    * `\p{IsXxx}` classes use, so parity with the pattern is structural,
    * not coincidental. Everything below U+0E00 — Thai's block floor, the
    * lowest code point of the four scripts — short-circuits before the
    * binary-search script lookup: ASCII and Latin text never pays it. */
  @inline private def isNoSpaceScript(cp: Int): Boolean =
    cp >= 0x0E00 && {
      val sc = Character.UnicodeScript.of(cp)
      (sc eq Character.UnicodeScript.HAN) ||
        (sc eq Character.UnicodeScript.HIRAGANA) ||
        (sc eq Character.UnicodeScript.KATAKANA) ||
        (sc eq Character.UnicodeScript.THAI)
    }

  /** Token-for-token twin of [[split]] without the regex engine.
    * Null in, null out. */
  def fusedSplit(s: String): Array[String] = {
    if (s == null) return null
    val n = s.length
    val out = Array.newBuilder[String]
    var i = 0
    var runStart = -1 // start of the current non-ws, non-script run
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (isAsciiWs(cp)) {
        if (runStart >= 0) { out += s.substring(runStart, i); runStart = -1 }
      } else if (isNoSpaceScript(cp)) {
        if (runStart >= 0) { out += s.substring(runStart, i); runStart = -1 }
        out += s.substring(i, i + w)
      } else if (runStart < 0) {
        runStart = i
      }
      i += w
    }
    if (runStart >= 0) out += s.substring(runStart, n)
    out.result()
  }

  /** [[fusedSplit]] over Tungsten types — the entry point
    * `ScriptTokensExpr`'s generated code calls. */
  def fusedArray(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = fusedSplit(u.toString)
    val arr = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) {
      arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(toks(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}
