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
}
