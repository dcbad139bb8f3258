package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScriptTokensSpec extends SparkSpec {
  import spark.implicits._

  // the same fixtures the DuckDB RE2 twin was validated against
  private val cases: Seq[(String, Seq[String])] = Seq(
    ("Hello world this is english",
      Seq("Hello", "world", "this", "is", "english")),
    ("你好世界", Seq("你", "好", "世", "界")),
    ("これは日本語のテスト",
      Seq("こ", "れ", "は", "日", "本", "語", "の", "テ", "ス", "ト")),
    ("สวัสดีชาวโลก",
      Seq("ส", "ว", "ั", "ส", "ด", "ี", "ช", "า", "ว", "โ", "ล", "ก")),
    ("Hello你好world", Seq("Hello", "你", "好", "world")),
    ("mixed 你好 text ひら and ไทย",
      Seq("mixed", "你", "好", "text", "ひ", "ら", "and", "ไ", "ท", "ย")),
    ("a,b c.d", Seq("a,b", "c.d")),
    ("  leading and trailing  ", Seq("leading", "and", "trailing")),
    ("", Seq.empty))

  behavior of "ScriptTokens.split"

  it should "segment whitespace words and per-code-point CJK/Thai runs" in {
    cases.foreach { case (text, want) =>
      withClue(s"'$text': ") {
        ScriptTokens.split(text).toSeq shouldBe want
      }
    }
    ScriptTokens.split(null) shouldBe null
  }

  it should "equal whitespaceTokens on text without no-space scripts" in {
    val texts = Seq("plain old text", "a,b;c d", " x ", "", "one")
    val df = texts.toDF("text")
      .select(graft.GraftFunctions.whitespaceTokens(col("text")).as("ws"),
        graft.GraftFunctions.scriptTokens(col("text")).as("st"))
    df.collect().foreach { r =>
      r.getSeq[String](1) shouldBe r.getSeq[String](0)
    }
  }

  behavior of "GraftFunctions.scriptTokens"

  it should "match the JVM splitter bit-for-bit (same regex engine)" in {
    val df = cases.map(_._1).toDF("text")
      .select(col("text"), graft.GraftFunctions.scriptTokens(col("text")).as("t"))
    df.collect().foreach { r =>
      r.getSeq[String](1).toSeq shouldBe
        ScriptTokens.split(r.getString(0)).toSeq
    }
  }

  behavior of "ScriptTokens.fusedSplit"

  it should "equal the regex splitter token-for-token on adversarial fixtures" in {
    // supplementary-plane Han (U+20000, a surrogate pair in UTF-16), NBSP
    // (U+00A0: Unicode space but NOT java-regex \s), vertical tab / form
    // feed (ASCII \s), combining marks, lone CJK at string edges
    val fixtures = cases.map(_._1) ++ Seq(
      "𠀀前after𠀀", // U+20000 Han between words
      "a b",                         // NBSP joins, does not split
      "xyz",                  // \x0B and \f DO split
      "你", "好world你", " 你 ", "\t\n你好\r\n",
      "étude café",            // combining acute, precomposed é
      "ไทยแท้ๆ 100%", "ｶﾀｶﾅhalf-width", // halfwidth katakana IS Katakana script
      "㐀㿿䶵", "一twoー三")               // CJK ext A edges; ー is Katakana
    fixtures.foreach { s =>
      withClue(s"'$s': ") {
        ScriptTokens.fusedSplit(s).toSeq shouldBe ScriptTokens.split(s).toSeq
      }
    }
    ScriptTokens.fusedSplit(null) shouldBe null
  }

  it should "equal the regex splitter on 500 random mixed-script strings" in {
    val rnd = new scala.util.Random(42)
    val pool: IndexedSeq[String] = IndexedSeq(
      "word", "a", "Zt9", ",.;!", " ", "  ", "\t", "\n", "\r\n", "",
      " ", "　", // ideographic space: not \s, not a no-space script
      "你", "好世", "ひら", "カタ", "ー", "ไท", "ย",
      "𠀀", // U+20000 supplementary Han
      "😀", // emoji (non-script, non-ws)
      "é", "é", "ß", "Ω")
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(40)).map(_ => pool(rnd.nextInt(pool.size))).mkString
      withClue(s"'$s': ") {
        ScriptTokens.fusedSplit(s).toSeq shouldBe ScriptTokens.split(s).toSeq
      }
    }
  }

  it should "match the regex form through Catalyst (codegen path) on mixed rows" in {
    // CODEGEN_ONLY: without this pin, a Janino compile error in
    // ScriptTokensExpr.doGenCode would silently fall back to the
    // interpreted nullSafeEval and this test would still pass — the
    // factory mode makes a broken codegen path fail loudly instead
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try runCatalystParity()
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  private def runCatalystParity(): Unit = {
    val texts = cases.map(_._1) ++ Seq("𠀀前after", "a b 你好")
    val df = texts.toDF("text").select(
      col("text"),
      graft.GraftFunctions.scriptTokens(col("text")).as("fused"),
      regexp_extract_all(col("text"), lit(ScriptTokens.JavaPattern), lit(0)).as("re"))
    df.collect().foreach { r =>
      withClue(s"'${r.getString(0)}': ") {
        r.getSeq[String](1) shouldBe r.getSeq[String](2)
      }
    }
  }

  behavior of "ScriptTokens.splitWithBoundaries"

  it should "mark exactly the whitespace-final units" in {
    ScriptTokens.splitWithBoundaries("hello world").toSeq shouldBe
      Seq("hello\n", "world\n")
    ScriptTokens.splitWithBoundaries("你好 world").toSeq shouldBe
      Seq("你", "好\n", "world\n")
    ScriptTokens.splitWithBoundaries("Hello你好world").toSeq shouldBe
      Seq("Hello", "你", "好", "world\n")
    ScriptTokens.splitWithBoundaries("  a  b  ").toSeq shouldBe
      Seq("a\n", "b\n")
    ScriptTokens.splitWithBoundaries("").toSeq shouldBe Seq.empty
    ScriptTokens.splitWithBoundaries(null) shouldBe null
  }

  it should "match the Catalyst boundaryTokens column" in {
    val texts = cases.map(_._1) ++ Seq("你好 世界", "a\nb\tc", "  x  ")
    val df = texts.toDF("text")
      .select(col("text"), graft.ext.Bpe.boundaryTokens(col("text")).as("t"))
    df.collect().foreach { r =>
      r.getSeq[String](1).toSeq shouldBe
        ScriptTokens.splitWithBoundaries(r.getString(0)).toSeq
    }
  }
}
