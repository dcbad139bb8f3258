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
