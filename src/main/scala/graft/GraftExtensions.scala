package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface of the engine's custom expression family, registered
  * through `SparkSessionExtensions` (enable with
  * `spark.sql.extensions=graft.GraftExtensions`):
  *
  * {{{
  *   SELECT farm_hash64(col1, col2),
  *          cosine_distance(v1, v2),
  *          shingle_hashes(text, 5),
  *          minhash(shingle_hashes(text, 5), 64),
  *          simhash(text),
  *          jaccard_sorted(a, b)
  * }}}
  *
  * Numeric parameters (shingle n, numHashes, seeds) arrive as SQL literal
  * arguments and are folded into the expression at registration time —
  * mirroring how Spark's own parameterized expressions take literals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {

  /** Late registration on an already-built session (extensions only apply
    * at construction time): `GraftExtensions.registerAll(spark)`. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, id, info, builder)
    }

  private def intArg(e: Expression, name: String, default: Option[Int] = None): Int =
    e match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case _ => default.getOrElse(
        throw new IllegalArgumentException(s"$name must be an integer literal"))
    }

  private[graft] lazy val functions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    val out = Seq.newBuilder[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)]
    def register(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      out += ((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))

    register("farm_hash64",
      "farm_hash64(cols...) - guava farmHashFingerprint64 of the folded fields") {
      args => FieldHash(args, "farm", None, ByteEncoding.Raw)
    }
    register("murmur128",
      "murmur128(seed, cols...) - seeded guava murmur3_128 low 64 bits") {
      args => FieldHash(args.tail, "murmur",
        Some(intArg(args.head, "seed")), ByteEncoding.Raw)
    }
    register("cosine_distance",
      "cosine_distance(a, b) - 1 - cosine similarity of two numeric arrays") {
      args => CosineDistance(args(0), args(1))
    }
    register("shingle_hashes",
      "shingle_hashes(text[, n]) - sorted distinct n-gram shingle hashes") {
      args => ShingleHashes(args.head,
        if (args.size > 1) intArg(args(1), "n") else 5, 0L)
    }
    register("minhash",
      "minhash(shingles[, numHashes[, seed]]) - minhash signature") {
      args => MinHashSignature(args.head,
        if (args.size > 1) intArg(args(1), "numHashes") else 64,
        if (args.size > 2) intArg(args(2), "seed") else 0)
    }
    register("simhash",
      "simhash(text_or_tokens[, seed]) - 64-bit simhash fingerprint") {
      args => SimHash64(args.head,
        if (args.size > 1) intArg(args(1), "seed") else 0)
    }
    register("double_order_bits",
      "double_order_bits(x) - order-preserving IEEE-754 double -> int64 key") {
      args => DoubleOrderBits(args.head)
    }
    register("jaccard_sorted",
      "jaccard_sorted(a, b) - exact jaccard of two sorted long arrays") {
      args => JaccardSorted(args(0), args(1))
    }
    register("script_tokens",
      "script_tokens(text) - whitespace words plus per-code-point tokens " +
        "for no-whitespace scripts (Han/Kana/Thai/...)") {
      args => ScriptTokensExpr(args.head)
    }
    out.result()
  }
}
