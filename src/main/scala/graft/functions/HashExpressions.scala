package graft.functions

import com.google.common.hash.{HashFunction, Hasher, Hashing}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** How binary values are fed to the hash funnel.
  *
  * Mirrors the reference's `--byteEncoding` axis
  * (ratatool-sampling/.../util/ByteHasher.scala:24-71): RAW puts the bytes
  * directly, HEX/BASE64 re-encode them as strings first so the hash matches
  * what BigQuery `TO_HEX`/`TO_BASE64` pipelines would produce.
  */
sealed trait ByteEncoding
object ByteEncoding {
  case object Raw extends ByteEncoding
  case object Hex extends ByteEncoding
  case object Base64 extends ByteEncoding
  def fromString(s: String): ByteEncoding = s.toLowerCase match {
    case "raw"    => Raw
    case "hex"    => Hex
    case "base64" => Base64
    case other    => throw new IllegalArgumentException(s"unknown byte encoding: $other")
  }
}

/** Deterministic multi-field fingerprint as a native Catalyst expression.
  *
  * Re-expression of the reference's hasher protocol
  * (ratatool-sampling/.../BigSamplerAvro.scala:126-185, util/Util.scala:89-98):
  * selected fields are folded into one guava `Hasher` in argument order with
  * type-directed puts — ints widened to long (BigSamplerAvro.scala:173-174, to
  * stay consistent with BigQuery INT64), strings as UTF-8, enums by name,
  * nulls silently skipped (BigSamplerAvro.scala:138-143), arrays element-wise,
  * nested structs recursed, and an optional seed prepended as `putInt` for
  * FarmHash (Util.scala:94-97). The null-skip is a preserved parity trap:
  * because a null contributes NO bytes (no position marker), (null, "x")
  * and ("x", null) fold to the same hash — identical to the reference;
  * sample on non-null key fields if that distinction matters.
  *
  * `algo = "farm"` matches BigQuery `FARM_FINGERPRINT` byte-for-byte on
  * string/bytes input (the reference documents this contract in
  * ratatool-sampling/README.md); `algo = "murmur"` is guava murmur3_128
  * truncated to its low 64 bits, seeded.
  *
  * Deliberate divergence from the reference: unseeded murmur here uses a
  * FIXED seed 42, whereas the reference seeds with current-time millis
  * (Util.scala:91) making unseeded murmur non-reproducible across runs. A
  * Catalyst expression must be deterministic within a query (it may be
  * re-evaluated on task retry), so we require reproducibility; callers who
  * want per-run variation should pass an explicit seed.
  *
  * Maps are folded in KEY-SORTED order (not MapData iteration order):
  * semantically equal maps may store entries differently, and Spark's own
  * hash expressions forbid MapType for exactly that reason.
  *
  * Full `doGenCode` (not `CodegenFallback` — the trait MARKER alone makes
  * `CollapseCodegenStages` refuse whole-stage codegen for the enclosing
  * plan, regardless of any doGenCode override): flat children
  * (primitives, string, raw binary, date/timestamp, decimal) fold into
  * the guava `Hasher` with direct unboxed puts generated inline, so the
  * R2 deterministic-sample scan — this engine's signature 100 TB
  * operation — stays in one fused WholeStageCodegen stage with no per-row
  * `Expression.eval` dispatch or boxing. Nested children (struct / array
  * / map) and re-encoded binary box just that child and fold through the
  * interpreted funnel on the SAME shared hasher (`putChildBoxed`), so
  * mixed funnels keep the fast path for their flat fields and the stage
  * still fuses. The byte stream is guava in both paths — codegen and
  * interpreted eval are bit-identical by construction (HashSpec pins
  * guava parity).
  */
case class FieldHash(
    children: Seq[Expression],
    algo: String,
    seed: Option[Int],
    encoding: ByteEncoding)
  extends Expression {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (algo != "farm" && algo != "murmur")
      return TypeCheckResult.TypeCheckFailure(s"unknown hash algo: $algo (expected farm|murmur)")
    def ok(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
           BooleanType | StringType | BinaryType | DateType | TimestampType |
           TimestampNTZType => true
      case _: DecimalType  => true
      case st: StructType  => st.fields.forall(f => ok(f.dataType))
      case at: ArrayType   => ok(at.elementType)
      case mt: MapType     => ok(mt.keyType) && ok(mt.valueType)
      case _               => false
    }
    children.find(c => !ok(c.dataType)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"FieldHash: unsupported input type ${bad.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  @transient private lazy val hashFn: HashFunction = algo match {
    case "farm"   => Hashing.farmHashFingerprint64()
    case "murmur" => Hashing.murmur3_128(seed.getOrElse(42))
    case other    => throw new IllegalArgumentException(s"unknown hash algo: $other")
  }

  @transient private lazy val childArray: Array[Expression] = children.toArray

  override def eval(input: InternalRow): Any = {
    val hasher = hashFn.newHasher()
    // FarmHash has no seed parameter; the reference prepends it to the stream.
    if (algo == "farm") seed.foreach(hasher.putInt)
    var i = 0
    while (i < childArray.length) {
      val c = childArray(i)
      putValue(hasher, c.eval(input), c.dataType)
      i += 1
    }
    hasher.hash().asLong()
  }

  private def putValue(h: Hasher, v: Any, dt: DataType): Unit = {
    if (v == null) return // nulls skipped, matching BigSamplerAvro.scala:138-143
    dt match {
      case ByteType              => h.putLong(v.asInstanceOf[Byte].toLong)
      case ShortType             => h.putLong(v.asInstanceOf[Short].toLong)
      case IntegerType           => h.putLong(v.asInstanceOf[Int].toLong)
      case LongType              => h.putLong(v.asInstanceOf[Long])
      case FloatType             => h.putFloat(v.asInstanceOf[Float])
      case DoubleType            => h.putDouble(v.asInstanceOf[Double])
      case BooleanType           => h.putBoolean(v.asInstanceOf[Boolean])
      case StringType            => h.putString(v.asInstanceOf[UTF8String].toString, UTF_8)
      case BinaryType =>
        val bytes = v.asInstanceOf[Array[Byte]]
        encoding match {
          case ByteEncoding.Raw    => h.putBytes(bytes)
          case ByteEncoding.Hex    => h.putString(bytes.map("%02x".format(_)).mkString, UTF_8)
          case ByteEncoding.Base64 => h.putString(java.util.Base64.getEncoder.encodeToString(bytes), UTF_8)
        }
      case d: DecimalType =>
        h.putString(v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString, UTF_8)
      case DateType              => h.putLong(v.asInstanceOf[Int].toLong)
      // both timestamp flavors store micros-as-long; parquet in this
      // engine's inputs surfaces as NTZ, so both must hash identically
      case TimestampType | TimestampNTZType => h.putLong(v.asInstanceOf[Long])
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        var i = 0
        while (i < st.length) {
          putValue(h, if (row.isNullAt(i)) null else row.get(i, st(i).dataType), st(i).dataType)
          i += 1
        }
      case at: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          putValue(h, if (arr.isNullAt(i)) null else arr.get(i, at.elementType), at.elementType)
          i += 1
        }
      case mt: MapType =>
        // maps folded as interleaved key/value in KEY-SORTED order: MapData
        // iteration order is not canonical for semantically equal maps, so
        // sorting is required for the deterministic-sampling/dedup contract
        // (the reference never hashes maps; this is a total extension)
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray(); val vals = m.valueArray()
        val n = m.numElements()
        val ord = TypeUtils.getInterpretedOrdering(mt.keyType)
        val idx = Array.range(0, n).sortWith((a, b) =>
          ord.compare(keys.get(a, mt.keyType), keys.get(b, mt.keyType)) < 0)
        var j = 0
        while (j < n) {
          val i = idx(j)
          putValue(h, keys.get(i, mt.keyType), mt.keyType)
          putValue(h, if (vals.isNullAt(i)) null else vals.get(i, mt.valueType), mt.valueType)
          j += 1
        }
      case other =>
        throw new UnsupportedOperationException(s"FieldHash: unsupported type $other")
    }
  }

  /** Fresh guava hasher for the generated code — referenced through `this`
    * (an Expression, always plan-serializable) instead of the HashFunction
    * itself, whose concrete guava classes aren't all Serializable. */
  private[functions] def newHasher(): Hasher = hashFn.newHasher()

  /** Boxed fold of child `i`'s value into a shared hasher — the generated
    * code's escape hatch for nested / re-encoded children. */
  private[functions] def putChildBoxed(h: Hasher, v: Any, i: Int): Unit =
    putValue(h, v, childArray(i).dataType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fieldHash", this, "graft.functions.FieldHash")
    val hasher = ctx.freshName("graftHasher")
    // FarmHash has no seed parameter; the reference prepends it (matches eval)
    val seedPut =
      if (algo == "farm") seed.map(s => s"$hasher.putInt($s);").getOrElse("")
      else ""
    val puts = children.zipWithIndex.map { case (c, i) =>
      val g = c.genCode(ctx)
      val put = c.dataType match {
        case ByteType | ShortType | IntegerType | DateType =>
          s"$hasher.putLong((long) ${g.value});"
        case LongType | TimestampType | TimestampNTZType =>
          s"$hasher.putLong(${g.value});"
        case FloatType   => s"$hasher.putFloat(${g.value});"
        case DoubleType  => s"$hasher.putDouble(${g.value});"
        case BooleanType => s"$hasher.putBoolean(${g.value});"
        case StringType =>
          // toString-then-encode, NOT UTF8String.getBytes: bit parity with
          // the interpreted path's putString (they differ on invalid UTF-8,
          // and a codegen/interpreted hash divergence would make sampling
          // decisions depend on which engine path ran)
          s"$hasher.putString(${g.value}.toString(), " +
            "java.nio.charset.StandardCharsets.UTF_8);"
        case BinaryType if encoding == ByteEncoding.Raw =>
          s"$hasher.putBytes(${g.value});"
        case _: DecimalType =>
          s"$hasher.putString(${g.value}.toJavaBigDecimal().toPlainString(), " +
            "java.nio.charset.StandardCharsets.UTF_8);"
        case _ => // struct / array / map / hex- or base64-encoded binary
          s"$self.putChildBoxed($hasher, ${g.value}, $i);"
      }
      s"""
         |${g.code}
         |if (!${g.isNull}) { $put }
       """.stripMargin
    }
    // Spark's own HashExpression split pattern: wide funnels split into
    // helper methods (64KB limit) with the hasher threaded as an argument;
    // under currentVars the splitter inlines instead
    val putsCode = ctx.splitExpressionsWithCurrentInputs(
      expressions = puts,
      funcName = "graftFieldHashPut",
      extraArguments = ("com.google.common.hash.Hasher", hasher) :: Nil)
    ev.copy(
      code = code"""
        |com.google.common.hash.Hasher $hasher = $self.newHasher();
        |$seedPut
        |$putsCode
        |final long ${ev.value} = $hasher.hash().asLong();
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
