package graft.functions

import com.google.common.hash.Hashing
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a bag of shingles: `array<string> -> array<long>`.
  *
  * For each of `numHashes` hash families i, emits
  * `min over shingles of murmur128(shingle, seed+i).lowBits`. Families are
  * simulated by seed perturbation (standard MinHash trick; cf. Broder '97).
  * Partition-local, no shuffle: the LSH dedup built on top groups by BAND
  * hash, never comparing all pairs. Null/empty input -> null signature.
  *
  * This is an engine extension beyond the reference (which has no dedup);
  * designed per the brief's shingle→minhash→band→bucket-join pipeline.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"numHashes must be positive, got $numHashes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < numHashes) {
          val h = Hashing.murmur3_128(seed + k).hashBytes(bytes).asLong()
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a bag of tokens: `array<string> -> long`.
  *
  * Classic Charikar '02 scheme: each token's 64-bit murmur hash votes +1/-1
  * per bit position; the sign of each accumulated position forms the
  * fingerprint. Near-duplicate docs differ in few bits (small Hamming
  * distance). Partition-local; candidate pairing at scale is done by banding
  * the 64 bits into chunks and grouping on chunk equality (pigeonhole).
  */
case class SimHash64(child: Expression, seed: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Hashing.murmur3_128(seed).hashBytes(arr.getUTF8String(i).getBytes).asLong()
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
