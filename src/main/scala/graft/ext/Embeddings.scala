package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column utilities: normalization and int8 quantization as
  * pure codegen'd expressions.
  *
  * Engine extension (100 TB training-data surface): a billion float32
  * embeddings at d=768 is ~3 TB; max-abs int8 quantization stores the
  * same geometry in ~0.77 TB (a tinyint per dimension plus one float
  * scale per vector). Cosine similarity is SCALE-INVARIANT, so the
  * quantized arrays alone support similarity search — the dot products
  * become integer arithmetic and the 4x smaller vectors are what
  * shuffles, broadcasts, and cache residency see. All operators here are
  * stateless column expressions: zero shuffle, stream-liftable, and
  * composable with [[Similarity]]'s bucketing (which only needs signs
  * and relative magnitudes — both preserved).
  */
object Embeddings {

  /** L2 norm of a numeric array column (double). */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0d), (a, x) => a + x.cast("double") * x.cast("double")))

  /** Unit-normalize: `vec / ||vec||_2` as array<double>; null for a null
    * input, and null for an all-zero vector (no direction to keep). */
  def l2Normalize(vec: Column): Column = {
    val n = l2Norm(vec)
    when(vec.isNotNull && n > 0.0,
      transform(vec, x => x.cast("double") / n))
  }

  /** Max-abs symmetric int8 quantization:
    * `struct(scale: double, q: array<tinyint>)` with
    * `x_i ≈ q_i * scale`, `q_i = round(x_i / scale) ∈ [-127, 127]`,
    * `scale = max_i |x_i| / 127`. Null for null input; an all-zero
    * vector quantizes to scale 0 with all-zero codes. Rounding is
    * half-away-from-zero on IEEE doubles — deterministic and
    * reproducible across engines. */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = aggregate(vec, lit(0.0d),
      (a, x) => greatest(a, abs(x.cast("double"))))
    val scale = maxAbs / 127.0d
    val q = when(scale > 0.0,
        transform(vec, x =>
          least(greatest(round(x.cast("double") / scale), lit(-127.0)), lit(127.0))
            .cast("byte")))
      .otherwise(transform(vec, x => lit(0).cast("byte")))
    when(vec.isNotNull, struct(scale.as("scale"), q.as("q")))
  }

  /** Reconstruct approximate doubles from [[quantizeInt8]] output. */
  def dequantizeInt8(qs: Column): Column =
    transform(qs.getField("q"), q => q.cast("double") * qs.getField("scale"))

  /** Cosine similarity straight from two int8 code arrays — scale drops
    * out of cosine, so the float scales are not needed. Null on length
    * mismatch or a zero vector (same contract as
    * [[graft.GraftFunctions.cosineDistance]]). */
  def quantizedCosine(qa: Column, qb: Column): Column = {
    val dot = aggregate(zip_with(qa, qb,
      (a, b) => a.cast("long") * b.cast("long")), lit(0L), (s, x) => s + x)
    val na = aggregate(qa, lit(0L), (s, x) => s + x.cast("long") * x.cast("long"))
    val nb = aggregate(qb, lit(0L), (s, x) => s + x.cast("long") * x.cast("long"))
    when(qa.isNotNull && qb.isNotNull && size(qa) === size(qb) &&
        na > 0L && nb > 0L,
      dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
  }
}
