package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
    * input, an all-zero vector (no direction to keep), or a vector with
    * any NaN element (NaN > 0.0 is TRUE under Spark comparison semantics,
    * so without the explicit isnan guard a NaN norm would pass the
    * positivity test and emit a NaN array instead of null). */
  def l2Normalize(vec: Column): Column = {
    val n = l2Norm(vec)
    when(vec.isNotNull && !isnan(n) && n > 0.0,
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

  /** Johnson–Lindenstrauss random projection: `outDim` seeded Gaussian
    * planes scaled by 1/sqrt(outDim), applied as ONE codegen'd matvec
    * pass ([[graft.functions.ProjectPlanes]]). For n points, outDim =
    * O(log n / eps²) preserves pairwise Euclidean distances within
    * (1 ± eps) with high probability (JL lemma; Gaussian case
    * Dasgupta & Gupta '03) — the cheap dimensionality squeeze BEFORE
    * clustering or ANN when the source dim is large: a 768-dim corpus
    * projected to 64 dims cuts every downstream shuffle, broadcast, and
    * distance kernel 12x while approximately preserving the geometry
    * every operator here consumes. Deterministic for a fixed seed.
    * Stateless column expression: zero shuffle, stream-liftable. */
  def randomProject(vec: Column, inDim: Int, outDim: Int,
                    seed: Long = 42L): Column = {
    require(inDim >= 1 && outDim >= 1,
      s"dims must be >= 1, got inDim=$inDim outDim=$outDim")
    val rnd = new java.util.Random(seed)
    val scale = 1.0 / math.sqrt(outDim)
    val planes = Array.fill(outDim)(
      Array.fill(inDim)(rnd.nextGaussian() * scale))
    graft.GraftFunctions.projectPlanes(vec, planes)
  }

  /** Train product-quantization codebooks for STORAGE compression
    * (int8 quantization's 4x, pushed to dim/m×: a 64-dim float vector
    * becomes m small codes). Same bounded strided sample and seeded
    * in-memory k-means++/Lloyd as [[Similarity.pqTopK]]'s ADC search —
    * train once, reuse for both storage and search. Returns m codebooks
    * of up to `codebookSize` sub-centroids; empty corpus -> empty array. */
  def pqCodebooks(df: DataFrame, vecCol: String, m: Int = 8,
                  codebookSize: Int = 256, seed: Long = 42L,
                  trainCap: Long = 100000L, maxIter: Int = 10): Array[Array[Array[Double]]] = {
    require(m >= 1, s"m must be >= 1, got $m")
    val corpusV = df.select(col(vecCol).as("v"))
    // sampleTrainVecs no longer persists (r21: the pin only served the
    // removed distributed MLlib fit) — collect directly, matching the
    // pqTopK/trainIvfPq call sites
    val pts = Similarity.sampleTrainVecs(corpusV, trainCap)
      .collect().map(_.getSeq[Double](0).toArray)
    if (pts.isEmpty) return Array.empty
    Similarity.trainSubCodebooks(pts, m, codebookSize, maxIter, seed)
  }

  /** Encode a vector column to its m PQ codes (array<int>, one nearest
    * sub-centroid index per subspace). Degenerate vectors (NaN, wrong
    * dim at slice) yield null codes elements per the NearestCells
    * contract. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    require(codebooks.nonEmpty, "codebooks must be non-empty")
    val lens = codebooks.map(_.head.length)
    val offs = lens.scanLeft(0)(_ + _)
    // l2 assignment: the codebooks minimize Euclidean distortion, and a
    // zero-norm subspace slice is a legitimate point (cosine would null
    // it and silently drop the whole row from search results)
    val codes = codebooks.indices.map { sp =>
      graft.GraftFunctions.nearestCells(
        slice(vec, offs(sp) + 1, lens(sp)), codebooks(sp), 1, metric = "l2")(0)
    }
    array(codes: _*)
  }

  /** Reconstruct the approximate vector from PQ codes: the concatenation
    * of each subspace's selected sub-centroid — pure Catalyst (flatten
    * of per-subspace literal lookups). */
  def pqDecode(codes: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    require(codebooks.nonEmpty, "codebooks must be non-empty")
    val parts = codebooks.indices.map { sp =>
      element_at(typedLit(codebooks(sp).map(_.toSeq).toSeq),
        element_at(codes, sp + 1) + 1)
    }
    flatten(array(parts: _*))
  }
}
