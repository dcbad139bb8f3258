package graft.ext

import graft.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): k-means the corpus into clusters,
  * then within each cluster drop every vector that is cosine-similar
  * (≥ `tau`) to an earlier-id vector. Near-duplicate SEMANTICS (same
  * content re-encoded, templated boilerplate, paraphrases) concentrate
  * inside clusters, so the quadratic pair step runs per-cluster, never
  * corpus-wide.
  *
  * Clustering is SPHERICAL: vectors are unit-normalized before both
  * training and assignment (the paper clusters normalized embeddings), so
  * cluster membership depends only on direction — a rescaled copy of a
  * vector (cosine 1) always lands in its original's cluster, and cosine
  * itself is normalization-invariant. Zero-norm / NaN vectors cannot be
  * semantic duplicates of anything and are kept in their own `-1` bucket.
  *
  * Spark shape, stage by stage:
  *   - centroid training reuses the IVF path's bounded machinery
  *     ([[Similarity.sampleTrainVecs]] + [[Similarity.localKMeansPP]]):
  *     one O(trainCap) strided sampling job, Lloyd iterations driver-side
  *     on the pinned sample — deterministic given (files, seed), never a
  *     full-corpus pass;
  *   - assignment is map-side only: centroids ship as literals inside the
  *     [[graft.functions.NearestCells]] expression (k × dim doubles — at
  *     the paper's k ≈ n/1000 with dim 64 that is ~0.5 MB per 1M docs;
  *     the caller caps k, not the engine);
  *   - the within-cluster pair step is a self-join ON the cluster id —
  *     shuffle keyed by cluster, so a cluster's ENTIRE c² pair volume
  *     lands in one task. `maxClusterSize` bounds that task: the 10 000
  *     default caps it at ~5×10⁷ cosine evaluations (seconds, not a hung
  *     executor); oversized clusters (degenerate k-means, adversarial
  *     corpora) are skipped — the same honest under-dedup fallback as
  *     [[Dedup.minhashNearDups]]'s bucket cap, surfaced via the returned
  *     `oversized` flag rather than an OOM at 100 TB. Size k ≈ n/1000
  *     (the paper's regime) and the cap rarely binds.
  *
  * Keep policy: a vector is removed iff SOME earlier-id vector in its
  * cluster has cosine ≥ tau (the paper's lower-index rule made
  * deterministic by id). Consequently the kept set is tau-sparse within
  * every cluster: for any same-cluster kept pair (a < b), cosine < tau —
  * an invariant the `semdedup` gate re-verifies with exact cosine.
  *
  * Returns one row per input vector: (id, cluster, keep, oversized) —
  * `oversized` marks rows whose cluster skipped pairing.
  *
  * Reference anchor: dedup keep-one policy per ratatool's dedup-by-key
  * idiom (BigSampler.scala:61-81 hash-keep); the semantic grouping is the
  * extension surface, not a reference port.
  */
object SemDedup {

  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, tau: Double,
                    trainCap: Long = 100000L, maxIter: Int = 20,
                    seed: Long = 42L,
                    maxClusterSize: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(tau >= -1.0 && tau <= 1.0, s"tau must be a cosine in [-1,1], got $tau")
    val raw = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // spherical: unit-normalize for training + assignment (zero-norm /
    // NaN → null, which NearestCells / sampleTrainVecs already degrade
    // safely); the raw vector is NOT carried along — cosine is
    // direction-only, so every later stage reads the unit vector
    val v = raw.select(col("id"), Embeddings.l2Normalize(col("v")).as("v"))

    val sample = Similarity.sampleTrainVecs(v, trainCap)
    val centroids =
      try {
        val pts = sample.collect().map(_.getSeq[Double](0).toArray)
        require(pts.nonEmpty, "semanticDedup: no finite vectors to train on")
        Similarity.localKMeansPP(pts, math.min(k, pts.length), maxIter, seed)
      } finally sample.unpersist()

    // map-side assignment; degenerate vectors (NaN/dim-mismatch) get a
    // null cell from NearestCells and form their own "cluster" -1 — they
    // cannot be semantic duplicates of anything, so they are always kept
    val assigned = v
      .withColumn("cluster",
        coalesce(nearestCells(col("v"), centroids, 1)(0), lit(-1)))
      // pinned: the size filter, both pair sides, and the final keep join
      // would each re-run assignment (k × dim multiplies per row) otherwise
      .localCheckpoint(true)

    val sizes = assigned.filter(col("cluster") >= 0)
      .groupBy("cluster").count()
    val pairable = sizes.filter(col("count") > 1 && col("count") <= maxClusterSize)
    val oversized = sizes.filter(col("count") > maxClusterSize)
      .select(col("cluster"), lit(true).as("oversized"))

    val a = assigned.join(pairable.select("cluster"), "cluster")
      .select(col("cluster"), col("id").as("id_a"), col("v").as("va"))
    val b = assigned.join(pairable.select("cluster"), "cluster")
      .select(col("cluster"), col("id").as("id_b"), col("v").as("vb"))
    val removed = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(lit(1.0) - cosineDistance(col("va"), col("vb")) >= tau)
      .select(col("id_b").as("id")).distinct()
      .withColumn("removed", lit(true))

    assigned.join(removed, Seq("id"), "left")
      .join(oversized, Seq("cluster"), "left")
      .select(col("id"), col("cluster"),
        coalesce(!col("removed"), lit(true)).as("keep"),
        coalesce(col("oversized"), lit(false)).as("oversized"))
  }
}
