package graft.tools

import graft.ext.SemDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 follow-up to the sf10 scale probe (r19 verdict #5): semdedup
  * was the closest-to-linear operator at sf10 (ratio 0.74, driver heap
  * ratio 2.6 — the split-round driver collects grow with active-cluster
  * count), so measure it ONE MORE DECADE before calling its scaling
  * settled.
  *
  * {{{ SemDecade [sf10Dir=/tmp/sf10] [outJson=/tmp/SEMDECADE.json] }}}
  *
  * Fixture: /tmp/sf30emb/embeddings.parquet = 3 stacked copies of the
  * sf10 embeddings (600k base vectors; the doubling fixture below makes
  * the measured corpora 400k and 1.2M). Copies k>0 get a hash-parity
  * sign pattern from a FRESH seed family (`hash(j, k + 1000)`), NOT the
  * `hash(j, k)` family [[ScaleUp]]'s tag mode already spent on the
  * sf1→sf10 hop: sign patterns compose multiplicatively and each is its
  * own inverse, so re-applying the same family would emit P_k·P_k = I —
  * byte-identical duplicates of the sf10 copy-0 block, exactly the
  * planted-clique fixture distortion the tag mode exists to avoid. A
  * disjoint seed family composes collision-free, and the probe MEASURES
  * that (max |cos| over aligned cross-copy pairs) instead of asserting
  * it — the r19 lesson that perturbation schemes get verified, not
  * trusted.
  *
  * The operator shape, k discipline (~1250 vectors per cluster, never
  * fixed k) and doubling fixture are byte-for-byte the sf10 probe's
  * ([[ScaleR19]]), so walls divide cleanly: the record's
  * `ratio_linear_decade` = (wall_sf30 / wall_sf10) / 3.
  *
  * Driver-memory bound carried alongside the measurement: each split
  * round collects (a) one (cluster, count) row per surviving cluster —
  * ≤ k + children rows — and (b) ≤ sampleCap=1024 sampled vectors per
  * ACTIVE (still-oversized) cluster, so per-round driver bytes ≤
  * active × 1024 × dim × 8, with active ≤ n / maxClusterSize and
  * strictly shrinking as clusters settle. At n = 10⁹ / dim 64 /
  * maxClusterSize 10⁴ that is ≤ 52 GB ONLY if every cluster were
  * simultaneously oversized and active — the k discipline (k ≈ n/1250)
  * makes the expected cluster size 8× under the cap, so active is the
  * rare degenerate tail, not n/10⁴. The probe prints peak driver heap at
  * both SFs so the slope of the REAL curve is in the record.
  */
object SemDecade {

  def main(args: Array[String]): Unit = {
    val sf10Dir = if (args.length > 0) args(0) else "/tmp/sf10"
    val outJson = if (args.length > 1) args(1) else "/tmp/SEMDECADE.json"
    val sf30Emb = "/tmp/sf30emb/embeddings.parquet"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sampler = new HeapSampler; sampler.start()

    val emb10 = spark.read.parquet(s"$sf10Dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n10 = emb10.count()
    val off10 = emb10.agg(max(col("vec_id")) + 1).first().getLong(0)

    // ---- build the sf30 embeddings fixture (idempotent) ----------------
    // completion is judged by the write's _SUCCESS marker, not bare
    // directory existence: a crashed build leaves task-committed partial
    // files that a bare exists() would silently reuse as a truncated
    // "sf30" corpus
    if (!new java.io.File(s"$sf30Emb/_SUCCESS").exists()) {
      val copies = (0 until 3).map { k =>
        val perturbed =
          if (k == 0) col("embedding")
          else expr(s"transform(embedding, (x, j) -> " +
            s"IF(pmod(hash(j, ${k + 1000}), 2) = 0, -x, x))")
        emb10.select((col("vec_id") + lit(k * off10)).as("vec_id"),
          perturbed.as("embedding"))
      }.reduce(_ unionByName _)
      copies.write.mode("overwrite").parquet(sf30Emb)
      println(s"[semdecade] built $sf30Emb")
    }
    val emb30 = spark.read.parquet(sf30Emb).select("vec_id", "embedding")
    val n30 = emb30.count()

    // ---- fixture sanity: MEASURE the decorrelation ---------------------
    // ALL aligned cross-copy pairs of the same base vector — (0,1),
    // (0,2) through the fresh patterns Q1/Q2, AND (1,2) through the
    // COMPOSED pattern Q1·Q2, the multiplicative-composition channel the
    // seed-family argument above centers on. Every channel's cosine must
    // sit far under the tau=0.9 the operator runs at.
    val aligned = emb30.select((col("vec_id") % lit(off10)).as("b"),
      (col("vec_id") / lit(off10)).cast("int").as("c"), col("embedding"))
    val worstCos = aligned.join(
        aligned.select(col("b"), col("c").as("c2"), col("embedding").as("e2")), "b")
      .filter(col("c") < col("c2"))
      .select(abs(lit(1.0) -
        graft.GraftFunctions.cosineDistance(col("embedding"), col("e2"))).as("abscos"))
      .agg(max("abscos")).first().getDouble(0)
    println(f"[semdecade] max |cos| over aligned cross-copy pairs (all copy pairs): " +
      f"$worstCos%.4f (tau=0.9)")

    // untimed warm pass of the operator itself: the first semanticDedup
    // in a JVM pays one-time Janino/JIT/checkpoint-machinery costs that
    // would otherwise inflate the sf10 wall and bias the decade ratio
    // TOWARD linear (the Bench.scala warmup rule)
    SemDedup.semanticDedup(emb10.limit(20000), "vec_id", "embedding",
      k = 32, tau = 0.9).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    def runSem(emb: DataFrame, nEmb: Long, label: String): (Double, Long, Long) = {
      System.gc(); Thread.sleep(300); sampler.mark()
      val off = emb.agg(max(col("vec_id")) + 1).first().getLong(0)
      val dups = emb.select((col("vec_id") + off).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
      val kk = math.max(32, (2 * nEmb / 1250).toInt)
      val t0 = System.nanoTime()
      val out = SemDedup.semanticDedup(emb.unionByName(dups), "vec_id",
        "embedding", k = kk, tau = 0.9).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[semdecade] $label%-6s n=${2 * nEmb}%8d k=$kk%4d " +
        f"wall=$wall%7.1f s peak=${sampler.peakMb}%5d MB out=$out%d")
      (wall, sampler.peakMb, out)
    }

    val (w10, h10, o10) = runSem(emb10, n10, "sf10")
    val (w30, h30, o30) = runSem(emb30, n30, "sf30")
    val ratio = (w30 / w10) / (n30.toDouble / n10)
    def num(v: Double): String = ProbeUtil.num("%.2f", v)
    val line =
      s"""{"sf10":{"n_vectors":${2 * n10},"wall_s":${num(w10)},""" +
        s""""peak_driver_mb":$h10,"rows_out":$o10},""" +
        s""""sf30":{"n_vectors":${2 * n30},"wall_s":${num(w30)},""" +
        s""""peak_driver_mb":$h30,"rows_out":$o30},""" +
        s""""ratio_linear_decade":${num(ratio)},""" +
        s""""max_aligned_cross_copy_abscos":${num(worstCos)},""" +
        s""""heap_mb":${Runtime.getRuntime.maxMemory >> 20}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), line + "\n")
    println(line)
    sampler.shutdown()
    spark.stop()
  }
}
