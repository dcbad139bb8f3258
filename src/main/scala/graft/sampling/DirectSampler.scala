package graft.sampling

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Direct (small-n) samplers: the reference's single-process head/reservoir
  * samplers (ratatool-sampling/.../AvroSampler.scala:45-144,
  * ParquetSampler.scala, Sampler.scala:30-38) re-expressed on the cluster.
  *
  * In the reference these read files on one machine with per-shard futures;
  * Spark's scan is already parallel, so head is a plain `limit` and
  * reservoir is `takeSample` (a two-job exact-n sample). The reference's
  * weighted multi-shard allocation (AvroSampler.scala:66-101) exists only to
  * compensate for single-process reading and is deliberately subsumed.
  */
object DirectSampler {

  /** First n records in a stable order. The reference reads shards in
    * lexical filename order (AvroSampler.scala:57-59); a distributed scan
    * has no such order, so `head` is deterministic only when `orderBy`
    * columns are given — matching the driver-visible contract (n records,
    * reproducible when asked). */
  def head(df: DataFrame, n: Int, orderBy: Seq[String] = Nil): DataFrame =
    if (orderBy.isEmpty) df.limit(n)
    else df.orderBy(orderBy.map(col): _*).limit(n)

  /** Exact-n uniform reservoir sample (reference AvroSampler.scala:128-144):
    * implemented with RDD takeSample — single pass per partition with
    * per-partition reservoirs, merged on the driver; returns a small
    * driver-side result re-parallelized as a DataFrame. Driver-local by
    * design (mirrors the reference's single-process sampler); keep n small. */
  def reservoir(df: DataFrame, n: Int, seed: Long = 42L): DataFrame = {
    require(n <= 10000000, s"reservoir materializes n rows on the driver; got n=$n")
    val spark = df.sparkSession
    val rows: Array[Row] = df.rdd.takeSample(withReplacement = false, n, seed)
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), df.schema)
  }

  /** Per-key top-k (reference topByKey, SamplerSCollectionFunctions
    * .scala:220, 260): keeps the k smallest rows per key under `orderBy`,
    * via the shared k-bounded [[graft.functions.TopK.SmallestRows]]
    * aggregator — the reference's bounded per-key heap, run as a partial
    * hash aggregate. A `row_number()` window here would sort each key's
    * ENTIRE slice in one task (for a low-cardinality key that is the whole
    * table through a handful of tasks); the aggregator instead carries at
    * most k rows per key per task and shuffles only those O(k) buffers.
    *
    * `orderBy` columns must be atomic non-binary scalars (numeric, string,
    * decimal, date, timestamp — an ORDER BY tuple): the aggregator compares
    * external Comparable values, and binary/array/struct/map ordering
    * columns are rejected with a require (a contract narrowing vs the old
    * window form, which accepted any orderable type). */
  def topByKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[String],
               k: Int): DataFrame = {
    val schema = df.schema
    val ordIdx = orderBy.map(schema.fieldIndex)
    val topk = udaf(new graft.functions.TopK.SmallestRows(k, schema, ordIdx),
      org.apache.spark.sql.Encoders.row(schema))
    // a Row-encoded udaf takes one argument per schema field
    df.groupBy(keyCols.map(col): _*)
      .agg(topk(df.columns.toIndexedSeq.map(col): _*).as("__topk"))
      .select(explode(col("__topk.rows")).as("__row"))
      .select(col("__row.*"))
  }

  /** Deterministic k rows PER KEY — the k-shot-per-class sampler (eval
    * few-shot sets, per-domain spot-check samples, class-balanced seed
    * data). Each row ranks by a seeded murmur hash of `hashCols`
    * (default: all non-key columns), so the selection is uniform-ish,
    * stable across runs/engines for the same data, and re-dealt by
    * changing `seed`; the per-key winners come from the same k-bounded
    * [[graft.functions.TopK.SmallestRows]] hash aggregate as
    * [[topByKey]] — map-side partial buffers of ≤ k rows, no window, no
    * per-key sort of the whole group. Keys with fewer than k rows keep
    * them all. Ties (hash-equal duplicate rows) resolve arbitrarily but
    * deterministically within a run; distinct content never ties (64-bit
    * birthday bound). */
  def kPerKey(df: DataFrame, keyCols: Seq[String], k: Int, seed: Int = 0,
              hashCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"kPerKey needs k >= 1, got $k")
    // an empty key list would silently degrade to ONE global k-row
    // sample (groupBy nothing) — the forgotten --per-key flag case
    require(keyCols.nonEmpty, "kPerKey needs at least one key column")
    val hc = if (hashCols.nonEmpty) hashCols
      else df.columns.toSeq.filterNot(keyCols.contains)
    require(hc.nonEmpty, "kPerKey needs at least one non-key column to hash")
    val hashed = df.withColumn("__draw",
      graft.GraftFunctions.fieldHash(hc.map(col), "murmur", Some(seed)))
    topByKey(hashed, keyCols, Seq("__draw"), k).drop("__draw")
  }
}
