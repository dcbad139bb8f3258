package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) parquet tables — the storage-side half of
  * shuffle elimination at 100 TB.
  *
  * A table written with `bucketBy(n, keys)` pins every row to
  * `hash(keys) % n` at WRITE time; Spark records the bucket spec in the
  * catalog and Catalyst then treats each scan as already hash-partitioned
  * on the keys. The payoffs this module exists for (each pinned in
  * BucketedSpec / PlanSpec):
  *
  *   - bucketed JOIN bucketed on the bucket keys with equal bucket
  *     counts: ZERO shuffle on either side — the sort-merge join reads
  *     bucket i of both tables in the same task. On a fact-fact join
  *     (lineitem ⋈ orders at 100 TB) this removes the two largest
  *     exchanges in the whole plan, paying one extra sort at write time.
  *   - bucketed JOIN unbucketed: one shuffle instead of two — only the
  *     unbucketed side moves.
  *   - groupBy on the bucket keys: no exchange before the aggregation.
  *   - equality filter on a bucket key: bucket pruning — the scan reads
  *     1 of n buckets (`SelectedBucketsCount` in the scan node) before
  *     row-group min/max pruning even starts.
  *
  * Bucketing lives in the session catalog (works with the default
  * in-memory catalog; durable with a Hive metastore), so tables are
  * registered by name with an explicit external `path`.
  *
  * Judgment for 100 TB: bucket count should target ~128 MB-1 GB per
  * bucket file per final write task; too few buckets re-creates skew,
  * too many makes small files. `sortBy` the bucket keys so the merge
  * join's per-bucket sort is already done on disk (Spark still inserts
  * a defensive sort node when a bucket holds >1 file, but the sort is a
  * no-op merge of sorted runs).
  */
object Bucketed {

  private def validIdent(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_')

  /** Write `df` as an external bucketed table `name` at `path`
    * (overwriting both any prior table of that name and the path), and
    * return the registered table. `sortCols` defaults to the bucket keys
    * — the layout the merge join wants. */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    buckets: Int, keys: Seq[String],
                    sortCols: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    require(keys.nonEmpty, "bucketing needs at least one key column")
    require(validIdent(name),
      s"table name must be a plain identifier, got '$name'")
    val spark = df.sparkSession
    // saveAsTable(Overwrite) refuses to change an existing table's bucket
    // spec; dropping first makes the call idempotent across re-runs with
    // different bucket counts (the external path is overwritten anyway)
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val sorts = if (sortCols.isEmpty) keys else sortCols
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(name)
    spark.table(name)
  }

  /** The registered table (bucket metadata attached — a plain
    * `spark.read.parquet(path)` would NOT carry it). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Drop the catalog entry (the external files remain). */
  def drop(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    ()
  }
}
