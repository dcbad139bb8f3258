package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for shuffle joins.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.*`) splits hot
  * sort-merge partitions at runtime and should be the first resort. Manual
  * salting remains necessary where AQE cannot reach: joins under
  * `mapGroupsWithState`-adjacent plans, hot keys known in advance that
  * overflow even a split partition, and engines/runs with AQE disabled.
  * Engine extension (100 TB training-data surface; the reference's Beam
  * runner has no equivalent — hot-key fan-out there is handled by Beam's
  * combiner lifting, which Spark's partial aggregation already mirrors).
  */
object Skew {

  /** Equi-join `large` (skewed on `keys`) with `small`, spreading each hot
    * key of the large side across `salt` shuffle partitions.
    *
    * The large side gets a per-row salt in `[0, salt)` derived from the
    * key columns hashed together with the row's position
    * (`monotonically_increasing_id`), so EXACT-DUPLICATE rows of a hot
    * key — the common skew shape in pre-dedup corpora — still spread
    * across salt buckets (a whole-row hash would send them all to one),
    * and map-typed payload columns never enter the hash (xxhash64 rejects
    * MapType). The position term is NONDETERMINISTIC across recomputes
    * (no deterministic function can distinguish exact duplicates): Spark
    * marks the stage indeterminate, so a fetch failure triggers full-stage
    * rollback-and-rerun rather than silent row loss — the standard cost
    * of duplicate-spreading salts, identical to `rand()`-based salting.
    * The small side is exploded `salt`× so every
    * (key, salt) bucket finds its match. Join output equals the unsalted
    * join exactly; only the shuffle distribution changes. The small side
    * must tolerate `salt`× replication — it is a dimension table by
    * contract.
    *
    * Supported join types: inner / left (left_outer). Right/full-outer
    * would need the unmatched-small-side rows deduplicated back from
    * `salt` copies — out of scope for a skew utility whose small side is
    * a dimension.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt > 1, s"salt must be > 1, got $salt")
    val jt = joinType.toLowerCase(java.util.Locale.ROOT)
    require(Set("inner", "left", "left_outer").contains(jt),
      s"saltedJoin supports inner/left joins, got $joinType")
    val largeCols = large.columns.toIndexedSeq
    val smallCols = small.columns.toIndexedSeq.filterNot(keys.contains)
    val l = large.withColumn("__salt", saltExpr(large, keys, salt))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, keys :+ "__salt", jt)
      .select((largeCols.map(l(_)) ++ smallCols.map(s(_))): _*)
  }

  /** The large-side salt: key columns hashed with the row position, so
    * exact duplicates of a hot key still spread. */
  private[ext] def saltExpr(large: DataFrame, keys: Seq[String], salt: Int): Column =
    pmod(xxhash64((keys.map(large(_)) :+ monotonically_increasing_id()): _*),
      lit(salt)).cast("int")

  /** Per-key frequency report over a prospective join/groupBy key — the
    * audit a pipeline runs BEFORE deciding to salt: returns the `topN`
    * hottest keys with counts and their share of all rows. */
  def keySkewReport(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    // single scan: the total derives from the grouped counts, so the
    // (possibly expensive) input plan is never executed twice
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(sum("n").as("__total"))))
      .orderBy(col("n").desc)
      .limit(topN)
      .withColumn("share", col("n").cast("double") / col("__total"))
      .drop("__total")
  }
}
