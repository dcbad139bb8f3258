package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators: backward as-of join and gap sessionization.
  *
  * Engine extension (100 TB training-data surface). Spark has no built-in
  * as-of join; the usual workaround — a window over `partition by key` —
  * funnels each key's ENTIRE history through one task, which dies on hot
  * keys. [[asofJoin]] instead buckets time so every window partition is
  * `(key, bucket)`-bounded, with cross-bucket state carried by a
  * bucket-summary pass that is `O(keys x active-buckets)`, not `O(rows)`.
  * The reference has no temporal surface; this follows the same
  * bounded-partition discipline as the exact sampler's range buckets
  * (BigSampler.exactRank) — cf. reference
  * SamplerSCollectionFunctions.scala:220,260 for the bounded-heap analog.
  */
object Temporal {

  /** Backward (inclusive) as-of join: for each `left` row, the single
    * `right` row with the greatest `rightTs <= leftTs` and equal `keys`.
    *
    * Output = every `left` column, plus `asof_ts` (the matched right
    * timestamp, original type) and `asof_<c>` for each payload column;
    * all null when no right row precedes (left-outer semantics). Rows of
    * `right` sharing `(keys, rightTs)` are first reduced to one by
    * greatest-payload-struct, so the join is deterministic. Null keys
    * never match (SQL join semantics).
    *
    * Scale shape: `right` is reduced to per-`(key, bucket)` "last row"
    * summaries (map-side partial agg); a per-key prefix scan over BUCKET
    * SUMMARIES (not rows — `O(span / bucketWidth)` entries per key)
    * computes each bucket's carry-in; then one shuffle co-partitions
    * left rows, in-bucket right rows, and the carry-in row by
    * `(key, bucket)` and a single ordered window resolves matches. No
    * window partition ever holds more than one bucket of one key, so a
    * hot key spreads across `span / bucketWidth` tasks instead of one.
    * Choose `bucketWidth` (same unit as the timestamp columns after
    * cast-to-double; seconds for timestamps, the raw unit for numeric
    * columns) so one key's densest bucket fits a task.
    *
    * Payload columns may be any type (carried via `max_by`/`last`, never
    * compared); the timestamp columns must cast to double losslessly
    * (timestamps, or integers below 2^53).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payloadCols: Seq[String],
               bucketWidth: Double): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toIndexedSeq
    def bkt(c: Column): Column = floor(c.cast("double") / bucketWidth).cast("long")
    val k = keys.map(col)

    // SQL join semantics: a null in ANY key column matches nothing. The
    // match path below groups by key — where a window partition would pool
    // null keys together — so null-key rows must never reach it: null-key
    // left rows short-circuit to the no-match output, null-key right rows
    // are dropped.
    val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
    val leftNullKeyed = left.filter(anyKeyNull)
    val leftK = left.filter(!anyKeyNull)
    val rightK = right.filter(!anyKeyNull)

    // one right row per (keys, ts): greatest payload struct wins ties
    val r0 = rightK
      .groupBy((k :+ col(rightTs).as("__rts")): _*)
      .agg(max(struct(payloadCols.map(col): _*)).as("__vals"))
      .select((k :+ col("__rts") :+
        struct(col("__rts"), col("__vals")).as("__pay")): _*)

    // per-(key, bucket) last right row — partial agg, longs+payload only
    val bucketLast = r0
      .groupBy((k :+ bkt(col("__rts")).as("__b")): _*)
      .agg(max_by(col("__pay"), col("__rts").cast("double")).as("__last"))

    // carry-in for EVERY bucket either side touches: the last right row
    // of any strictly-earlier bucket. Rows here are bucket summaries —
    // the per-key ordered scan is over O(span/bucketWidth) entries.
    val allBuckets = leftK
      .select((k :+ bkt(col(leftTs)).as("__b")): _*).distinct()
      .unionByName(bucketLast.select((k :+ col("__b")): _*))
      .distinct()
    val carryW = Window.partitionBy(k: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allBuckets
      .join(bucketLast, keys :+ "__b", "left")
      // later buckets always hold later timestamps, so "last non-null in
      // bucket order" IS the max — no struct comparison on the payload
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(carryW))
      .select((k :+ col("__b") :+ col("__carry")): _*)

    // co-partition carry-in (+tag -1), right rows (0), left rows (1) by
    // (key, bucket); one ordered window resolves the match per left row
    val sortTs = col("__tsd")
    val lrowType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val payType = r0.schema("__pay").dataType
    val carryRows = carry
      .select((k :+ col("__b") :+ lit(Double.NegativeInfinity).as("__tsd") :+
        lit(-1).as("__tag") :+ col("__carry").as("__pay") :+
        lit(null).cast(lrowType).as("__lrow")): _*)
    val rightRows = r0
      .select((k :+ bkt(col("__rts")).as("__b") :+
        col("__rts").cast("double").as("__tsd") :+ lit(0).as("__tag") :+
        col("__pay") :+
        lit(null).cast(lrowType).as("__lrow")): _*)
    val leftRows = leftK
      .select((k :+ bkt(col(leftTs)).as("__b") :+
        col(leftTs).cast("double").as("__tsd") :+ lit(1).as("__tag") :+
        lit(null).cast(payType).as("__pay") :+
        struct(leftCols.map(col): _*).as("__lrow")): _*)

    // right sorts before left at equal ts (inclusive backward semantics);
    // the carry row sorts first via -Infinity
    val w = Window.partitionBy((k :+ col("__b")): _*)
      .orderBy(sortTs, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = carryRows.unionByName(rightRows).unionByName(leftRows)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val out = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      (col("__m.__rts").as("asof_ts") +:
        payloadCols.map(c => col(s"__m.__vals.$c").as(s"asof_$c")))
    val nullOut = leftCols.map(col) ++
      (lit(null).cast(right.schema(rightTs).dataType).as("asof_ts") +:
        payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"asof_$c")))
    matched.select(out: _*).unionByName(leftNullKeyed.select(nullOut: _*))
  }

  /** Gap sessionization: appends `sessionCol` (1-based long, counted per
    * key) where a new session starts when the gap to the previous event
    * of the same key exceeds `gap` (same unit as `tsCol` cast to double;
    * strictly-greater — an exactly-`gap` pause continues the session).
    *
    * Equal-timestamp rows always share a session (gap 0), so the
    * assignment is deterministic even though their relative order is not.
    *
    * Scale contract: one window `partition by keys` — each key's full
    * history transits one task, the unavoidable shape for an ordered
    * per-key scan with unbounded session chains (a session may span any
    * time range, so bucketing cannot bound the stitch). Fit for
    * user/session keys where cardinality >> cores and per-key history is
    * bounded (activity data); for pathological hot keys, pre-split the
    * key or use the streaming form ([[graft.streaming.StreamOps]] /
    * `session_window`) whose state is watermark-bounded.
    */
  /** Per-key TRAILING event-time aggregates (the feature-engineering
    * staple: "this user's event count / value sum / mean over the last
    * hour" attached to every event row): a RANGE frame `[ts - span, ts]`
    * partitioned by `keys`, so equal-timestamp rows are peers and share
    * one (deterministic) result regardless of their physical order.
    * `tsCol` must be numeric (e.g. epoch micros — the [[sessionize]]
    * convention); `span` is in the same unit. Rows with a null timestamp
    * form their own peer group (Spark's null-ordering contract) — filter
    * them first if that is not wanted.
    *
    * Scale contract: one window partition per key, the same shape and
    * caveats as [[sessionize]] (hot keys: pre-split or go streaming —
    * the watermarked windowed aggregates in
    * [[graft.streaming.StreamOps]] bound state where this unbounded
    * trailing frame cannot). */
  def rollingAgg(df: DataFrame, keys: Seq[String], tsCol: String, span: Long,
                 valueCol: String): DataFrame = {
    require(keys.nonEmpty, "rollingAgg needs at least one key column")
    require(span >= 0, s"span must be >= 0, got $span")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).cast("long"))
      .rangeBetween(-span, Window.currentRow)
    df.withColumn("roll_count", count(lit(1)).over(w))
      .withColumn("roll_sum", sum(col(valueCol)).over(w))
      .withColumn("roll_mean", avg(col(valueCol)).over(w))
  }

  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String, gap: Double,
                 sessionCol: String = "session_id"): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(gap >= 0, s"gap must be >= 0, got $gap")
    val k = keys.map(col)
    val tsd = col(tsCol).cast("double")
    val w = Window.partitionBy(k: _*).orderBy(tsd)
    val prev = lag(tsd, 1).over(w)
    val isNew = when(prev.isNull || (tsd - prev) > gap, 1L).otherwise(0L)
    df.withColumn(sessionCol,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
