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

  /** Binned range join: each `points` row matched to every `intervals`
    * row with equal `keys` and `startCol <= ptCol <= endCol` (inclusive
    * both ends). Output = all `points` columns then all `intervals`
    * columns except its keys (same names, same values); `how` = "inner"
    * or "left" (unmatched points survive with null interval columns).
    *
    * Spark plans a raw `BETWEEN` join predicate with no equi-key as
    * BroadcastNestedLoop (driver-OOM at any real size) or, keyed, puts a
    * hot key's whole history in one task. This instead makes the range
    * predicate an EQUI-join on a time bin: intervals are exploded to one
    * copy per `binWidth`-wide bin they touch (`sequence` of bin ids — an
    * interval of length L costs `L/binWidth + 1` copies), points carry
    * their single bin, and the join is shuffle-hash/sort-merge on
    * `(keys..., bin)` with the exact range check as a post-predicate.
    * A point's bin holds every interval that could contain it, and the
    * SAME interval copy can match a point at most once (the copy in the
    * point's own bin), so no dedup pass is needed.
    *
    * Scale shape: shuffle volume = points + exploded intervals; task
    * bound = one (key, bin) cell's points x intervals. Pick `binWidth`
    * near the typical interval length — larger wastes post-filtered
    * pairs inside a cell, smaller multiplies interval copies; either
    * degrades linearly, never to a nested loop. Intervals touching more
    * than `maxBinsPerInterval` bins (default 4096 — a mis-chosen
    * binWidth or one pathological row) are routed around the explode
    * entirely: broadcast against the points' distinct (key, bin) set,
    * so a single million-bin interval costs O(bins with data), never
    * O(span/binWidth) rows, and no single row can sink the job.
    * Null keys, null/NaN
    * endpoints, and empty intervals (end < start) never match (SQL
    * semantics); under "left" such points still surface null-extended.
    * Endpoint columns must cast to double losslessly (timestamps, or
    * integers below 2^53 — the [[asofJoin]] contract).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                ptCol: String, startCol: String, endCol: String,
                binWidth: Double, how: String = "inner",
                maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one key column")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(how == "inner" || how == "left", s"how must be inner|left, got $how")
    require(maxBinsPerInterval >= 1,
      s"maxBinsPerInterval must be >= 1, got $maxBinsPerInterval")
    val dup = points.columns.toSet
      .intersect(intervals.columns.toSet.diff(keys.toSet))
    require(dup.isEmpty,
      s"rangeJoin: non-key columns shared by both sides (rename first): ${dup.mkString(", ")}")
    // the bin/rename scratch names must stay ours — silently overwriting
    // a caller column would return bin ids under the caller's name
    val clash = points.columns
      .filter(c => c == "__pb" || c == "__pb0" || c == "__ib" ||
        c.startsWith("__i_")) ++
      intervals.columns.filter(_ == "__ib")
    require(clash.isEmpty,
      s"rangeJoin: reserved column names in input (rename first): ${clash.mkString(", ")}")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")

    // one interval copy per touched bin; degenerate intervals (null/NaN
    // endpoints, end < start) produce an empty/null sequence -> explode
    // drops them, which IS their match semantics. The interval side is
    // renamed wholesale (`__i_*`) so the join condition resolves by name
    // even when both sides share lineage (a self-derived gate query).
    //
    // OVERSIZED intervals (touching > maxBinsPerInterval bins — a
    // mis-chosen binWidth, or one pathological row in real data) never
    // reach the explode: copied per-bin, a single interval spanning 1e9
    // bins would materialize 1e9 rows and kill the job. They instead
    // join against the points' DISTINCT (key, bin) set — bounded by data
    // actually present, not by interval length — and their copies feed
    // the same single downstream join, so inner/left semantics are
    // identical on both routes. The oversized set is broadcast (if it
    // were not small, the binWidth is wrong by construction), and the
    // distinct pass is semi-filtered to oversized KEYS first so the
    // common no-oversized-rows case shuffles nothing.
    val sd = col(startCol).cast("double"); val ed = col(endCol).cast("double")
    val valid = !isnan(sd) && !isnan(ed) && sd <= ed
    // bigness test in DOUBLE: bin() saturates at Long.MaxValue for huge
    // endpoints (incl. +Infinity, which passes `valid`), and a LONG
    // `bin(e) - bin(s) + 1` would overflow negative there and route the
    // very rows this guard exists for back into the explode. Double
    // subtraction never overflows; `diff >= max` == `diff + 1 > max`.
    val isBig = coalesce(valid &&
      (bin(col(endCol)).cast("double") - bin(col(startCol)).cast("double")
        >= maxBinsPerInterval.toDouble), lit(false))
    val iCols = intervals.columns.toIndexedSeq
    val ixRegular = intervals.filter(!isBig)
      .withColumn("__ib", explode(when(valid,
        sequence(bin(col(startCol)), bin(col(endCol))))))
      .select(col("__ib") +: iCols.map(c => col(c).as(s"__i_$c")): _*)
    val big = intervals.filter(isBig)
    // driver-side short circuit: with no oversized rows (the common,
    // well-tuned case) the side route would still cost a full extra scan
    // of points; one tiny probe job on the (filtered) intervals side
    // keeps the plan single-scan there
    val hasBig = !big.limit(1).isEmpty
    val ix = if (!hasBig) ixRegular else {
      val pBins = points
        .select(keys.map(col) :+ bin(col(ptCol)).as("__pb0"): _*)
        .join(broadcast(big.select(keys.map(col): _*).distinct()), keys, "left_semi")
        .distinct()
      val ixBig = pBins
        .join(broadcast(big.select(iCols.map(c => col(c).as(s"__i_$c")): _*)),
          keys.map(c => col(c) === col(s"__i_$c")).reduce(_ && _) &&
            col("__pb0") >= bin(col(s"__i_$startCol")) &&
            col("__pb0") <= bin(col(s"__i_$endCol")), "inner")
        .select(col("__pb0").as("__ib") +: iCols.map(c => col(s"__i_$c")): _*)
      ixRegular.unionByName(ixBig)
    }
    val px = points.withColumn("__pb", bin(col(ptCol)))

    val cond = keys.map(c => col(c) === col(s"__i_$c"))
      .reduce(_ && _) && (col("__pb") === col("__ib")) &&
      col(ptCol).cast("double") >= col(s"__i_$startCol").cast("double") &&
      col(ptCol).cast("double") <= col(s"__i_$endCol").cast("double")
    val joined = px.join(ix, cond, how)
    val out = points.columns.toIndexedSeq.map(col) ++
      intervals.columns.toIndexedSeq.filterNot(keys.contains)
        .map(c => col(s"__i_$c").as(c))
    joined.select(out: _*)
  }

  /** Binned interval-overlap self/cross join: every (`left`, `right`)
    * pair with equal `keys` whose closed intervals overlap —
    * `lStart <= rEnd && rStart <= lEnd`. Output = all `left` columns
    * then all `right` columns except its keys; inner semantics.
    *
    * Same binning discipline as [[rangeJoin]] with BOTH sides exploded;
    * a pair sharing several bins is emitted exactly once via bin
    * responsibility — only the FIRST bin the two intervals share (the
    * later of the two start bins, which any overlapping pair provably
    * shares) counts the match, so no distinct pass over the output.
    * Intervals touching more than `maxBinsPerInterval` bins bypass the
    * explode through broadcast side-joins (pair space partitioned
    * exactly once across the routes) — the same no-single-row-can-sink-
    * the-job contract as [[rangeJoin]].
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          binWidth: Double,
                          maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(keys.nonEmpty, "intervalOverlapJoin needs at least one key column")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval >= 1,
      s"maxBinsPerInterval must be >= 1, got $maxBinsPerInterval")
    val dup = left.columns.toSet
      .intersect(right.columns.toSet.diff(keys.toSet))
    require(dup.isEmpty,
      s"intervalOverlapJoin: non-key columns shared by both sides (rename first): ${dup.mkString(", ")}")
    val clash = left.columns
      .filter(c => c == "__lb" || c == "__rb" || c.startsWith("__r_")) ++
      right.columns.filter(_ == "__rb")
    require(clash.isEmpty,
      s"intervalOverlapJoin: reserved column names in input (rename first): ${clash.mkString(", ")}")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    def validOf(s: String, e: String): Column = {
      val sd = col(s).cast("double"); val ed = col(e).cast("double")
      !isnan(sd) && !isnan(ed) && sd <= ed
    }
    // DOUBLE subtraction: a LONG bin diff overflows on saturated bins
    // (huge/infinite endpoints) — the rangeJoin isBig rationale
    def bigOf(s: String, e: String): Column = coalesce(
      validOf(s, e) && (bin(col(e)).cast("double") - bin(col(s)).cast("double")
        >= maxBinsPerInterval.toDouble),
      lit(false))
    def expl(df: DataFrame, s: String, e: String, b: String): DataFrame =
      df.withColumn(b,
        explode(when(validOf(s, e), sequence(bin(col(s)), bin(col(e))))))
    val rCols = right.columns.toIndexedSeq
    // right side renamed wholesale so the condition resolves by name under
    // shared lineage (the self-overlap case)
    def renameR(df: DataFrame): DataFrame =
      df.select(rCols.map(c => col(c).as(s"__r_$c")): _*)
    val overlapCond = keys.map(c => col(c) === col(s"__r_$c")).reduce(_ && _) &&
      col(lStart).cast("double") <= col(s"__r_$rEnd").cast("double") &&
      col(s"__r_$rStart").cast("double") <= col(lEnd).cast("double")
    val out = left.columns.toIndexedSeq.map(col) ++
      rCols.filterNot(keys.contains).map(c => col(s"__r_$c").as(c))

    // OVERSIZED intervals (> maxBinsPerInterval bins) never reach the
    // explode — a single pathological row would otherwise materialize
    // span/binWidth copies. Pair space partitions exactly once:
    //   regular x regular -> the binned equi-join (bin responsibility)
    //   big x all-right   -> broadcast inner join, plain overlap check
    //   regular x big     -> broadcast inner join, plain overlap check
    // The big sets broadcast: if they were not small, binWidth is wrong
    // by construction. Inner semantics, so no null-extension reconciles
    // across routes.
    val lBig = bigOf(lStart, lEnd)
    val rBigRenamed = bigOf(s"__r_$rStart", s"__r_$rEnd")
    val lR = left.filter(!lBig); val lO = left.filter(lBig)
    val rAll = renameR(right)
    val rR = rAll.filter(!rBigRenamed); val rO = rAll.filter(rBigRenamed)
    // driver-side short circuit per side — the broadcast routes are free
    // to skip when no row qualifies (the rangeJoin rationale)
    val hasLBig = !lO.limit(1).isEmpty
    val hasRBig = !rO.limit(1).isEmpty

    val lx = expl(lR, lStart, lEnd, "__lb")
    val rx = rR
      .withColumn("__rb", explode(when(
        validOf(s"__r_$rStart", s"__r_$rEnd"),
        sequence(bin(col(s"__r_$rStart")), bin(col(s"__r_$rEnd"))))))
    val binned = lx.join(rx,
      overlapCond && (col("__lb") === col("__rb")) &&
        // responsibility: count the pair only in the later start bin
        (col("__lb") === greatest(bin(col(lStart)), bin(col(s"__r_$rStart")))),
      "inner").select(out: _*)
    var result = binned
    if (hasLBig) result = result.unionByName(
      broadcast(lO)
        .join(rAll.filter(coalesce(
          validOf(s"__r_$rStart", s"__r_$rEnd"), lit(false))),
          overlapCond, "inner")
        .select(out: _*))
    if (hasRBig) result = result.unionByName(
      lR.filter(validOf(lStart, lEnd))
        .join(broadcast(rO), overlapCond, "inner")
        .select(out: _*))
    result
  }
}
