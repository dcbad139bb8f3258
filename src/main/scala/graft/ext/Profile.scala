package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass dataset profiling and declarative data-quality constraints —
  * the pre-flight check a 100 TB ingest runs before (and after) every
  * pipeline stage: did a column go null-heavy, did cardinality collapse,
  * did a range drift, are the keys still unique?
  *
  * Shape: [[profile]] and [[check]] each compile to ONE aggregation over
  * one scan — every metric is an agg expression, the per-column /
  * per-constraint rows are exploded from the single result row
  * driver-side-free (an `inline` of a literal-keyed struct array).
  * Cardinality uses `approx_count_distinct` (fixed-size HLL state, the
  * only distinct that survives 100 TB); [[Unique]] is the one constraint
  * that pays an exact distinct expand — its scaladoc says so, and the
  * fingerprint-dedup operators are the scale path when approximate
  * uniqueness isn't enough.
  */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Per-column profile: one output row per requested column (default:
    * all), from one aggregation pass.
    *
    * Columns: `col`, `n_rows`, `n_nonnull`, `completeness`,
    * `approx_distinct` (HLL, rsd 2%), and for numeric columns
    * `min_v`/`max_v`/`mean_v`/`stddev_v` (sample), for string
    * columns `avg_len`/`max_len` — others null; values unrounded
    * (presentation rounding belongs to the caller). */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    names.foreach(c => require(types.contains(c), s"no such column: $c"))
    val nRows = count(lit(1))
    val metricStructs = names.map { c =>
      val dt = types(c)
      val v = col(c)
      val numeric = isNumeric(dt)
      val string = dt == StringType
      struct(
        lit(c).as("col"),
        nRows.as("n_rows"),
        count(v).as("n_nonnull"),
        (count(v).cast("double") / nRows).as("completeness"),
        approx_count_distinct(v, rsd = 0.02).as("approx_distinct"),
        (if (numeric) min(v.cast("double")) else lit(null).cast("double")).as("min_v"),
        (if (numeric) max(v.cast("double")) else lit(null).cast("double")).as("max_v"),
        (if (numeric) avg(v.cast("double")) else lit(null).cast("double")).as("mean_v"),
        (if (numeric) stddev_samp(v.cast("double")) else lit(null).cast("double")).as("stddev_v"),
        (if (string) avg(length(v).cast("double")) else lit(null).cast("double")).as("avg_len"),
        (if (string) max(length(v)).cast("long") else lit(null).cast("long")).as("max_len"))
    }
    df.agg(array(metricStructs: _*).as("__m"))
      .select(inline(col("__m")))
  }

  /** A declarative data-quality constraint; `observed` below is the
    * measured value its verdict compares against. */
  sealed trait Constraint {
    def label: String
    def column: String
  }
  /** Every value of `column` is non-null. Observed: null count. */
  final case class NotNull(column: String) extends Constraint {
    val label = "not_null"
  }
  /** Non-null fraction of `column` ≥ `frac`. Observed: completeness. */
  final case class CompletenessAtLeast(column: String, frac: Double)
    extends Constraint { val label = "completeness_at_least" }
  /** All non-null values of numeric `column` in [lo, hi]. Observed:
    * out-of-range count. */
  final case class InRange(column: String, lo: Double, hi: Double)
    extends Constraint { val label = "in_range" }
  /** Fraction of non-null values fully matching `regex` ≥ `minFrac`.
    * Observed: matching fraction. */
  final case class MatchesRegex(column: String, regex: String, minFrac: Double)
    extends Constraint { val label = "matches_regex" }
  /** `columns` form a unique key. Observed: n_rows − n_distinct.
    * COST NOTE: exact distinct — at full scale this is the one check
    * here that shuffles the key column; prefer the dedup operators'
    * fingerprint path when an approximate answer would do. */
  final case class Unique(columns: Seq[String]) extends Constraint {
    val label = "unique"
    val column: String = columns.mkString(",")
  }
  /** approx_count_distinct(column) in [lo, hi] — the drift alarm for
    * cardinality collapse (every value suddenly "en") or explosion
    * (an id leaked into a category column). Observed: the estimate.
    * Band endpoints must absorb the sketch's ~2% rsd. */
  final case class ApproxDistinctBetween(column: String, lo: Long, hi: Long)
    extends Constraint { val label = "approx_distinct_between" }

  /** Evaluate all constraints in one aggregation pass: one output row
    * per constraint — `constraint`, `col`, `observed` (6dp), `passed`. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "check needs at least one constraint")
    df.agg(checkArray(constraints).as("__c"))
      .select(inline(col("__c")))
  }

  /** The constraint verdicts as ONE aggregate array-of-structs column —
    * the building block [[check]] applies globally and the streaming
    * telemetry applies per window ([[graft.streaming.StreamOps
    * .constraintTelemetry]]). [[Unique]] needs an exact distinct, which
    * streaming state cannot hold — callers grouping a stream must
    * exclude it (constraintTelemetry rejects it with a clear error). */
  def checkArray(constraints: Seq[Constraint]): Column = {
    require(constraints.nonEmpty, "check needs at least one constraint")
    val rows: Seq[(String, String, Column, Column)] = constraints.map {
      case NotNull(c) =>
        val nulls = count(lit(1)) - count(col(c))
        ("not_null", c, nulls.cast("double"), nulls === 0L)
      case CompletenessAtLeast(c, f) =>
        // empty input is vacuously complete (0/0 would yield a null
        // verdict — a constraint row must always carry a real boolean)
        val comp = when(count(lit(1)) === 0L, 1.0)
          .otherwise(count(col(c)).cast("double") / count(lit(1)))
        ("completeness_at_least", c, comp, comp >= f)
      case InRange(c, lo, hi) =>
        val out = sum(when(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
        val observed = coalesce(out, lit(0L)).cast("double")
        ("in_range", c, observed, observed === 0.0)
      case MatchesRegex(c, re, minFrac) =>
        val m = sum(when(col(c).rlike("^(?:" + re + ")$"), 1L).otherwise(0L))
        // vacuously passes when no non-null value exists (same rationale
        // as the empty-input completeness rule)
        val frac = when(count(col(c)) === 0L, 1.0)
          .otherwise(coalesce(m, lit(0L)).cast("double") / count(col(c)))
        ("matches_regex", c, frac, frac >= minFrac)
      case u @ Unique(cs) =>
        // struct-wrap the key so a NULL key counts as one distinct value
        // (bare countDistinct drops null keys entirely, which would
        // report every null-keyed row as a duplicate)
        val dups = count(lit(1)) - countDistinct(struct(cs.map(col): _*))
        ("unique", u.column, dups.cast("double"), dups === 0L)
      case ApproxDistinctBetween(c, lo, hi) =>
        val est = approx_count_distinct(col(c), rsd = 0.02)
        ("approx_distinct_between", c, est.cast("double"),
          est >= lo && est <= hi)
    }
    val structs = rows.map { case (label, c, observed, passed) =>
      struct(lit(label).as("constraint"), lit(c).as("col"),
        round(observed, 6).as("observed"), passed.as("passed"))
    }
    array(structs: _*)
  }
}
