package graft.diffy

import graft.GraftFunctions.cosineDistance
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles one schema leaf into a Catalyst delta expression.
  *
  * This is the Spark-native re-expression of the reference's delta typing
  * dispatch (ratatool-diffy/.../Diffy.scala:97-124) and the array/map
  * semantics of AvroDiffy.scala:99-160 — but resolved STATICALLY from the
  * Catalyst type instead of per-row runtime reflection, so the whole
  * dispatch disappears at planning time and each leaf is a codegen'd
  * column expression.
  *
  * Parity traps preserved (SURVEY §7.3):
  *   - numeric-parse-first for strings: `"1"` vs `"2"` is a NUMERIC delta
  *     of 1.0, not a Levenshtein distance (Diffy.scala:97-115). Guarded by
  *     a numeric regex (ANSI-safe, no try/catch at runtime);
  *   - equal-size numeric arrays ⇒ VECTOR delta `1 − cos`; size mismatch ⇒
  *     UNKNOWN (AvroDiffy.scala:117-142);
  *   - `unordered` arrays sorted by STRING rendering before comparison
  *     (Diffy.scala:131-140 sorts by `toString`);
  *   - keyed arrays-of-records matched by subfield with `field[key].sub`
  *     path labels (AvroDiffy.scala:99-115).
  */
object DeltaExpr {

  val deltaStructType: StructType = StructType(Seq(
    StructField("field", StringType, nullable = false),
    StructField("left", StringType, nullable = true),
    StructField("right", StringType, nullable = true),
    StructField("delta_type", StringType, nullable = false),
    StructField("delta", DoubleType, nullable = true)))

  val deltaArrayType: ArrayType = ArrayType(deltaStructType)

  private val NumericRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"

  private def isNumeric(dt: DataType): Boolean = dt.isInstanceOf[NumericType]

  /** Reference rendering: bytes → uppercase hex; containers → JSON; rest →
    * SQL string cast (null stays null; sinks render "null"). */
  def render(c: Column, dt: DataType): Column = dt match {
    case BinaryType                               => upper(hex(c))
    case _: ArrayType | _: MapType | _: StructType => to_json(c)
    case _                                        => c.cast(StringType)
  }

  /** Three-way comparator on string rendering, for `unordered` array sort
    * (the reference sorts by `toString`, so "10" < "9" — preserved). */
  private def strCompare(a: Column, b: Column): Column = {
    val as = a.cast(StringType); val bs = b.cast(StringType)
    when(as.isNull && bs.isNull, 0).when(as.isNull, -1).when(bs.isNull, 1)
      .when(as < bs, -1).when(as > bs, 1).otherwise(0)
  }

  private def sortByString(arr: Column): Column = array_sort(arr, strCompare)

  private def mkDelta(path: String, l: Column, r: Column, dt: DataType,
                      deltaType: Column, delta: Column): Column =
    struct(lit(path).as("field"), render(l, dt).as("left"), render(r, dt).as("right"),
      deltaType.as("delta_type"), delta.as("delta"))

  /** (delta_type, delta) dispatch for one pair of same-type values —
    * shared by plain leaves, keyed-array subfields, and map values. */
  private def scalarDelta(dt: DataType, lc: Column, rc: Column): (Column, Column) =
    dt match {
      case t if isNumeric(t) =>
        (lit("NUMERIC"), rc.cast(DoubleType) - lc.cast(DoubleType))
      case StringType =>
        // numeric-parse-first (Diffy.scala:97-115); regex guard keeps the
        // cast ANSI-safe and the branch fully codegen'd
        val bothNum = lc.rlike(NumericRe) && rc.rlike(NumericRe)
        (when(bothNum, "NUMERIC").when(lc.isNotNull && rc.isNotNull, "STRING")
           .otherwise("UNKNOWN"),
         when(bothNum, rc.cast(DoubleType) - lc.cast(DoubleType))
           .when(lc.isNotNull && rc.isNotNull, levenshtein(lc, rc).cast(DoubleType)))
      case ArrayType(et, _) if isNumeric(et) =>
        val cos = cosineDistance(lc, rc)
        (when(size(lc) === size(rc) && cos.isNotNull, "VECTOR").otherwise("UNKNOWN"),
         when(size(lc) === size(rc), cos))
      case _ =>
        (lit("UNKNOWN"), lit(null).cast(DoubleType))
    }

  /** Delta struct for one leaf, or null when the sides agree. */
  def forLeaf(path: String, dt: DataType, l: Column, r: Column,
              opts: DiffOptions): Column = {
    val (lc, rc, neq) = dt match {
      case _: ArrayType if opts.unordered.contains(path) =>
        val ls = sortByString(l); val rs = sortByString(r)
        (ls, rs, !(ls <=> rs))
      case _ => (l, r, !(l <=> r))
    }
    val (deltaType, delta) = scalarDelta(dt, lc, rc)
    when(neq, mkDelta(path, lc, rc, dt, deltaType, delta))
      .otherwise(lit(null).cast(deltaStructType))
  }

  /** Per-key map diff (reference AvroDiffy.scala:144-160): deltas computed
    * over the UNION of both sides' key sets, one delta per differing key
    * with a `path[key]` label and the value-type dispatch applied to the
    * two values (missing key ⇒ null side ⇒ UNKNOWN/absent-value delta).
    * Returns array<deltaStruct> (possibly empty). Pure higher-order
    * functions; `try_element_at` keeps missing-key lookups ANSI-safe. */
  def forMap(path: String, mt: MapType, l: Column, r: Column): Column = {
    val vt = mt.valueType
    // a null map on ONE side is itself a difference (the per-key union
    // would see identical nulls for every key and silently report SAME):
    // emit a whole-map UNKNOWN delta, matching the plain-leaf behavior
    val nullityDelta = array(struct(lit(path).as("field"),
      render(l, mt).as("left"), render(r, mt).as("right"),
      lit("UNKNOWN").as("delta_type"), lit(null).cast(DoubleType).as("delta")))
    val allKeys = array_distinct(concat(
      coalesce(map_keys(l), array().cast(ArrayType(mt.keyType))),
      coalesce(map_keys(r), array().cast(ArrayType(mt.keyType)))))
    val perKey = transform(allKeys, k => {
      val lv = try_element_at(l, k)
      val rv = try_element_at(r, k)
      val (dt0, delta) = scalarDelta(vt, lv, rv)
      // key present on one side only ⇒ UNKNOWN, matching the reference's
      // unknown-delta for unmatched map entries (AvroDiffy.scala:144-160)
      val deltaType = when(lv.isNull || rv.isNull, "UNKNOWN").otherwise(dt0)
      when(!(lv <=> rv),
        struct(
          concat(lit(s"$path["), k.cast(StringType), lit("]")).as("field"),
          render(lv, vt).as("left"), render(rv, vt).as("right"),
          deltaType.as("delta_type"), delta.as("delta")))
        .otherwise(lit(null).cast(deltaStructType))
    })
    when(l.isNull =!= r.isNull, nullityDelta)
      .otherwise(filter(perKey, d => d.isNotNull))
  }

  /** Leaf whose Catalyst type differs between sides (schema evolution):
    * both sides render to string; inequality yields an UNKNOWN delta,
    * matching the reference's runtime dispatch falling through to
    * UnknownDelta on type mismatch (Diffy.scala:97-115). */
  def forTypeMismatch(path: String, lt: DataType, rt: DataType,
                      l: Column, r: Column): Column = {
    val lr = render(l, lt); val rr = render(r, rt)
    when(!(lr <=> rr),
      struct(lit(path).as("field"), lr.as("left"), rr.as("right"),
        lit("UNKNOWN").as("delta_type"), lit(null).cast(DoubleType).as("delta")))
      .otherwise(lit(null).cast(deltaStructType))
  }

  /** Keyed array-of-struct diff (AvroDiffy.scala:99-115): elements matched
    * by `keyField` instead of position; per matched key, each leaf subfield
    * is diffed with a `path[key].sub` label; keys present on one side only
    * yield an UNKNOWN whole-element delta. Returns array<deltaStruct>
    * (possibly empty), flattened into the row's delta array by the caller.
    * Pure higher-order-function composition: no shuffle, no UDF. */
  def forKeyedArray(path: String, elem: StructType, keyField: String,
                    l: Column, r: Column): Column = {
    val keyOf: Column => Column = e => e.getField(keyField).cast(StringType)
    val lKeys = transform(l, keyOf)
    val rKeys = transform(r, keyOf)
    val allKeys = array_union(coalesce(lKeys, array()), coalesce(rKeys, array()))
    val subFields = elem.fields.filter(_.name != keyField)

    val perKey = transform(allKeys, k => {
      // try_element_at: a key present on only one side filters to an empty
      // array, and plain element_at(…, 1) THROWS under ANSI mode
      val le = try_element_at(filter(l, e => keyOf(e) === k), lit(1))
      val re = try_element_at(filter(r, e => keyOf(e) === k), lit(1))
      val subDeltas: Seq[Column] = subFields.toSeq.map { f =>
        val lv = le.getField(f.name); val rv = re.getField(f.name)
        val sub = forLeaf("", f.dataType, lv, rv, DiffOptions())
        when(le.isNotNull && re.isNotNull && sub.isNotNull,
          sub.withField("field", concat(lit(s"$path["), k, lit(s"].${f.name}"))))
          .otherwise(lit(null).cast(deltaStructType))
      }
      val missing = when(le.isNull || re.isNull,
        struct(concat(lit(s"$path["), k, lit("]")).as("field"),
          render(le, elem).as("left"), render(re, elem).as("right"),
          lit("UNKNOWN").as("delta_type"), lit(null).cast(DoubleType).as("delta")))
        .otherwise(lit(null).cast(deltaStructType))
      filter(array(subDeltas :+ missing: _*), d => d.isNotNull)
    })
    flatten(perKey)
  }
}
