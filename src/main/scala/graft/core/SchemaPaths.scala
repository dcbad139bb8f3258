package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Field-path resolution and key extraction over `StructType`.
  *
  * Re-expression of the reference's record-key machinery
  * (ratatool-diffy/.../BigDiffy.scala:621-664): dotted paths `a.b.c` resolve
  * through nested structs; key values stringify with bytes → UPPERCASE hex
  * (BigDiffy.scala:630-634), null → literal "null" (:626-635), and multiple
  * keys join with `_` (MultiKey, BigDiffy.scala:64-70).
  *
  * All of it is pure `Column` composition — Catalyst prunes unused struct
  * legs and pushes the key projection into the scan.
  */
object SchemaPaths {

  /** Resolve a dotted path to the Catalyst type it denotes, or None if the
    * path doesn't exist. Descends structs; a path segment cannot descend
    * into arrays/maps (matching the reference, which treats repeated fields
    * as terminal for keys). */
  def typeAt(schema: StructType, path: String): Option[DataType] = {
    def go(dt: DataType, parts: List[String]): Option[DataType] = (dt, parts) match {
      case (t, Nil) => Some(t)
      case (st: StructType, p :: rest) =>
        st.fields.find(_.name == p).flatMap(f => go(f.dataType, rest))
      case _ => None
    }
    go(schema, path.split('.').toList)
  }

  /** All leaf paths of a schema with their types, in schema order.
    * Arrays/maps are leaves (diffed/hashed as whole values). */
  def leafPaths(schema: StructType, prefix: String = ""): Seq[(String, DataType)] =
    schema.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => leafPaths(st, p)
        case dt             => Seq(p -> dt)
      }
    }

  /** All intermediate STRUCT node paths (the non-leaf "message" nodes), in
    * schema order — the presence-bearing nodes of a protobuf-style schema. */
  def structNodePaths(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => p +: structNodePaths(st, p)
        case _              => Nil
      }
    }

  /** One key field rendered as string: bytes → uppercase hex, null → "null",
    * everything else → SQL string cast. */
  def keyPart(schema: StructType, path: String): Column = {
    val c = col(path)
    val rendered = typeAt(schema, path) match {
      case Some(BinaryType) => upper(hex(c))
      case _                => c.cast(StringType)
    }
    coalesce(rendered, lit("null"))
  }

  /** Composite record key: parts joined with `_` (reference MultiKey,
    * BigDiffy.scala:64-70). Parity trap preserved intentionally: the
    * `_`-join can alias when values themselves contain underscores —
    * ("a_b","c") renders identically to ("a","b_c") — exactly as in the
    * reference; callers needing collision-free composites should pick a
    * separator absent from their key domain. */
  def multiKey(schema: StructType, paths: Seq[String]): Column = {
    require(paths.nonEmpty, "at least one key field required")
    val parts = paths.map(p => keyPart(schema, p))
    if (parts.size == 1) parts.head
    else concat(parts.flatMap(p => Seq(lit("_"), p)).tail: _*)
  }

  /** keyBy projection: `(key, record-struct)` shaping used before the diff
    * join (reference BigDiffy.scala:229-230). */
  def keyBy(df: DataFrame, keys: Seq[String], valueName: String): DataFrame =
    df.select(multiKey(df.schema, keys).as("__key"), struct(col("*")).as(valueName))

  /** BigQuery-style union merge of two schemas (reference
    * BigDiffy.scala:549-579 mergeTableSchema): fields present on either
    * side survive, same-name records merge recursively, same-name
    * primitives must agree up to numeric widening (int ⊂ long ⊂ double;
    * float ⊂ double) and nullability is OR'd. A non-widenable type
    * conflict is an error, matching the reference's merge failure. */
  def mergeSchemas(l: StructType, r: StructType): StructType = {
    val rByName = r.fields.map(f => f.name -> f).toMap
    val merged = l.fields.map { lf =>
      rByName.get(lf.name) match {
        // one-sided fields must be nullable in the union view: rows from
        // the side that lacks the field can only supply null
        case None => lf.copy(nullable = true)
        case Some(rf) =>
          StructField(lf.name, mergeType(lf.name, lf.dataType, rf.dataType),
            lf.nullable || rf.nullable)
      }
    }
    val extras = r.fields.filterNot(f => l.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(merged ++ extras)
  }

  private def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (ByteType | ShortType | IntegerType, LongType) => Some(LongType)
    case (LongType, ByteType | ShortType | IntegerType) => Some(LongType)
    case (ByteType | ShortType | IntegerType | LongType | FloatType, DoubleType) => Some(DoubleType)
    case (DoubleType, ByteType | ShortType | IntegerType | LongType | FloatType) => Some(DoubleType)
    case _ => None
  }

  private def mergeType(path: String, a: DataType, b: DataType): DataType = (a, b) match {
    case (x: StructType, y: StructType) => mergeSchemas(x, y)
    case (ArrayType(x, n1), ArrayType(y, n2)) =>
      ArrayType(mergeType(path, x, y), n1 || n2)
    case (MapType(k1, v1, n1), MapType(k2, v2, n2)) if k1 == k2 =>
      MapType(k1, mergeType(path, v1, v2), n1 || n2)
    case (x, y) => widen(x, y).getOrElse(
      throw new IllegalArgumentException(
        s"schema merge conflict at '$path': ${x.catalogString} vs ${y.catalogString}"))
  }

  /** Reader-compatibility selection (reference ParquetIO.scala:57-75 picks
    * whichever side's schema can read both): a schema can read another iff
    * every field it shares agrees up to widening TOWARD the reader and it
    * is nullable wherever the other side lacks the field. */
  def canRead(reader: StructType, writer: StructType): Boolean =
    writer.fields.forall { wf =>
      reader.fields.find(_.name == wf.name) match {
        case None => true // reader ignores unknown writer fields
        case Some(rf) =>
          // a nullable writer field needs a nullable reader field — a
          // non-nullable reader column fed writer nulls corrupts
          // downstream null-elision optimizations
          readableType(rf.dataType, wf.dataType) && (!wf.nullable || rf.nullable)
      }
    } && reader.fields.forall { rf =>
      writer.fields.exists(_.name == rf.name) || rf.nullable
    }

  private def readableType(r: DataType, w: DataType): Boolean = (r, w) match {
    case (x, y) if x == y => true
    case (x: StructType, y: StructType) => canRead(x, y)
    case (ArrayType(x, _), ArrayType(y, _)) => readableType(x, y)
    case (MapType(k1, x, _), MapType(k2, y, _)) => k1 == k2 && readableType(x, y)
    case _ => widen(r, w).contains(r) // numeric widening toward the reader
  }

  /** Pick the side whose schema can read both, preferring lhs (reference
    * ParquetIO compat selection); error when neither side is compatible. */
  def compatSchema(l: StructType, r: StructType): StructType =
    if (canRead(l, r)) l
    else if (canRead(r, l)) r
    else throw new IllegalArgumentException(
      "neither schema can read the other; use mergeSchemas for a union view")
}
