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

  /** Composite record key: parts joined with `_` (reference MultiKey). */
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
}
