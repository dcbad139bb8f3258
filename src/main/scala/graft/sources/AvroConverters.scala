package graft.sources

import java.nio.ByteBuffer
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro ⇄ Catalyst conversion for the engine's Avro IO paths.
  *
  * Mirrors the type mapping the reference relies on (SURVEY §1.2): ints
  * stay ints, nullable fields are `[null, T]` unions, bytes ⇄ ByteBuffer,
  * `Utf8` → String, enum → name string, fixed → bytes, map keys are
  * strings. General multi-branch unions are out of scope (the reference's
  * own test schemas never use them — TestRecord.avsc:15-25).
  */
object AvroConverters {

  /** Avro schema → Catalyst schema. */
  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"expected record, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toDataType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def toDataType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"only [null, T] unions are supported, got ${s.getTypes.asScala.map(_.getType)}")
      (toDataType(branches.head)._1, true)
    case Schema.Type.RECORD  => (toStructType(s), false)
    case Schema.Type.ARRAY   =>
      val (et, en) = toDataType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP     =>
      val (vt, vn) = toDataType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.ENUM    => (StringType, false)
    case Schema.Type.BYTES   =>
      s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.FIXED   =>
      s.getLogicalType match {
        // Hive/parquet-avro writers commonly back decimals with FIXED
        case d: org.apache.avro.LogicalTypes.Decimal =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.INT =>
      s.getLogicalType match {
        case _: org.apache.avro.LogicalTypes.Date => (DateType, false)
        case _                                    => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: org.apache.avro.LogicalTypes.TimestampMicros      => (TimestampType, false)
        case _: org.apache.avro.LogicalTypes.LocalTimestampMicros => (TimestampNTZType, false)
        case _                                                    => (LongType, false)
      }
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case other => throw new UnsupportedOperationException(s"avro type $other")
  }

  /** Catalyst schema → Avro record schema (nullable ⇒ [null, T] union). */
  def toAvroSchema(st: StructType, recordName: String = "record",
                   namespace: String = "graft"): Schema = {
    val fields = st.fields.map { f =>
      val base = fieldSchema(f.dataType, s"${recordName}_${f.name}", namespace)
      val sch = if (f.nullable) Schema.createUnion(
        List(Schema.create(Schema.Type.NULL), base).asJava) else base
      new Schema.Field(f.name, sch,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, namespace, false, fields.toList.asJava)
  }

  private def fieldSchema(dt: DataType, name: String, ns: String): Schema = dt match {
    case StringType    => Schema.create(Schema.Type.STRING)
    case BinaryType    => Schema.create(Schema.Type.BYTES)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType      => Schema.create(Schema.Type.LONG)
    case FloatType     => Schema.create(Schema.Type.FLOAT)
    case DoubleType    => Schema.create(Schema.Type.DOUBLE)
    case BooleanType   => Schema.create(Schema.Type.BOOLEAN)
    // temporal types carry Avro logical type annotations so the Catalyst
    // type survives a write→read roundtrip
    case TimestampType => org.apache.avro.LogicalTypes.timestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType => org.apache.avro.LogicalTypes.localTimestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    case DateType => org.apache.avro.LogicalTypes.date()
      .addToSchema(Schema.create(Schema.Type.INT))
    // the standard Avro decimal logical type: two's-complement unscaled
    // bytes, precision/scale carried in the schema
    case d: DecimalType => org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
      .addToSchema(Schema.create(Schema.Type.BYTES))
    case st: StructType => toAvroSchema(st, name, ns)
    case ArrayType(et, containsNull) =>
      val e = fieldSchema(et, s"${name}_item", ns)
      Schema.createArray(if (containsNull)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), e).asJava) else e)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = fieldSchema(vt, s"${name}_value", ns)
      Schema.createMap(if (valueContainsNull)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), v).asJava) else v)
    case other => throw new UnsupportedOperationException(s"catalyst type $other for avro")
  }

  /** Avro datum → Row-compatible value under the given Catalyst type. */
  def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (e: Any, StringType) if e.getClass.getName.contains("GenericData$EnumSymbol") =>
      e.toString
    case (b: ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (b: ByteBuffer, d: DecimalType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out)
      new java.math.BigDecimal(new java.math.BigInteger(out), d.scale)
    case (f: GenericData.Fixed, d: DecimalType) =>
      new java.math.BigDecimal(new java.math.BigInteger(f.bytes()), d.scale)
    case (f: GenericData.Fixed, BinaryType) => f.bytes()
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map(f => toCatalyst(r.get(f.name), f.dataType)))
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.toSeq.map(toCatalyst(_, et))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> toCatalyst(mv, vt) }.toMap
    case (i: java.lang.Integer, LongType) => i.longValue()
    case (x, TimestampType) =>
      // full micros precision: Timestamp.getTime/1000 round trips would
      // truncate sub-millisecond digits
      val micros = x.asInstanceOf[Long]
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
    case (x, TimestampNTZType) => java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(x.asInstanceOf[Long], 1000000L),
      (Math.floorMod(x.asInstanceOf[Long], 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    case (x, DateType) => java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(x.asInstanceOf[Int].toLong))
    case (x, _) => x
  }

  /** Row → Avro GenericRecord under the given Avro schema. */
  def toAvro(row: Row, schema: Schema, st: StructType): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvroValue(if (row.isNullAt(i)) null else row.get(i),
        nonNull(schema.getField(f.name).schema()), f.dataType))
    }
    rec
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvroValue(v: Any, s: Schema, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) => toAvro(r, s, st)
    // match scala.collection.Seq/Map, NOT the 2.13 immutable defaults:
    // Spark external Rows carry mutable.ArraySeq for array columns, which
    // silently falls through an immutable.Seq pattern into the raw-value
    // case and dies in avro with "Array data must be a Collection or Array"
    case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
      val out = new java.util.ArrayList[Any](seq.size)
      seq.foreach(x => out.add(toAvroValue(x, nonNull(s.getElementType), et)))
      out
    case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
      val out = new java.util.HashMap[String, Any](m.size)
      m.foreach { case (k, mv) =>
        out.put(k.toString, toAvroValue(mv, nonNull(s.getValueType), vt)) }
      out
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (bd: java.math.BigDecimal, d: DecimalType) =>
      ByteBuffer.wrap(bd.setScale(d.scale).unscaledValue.toByteArray)
    case (bd: BigDecimal, d: DecimalType) =>
      ByteBuffer.wrap(bd.underlying.setScale(d.scale).unscaledValue.toByteArray)
    case (b: Byte, _) => b.toInt
    case (sh: Short, _) => sh.toInt
    case (t: java.sql.Timestamp, TimestampType) =>
      // via Instant: getTime*1000 drops the sub-millisecond nanos part
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (t: java.time.Instant, TimestampType) =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case (t: java.time.LocalDateTime, TimestampNTZType) =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (x, _) => x
  }
}
