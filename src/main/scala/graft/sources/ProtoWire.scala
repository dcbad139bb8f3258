package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import org.apache.hadoop.io.{BytesWritable, NullWritable}
import org.apache.hadoop.mapreduce.{RecordWriter, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.output.FileOutputFormat
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Pure-Scala protobuf wire-format reader/writer (S5 + G3) — no protobuf
  * runtime on the classpath, so the wire format itself is implemented
  * from the public spec: varint tags, zigzag sint32/64, little-endian
  * fixed32/64, length-delimited strings/bytes/messages, and the standard
  * `writeDelimitedTo` file framing (varint length prefix per message).
  *
  * Reference surface covered: the protobuf file scan feeding BigDiffy
  * (reference BigDiffy.scala:339 `sc.protobufFile`) and the wire-emitting
  * generator (ProtoBufGenerator.scala:37-206, whose CodedOutputStream
  * writers these encoders mirror writer-for-writer), replayed through a
  * descriptor model shaped like schemas.proto
  * (ratatool-common/src/test/protobuf/schemas.proto).
  *
  * Semantics (proto2, public spec):
  *   - optional/required scalar seen twice on the wire: last one wins;
  *   - optional/required MESSAGE seen twice: merged — concatenated
  *     serializations parse as the merged message, so the decoder
  *     accumulates the raw chunks and parses once;
  *   - repeated fields concatenate across occurrences; the decoder also
  *     accepts PACKED primitive encodings (wire type 2) although the
  *     encoder emits the unpacked form the reference's CodedOutputStream
  *     calls produce;
  *   - unknown field numbers are skipped by wire type (groups included);
  *   - a missing `required` field fails the parse loudly, like
  *     `parseFrom`'s uninitialized-message error;
  *   - proto2 presence maps to Row nullability: a missing optional field
  *     decodes to null, never to the type's default — exactly the
  *     information [[graft.diffy.BigDiffy]]'s messagePresence consumes.
  *
  * proto3 (via [[PImplicit]], open [[PEnum]]s, packed emission, and
  * `syntax = "proto3"` in [[parseProto]]): no-presence scalar fields
  * decode absent-as-default into non-nullable columns and omit defaults
  * on the wire; repeated primitives emit PACKED; enums are open (unknown
  * numbers survive as decimal strings and encode back). [[PMap]] fields
  * and `oneof` groups (last-member-seen-wins on decode, at-most-one-set
  * enforced on encode) are supported under both syntaxes.
  *
  * Scale: files are non-splittable (the length-delimited stream has no
  * sync markers — same contract as the reference's Beam ProtoIO), so
  * read parallelism is per FILE and the writer emits one file per input
  * partition through the Hadoop committer (task retries and speculative
  * attempts commit exactly one winner). Write with enough partitions
  * that no single file dominates.
  */
object ProtoWire {

  // ---- descriptor model ----------------------------------------------------

  sealed trait PLabel
  case object POptional extends PLabel
  case object PRequired extends PLabel
  case object PRepeated extends PLabel
  /** proto3 implicit presence (a singular scalar/enum field with no
    * `optional` keyword): absent on the wire IS the default value — the
    * decoder materializes the default instead of null, and the encoder
    * omits default values, so the column is non-nullable and the round
    * trip is lossless over the no-presence semantics. */
  case object PImplicit extends PLabel

  sealed trait PType
  case object PDouble extends PType
  case object PFloat extends PType
  case object PInt32 extends PType
  case object PInt64 extends PType
  case object PUInt32 extends PType
  case object PUInt64 extends PType
  case object PSInt32 extends PType
  case object PSInt64 extends PType
  case object PFixed32 extends PType
  case object PFixed64 extends PType
  case object PSFixed32 extends PType
  case object PSFixed64 extends PType
  case object PBool extends PType
  case object PString extends PType
  case object PBytes extends PType
  final case class PMsg(msg: PMessage) extends PType
  /** Enum: symbols carried as STRINGS in the Row (readable, join-able),
    * numbers on the wire. A wire number outside the declared set decodes
    * to null for a CLOSED (proto2) enum — proto2 treats unknown enum
    * values as unknown fields, and the presence-as-nullability model has
    * no unknown-field buffer to preserve them in — and to the number's
    * DECIMAL STRING for an OPEN (proto3) enum, which preserves the value
    * like proto3 requires; the encoder accepts a decimal-string symbol
    * back for an open enum, so the round trip is lossless. */
  final case class PEnum(name: String, symbols: Map[String, Int],
                         open: Boolean = false) extends PType {
    require(symbols.nonEmpty, s"enum $name needs at least one symbol")
    require(symbols.values.toSeq.distinct.size == symbols.size,
      s"enum $name: duplicate numbers")
    private[ProtoWire] val byNumber: Map[Int, String] =
      symbols.map { case (s, n) => n -> s }
    /** proto's default symbol: number 0 when declared, else the least
      * number (proto2's first-declared default is approximated by the
      * least number — the Map constructor carries no declaration order). */
    private[ProtoWire] val defaultSymbol: String =
      byNumber.getOrElse(0, symbols.minBy(_._2)._1)
  }

  /** `map<key, value>` field: a repeated synthetic entry message on the
    * wire (field 1 = key, field 2 = value), a non-null `MapType` column
    * in the Row. Duplicated keys: last one wins (spec). An entry with a
    * missing key or value decodes to that side's default (for a message
    * value: the empty message). */
  final case class PMap(key: PType, value: PType) extends PType {
    require(key match {
      case PInt32 | PInt64 | PUInt32 | PUInt64 | PSInt32 | PSInt64 |
           PFixed32 | PFixed64 | PSFixed32 | PSFixed64 | PBool | PString => true
      case _ => false
    }, "map key must be an integral, bool, or string type")
    require(!value.isInstanceOf[PMap], "map value cannot be another map")
    private[ProtoWire] def keyField: PField = PField(1, "key", POptional, key)
    private[ProtoWire] def valueField: PField = PField(2, "value", POptional, value)
  }

  /** `oneof`: members carry their group's name; at most one member is
    * non-null per row (the encoder enforces it loudly), and the decoder
    * applies last-member-seen-wins across the group like `parseFrom`.
    * `packed`: repeated primitives EMIT the packed run (proto3's default
    * and proto2's `[packed = true]`); the decoder accepts both forms for
    * every repeated primitive regardless. */
  final case class PField(number: Int, name: String, label: PLabel, ptype: PType,
                          oneof: Option[String] = None, packed: Boolean = false) {
    require(number >= 1 && number < (1 << 29) && !(number >= 19000 && number <= 19999),
      s"field number $number outside the valid proto range")
    require(oneof.isEmpty || (label == POptional && !ptype.isInstanceOf[PMap]),
      s"$name: a oneof member must be a singular optional field")
  }

  /** @param truncated field numbers that exist in the SOURCE schema but
    *        were cut from this (unrolled) descriptor level because their
    *        message type already occurs `maxRecursionDepth` times on the
    *        ancestor chain ([[parseProto]]'s bounded unroll of recursive
    *        schemas). Not silent: the decoder fails LOUDLY when wire data
    *        carries one of these numbers — deeper data needs a deeper
    *        re-parse, never a silent drop. Maps number → type name. */
  final case class PMessage(name: String, fields: Seq[PField],
                            truncated: Map[Int, String] = Map.empty) {
    require(fields.map(_.number).distinct.size == fields.size,
      s"$name: duplicate field numbers")
    require(fields.map(_.name).distinct.size == fields.size,
      s"$name: duplicate field names")
    require(truncated.keySet.intersect(fields.map(_.number).toSet).isEmpty,
      s"$name: truncated numbers overlap declared fields")
    private[ProtoWire] val byNumber: Map[Int, (PField, Int)] =
      fields.zipWithIndex.map { case (f, i) => f.number -> (f, i) }.toMap
    private[ProtoWire] val oneofGroups: Map[String, Seq[Int]] =
      fields.zipWithIndex.collect { case (f, i) if f.oneof.isDefined =>
        (f.oneof.get, i) }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    private[ProtoWire] val oneofSiblings: Map[Int, Seq[Int]] =
      oneofGroups.values.flatMap(idxs =>
        idxs.map(i => i -> idxs.filterNot(_ == i))).toMap
  }

  private def baseType(t: PType): DataType = t match {
    case PDouble                           => DoubleType
    case PFloat                            => FloatType
    case PInt32 | PSInt32 | PSFixed32      => IntegerType
    // uint32/fixed32 follow proto-java: held in a 32-bit int,
    // two's-complement for values past Int.MaxValue
    case PUInt32 | PFixed32                => IntegerType
    case PInt64 | PSInt64 | PSFixed64      => LongType
    case PUInt64 | PFixed64                => LongType
    case PBool                             => BooleanType
    case PString                           => StringType
    case PBytes                            => BinaryType
    case _: PEnum                          => StringType
    case PMsg(m)                           => sparkSchema(m)
    // missing key/value decode to defaults, so values hold no nulls
    case PMap(k, v)                        =>
      MapType(baseType(k), baseType(v), valueContainsNull = false)
  }

  /** The descriptor's Spark schema: presence-tracked (optional) fields are
    * nullable, required and proto3 no-presence (implicit) fields are not
    * (absence decodes to the default), repeated are non-null arrays of
    * non-null elements (proto repeated fields hold no nulls, only
    * emptiness), maps are non-null `MapType` columns. */
  def sparkSchema(msg: PMessage): StructType =
    StructType(msg.fields.map { f =>
      val base = baseType(f.ptype)
      f.ptype match {
        case _: PMap => StructField(f.name, base, nullable = false)
        case _ => f.label match {
          case PRepeated => StructField(f.name, ArrayType(base, containsNull = false),
            nullable = false)
          case POptional => StructField(f.name, base, nullable = true)
          // a message field always has presence, even under proto3
          case PImplicit => StructField(f.name, base,
            nullable = f.ptype.isInstanceOf[PMsg])
          case PRequired => StructField(f.name, base, nullable = false)
        }
      }
    })

  /** proto's per-type default value — what a proto3 no-presence field
    * reads as when absent, and what a map entry's missing side becomes. */
  private[sources] def defaultValue(t: PType): Any = t match {
    case PDouble => 0.0d
    case PFloat => 0.0f
    case PInt32 | PSInt32 | PSFixed32 | PUInt32 | PFixed32 => 0
    case PInt64 | PSInt64 | PSFixed64 | PUInt64 | PFixed64 => 0L
    case PBool => false
    case PString => ""
    case PBytes => Array.emptyByteArray
    case e: PEnum => e.defaultSymbol
    case _: PMsg | _: PMap => null
  }

  /** Whether `v` is `t`'s default (proto3 encoders omit defaults for
    * no-presence fields). Floats compare by RAW BITS like protobuf-java:
    * -0.0 is NOT the default and stays on the wire. */
  private def isDefault(t: PType, v: Any): Boolean = t match {
    case PDouble => java.lang.Double.doubleToRawLongBits(asDouble(v)) == 0L
    case PFloat => java.lang.Float.floatToRawIntBits(asFloat(v)) == 0
    case PInt32 | PSInt32 | PSFixed32 | PUInt32 | PFixed32 => asInt(v) == 0
    case PInt64 | PSInt64 | PSFixed64 | PUInt64 | PFixed64 => asLong(v) == 0L
    case PBool => !v.asInstanceOf[Boolean]
    case PString => v.asInstanceOf[String].isEmpty
    case PBytes => v.asInstanceOf[Array[Byte]].isEmpty
    case e: PEnum => enumNumber(e, v) == 0
    case _ => false
  }

  // ---- varint / zigzag primitives ------------------------------------------

  private[sources] def zigzag32(n: Int): Int = (n << 1) ^ (n >> 31)
  private[sources] def zigzag64(n: Long): Long = (n << 1) ^ (n >> 63)
  private[sources] def unzigzag32(n: Int): Int = (n >>> 1) ^ -(n & 1)
  private[sources] def unzigzag64(n: Long): Long = (n >>> 1) ^ -(n & 1L)

  private[sources] def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7FL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Mutable cursor over a byte array — the decode loop's only state. */
  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def byte(): Int = {
      if (pos >= end) throw new IllegalArgumentException(
        "proto wire: truncated input (ran off the buffer)")
      val b = buf(pos) & 0xFF; pos += 1; b
    }
    def varint(): Long = {
      var shift = 0; var result = 0L
      while (shift < 64) {
        val b = byte()
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("proto wire: malformed varint (>10 bytes)")
    }
    def fixed32(): Int = {
      val v = (byte()) | (byte() << 8) | (byte() << 16) | (byte() << 24)
      v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (byte().toLong << (8 * i)); i += 1 }
      v
    }
    def slice(len: Int): Array[Byte] = {
      if (len < 0 || pos + len > end) throw new IllegalArgumentException(
        s"proto wire: length-delimited field of $len bytes overruns the buffer")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      a
    }
    def skipBytes(len: Int): Unit = {
      if (len < 0 || pos + len > end) throw new IllegalArgumentException(
        s"proto wire: skip of $len bytes overruns the buffer")
      pos += len
    }
  }

  private val WireVarint = 0
  private val WireFixed64 = 1
  private val WireLen = 2
  private val WireStartGroup = 3
  private val WireEndGroup = 4
  private val WireFixed32 = 5

  // ---- encoding --------------------------------------------------------------

  private def writeTag(out: ByteArrayOutputStream, number: Int, wt: Int): Unit =
    writeVarint(out, ((number.toLong << 3) | wt.toLong))

  private def writeLenDelimited(out: ByteArrayOutputStream, number: Int,
                                bytes: Array[Byte]): Unit = {
    writeTag(out, number, WireLen)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes, 0, bytes.length)
  }

  private def writeFixed32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def writeFixed64(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xFFL).toInt); i += 1 }
  }

  /** One scalar occurrence of `f` carrying `v` (not null). Mirrors the
    * reference's per-type CodedOutputStream writers
    * (ProtoBufGenerator.scala:48-122) on the public wire spec. */
  private def writeScalar(out: ByteArrayOutputStream, f: PField, v: Any): Unit =
    f.ptype match {
      case PDouble =>
        writeTag(out, f.number, WireFixed64)
        writeFixed64(out, java.lang.Double.doubleToLongBits(asDouble(v)))
      case PFloat =>
        writeTag(out, f.number, WireFixed32)
        writeFixed32(out, java.lang.Float.floatToIntBits(asFloat(v)))
      case PInt32 => // negative int32 sign-extends to a 10-byte varint (spec)
        writeTag(out, f.number, WireVarint); writeVarint(out, asInt(v).toLong)
      case PInt64 =>
        writeTag(out, f.number, WireVarint); writeVarint(out, asLong(v))
      case PUInt32 =>
        writeTag(out, f.number, WireVarint)
        writeVarint(out, asInt(v).toLong & 0xFFFFFFFFL)
      case PUInt64 =>
        writeTag(out, f.number, WireVarint); writeVarint(out, asLong(v))
      case PSInt32 =>
        writeTag(out, f.number, WireVarint)
        writeVarint(out, zigzag32(asInt(v)).toLong & 0xFFFFFFFFL)
      case PSInt64 =>
        writeTag(out, f.number, WireVarint); writeVarint(out, zigzag64(asLong(v)))
      case PFixed32 | PSFixed32 =>
        writeTag(out, f.number, WireFixed32); writeFixed32(out, asInt(v))
      case PFixed64 | PSFixed64 =>
        writeTag(out, f.number, WireFixed64); writeFixed64(out, asLong(v))
      case PBool =>
        writeTag(out, f.number, WireVarint)
        writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
      case PString =>
        writeLenDelimited(out, f.number,
          v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))
      case PBytes =>
        writeLenDelimited(out, f.number, v.asInstanceOf[Array[Byte]])
      case e: PEnum =>
        writeTag(out, f.number, WireVarint)
        writeVarint(out, enumNumber(e, v).toLong)
      case PMsg(m) =>
        writeLenDelimited(out, f.number, toBytes(v.asInstanceOf[Row], m))
      case pm: PMap =>
        writeLenDelimited(out, f.number, mapEntryBytes(pm, v))
    }

  /** Resolve an enum symbol to its wire number; an OPEN enum additionally
    * accepts a decimal-string symbol (the decoder's preserved form of an
    * unknown number), so open-enum round trips are lossless. */
  private def enumNumber(e: PEnum, v: Any): Int = {
    val sym = v.asInstanceOf[String]
    e.symbols.get(sym) match {
      case Some(n) => n
      case None if e.open => sym.toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"${e.name}: '$sym' is neither a declared symbol nor a number " +
            s"(declared: ${e.symbols.keys.mkString(", ")})"))
      case None => throw new IllegalArgumentException(
        s"${e.name}: unknown enum symbol '$sym' " +
          s"(declared: ${e.symbols.keys.mkString(", ")})")
    }
  }

  /** One map entry's body: key then value, both always serialized (every
    * parser accepts the omitted-default form too, but emitting both keeps
    * the bytes canonical and the round trip trivially stable). A missing
    * (null) value emits the type's default — the empty message for
    * message values. */
  private def mapEntryBytes(pm: PMap, kv: Any): Array[Byte] = {
    val (k, v) = kv match {
      case t: Tuple2[_, _] => (t._1: Any, t._2: Any)
      case other => throw new IllegalArgumentException(
        s"map entry expects a (key, value) pair, got $other")
    }
    val entry = new ByteArrayOutputStream(32)
    writeScalar(entry, pm.keyField, if (k == null) defaultValue(pm.key) else k)
    (v, pm.value) match {
      case (null, PMsg(_)) => writeLenDelimited(entry, 2, Array.emptyByteArray)
      case (null, t)       => writeScalar(entry, pm.valueField, defaultValue(t))
      case (vv, _)         => writeScalar(entry, pm.valueField, vv)
    }
    entry.toByteArray
  }

  /** One packed element's payload (no tag) — primitives and enums only,
    * matching [[packable]]. */
  private def writePackedPayload(out: ByteArrayOutputStream, t: PType, v: Any): Unit =
    t match {
      case PDouble =>
        writeFixed64(out, java.lang.Double.doubleToLongBits(asDouble(v)))
      case PFloat =>
        writeFixed32(out, java.lang.Float.floatToIntBits(asFloat(v)))
      case PInt32 => writeVarint(out, asInt(v).toLong)
      case PInt64 | PUInt64 => writeVarint(out, asLong(v))
      case PUInt32 => writeVarint(out, asInt(v).toLong & 0xFFFFFFFFL)
      case PSInt32 => writeVarint(out, zigzag32(asInt(v)).toLong & 0xFFFFFFFFL)
      case PSInt64 => writeVarint(out, zigzag64(asLong(v)))
      case PFixed32 | PSFixed32 => writeFixed32(out, asInt(v))
      case PFixed64 | PSFixed64 => writeFixed64(out, asLong(v))
      case PBool => writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
      case e: PEnum => writeVarint(out, enumNumber(e, v).toLong)
      case other => throw new IllegalStateException(s"$other cannot be packed")
    }

  private def asInt(v: Any): Int = v match {
    case i: Int => i
    case i: java.lang.Integer => i.intValue
    case other => throw new IllegalArgumentException(s"expected Int, got $other")
  }
  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case l: java.lang.Long => l.longValue
    case other => throw new IllegalArgumentException(s"expected Long, got $other")
  }
  private def asFloat(v: Any): Float = v match {
    case f: Float => f
    case f: java.lang.Float => f.floatValue
    case other => throw new IllegalArgumentException(s"expected Float, got $other")
  }
  private def asDouble(v: Any): Double = v match {
    case d: Double => d
    case d: java.lang.Double => d.doubleValue
    case other => throw new IllegalArgumentException(s"expected Double, got $other")
  }

  /** Serialize a Row (shaped by [[sparkSchema]] — positional) as one wire
    * message. Null optional fields are absent on the wire (proto2
    * presence); a null in a required field fails loudly; a proto3
    * no-presence (implicit) field is omitted when it holds its default.
    * Repeated fields emit one unpacked occurrence per element, like the
    * reference's RepeatedWriter (ProtoBufGenerator.scala:118-121), unless
    * the field is `packed` (proto3 default / proto2 `[packed = true]`),
    * which emits the single length-delimited run. Map fields emit one
    * entry message per pair; a row with two members of the same oneof set
    * fails loudly (the wire would silently drop one on re-parse). */
  def toBytes(row: Row, msg: PMessage): Array[Byte] = {
    msg.oneofGroups.foreach { case (g, idxs) =>
      val set = idxs.filter(j => row.get(j) != null)
      if (set.size > 1) throw new IllegalArgumentException(
        s"${msg.name}: oneof '$g' has ${set.size} members set " +
          s"(${set.map(msg.fields(_).name).mkString(", ")}); at most one")
    }
    val out = new ByteArrayOutputStream(64)
    var i = 0
    val n = msg.fields.length
    while (i < n) {
      val f = msg.fields(i)
      val v = row.get(i)
      f.ptype match {
        case _: PMap =>
          v match {
            case null => // tolerated: an absent map encodes as empty
            case m: scala.collection.Map[_, _] =>
              m.foreach(kv => writeScalar(out, f, kv))
            case other => throw new IllegalArgumentException(
              s"${msg.name}.${f.name}: map field expects a Map, got $other")
          }
        case _ => f.label match {
          case PRepeated =>
            val elems: Iterator[Any] = v match {
              case null => Iterator.empty // absent array encodes as empty
              case s: scala.collection.Seq[_] => s.iterator
              case a: Array[_] => a.iterator
              case other => throw new IllegalArgumentException(
                s"${msg.name}.${f.name}: repeated field expects a Seq, got $other")
            }
            if (f.packed && packable(f.ptype)) {
              if (elems.hasNext) { // an empty packed field is absent (spec)
                val body = new ByteArrayOutputStream(32)
                elems.foreach(e => writePackedPayload(body, f.ptype, e))
                writeLenDelimited(out, f.number, body.toByteArray)
              }
            } else elems.foreach(e => writeScalar(out, f, e))
          case POptional =>
            if (v != null) writeScalar(out, f, v)
          case PImplicit =>
            if (v != null && !isDefault(f.ptype, v)) writeScalar(out, f, v)
          case PRequired =>
            if (v == null) throw new IllegalArgumentException(
              s"${msg.name}.${f.name}: required field is null")
            writeScalar(out, f, v)
        }
      }
      i += 1
    }
    out.toByteArray
  }

  // ---- decoding --------------------------------------------------------------

  /** Skip one unknown field of wire type `wt` (groups skipped recursively
    * to their matching end tag). */
  private def skipUnknown(r: Reader, wt: Int): Unit = wt match {
    case WireVarint     => r.varint(); ()
    case WireFixed64    => r.skipBytes(8)
    case WireLen        => r.skipBytes(r.varint().toInt)
    case WireFixed32    => r.skipBytes(4)
    case WireStartGroup =>
      var done = false
      while (!done) {
        val tag = r.varint()
        val innerWt = (tag & 7L).toInt
        if (innerWt == WireEndGroup) done = true
        else skipUnknown(r, innerWt)
      }
    case other => throw new IllegalArgumentException(
      s"proto wire: invalid wire type $other")
  }

  /** One scalar value of `t` at the cursor, from its non-packed wire form. */
  private def readScalar(r: Reader, t: PType, wt: Int, where: String): Any = {
    def expect(w: Int): Unit =
      if (wt != w) throw new IllegalArgumentException(
        s"proto wire: $where expects wire type $w, got $wt")
    t match {
      case PDouble    => expect(WireFixed64); java.lang.Double.longBitsToDouble(r.fixed64())
      case PFloat     => expect(WireFixed32); java.lang.Float.intBitsToFloat(r.fixed32())
      case PInt32     => expect(WireVarint); r.varint().toInt
      case PInt64     => expect(WireVarint); r.varint()
      case PUInt32    => expect(WireVarint); r.varint().toInt
      case PUInt64    => expect(WireVarint); r.varint()
      case PSInt32    => expect(WireVarint); unzigzag32(r.varint().toInt)
      case PSInt64    => expect(WireVarint); unzigzag64(r.varint())
      case PFixed32   => expect(WireFixed32); r.fixed32()
      case PSFixed32  => expect(WireFixed32); r.fixed32()
      case PFixed64   => expect(WireFixed64); r.fixed64()
      case PSFixed64  => expect(WireFixed64); r.fixed64()
      case PBool      => expect(WireVarint); r.varint() != 0L
      case PString    => expect(WireLen)
        new String(r.slice(r.varint().toInt), StandardCharsets.UTF_8)
      case PBytes     => expect(WireLen); r.slice(r.varint().toInt)
      case e: PEnum   => expect(WireVarint)
        val n = r.varint().toInt
        // closed (proto2): unknown number -> null (unknown field);
        // open (proto3): the number survives as its decimal string
        e.byNumber.getOrElse(n, if (e.open) n.toString else null)
      case PMsg(_)    => throw new IllegalStateException(
        s"$where: message fields are handled by the merge accumulator")
      case _: PMap    => throw new IllegalStateException(
        s"$where: map fields are handled by the entry accumulator")
    }
  }

  /** One map entry parsed from its length-delimited body: (key, value)
    * with missing sides defaulted (empty message for a missing message
    * value), unknown entry fields skipped. */
  private def decodeMapEntry(bytes: Array[Byte], pm: PMap, where: String): (Any, Any) = {
    val r = new Reader(bytes, 0, bytes.length)
    var k: Any = null
    var v: Any = null
    while (r.hasMore) {
      val tag = r.varint()
      val num = (tag >>> 3).toInt
      val wt = (tag & 7L).toInt
      num match {
        case 1 => k = readScalar(r, pm.key, wt, s"$where.key")
        case 2 => pm.value match {
          case PMsg(m) =>
            if (wt != WireLen) throw new IllegalArgumentException(
              s"proto wire: $where.value expects wire type 2, got $wt")
            v = fromBytes(r.slice(r.varint().toInt), m)
          case t => v = readScalar(r, t, wt, s"$where.value")
        }
        case _ => skipUnknown(r, wt)
      }
    }
    val kk = if (k == null) defaultValue(pm.key) else k
    val vv =
      if (v != null) v
      else pm.value match {
        case PMsg(m) => fromBytes(Array.emptyByteArray, m)
        case t => defaultValue(t)
      }
    (kk, vv)
  }

  /** Whether a repeated `t` may legally arrive PACKED (primitive numeric
    * and bool — never strings, bytes, messages). */
  private def packable(t: PType): Boolean = t match {
    case PString | PBytes | _: PMsg | _: PMap => false
    case _                                    => true
  }

  /** The non-packed wire type `t`'s scalar form uses (for packed-element
    * decoding, where each element is read with its natural form). */
  private def scalarWire(t: PType): Int = t match {
    case PDouble | PFixed64 | PSFixed64          => WireFixed64
    case PFloat | PFixed32 | PSFixed32           => WireFixed32
    case PString | PBytes | _: PMsg | _: PMap    => WireLen
    case _                                       => WireVarint
  }

  private def parseInto(r: Reader, msg: PMessage,
                        scalars: Array[Any],
                        msgChunks: Array[ByteArrayOutputStream],
                        repeats: Array[mutable.ArrayBuffer[Any]]): Unit = {
    while (r.hasMore) {
      val tag = r.varint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7L).toInt
      if (number == 0) throw new IllegalArgumentException(
        "proto wire: zero field number (corrupt tag)")
      // a truncated recursive field is NOT an unknown field: data deeper
      // than the unroll bound must fail loudly, never be silently skipped
      msg.truncated.get(number).foreach { tname =>
        throw new IllegalArgumentException(
          s"proto wire: ${msg.name} field #$number carries a '$tname' " +
            "occurrence past the schema's unroll depth — re-parse with a " +
            "larger maxRecursionDepth to read deeper data")
      }
      msg.byNumber.get(number) match {
        case None => skipUnknown(r, wt)
        case Some((f, idx)) if f.ptype.isInstanceOf[PMap] =>
          val where = s"${msg.name}.${f.name}"
          if (wt != WireLen) throw new IllegalArgumentException(
            s"proto wire: $where expects wire type 2, got $wt")
          val bytes = r.slice(r.varint().toInt)
          repeats(idx) += decodeMapEntry(bytes, f.ptype.asInstanceOf[PMap], where)
        case Some((f, idx)) =>
          val where = s"${msg.name}.${f.name}"
          f.label match {
            case PRepeated =>
              if (wt == WireLen && packable(f.ptype)) {
                // packed run: length-prefixed concatenation of elements
                val len = r.varint().toInt
                val sub = new Reader(r.buf, r.pos, r.pos + len)
                r.skipBytes(len)
                val ewt = scalarWire(f.ptype)
                while (sub.hasMore) {
                  val sv = readScalar(sub, f.ptype, ewt, where)
                  if (sv != null) repeats(idx) += sv // null = unknown enum
                }
              } else f.ptype match {
                case PMsg(m) =>
                  if (wt != WireLen) throw new IllegalArgumentException(
                    s"proto wire: $where expects wire type 2, got $wt")
                  val bytes = r.slice(r.varint().toInt)
                  repeats(idx) += fromBytes(bytes, m)
                case t =>
                  val sv = readScalar(r, t, wt, where)
                  if (sv != null) repeats(idx) += sv // null = unknown enum
              }
            case _ =>
              // last-member-seen-wins across a oneof: seeing this member
              // clears every sibling's accumulated value (a switch also
              // resets message-merge accumulation, like parseFrom)
              if (f.oneof.isDefined)
                msg.oneofSiblings(idx).foreach { j =>
                  scalars(j) = null
                  msgChunks(j) = null
                }
              f.ptype match {
                case PMsg(_) =>
                  if (wt != WireLen) throw new IllegalArgumentException(
                    s"proto wire: $where expects wire type 2, got $wt")
                  val bytes = r.slice(r.varint().toInt)
                  // merge semantics: concatenated serializations == merged
                  // message, so accumulate chunks and parse once at the end
                  if (msgChunks(idx) == null)
                    msgChunks(idx) = new ByteArrayOutputStream(bytes.length)
                  msgChunks(idx).write(bytes, 0, bytes.length)
                case t => scalars(idx) = readScalar(r, t, wt, where) // last wins
              }
          }
      }
    }
  }

  /** Parse one wire message into a Row shaped by [[sparkSchema]].
    * A missing required field fails like `parseFrom`'s
    * uninitialized-message error. */
  def fromBytes(bytes: Array[Byte], msg: PMessage): Row = {
    val n = msg.fields.length
    val scalars = new Array[Any](n)
    val msgChunks = new Array[ByteArrayOutputStream](n)
    val repeats = Array.fill(n)(mutable.ArrayBuffer.empty[Any])
    parseInto(new Reader(bytes, 0, bytes.length), msg, scalars, msgChunks, repeats)
    val values = msg.fields.zipWithIndex.map { case (f, i) =>
      f.ptype match {
        case _: PMap =>
          // duplicated keys: last one wins (spec)
          val m = mutable.LinkedHashMap.empty[Any, Any]
          repeats(i).foreach { e =>
            val (k, v) = e.asInstanceOf[(Any, Any)]
            m(k) = v
          }
          m.toMap
        case _ => f.label match {
          case PRepeated => repeats(i).toSeq
          case _ =>
            val v = f.ptype match {
              case PMsg(m) =>
                if (msgChunks(i) == null) null
                else fromBytes(msgChunks(i).toByteArray, m)
              case _ => scalars(i)
            }
            if (v == null && f.label == PRequired)
              throw new IllegalArgumentException(
                s"${msg.name}.${f.name}: required field missing from the wire " +
                  "(uninitialized message)")
            // proto3 no-presence: absent IS the default value
            if (v == null && f.label == PImplicit && !f.ptype.isInstanceOf[PMsg])
              defaultValue(f.ptype)
            else v
        }
      }
    }
    Row.fromSeq(values)
  }

  // ---- length-delimited file framing ----------------------------------------

  /** Frame one message for a delimited stream: varint byte-length prefix
    * then the body — the standard `writeDelimitedTo` format. */
  def frame(body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 5)
    writeVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** All messages of a delimited stream held in `bytes`. */
  def unframe(bytes: Array[Byte], msg: PMessage): Iterator[Row] = {
    val r = new Reader(bytes, 0, bytes.length)
    new Iterator[Row] {
      override def hasNext: Boolean = r.hasMore
      override def next(): Row = fromBytes(r.slice(r.varint().toInt), msg)
    }
  }

  // ---- Spark IO ---------------------------------------------------------------

  /** Hadoop output format writing raw value bytes verbatim (no record
    * framing of its own — the values arrive pre-framed). Riding the
    * FileOutputCommitter keeps distributed-write semantics correct:
    * task retries and speculative attempts commit exactly one winner. */
  final class RawBytesOutputFormat extends FileOutputFormat[NullWritable, BytesWritable] {
    override def getRecordWriter(ctx: TaskAttemptContext)
        : RecordWriter[NullWritable, BytesWritable] = {
      val file = getDefaultWorkFile(ctx, ".pb")
      val out = file.getFileSystem(ctx.getConfiguration).create(file, false)
      new RecordWriter[NullWritable, BytesWritable] {
        override def write(k: NullWritable, v: BytesWritable): Unit =
          out.write(v.getBytes, 0, v.getLength)
        override def close(c: TaskAttemptContext): Unit = out.close()
      }
    }
  }

  /** Write `df` (shaped by [[sparkSchema]] of `msg` — same field order) as
    * length-delimited wire files, one per partition, committed through the
    * Hadoop committer. The output directory is replaced, mirroring
    * [[AvroIO.write]]. */
  def writeDelimited(df: DataFrame, msg: PMessage, path: String): Unit = {
    val dfSchema = df.schema
    val want = sparkSchema(msg)
    require(dfSchema.fieldNames.sameElements(want.fieldNames),
      s"writeDelimited: dataframe columns ${dfSchema.fieldNames.mkString(",")} " +
        s"must match the descriptor's ${want.fieldNames.mkString(",")}")
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    if (fs.exists(p)) fs.delete(p, true)
    val msgLocal = msg
    df.rdd.mapPartitions { it =>
      it.map { row =>
        val framed = frame(toBytes(row, msgLocal))
        (NullWritable.get(), new BytesWritable(framed))
      }
    }.saveAsNewAPIHadoopFile(path, classOf[NullWritable], classOf[BytesWritable],
      classOf[RawBytesOutputFormat], hadoopConf)
  }

  /** Distributed scan of length-delimited wire files: one task per file
    * (the framing has no split points — the reference's ProtoIO contract),
    * decoded executor-side straight to Rows under the descriptor schema. */
  def readDelimited(spark: SparkSession, path: String, msg: PMessage): DataFrame = {
    val msgLocal = msg
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pb")
      .load(path)
      .select("content")
    val rdd = files.rdd.flatMap(r => unframe(r.getAs[Array[Byte]](0), msgLocal))
    spark.createDataFrame(rdd, sparkSchema(msg))
  }

  // ---- .proto text parser -----------------------------------------------------

  /** Parse a `.proto` SOURCE TEXT (proto2 OR proto3) into descriptor
    * models — the schema-from-file entry the CLI's `proto:` mode uses, so
    * wire files are readable with nothing but their original schema file
    * (the reference needs a protoc-compiled class on the classpath
    * instead).
    *
    * Supported subset (what the wire scan needs): `message` blocks with
    * optional/required/repeated fields of every scalar type, proto3
    * implicit (no-label) fields with no-presence default semantics,
    * `oneof` groups (last-member-seen-wins), `map<,>` fields, `enum`
    * blocks (closed under proto2, OPEN under proto3 — unknown numbers
    * survive as decimal strings), nested `message`/`enum` declarations,
    * references between top-level types in any order, line and block
    * comments, packedness (`[packed = true]`, and proto3's
    * packed-by-default repeated primitives), and ignored
    * `syntax`/`package`/`option`/`import`/`reserved`/field options.
    * proto3 rules enforced loudly: no `required`, enums need a
    * zero-numbered symbol. Not supported (loud failure): `group` and
    * `extend`/`extensions`.
    *
    * Recursive message references (self- or mutually-recursive —
    * AST/tree-node protos) are UNROLLED to `maxRecursionDepth` nested
    * occurrences of the same message type per path: the descriptor model
    * (and Catalyst's StructType) is a finite tree, so the recursion is
    * expanded into one. At the bound the recursive field is cut from
    * that level's descriptor and recorded in [[PMessage.truncated]] —
    * wire data deeper than the bound fails LOUDLY at decode (never a
    * silent skip); re-parse with a larger bound to read it. The unrolled
    * descriptor's width grows with branching^depth, so pathological
    * bounds on wide recursive schemas cost schema size — pick the bound
    * from the data's real depth. */
  def parseProto(text: String,
                 maxRecursionDepth: Int = 8): Map[String, PMessage] = {
    require(maxRecursionDepth >= 1,
      s"maxRecursionDepth must be >= 1, got $maxRecursionDepth")
    // strip comments, preserving structure
    val noBlock = "/\\*[\\s\\S]*?\\*/".r.replaceAllIn(text, " ")
    val noLine = "//[^\n]*".r.replaceAllIn(noBlock, " ")
    val toks = noLine
      .replace("{", " { ").replace("}", " } ").replace(";", " ; ")
      .replace("=", " = ").replace("[", " [ ").replace("]", " ] ")
      .replace("<", " < ").replace(">", " > ").replace(",", " , ")
      .split("\\s+").filter(_.nonEmpty).toList
    // the syntax statement is the file's first non-comment statement
    // (spec), so the flag is settled before any message parses; absent
    // means proto2 (spec)
    var proto3 = false

    // first pass: collect raw message/enum blocks (flattened names —
    // nested types are hoisted like protoc's Outer.Inner, referable by
    // either their simple or dotted name when unambiguous)
    final case class RawField(label: String, tpe: String, name: String, number: Int,
                              oneof: Option[String] = None, packed: Boolean = false,
                              mapKey: Option[String] = None)
    final case class RawMsg(name: String, fields: List[RawField],
                            nested: List[String])
    val enums = mutable.Map[String, PEnum]()
    val raws = mutable.Map[String, RawMsg]()

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"parseProto: $msg")

    def skipStatement(ts: List[String]): List[String] = ts match {
      case ";" :: rest => rest
      case Nil => Nil
      case _ :: rest => skipStatement(rest)
    }
    def skipBracketed(ts: List[String]): List[String] = ts match {
      case "]" :: rest => rest
      case Nil => fail("unterminated [ ... ] option")
      case _ :: rest => skipBracketed(rest)
    }
    // consume a field statement's tail — optional `[ options ]` then the
    // `;` — returning (option tokens, rest); options are otherwise
    // ignored but `packed = true` is honored
    def fieldTail(ts: List[String]): (List[String], List[String]) = ts match {
      case "[" :: t2 =>
        def collect(acc: List[String], l: List[String]): (List[String], List[String]) =
          l match {
            case "]" :: r => (acc.reverse, r)
            case Nil => fail("unterminated [ ... ] option")
            case x :: r => collect(x :: acc, r)
          }
        val (opts, after) = collect(Nil, t2)
        (opts, after match { case ";" :: t3 => t3; case t3 => t3 })
      case ";" :: t2 => (Nil, t2)
      case t2 => (Nil, t2)
    }
    def hasPackedTrue(opts: List[String]): Boolean =
      opts.sliding(3).exists {
        case List("packed", "=", "true") => true
        case _ => false
      }

    def parseEnum(scope: String, name: String,
                  ts: List[String]): List[String] = {
      val full = if (scope.isEmpty) name else s"$scope.$name"
      val syms = mutable.LinkedHashMap[String, Int]()
      var rest = ts
      var done = false
      while (!done) rest match {
        case "}" :: tail => done = true; rest = tail
        case "option" :: tail => rest = skipStatement(tail)
        case "reserved" :: tail => rest = skipStatement(tail)
        case sym :: "=" :: numTok :: tail =>
          val n = numTok.toIntOption.getOrElse(fail(s"enum $name: bad number $numTok"))
          syms(sym) = n
          rest = tail match {
            case "[" :: t2 => skipBracketed(t2) match {
              case ";" :: t3 => t3
              case t3 => t3
            }
            case ";" :: t2 => t2
            case t2 => t2
          }
        case Nil => fail(s"enum $name: unterminated block")
        case other :: _ => fail(s"enum $name: unexpected token '$other'")
      }
      if (proto3 && !syms.values.exists(_ == 0))
        fail(s"enum $name: proto3 requires a zero-numbered first symbol")
      // proto3 enums are OPEN: unknown numbers survive the decode
      enums(full) = PEnum(full, syms.toMap, open = proto3)
      rest
    }

    def parseMessage(scope: String, name: String,
                     ts: List[String]): List[String] = {
      val full = if (scope.isEmpty) name else s"$scope.$name"
      val fields = mutable.ListBuffer[RawField]()
      val nested = mutable.ListBuffer[String]()
      var rest = ts
      var done = false
      while (!done) rest match {
        case "}" :: tail => done = true; rest = tail
        case "message" :: n :: "{" :: tail =>
          nested += s"$full.$n"; rest = parseMessage(full, n, tail)
        case "enum" :: n :: "{" :: tail =>
          nested += s"$full.$n"; rest = parseEnum(full, n, tail)
        case ("option" | "reserved" | "extensions") :: tail =>
          rest = skipStatement(tail)
        case ("group" | "extend") :: _ =>
          fail(s"message $name: '${rest.head}' is outside the supported subset")
        case "oneof" :: gname :: "{" :: tail =>
          // members are singular, label-free fields sharing presence
          var r2 = tail
          var od = false
          while (!od) r2 match {
            case "}" :: t2 => od = true; r2 = t2
            case ("option" | "reserved") :: t2 => r2 = skipStatement(t2)
            case ("optional" | "required" | "repeated" | "map" | "oneof" |
                  "group") :: _ =>
              fail(s"$name.$gname: '${r2.head}' is not allowed inside a oneof")
            case tpe :: fname :: "=" :: numTok :: t2 =>
              val n = numTok.toIntOption.getOrElse(
                fail(s"$name.$fname: bad field number $numTok"))
              fields += RawField("oneof", tpe, fname, n, oneof = Some(gname))
              r2 = fieldTail(t2)._2
            case Nil => fail(s"$name.$gname: unterminated oneof block")
            case other :: _ => fail(s"$name.$gname: unexpected token '$other'")
          }
          rest = r2
        case "map" :: "<" :: ktype :: "," :: vtype :: ">" ::
            fname :: "=" :: numTok :: tail =>
          val n = numTok.toIntOption.getOrElse(
            fail(s"$name.$fname: bad field number $numTok"))
          fields += RawField("map", vtype, fname, n, mapKey = Some(ktype))
          rest = fieldTail(tail)._2
        case (label @ ("optional" | "required" | "repeated")) ::
            tpe :: fname :: "=" :: numTok :: tail =>
          if (proto3 && label == "required")
            fail(s"$name.$fname: 'required' is a proto2-only label")
          val n = numTok.toIntOption.getOrElse(
            fail(s"$name.$fname: bad field number $numTok"))
          val (opts, t2) = fieldTail(tail)
          // proto3 packs repeated primitives by default; proto2 needs the
          // explicit option (packability itself is settled at build time)
          val packed = label == "repeated" && (proto3 || hasPackedTrue(opts))
          fields += RawField(label, tpe, fname, n, packed = packed)
          rest = t2
        // proto3 implicit (no-label) singular field
        case tpe :: fname :: "=" :: numTok :: tail if proto3 =>
          val n = numTok.toIntOption.getOrElse(
            fail(s"$name.$fname: bad field number $numTok"))
          fields += RawField("implicit", tpe, fname, n)
          rest = fieldTail(tail)._2
        case Nil => fail(s"message $name: unterminated block")
        case other :: _ => fail(s"message $name: unexpected token '$other' " +
          "(under proto2, every field needs an optional/required/repeated label)")
      }
      raws(full) = RawMsg(full, fields.toList, nested.toList)
      rest
    }

    var rest = toks
    while (rest.nonEmpty) rest match {
      case "message" :: n :: "{" :: tail => rest = parseMessage("", n, tail)
      case "enum" :: n :: "{" :: tail => rest = parseEnum("", n, tail)
      case "syntax" :: "=" :: s :: tail =>
        s.replace("\"", "").replace("'", "") match {
          case "proto2" => proto3 = false
          case "proto3" => proto3 = true
          case other => fail(s"unknown syntax '$other' (proto2 or proto3)")
        }
        rest = skipStatement(tail)
      case ("package" | "option" | "import") :: tail =>
        rest = skipStatement(tail)
      case ";" :: tail => rest = tail
      case other :: _ => fail(s"unexpected top-level token '$other'")
      case Nil => ()
    }

    val Scalars: Map[String, PType] = Map(
      "double" -> PDouble, "float" -> PFloat, "int32" -> PInt32,
      "int64" -> PInt64, "uint32" -> PUInt32, "uint64" -> PUInt64,
      "sint32" -> PSInt32, "sint64" -> PSInt64, "fixed32" -> PFixed32,
      "fixed64" -> PFixed64, "sfixed32" -> PSFixed32,
      "sfixed64" -> PSFixed64, "bool" -> PBool, "string" -> PString,
      "bytes" -> PBytes)

    // resolve a type name from a field's scope: exact dotted name, then
    // innermost-scope-outward simple name (protoc's resolution order)
    def resolveName(scope: String, tpe: String): Option[String] = {
      val candidates =
        if (tpe.contains(".")) Seq(tpe)
        else {
          val scopes = scope.split('.').inits.map(_.mkString(".")).toSeq
          scopes.map(s => if (s.isEmpty) tpe else s"$s.$tpe")
        }
      candidates.find(c => raws.contains(c) || enums.contains(c))
    }

    // name resolution shared by the reachability pass and the builder:
    // a field's type resolved from its message's scope (or the enclosing
    // scope), or None for scalars/unknowns
    def resolveRef(full: String, tpe: String): Option[String] =
      if (Scalars.contains(tpe)) None
      else {
        val scope = full.split('.').dropRight(1).mkString(".")
        resolveName(full, tpe).orElse(resolveName(scope, tpe))
      }

    // message → message names transitively reachable through its fields
    // (map values included). Used to decide when a build result is
    // path-independent (cacheable): an unrolled recursive build depends
    // on how many times its OWN types already sit on the ancestor chain,
    // so it may only be cached when nothing on the chain is reachable.
    val reach: Map[String, Set[String]] = {
      val direct = raws.map { case (full, raw) =>
        full -> raw.fields.flatMap(rf => resolveRef(full, rf.tpe))
          .filter(raws.contains).toSet
      }
      val m = mutable.Map(direct.toSeq: _*)
      var changed = true
      while (changed) {
        changed = false
        m.keys.toSeq.foreach { k =>
          val nxt = m(k) ++ m(k).flatMap(r => m.getOrElse(r, Set.empty))
          if (nxt.size != m(k).size) { m(k) = nxt; changed = true }
        }
      }
      m.toMap
    }

    // second pass: materialize PMessages, recursion unrolled to
    // maxRecursionDepth occurrences of a message type per ancestor chain.
    // The unroll is exponential in recursive-field BRANCHING (k recursive
    // fields unroll to ~k^depth descriptor nodes), so a hard node cap
    // keeps a wide recursive schema failing loudly in milliseconds
    // instead of hanging or exhausting driver memory.
    val maxUnrolledNodes = 100000
    var unrolledNodes = 0
    val built = mutable.Map[String, PMessage]()
    def build(full: String, chain: List[String]): PMessage = {
      val cacheable = {
        val relevant = reach.getOrElse(full, Set.empty) + full
        !chain.exists(relevant.contains)
      }
      if (cacheable) built.getOrElseUpdate(full, buildUncached(full, chain))
      else buildUncached(full, chain)
    }
    def buildUncached(full: String, chain: List[String]): PMessage = {
      unrolledNodes += 1
      if (unrolledNodes > maxUnrolledNodes)
        fail(s"unrolling recursive messages exceeded $maxUnrolledNodes " +
          s"descriptor nodes at maxRecursionDepth=$maxRecursionDepth — " +
          "a schema with several recursive fields grows exponentially " +
          "with depth; lower maxRecursionDepth")
      val raw = raws(full)
      val chain2 = full :: chain
      val truncated = mutable.Map[Int, String]()
      // a message reference at the unroll bound truncates its FIELD (the
      // whole map field, for a map whose value type recursed out)
      def resolveMsg(rf: RawField, r: String): Option[PType] =
        if (chain2.count(_ == r) >= maxRecursionDepth) {
          truncated(rf.number) = r
          None
        } else Some(PMsg(build(r, chain2)))
      val fs = raw.fields.flatMap { rf =>
        def resolve(tpe: String, what: String): Option[PType] =
          Scalars.get(tpe).map(Some(_)).orElse {
            resolveRef(full, tpe).map { r =>
              if (enums.contains(r)) Some(enums(r))
              else resolveMsg(rf, r)
            }
          }.getOrElse(fail(s"${raw.name}.${rf.name}: unknown $what '$tpe'"))
        val ptype: Option[PType] = rf.mapKey match {
          case Some(kt) =>
            val key = Scalars.getOrElse(kt,
              fail(s"${raw.name}.${rf.name}: map key type '$kt' " +
                "must be an integral, bool, or string scalar"))
            resolve(rf.tpe, "map value type").map(PMap(key, _))
          case None => resolve(rf.tpe, "type")
        }
        ptype.map { pt =>
          val label = rf.label match {
            case "optional" => POptional
            case "required" => PRequired
            case "repeated" => PRepeated
            case "map" => PRepeated // wire truth; the schema keys off PMap
            case "oneof" => POptional
            // proto3 no-label: scalars/enums have no presence; message
            // fields keep explicit presence (spec)
            case "implicit" =>
              if (pt.isInstanceOf[PMsg]) POptional else PImplicit
          }
          PField(rf.number, rf.name, label, pt,
            oneof = rf.oneof, packed = rf.packed)
        }
      }
      PMessage(full.split('.').last, fs, truncated.toMap)
    }
    val byFull = raws.keys.map(k => k -> build(k, Nil)).toMap
    val simpleCounts = raws.keys.groupBy(_.split('.').last)
    val bySimple = simpleCounts.collect {
      case (simple, fulls) if fulls.size == 1 => simple -> byFull(fulls.head)
    }
    byFull ++ bySimple
  }

  /** [[parseProto]] over a file readable by the driver. */
  def parseProtoFile(path: String,
                     maxRecursionDepth: Int = 8): Map[String, PMessage] =
    parseProto(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      StandardCharsets.UTF_8), maxRecursionDepth)

  // ---- the reference's test descriptors --------------------------------------

  /** schemas.proto (ratatool-common/src/test/protobuf/schemas.proto)
    * re-declared against the descriptor model — the surface
    * ProtoBufGeneratorTest and ProtoBufDiffyTest exercise. */
  object Schemas {
    private def scalarFields(label: PLabel): Seq[PField] = Seq(
      PField(1, "double_field", label, PDouble),
      PField(2, "float_field", label, PFloat),
      PField(3, "int32_field", label, PInt32),
      PField(4, "int64_field", label, PInt64),
      PField(5, "uint32_field", label, PUInt32),
      PField(6, "uint64_field", label, PUInt64),
      PField(7, "sint32_field", label, PSInt32),
      PField(8, "sint64_field", label, PSInt64),
      PField(9, "fixed32_field", label, PFixed32),
      PField(10, "fixed64_field", label, PFixed64),
      PField(11, "sfixed32_field", label, PSFixed32),
      PField(12, "sfixed64_field", label, PSFixed64),
      PField(13, "bool_field", label, PBool),
      PField(14, "string_field", label, PString),
      PField(15, "bytes_field", label, PBytes))

    val OptionalNestedRecord: PMessage = PMessage("OptionalNestedRecord",
      scalarFields(POptional) :+ PField(16, "upper_string_field", POptional, PString))

    val RequiredNestedRecord: PMessage =
      PMessage("RequiredNestedRecord", scalarFields(PRequired))

    val RepeatedNestedRecord: PMessage =
      PMessage("RepeatedNestedRecord", scalarFields(PRepeated))

    val TestRecord: PMessage = PMessage("TestRecord", Seq(
      PField(1, "optional_fields", PRequired, PMsg(OptionalNestedRecord)),
      PField(2, "required_fields", PRequired, PMsg(RequiredNestedRecord)),
      PField(3, "repeated_fields", PRequired, PMsg(RepeatedNestedRecord)),
      PField(4, "optional_nested_field", POptional, PMsg(OptionalNestedRecord)),
      PField(5, "repeated_nested_field", PRepeated, PMsg(OptionalNestedRecord))))

    val RepeatedRecord: PMessage = PMessage("RepeatedRecord", Seq(
      PField(1, "nested_repeated_field", PRepeated, PInt32),
      PField(2, "string_field", PRequired, PString)))

    val DeeplyRepeatedRecord: PMessage = PMessage("DeeplyRepeatedRecord", Seq(
      PField(1, "repeated_record", PRepeated, PMsg(RepeatedRecord))))
  }
}
