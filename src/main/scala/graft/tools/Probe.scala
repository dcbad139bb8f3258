package graft.tools

import graft.sources.AvroConverters
import java.io.ByteArrayOutputStream
import org.apache.avro.generic.GenericDatumWriter
import org.apache.avro.generic.GenericRecord
import org.apache.avro.io.EncoderFactory
import org.apache.avro.reflect.ReflectDatumWriter
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Scratch probe: which DatumWriter rejects the converted record? */
object Probe {
  def main(args: Array[String]): Unit = {
    val st = StructType(Seq(
      StructField("id", LongType, false),
      StructField("tags", ArrayType(StringType, false), false)))
    val schema = AvroConverters.toAvroSchema(st)
    println("avro schema: " + schema)
    val rec = AvroConverters.toAvro(Row(1L, Seq("x", "y")), schema, st)
    println("record: " + rec)
    println("tags datum class: " + rec.get("tags").getClass)

    def tryWriter(label: String, w: org.apache.avro.io.DatumWriter[GenericRecord]): Unit =
      try {
        w.setSchema(schema)
        val out = new ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(out, null)
        w.write(rec, enc); enc.flush()
        println(s"== $label: OK (${out.size()} bytes)")
      } catch {
        case e: Throwable => println(s"== $label: FAIL ${e.getMessage}")
      }

    tryWriter("GenericDatumWriter", new GenericDatumWriter[GenericRecord]())
    tryWriter("ReflectDatumWriter", new ReflectDatumWriter[GenericRecord]())
  }
}
