package graft.sources

import java.io.File
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Avro source/sink without the spark-avro datasource (not shipped in this
  * environment): built on the public Avro core + avro-mapred APIs.
  *
  * Reference surface covered: distributed scan S1 (`sc.avroFile`,
  * BigDiffy.scala:776-777), sharded sink S10 (`saveAsAvroFile`,
  * BigSamplerAvro.scala:261), local reader/writer S6 (AvroIO.scala:63-100),
  * schema sniff S15 (AvroIO.scala:102-109).
  *
  * Serialization hygiene mirrors the reference's own trick: Avro `Schema`
  * is NOT serializable, so closures capture the schema JSON STRING and
  * re-parse lazily per partition (reference package.scala:75-76).
  * GenericRecords are converted to/from Row INSIDE mapPartitions — records
  * never cross a shuffle boundary.
  */
object AvroIO {

  /** Distributed scan via AvroKeyInputFormat (splittable, no whole-file
    * reads). Schema sniffed from the first file when not given. Records
    * convert straight to INTERNAL rows through compiled per-field
    * converters ([[AvroInternalConverters]]) — no external-Row /
    * RowEncoder round trip, which at scan scale is the source's cost. */
  def read(spark: SparkSession, path: String, avroSchema: Option[Schema] = None): DataFrame = {
    val schema = avroSchema.getOrElse(sniffSchema(path))
    val st = AvroConverters.toStructType(schema)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, schema)
    val stLocal = st // avoid capturing `this`
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], job.getConfiguration)
      .mapPartitions { it =>
        val rd = AvroInternalConverters.internalReader(stLocal)
        // convert EAGERLY per record: avro-mapred reuses the datum tree,
        // and the compiled reader copies every value out of it
        it.map { case (k, _) => rd(k.datum()) }
      }
    org.apache.spark.sql.graftbridge.ColumnBridge
      .internalCreateDataFrame(spark, rdd, st)
  }

  /** Distributed sharded sink via AvroKeyOutputFormat. Overwrite
    * semantics match the engine's parquet/json sinks: a pre-existing
    * output directory is removed first (saveAsNewAPIHadoopFile would
    * otherwise fail every re-run — including crash retries that never
    * wrote a _SUCCESS marker). */
  def write(df: DataFrame, path: String, recordName: String = "record"): Unit = {
    val st = df.schema
    val schemaJson = AvroConverters.toAvroSchema(st, recordName).toString
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    if (fs.exists(p)) fs.delete(p, true)
    val job = Job.getInstance(hadoopConf)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    // INTERNAL rows straight to avro datums (compiled per-field writers):
    // df.rdd would deserialize every InternalRow to a boxed external Row
    // first — at sink scale that encoder pass costs more than the avro
    // encoding itself. Safe against row reuse: the writer materializes a
    // full GenericRecord (copying values) before the next row is fetched.
    df.queryExecution.toRdd.mapPartitions { it =>
      lazy val schema = new Schema.Parser().parse(schemaJson)
      val wr = AvroInternalConverters.internalWriter(schema, st)
      it.map(r => (new AvroKey[GenericRecord](wr(r)), NullWritable.get()))
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Local (driver-side) container-file reader, for fixtures. */
  def readLocal(file: String): (Seq[Row], StructType) = {
    val reader = new DataFileReader[GenericRecord](new File(file),
      new GenericDatumReader[GenericRecord]())
    try {
      val st = AvroConverters.toStructType(reader.getSchema)
      val rows = reader.iterator().asScala
        .map(r => AvroConverters.toCatalyst(r, st).asInstanceOf[Row]).toList
      (rows, st)
    } finally reader.close()
  }

  /** Local (driver-side) container-file writer, for fixtures. */
  def writeLocal(rows: Seq[Row], st: StructType, file: String,
                 recordName: String = "record"): Unit = {
    val schema = AvroConverters.toAvroSchema(st, recordName)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(file))
    try rows.foreach(r => w.append(AvroConverters.toAvro(r, schema, st)))
    finally w.close()
  }

  /** Schema sniff from the first matching file (reference
    * AvroIO.getAvroSchemaFromFile, S15). */
  def sniffSchema(path: String): Schema = {
    val first = GraftIO.listFiles(path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no avro files under $path"))
    val r = new DataFileReader[GenericRecord](new File(first),
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }
}
