package graft.ext

import graft.GraftFunctions.farmHash64
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction / resize / frame-sampling are per-partition batch
  * operators whose Spark-side plumbing (schema, partitioning, batch shape)
  * is real while the codec kernels are STUBS — this container has no
  * image/audio libraries, so the decode step is a clearly-marked
  * deterministic fake over the payload bytes. Swapping in a real codec
  * means replacing ONLY the `stubDecode*` functions; every schema and
  * operator contract stays.
  *
  * Scale notes: metadata extraction is pure Catalyst (scan-speed, no
  * shuffle); decode operators run via mapPartitions in batches so a real
  * codec can amortize model/codec init per partition — the same shape a
  * Pandas-UDF `mapInPandas` pipeline has in PySpark.
  */
object Multimodal {

  /** Container-format sniff from magic bytes — real (public magic numbers),
    * pure Catalyst: jpeg/png/gif/wav/riff/mp4/unknown. */
  def sniffFormat(bin: Column): Column = {
    val hex8 = upper(hex(substring(bin, 1, 8)))
    when(hex8.startsWith("FFD8FF"), "jpeg")
      .when(hex8.startsWith("89504E47"), "png")
      .when(hex8.startsWith("47494638"), "gif")
      .when(hex8.startsWith("52494646") && upper(hex(substring(bin, 9, 4))) === "57415645", "wav")
      .when(hex8.startsWith("52494646"), "riff")
      .when(upper(hex(substring(bin, 5, 4))) === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** Typed payload metadata: byte size, sniffed format, content
    * fingerprint. Scan-speed column expressions, no decode. */
  def withMetadata(df: DataFrame, binCol: String,
                   metaCol: String = "meta"): DataFrame =
    df.withColumn(metaCol, struct(
      length(col(binCol)).as("n_bytes"),
      sniffFormat(col(binCol)).as("format"),
      farmHash64(col(binCol)).as("fingerprint")))

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("mean_intensity", DoubleType, nullable = true)))

  /** STUB image decode: deterministic fake dimensions/intensity derived
    * from the payload bytes (`???`-grade placeholder for a real codec —
    * replace this function body alone to integrate one). */
  private def stubDecodeImage(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length < 4) return Row(null, null, null, null)
    val w = ((bytes(0) & 0x7f) << 4 | (bytes(1) & 0x0f)) + 1
    val h = ((bytes(2) & 0x7f) << 4 | (bytes(3) & 0x0f)) + 1
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    Row(w, h, 3, sum.toDouble / bytes.length)
  }

  /** Image decode + feature extraction over batches: appends
    * `imageFeatureSchema` columns. Real partition-batch plumbing, stub
    * kernel. */
  def decodeImages(df: DataFrame, binCol: String,
                   featCol: String = "img"): DataFrame = {
    val schema = df.schema.add(StructField(featCol, imageFeatureSchema, nullable = true))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      // per-partition init point: a real codec/model loads HERE, once
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ stubDecodeImage(bytes))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** STUB resize: recomputes fake features at the target size; a real
    * implementation re-encodes pixels. Keeps the binary payload opaque. */
  def resizeImages(df: DataFrame, featCol: String, targetW: Int,
                   targetH: Int): DataFrame =
    df.withColumn(featCol, struct(
      lit(targetW).as("width"), lit(targetH).as("height"),
      col(s"$featCol.channels").as("channels"),
      col(s"$featCol.mean_intensity").as("mean_intensity")))

  /** STUB video frame sampling: emits `n` deterministic frame offsets per
    * payload as an array of (frame_idx, byte_offset) structs — the real
    * kernel would demux containers; the fan-out/explode shape is what a
    * pipeline consumes. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int,
                   frameCol: String = "frames"): DataFrame = {
    val len = length(col(binCol)).cast("long")
    val idxs = (0 until n).map { i =>
      struct(lit(i).as("frame_idx"),
        (len * i / math.max(n, 1)).cast("long").as("byte_offset")) // sql / is double
    }
    df.withColumn(frameCol, filter(array(idxs: _*), f => len > 0))
  }
}
