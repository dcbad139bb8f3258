package graft.gen

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import java.sql.{Date, Timestamp}
import java.util.SplittableRandom
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Schema-driven random Row generation — the Spark-native re-expression of
  * the reference's generator surface:
  *
  *   - `of(schema)` ≈ `genericRecordOf(schema)` / `tableRowOf(schema)`
  *     (ratatool-scalacheck/.../AvroGenerator.scala:62-298,
  *     TableRowGenerator.scala:54-160): every Catalyst type is covered,
  *     nullable fields are None 50% of the time (TableRowGenerator
  *     NULLABLE mode :149-158), arrays are non-empty bounded lists, maps
  *     get alphanumeric keys, decimals respect precision/scale
  *     (AvroGenerator.scala:250-256), strings use the reference's biased
  *     distribution;
  *   - `amend` / `tryAmend` / `amend2` mirror the correlation combinators
  *     (scalacheck/package.scala:43-210) — override generated fields by
  *     name, or generate correlated record PAIRS sharing key fields (the
  *     reference's main tool for building diff/join fixtures);
  *   - `distributed` ≈ the distributed-generation example
  *     (ratatool-examples/.../DataGenAvro.scala:36-63): `spark.range`
  *     over shards, one derived deterministic seed per partition,
  *     `mapPartitions` generating rows executor-side — no driver
  *     materialization, scales to any row count.
  */
object RowGen {

  /** Gen[Row] for a schema; nullable fields are populated with probability
    * `noneFraction` complement. */
  def of(schema: StructType, noneFraction: Double = 0.5,
         maxArrayLen: Int = 4, maxStringLen: Int = 39): Gen[Row] =
    Gen.delay { r =>
      Row.fromSeq(schema.fields.toSeq.map(f => genValue(f.dataType, f.nullable, r,
        noneFraction, maxArrayLen, maxStringLen)))
    }

  private def genValue(dt: DataType, nullable: Boolean, r: SplittableRandom,
                       noneFraction: Double, maxArr: Int, maxStr: Int): Any = {
    if (nullable && r.nextDouble() < noneFraction) return null
    dt match {
      case ByteType      => r.nextInt(256).toByte
      case ShortType     => r.nextInt(Short.MinValue, Short.MaxValue + 1).toShort
      case IntegerType   => r.nextInt()
      case LongType      => r.nextLong()
      case FloatType     => r.nextDouble().toFloat
      case DoubleType    => r.nextDouble()
      case BooleanType   => r.nextBoolean()
      case StringType    => Gen.alphaNumString(maxStr)(r)
      case BinaryType    => Gen.bytes(16)(r)
      case DateType      => new Date(r.nextLong(0L, 20000L * 86400000L))
      case TimestampType => new Timestamp(r.nextLong(0L, 2000000000000L))
      case d: DecimalType =>
        // unscaled bounded so the value always fits (precision, scale)
        val limit = math.pow(10, math.min(d.precision, 15)).toLong
        val unscaled = BigInt(r.nextLong(-limit + 1, limit))
        new JBigDecimal(unscaled.bigInteger, d.scale,
          new MathContext(d.precision, RoundingMode.HALF_UP))
      case st: StructType =>
        Row.fromSeq(st.fields.toSeq.map(f =>
          genValue(f.dataType, f.nullable, r, noneFraction, maxArr, maxStr)))
      case ArrayType(et, containsNull) =>
        List.fill(r.nextInt(1, maxArr + 1))(
          genValue(et, containsNull, r, noneFraction, maxArr, maxStr))
      case MapType(StringType, vt, valueContainsNull) =>
        List.fill(r.nextInt(1, maxArr + 1))(
          Gen.alphaNumString(8)(r) ->
            genValue(vt, valueContainsNull, r, noneFraction, maxArr, maxStr)).toMap
      case MapType(kt, vt, valueContainsNull) =>
        List.fill(r.nextInt(1, maxArr + 1))(
          genValue(kt, nullable = false, r, noneFraction, maxArr, maxStr) ->
            genValue(vt, valueContainsNull, r, noneFraction, maxArr, maxStr)).toMap
      case other =>
        throw new UnsupportedOperationException(s"RowGen: unsupported type $other")
    }
  }

  /** Override one generated field (top-level name) with values from `g` —
    * the reference's `amend` (scalacheck/package.scala:43-63). */
  def amend(base: Gen[Row], schema: StructType)(field: String, g: Gen[Any]): Gen[Row] = {
    val idx = schema.fieldIndex(field)
    Gen.delay { r =>
      val row = base(r)
      Row.fromSeq(row.toSeq.updated(idx, g(r)))
    }
  }

  /** Amend that keeps the base value when `g` yields None — `tryAmend`. */
  def tryAmend(base: Gen[Row], schema: StructType)(field: String,
                                                   g: Gen[Option[Any]]): Gen[Row] = {
    val idx = schema.fieldIndex(field)
    Gen.delay { r =>
      val row = base(r)
      g(r) match {
        case Some(v) => Row.fromSeq(row.toSeq.updated(idx, v))
        case None    => row
      }
    }
  }

  /** Correlated PAIR generation — the reference's `amend2`
    * (scalacheck/package.scala:136-210): both rows receive the same
    * generated value for each listed field (e.g. a shared primary key),
    * the rest of each row stays independent. */
  def amend2(a: Gen[Row], aSchema: StructType, b: Gen[Row], bSchema: StructType)(
      shared: (String, String, Gen[Any])*): Gen[(Row, Row)] =
    Gen.delay { r =>
      val ra = a(r); val rb = b(r)
      var sa = ra.toSeq; var sb = rb.toSeq
      shared.foreach { case (fa, fb, g) =>
        val v = g(r)
        sa = sa.updated(aSchema.fieldIndex(fa), v)
        sb = sb.updated(bSchema.fieldIndex(fb), v)
      }
      (Row.fromSeq(sa), Row.fromSeq(sb))
    }

  import graft.functions.Mix.mix64

  /** Distributed generation: `rows` records over `shards` partitions, each
    * partition seeded deterministically from (seed, partition id) — same
    * output for the same arguments on any cluster layout.
    *
    * Per-shard seeds MUST be derived through a full mixer: seeding shard k
    * with `seed ^ (k * 0x9e3779b97f4a7c15)` collides with
    * SplittableRandom's own golden gamma and adjacent shards then emit THE
    * SAME stream offset by one draw (observed empirically — 500 "random"
    * ids contained 248 duplicates). mix64 composition breaks the
    * alignment. */
  def distributed(spark: SparkSession, gen: Gen[Row], schema: StructType,
                  rows: Long, shards: Int = 32, seed: Long = 42L): DataFrame = {
    val perShard = rows / shards
    val rem = rows % shards
    val rdd = spark.sparkContext
      .parallelize(0 until shards, shards)
      .mapPartitions { it =>
        it.flatMap { shard =>
          val rnd = new SplittableRandom(mix64(mix64(seed) ^ mix64(shard + 1L)))
          val n = perShard + (if (shard < rem) 1 else 0)
          // Long-counted iterator: Iterator.fill takes an Int and would
          // silently wrap for > 2^31 rows per shard
          new Iterator[Row] {
            private var i = 0L
            override def hasNext: Boolean = i < n
            override def next(): Row = { i += 1; gen(rnd) }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
