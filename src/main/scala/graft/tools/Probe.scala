package graft.tools

import graft.sampling.BigSampler
import graft.sources.AvroIO
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: review-fix scenarios that only show up at runtime. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("== avro sub-millisecond timestamp roundtrip:")
    val ts = Timestamp.valueOf("2024-03-01 12:00:00.123456")
    val dir = java.nio.file.Files.createTempDirectory("avrots").toString + "/out"
    AvroIO.write(Seq((1L, ts)).toDF("id", "ts"), dir)
    val back = AvroIO.read(spark, dir).select("ts").head().getTimestamp(0)
    println(s"   wrote $ts  read $back  equal=${back == ts}")

    println("== avro overwrite: second write to same dir:")
    AvroIO.write(Seq((2L, ts)).toDF("id", "ts"), dir)
    println("   re-write ok, rows now: " + AvroIO.read(spark, dir).count())

    println("== Random-coin EXACT sampling on a SHUFFLED lineage:")
    // a join output: shuffle-fetch order is nondeterministic across jobs
    val a = (1L to 50000L).map(i => (i, i % 7)).toDF("k", "g")
    val b = (1L to 50000L).map(i => (i, s"v$i")).toDF("k", "v")
    val shuffled = a.join(b, "k").repartition(16, col("g"))
    val want = math.ceil(50000 * 0.1).toLong
    var ok = true
    for (trial <- 1 to 3) {
      val got = BigSampler.sample(shuffled, 0.1, BigSampler.Random(trial.toLong),
        exact = true).count()
      println(s"   trial $trial: got=$got want=$want ${if (got == want) "OK" else "MISMATCH"}")
      ok &= got == want
    }
    println(if (ok) "   exactness holds on shuffled lineage" else "   BROKEN")
    spark.stop()
  }
}
