package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement-only probe (guide §1): verifies that an `observe()` metric
  * attached below an EAGER localCheckpoint is populated by the
  * checkpoint's own materialization job — i.e. that a bloom-sizing /
  * broadcast-sizing count can ride the pin instead of paying its own
  * scheduler round trip — and counts the Spark jobs each variant costs.
  *
  * Usage: run_tool.sh graft.tools.ProbeObserve
  */
object ProbeObserve {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobs.incrementAndGet(); () }
      })
    def countJobs[T](tag: String)(body: => T): T = {
      Thread.sleep(300); jobs.set(0)
      val r = body
      Thread.sleep(300)
      println(s"[probe] $tag: ${jobs.get()} jobs")
      r
    }

    val base = spark.range(100000).toDF("id")
      .select(col("id"), (col("id") % 97).as("k"))

    // variant A (current shape): eager pin, then a separate count job
    val a = countJobs("pin + separate count") {
      val pinned = base.localCheckpoint(true)
      val n = pinned.count()
      n
    }
    // variant B (proposed): the count rides the pin as an observed metric
    val b = countJobs("pin with observed count") {
      val obs = org.apache.spark.sql.Observation()
      val pinned = base.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
      val n = obs.get("n").asInstanceOf[Long]
      // the pinned relation must still be readable (and must NOT carry
      // the CollectMetrics node into downstream plans)
      require(pinned.columns.toSeq == Seq("id", "k"), pinned.columns.mkString(","))
      n
    }
    println(s"[probe] counts equal: ${a == b} (a=$a, b=$b)")

    // variant C: observed metric on a derived-from-pin relation (the
    // shingleBanded shape: sh pinned, banded derived+pinned, both counted)
    val c = countJobs("two chained pins with observed counts") {
      val o1 = org.apache.spark.sql.Observation()
      val sh = base.observe(o1, count(lit(1)).as("n")).localCheckpoint(true)
      val o2 = org.apache.spark.sql.Observation()
      val banded = sh.filter(col("k") < 50)
        .observe(o2, count(lit(1)).as("n")).localCheckpoint(true)
      (o1.get("n").asInstanceOf[Long], o2.get("n").asInstanceOf[Long],
        banded.count())
    }
    println(s"[probe] chained: $c")
    spark.stop()
  }
}
