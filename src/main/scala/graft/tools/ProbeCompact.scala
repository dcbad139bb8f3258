package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Measurement-only probe: replays DedupIndex.compact's five Spark
  * stages SERIALLY with labels (the real compact overlaps them as
  * concurrent legs, which hides which stage owns the r20 SCALE record's
  * `volume_driven` straggler), printing per-stage task duration and
  * volume distributions. Builds a throwaway index from the fixture
  * first (same banding as the SCALE probe), then:
  *   1. shingles dedupe+rewrite   2. fingerprints dedupe+rewrite
  *   3. bands dedupe+rewrite      4. fp bloom build   5. band bloom build
  * Writes rewrites to scratch (never swaps) — pure measurement.
  *
  * Usage: run_tool.sh graft.tools.ProbeCompact <sfDir> [shuffleParts]
  */
object ProbeCompact {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf10"
    val shuffleParts = if (args.length > 1) args(1) else "64"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class T(dur: Long, recs: Long, bytes: Long, shRecs: Long, idx: Int)
    val stageTasks = TrieMap.empty[Int, ArrayBuffer[T]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful && t.taskMetrics != null) {
          val buf = stageTasks.getOrElseUpdate(t.stageId, ArrayBuffer.empty)
          val rec = T(t.taskInfo.duration,
            t.taskMetrics.inputMetrics.recordsRead,
            t.taskMetrics.inputMetrics.bytesRead,
            t.taskMetrics.shuffleReadMetrics.recordsRead, t.taskInfo.index)
          buf.synchronized { buf += rec }
        }
    })
    def step[A](tag: String)(body: => A): A = {
      stageTasks.clear()
      val t0 = System.nanoTime()
      val r = body
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      println(f"== $tag: ${w}%.1f s")
      stageTasks.toSeq.sortBy(_._1).foreach { case (id, b) =>
        val ts = b.synchronized(b.toArray)
        if (ts.nonEmpty) {
          val durs = ts.map(_.dur).sorted
          val med = math.max(durs(durs.length / 2), 1L)
          println(f"   stage $id%4d tasks=${ts.length}%3d med=${med}ms " +
            f"max=${durs.last}ms skew=${durs.last.toDouble / med}%.1f")
          if (durs.last >= 500 && durs.last >= 2 * med)
            (ts.sortBy(-_.dur).take(3) :+ ts.sortBy(_.dur).apply(ts.length / 2))
              .foreach { t =>
                println(f"     idx=${t.idx}%3d dur=${t.dur}%6d recs=${t.recs}%9d " +
                  f"shRecs=${t.shRecs}%9d")
              }
        }
      }
      r
    }

    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    val docs = t("documents")
    val idx = java.nio.file.Files.createTempDirectory("graft_probe_cmp").toString
    val scratch = java.nio.file.Files.createTempDirectory("graft_probe_out").toString

    step("build+append (fixture)") {
      graft.ext.DedupIndex.build(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", idx, numHashes = 64, bands = 16, shingleLen = 10)
      graft.ext.DedupIndex.append(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", idx)
    }
    val floor = spark.sparkContext.defaultParallelism
    // local replica of ArtifactIO.targetFileCount (private[ext])
    def targetFileCount(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = hfs.listFiles(p, true)
      var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
      }
      val target = 256L << 20
      val sizeN = math.max(1L, (bytes + target - 1) / target)
      val floorN =
        if (sizeN >= floor) 1L
        else {
          val byBytes = bytes / (8L << 20)
          val byRows = spark.read.parquet(dir).count() / 250000L
          math.min(floor.toLong, math.max(1L, math.max(byBytes, byRows)))
        }
      math.max(sizeN, floorN).toInt
    }
    Seq("shingles", "fingerprints", "bands").foreach { name =>
      val dir = s"$idx/$name"
      val n = targetFileCount(dir)
      val df0 = spark.read.parquet(dir)
      val df = df0.dropDuplicates(df0.columns.filterNot(_ == "batch").toSeq)
        .drop("batch")
      step(s"$name dedupe+rewrite (n=$n)") {
        df.repartition(n).write.mode("overwrite").parquet(s"$scratch/$name")
      }
    }
    val nFps = spark.read.parquet(s"$scratch/fingerprints").count()
    val nBands = spark.read.parquet(s"$scratch/bands").count()
    step("fp bloom") {
      val fps = spark.read.parquet(s"$scratch/fingerprints")
      fps.stat.bloomFilter("fp", nFps, 0.01)
    }
    step("band bloom") {
      val banded = spark.read.parquet(s"$scratch/bands")
      val n = nBands
      banded.select(graft.GraftFunctions.fieldHash(
          Seq(col("band"), col("bsig"))).as("__bk"))
        .stat.bloomFilter("__bk", n, 0.01)
    }
    spark.stop()
  }
}
