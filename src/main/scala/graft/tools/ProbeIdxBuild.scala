package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Measurement-only probe (guide §1/§2.5) for the r20 SCALE record's one
  * `volume_driven` straggler: dedup_index_build at sf10 showed a 32-task
  * stage whose max task grew 0.6 → 3.6 s across the sf1→sf10 decade
  * (max/median 4.3×). The SCALE listener only keeps (duration,
  * launchTime); this probe keeps, for every material stage, each task's
  * duration, INPUT VOLUME (records + bytes) and shuffle-read volume, so
  * the straggler can be classified at the task level:
  *   - duration tracks records/bytes → data skew (a growing key: fix by
  *     salting or splitting);
  *   - duration outlier at even volume → a per-task fixed cost that
  *     scales with something else (bloom bitset size, codegen, GC).
  * Runs the exact ScaleR19 op body (build → append → compact with the
  * probe's scale-appropriate banding) against the given fixture.
  *
  * Usage: run_tool.sh graft.tools.ProbeIdxBuild <sfDir> [shuffleParts]
  */
object ProbeIdxBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val shuffleParts = if (args.length > 1) args(1) else "64"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class T(dur: Long, recs: Long, bytes: Long, shRecs: Long,
                       launch: Long, idx: Int)
    val stageTasks = TrieMap.empty[Int, ArrayBuffer[T]]
    val stageNames = TrieMap.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        val op = s.stageInfo.name.takeWhile(_ != '\n').trim
        val site = s.stageInfo.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("graft.tools"))
          .getOrElse("").trim
        stageNames(s.stageInfo.stageId) = s"$op | $site".take(150)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful && t.taskMetrics != null) {
          val buf = stageTasks.getOrElseUpdate(t.stageId, ArrayBuffer.empty)
          val rec = T(t.taskInfo.duration,
            t.taskMetrics.inputMetrics.recordsRead,
            t.taskMetrics.inputMetrics.bytesRead,
            t.taskMetrics.shuffleReadMetrics.recordsRead,
            t.taskInfo.launchTime, t.taskInfo.index)
          buf.synchronized { buf += rec }
        }
    })

    def report(op: String): Unit = {
      Thread.sleep(800)
      val snap = stageTasks.toSeq.map { case (id, b) =>
        (id, b.synchronized(b.toArray)) }
      snap.sortBy(_._1).foreach { case (id, ts) =>
        if (ts.length >= 4 && ts.map(_.dur).max >= 300L) {
          val durs = ts.map(_.dur).sorted
          val med = math.max(durs(durs.length / 2), 1L)
          if (durs.last >= 2 * med || durs.last >= 1000L) {
            println(f"[$op] stage $id%4d tasks=${ts.length}%3d " +
              f"med=${med}ms max=${durs.last}ms  ${stageNames.getOrElse(id, "?")}")
            ts.sortBy(-_.dur).take(4).foreach { t =>
              println(f"    slow idx=${t.idx}%3d dur=${t.dur}%6d ms " +
                f"recs=${t.recs}%9d bytes=${t.bytes}%11d shRecs=${t.shRecs}%9d")
            }
            val m = ts.sortBy(_.dur).apply(ts.length / 2)
            println(f"    med  idx=${m.idx}%3d dur=${m.dur}%6d ms " +
              f"recs=${m.recs}%9d bytes=${m.bytes}%11d shRecs=${m.shRecs}%9d")
          }
        }
      }
      stageTasks.clear(); stageNames.clear()
    }

    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    val docs = t("documents")
    val idxTmp = java.nio.file.Files
      .createTempDirectory("graft_probe_idx").toString

    // same body and banding as ScaleR19's dedup_index_build op
    val t0 = System.nanoTime()
    graft.ext.DedupIndex.build(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", idxTmp, numHashes = 64, bands = 16, shingleLen = 10)
    val t1 = System.nanoTime()
    report("build")
    graft.ext.DedupIndex.append(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", idxTmp)
    val t2 = System.nanoTime()
    report("append")
    graft.ext.DedupIndex.compact(spark, idxTmp)
    val t3 = System.nanoTime()
    report("compact")
    println(f"[probe] build=${(t1 - t0) / 1e9}%.1f s  " +
      f"append=${(t2 - t1) / 1e9}%.1f s  compact=${(t3 - t2) / 1e9}%.1f s")
    spark.stop()
  }
}
