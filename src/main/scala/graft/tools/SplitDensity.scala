package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** One-off: attribute the dedup_index_search skew reading — per-stage
  * task-duration profile (n, median, max) of the artifact serve path.
  *
  * DELIBERATELY mirrors [[ScaleR19]]'s fixture verbatim (the doc_id%30
  * truncate/reverse incoming batch and the build/append/compact
  * parameters): this profiler exists to attribute THAT probe's numbers,
  * so the two must stay in lockstep — change the fixture there, change
  * it here. */
object SplitDensity {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tasks = TrieMap.empty[Int, ArrayBuffer[Long]]
    val names = TrieMap.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        names(s.stageInfo.stageId) = s.stageInfo.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("tools"))
          .getOrElse(s.stageInfo.name).trim.take(100)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful) {
          // capture once: a clear() between a second lookup and the
          // append would throw on the listener-bus thread (r19 advice)
          val buf = tasks.getOrElseUpdate(t.stageId, ArrayBuffer.empty)
          buf.synchronized { buf += t.taskInfo.duration }
        }
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val off = docs.agg(max(col("doc_id")) + 1).first().getLong(0)
    val incoming = docs.filter(col("doc_id") % 30 === 0)
      .select((col("doc_id") + off).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 10, 20))").as("text"))
      .unionByName(docs.filter(col("doc_id") % 30 === 1)
        .select((col("doc_id") + off).as("doc_id"), reverse(col("text")).as("text")))
    val idx = s"/tmp/density_idx_${System.nanoTime()}"
    // delete the multi-GB index fixture even on a crashed run (r19
    // advice: leaked per-run /tmp dirs)
    try {
      graft.ext.DedupIndex.build(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", idx, numHashes = 64, bands = 16, shingleLen = 10)
      graft.ext.DedupIndex.append(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", idx)
      graft.ext.DedupIndex.compact(spark, idx)
      tasks.clear(); names.clear()
      val t0 = System.nanoTime()
      val n = graft.ext.DedupIndex.minhashNewAgainst(spark, idx, incoming,
        "doc_id", "text", threshold = 0.7).count()
      println(f"[prof] serve wall=${(System.nanoTime()-t0)/1e9}%.1f s pairs=$n")
      tasks.toSeq.sortBy(_._1).foreach { case (id, ds) =>
        val s = ds.toArray.sorted
        println(f"[prof] stage=$id%3d n=${s.length}%4d med=${s(s.length/2)}%6d ms " +
          f"max=${s.last}%6d ms  ${names.getOrElse(id, "?")}")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    }
    spark.stop()
  }
}
