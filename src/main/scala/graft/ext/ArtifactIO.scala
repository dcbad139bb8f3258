package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Shared filesystem plumbing for the persisted-index family (text,
  * IVF, IVF-PQ, dedup): in-place directory rewrites staged to a sibling
  * and swapped by rename-ASIDE, so the live data exists (as the
  * destination or as `<dst>_compact_old`) at every instant — a crash or
  * a failed rename in the swap window can lose the compaction, never
  * the data. Single-writer contract throughout, like the artifacts
  * themselves. */
private[ext] object ArtifactIO {

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Resolve an optional caller-supplied batch id: validated (it becomes
    * a `batch=<id>` partition directory name) when given — the STABLE
    * id that makes a retried append overwrite itself — or a fresh
    * unique id otherwise (plain at-least-once appends). */
  def validBatchId(batchId: Option[String]): String = batchId match {
    case Some(id) =>
      require(id.matches("[A-Za-z0-9._-]+"),
        s"batch id must match [A-Za-z0-9._-]+, got '$id'")
      id
    case None => s"auto-${java.util.UUID.randomUUID.toString.take(13)}"
  }

  /** Rewrite the directory `dst` in place: `stage(tmp)` materializes the
    * replacement contents under `<dst>_compact_tmp`, then the swap
    * renames dst aside to `<dst>_compact_old`, promotes tmp, and deletes
    * the aside copy. Never delete-then-rename. A missing `dst` (legal
    * for an optional artifact dir that was never written, e.g. the Bloom
    * dir of an empty index) skips the aside step. Recovery from a torn
    * swap: if dst is absent, rename `_compact_old` (or `_compact_tmp`,
    * whichever exists) back into place — both hold a complete copy. */
  def rewriteInPlace(spark: SparkSession, dst: String)
                    (stage: String => Unit): Unit = {
    val hfs = fs(spark, dst)
    val dstP = new Path(dst)
    val tmp = new Path(dst + "_compact_tmp")
    val old = new Path(dst + "_compact_old")
    hfs.delete(tmp, true)
    hfs.delete(old, true)
    stage(tmp.toString)
    if (hfs.exists(dstP)) {
      require(hfs.rename(dstP, old),
        s"rewriteInPlace: rename $dstP -> $old failed (compaction " +
          "aborted; live data untouched)")
      if (!hfs.rename(tmp, dstP)) {
        // restore the original before failing — dst never stays absent
        hfs.rename(old, dstP)
        throw new IllegalStateException(
          s"rewriteInPlace: rename $tmp -> $dstP failed; original restored")
      }
      hfs.delete(old, true)
    } else {
      require(hfs.rename(tmp, dstP),
        s"rewriteInPlace: rename $tmp -> $dstP failed")
    }
    ()
  }

  /** Compact a batch-partitioned postings directory in place: repeated
    * appends accumulate one `batch=<id>` partition per append — this
    * collapses them in ONE shuffle into a single `batch=<compact-id>`
    * partition with O(1) files per `partCol` directory (both the
    * small-file count and the partition-discovery listing stop growing
    * with append count). `dedupe = true` additionally drops duplicates
    * on the DATA columns (`batch` excluded) — the rows an un-keyed blind
    * retry of a torn append double-writes (safe only when the artifact
    * carries no separate aggregate that double-counted them — the
    * caller knows). Returns false (untouched) when `partCol` is absent,
    * the empty-built unpartitioned layout. */
  def compactPartitioned(spark: SparkSession, dst: String, partCol: String,
                         dedupe: Boolean = false): Boolean = {
    val df0 = spark.read.parquet(dst)
    if (!df0.columns.contains(partCol)) return false
    val data = df0.drop("batch")
    val df = if (dedupe) data.dropDuplicates() else data
    val cid = s"compact-${java.util.UUID.randomUUID.toString.take(13)}"
    rewriteInPlace(spark, dst) { tmp =>
      df.repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol)
        .parquet(s"$tmp/batch=$cid")
    }
    true
  }

  /** Output file count for an in-place rewrite of `dir`, from its actual
    * on-disk parquet bytes (same format + codec in and out, so size
    * carries over — the [[Layout.compactTo]] rule). */
  def targetFileCount(spark: SparkSession, dir: String,
                      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val hfs = fs(spark, dir)
    val it = hfs.listFiles(new Path(dir), true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }
}
