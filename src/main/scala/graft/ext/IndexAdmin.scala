package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational census of a persisted-index artifact (any of the family:
  * dedup, text, IVF, IVF-PQ) — the view an operator checks before and
  * after an append, a compact, or a batch drop.
  *
  * One row per (relation, batch): parquet file count, summed bytes, and
  * rows. Bloom-segment directories report one row per segment (batch =
  * the segment's id, rows null). Row counts come from `count()` over
  * the batch's partition — parquet footer metadata, not a data scan —
  * so a describe is cheap even on a corpus-scale artifact. */
object IndexAdmin {

  /** The artifact's current writer lease, if any: `(payload, ageMs)` with
    * payload "token op hostname". Read-only ([[ArtifactIO.describeLease]]). */
  def describeLease(spark: SparkSession, path: String): Option[(String, Long)] =
    ArtifactIO.describeLease(spark, path)

  /** Evict the artifact's writer lock unconditionally — the operator
    * override for a KNOWN-dead holder ([[ArtifactIO.forceUnlock]]; the
    * automatic path is the lease's staleness takeover). Returns true if
    * a lock was present and removed. */
  def forceUnlock(spark: SparkSession, path: String): Boolean =
    ArtifactIO.forceUnlock(spark, path)

  /** Complete a pre-marker-era torn swap by hand: promote the NAMED
    * unmarked staging sibling into the absent `dst` — the manual rename
    * the torn-swap runbook message prescribes, as a command. Explicit
    * and refusing by design: `dst` present, or `staging` not one of
    * dst's on-disk staging siblings, is an error; nothing is inferred
    * (an unmarked tmp is indistinguishable from a killed writer's
    * partial stage — only the operator who inspected it can know).
    * Returns the promoted sibling's name. */
  def forcePromoteStaged(spark: SparkSession, dst: String,
                         staging: String): String =
    ArtifactIO.forcePromoteStaged(spark, dst, staging)

  /** (relation, batch, files, bytes, rows) for every relation directory
    * under `path`. Batch-less relations (params, centroids, codebooks,
    * an empty-built postings layout) report batch = null. */
  def describeIndex(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val hfs = ArtifactIO.fs(spark, path)
    val root = new Path(path)
    require(hfs.exists(root), s"describeIndex: no artifact at $path")

    def filesUnder(p: Path): (Long, Long) = {
      val it = hfs.listFiles(p, true)
      var n = 0L; var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".")) {
          n += 1; bytes += f.getLen
        }
      }
      (n, bytes)
    }

    val rows = hfs.listStatus(root).filter(_.isDirectory).toSeq
      .sortBy(_.getPath.getName).flatMap { relSt =>
        val rel = relSt.getPath.getName
        val children = hfs.listStatus(relSt.getPath)
        val batchDirs = children
          .filter(c => c.isDirectory && c.getPath.getName.startsWith("batch="))
        val segs = children
          .filter(c => c.isFile && c.getPath.getName.endsWith(".bin"))
        if (segs.nonEmpty)
          segs.toSeq.map { s =>
            val id = s.getPath.getName.stripPrefix("seg-").stripSuffix(".bin")
            (rel, id, 1L, s.getLen, None: Option[Long])
          }
        else if (batchDirs.nonEmpty)
          batchDirs.toSeq.map { b =>
            val id = b.getPath.getName.stripPrefix("batch=")
            val (n, bytes) = filesUnder(b.getPath)
            // census from parquet footers — exact row counts, driver-side
            // metadata only: the census is file accounting, so it reads
            // the files' own ledgers instead of paying one scan JOB per
            // batch directory (a full cluster barrier each, at scale)
            val cnt = ArtifactIO.parquetRowCount(spark, b.getPath.toString)
            (rel, id, n, bytes, Some(cnt))
          }
        else {
          val (n, bytes) = filesUnder(relSt.getPath)
          val cnt =
            if (n > 0)
              Some(ArtifactIO.parquetRowCount(spark, relSt.getPath.toString))
            else None
          Seq((rel, null: String, n, bytes, cnt))
        }
      }
    rows.toDF("relation", "batch", "files", "bytes", "rows")
  }

  /** Quantizer-drift probe for an IVF or IVF-PQ artifact: how well the
    * TRAINED coarse quantizer still fits a (new) vector batch. Returns
    * one row per cell with the batch's assignment count and mean/max
    * distance to the assigned centroid, plus an `__overall__` row. Rising
    * mean distance or mass collapsing into few cells versus the build-
    * time profile is the retrain signal — appends keep cells fixed by
    * contract ([[Similarity.appendIvfIndex]]), so drift silently costs
    * recall-per-probe until the quantizer is retrained. One narrow pass
    * over the batch, no shuffle beyond the per-cell aggregate. */
  def ivfDriftCheck(spark: SparkSession, path: String,
                    batch: DataFrame, idCol: String,
                    vecCol: String): DataFrame = {
    import graft.GraftFunctions.nearestCells
    val centroids = Similarity.loadIvfCentroids(spark, path)
    require(centroids.nonEmpty, s"ivfDriftCheck: empty index at $path")
    val assigned = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cell", nearestCells(col("v"), centroids, 1)(0))
      .withColumn("dist", cellDistance(col("v"), centroids))
    val perCell = assigned.groupBy("cell")
      .agg(count(lit(1)).as("n"),
        avg(col("dist")).as("mean_dist"), max(col("dist")).as("max_dist"))
    val overall = assigned.agg(count(lit(1)).as("n"),
        avg(col("dist")).as("mean_dist"), max(col("dist")).as("max_dist"))
      .select(lit(-1).as("cell"), col("n"), col("mean_dist"), col("max_dist"))
    perCell.unionByName(overall).orderBy("cell")
  }

  /** Cosine distance (1 - max cosine similarity) from `v` to its nearest
    * centroid — the SAME metric the IVF assignment uses
    * ([[graft.GraftFunctions.nearestCells]] defaults to cosine), so the
    * aggregated distance is exactly the assignment quality the index
    * loses recall to. */
  private def cellDistance(v: org.apache.spark.sql.Column,
                           centroids: Array[Array[Double]])
      : org.apache.spark.sql.Column = {
    val vnorm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    val sims = centroids.map { c =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val carr = array(c.map(lit): _*)
      aggregate(zip_with(v, carr, (a, b) => a * b), lit(0.0),
        (acc, x) => acc + x) / nullif(vnorm * lit(cn), lit(0.0))
    }
    lit(1.0) - array_max(array(sims: _*))
  }
}
