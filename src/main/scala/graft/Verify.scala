package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional subset (comma-separated names) for fast iteration on a new
    // gate; the checker only compares dumped dirs, so a partial out dir is
    // a partial — not failing — report. Same contract as Bench's filter:
    // empty value = unset, typo'd names called out instead of silently
    // dumping nothing (a vacuously-passing compare would hide a dead gate).
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(
          s"[verify] unknown queries ignored: ${unknown.mkString(", ")}")
    }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.toString).take(500)
        // FAIL-CLOSED: a throwing query must still produce a comparable
        // dump. A one-row parquet carrying only an `err` column can never
        // row/schema/hash-match its oracle, so any checker that iterates
        // output dirs reports the crash as a red row instead of silently
        // dropping the query from the artifact (the r11 failure mode:
        // 4 erroring gates vanished and 80/84 presented as 80/80).
        try {
          import spark.implicits._
          Seq(errors(name)).toDF("err").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name error-marker write also " +
            s"failed: ${e2.getMessage}")
        }
      }
      // per-query isolation: drop pinned relations (cached diff relation,
      // localCheckpoint'd intermediates) so 50+ queries don't accumulate
      // session state — see the matching note in Bench.scala
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // machine-readable error sidecar (underscore-prefixed: never mistaken
    // for a query dump directory) — the human-facing complement to the
    // per-query err markers above
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
    }
    // exit 0 even with failures: the per-query err markers are the signal;
    // a non-zero exit could make a driver discard the whole (mostly valid)
    // dump, which would be fail-open again in the other direction
    spark.stop()
  }
}
