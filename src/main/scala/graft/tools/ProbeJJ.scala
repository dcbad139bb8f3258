package graft.tools

import graft.GraftFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where do jaccard_join_exact's seconds go, stage by
  * stage, mirroring the CURRENT Dedup.jaccardJoinExact pipeline
  * (asymmetric mid-prefix probe side + per-row positional filter +
  * accumulated PPJoin bound)? Prints row counts at every pruning stage
  * so a filter's selectivity and its wall cost are visible together. */
object ProbeJJ {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val off = docs.agg(max("doc_id")).first().getLong(0) + 1
    val corpus = docs.unionByName(docs.select((col("doc_id") + off).as("doc_id"),
      expr("substring(text, 1, greatest(length(text) - 4, 20))").as("text")))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val threshold = 0.8
    val sh = time("shingle+pin") {
      corpus.select(col("doc_id").as("id"), shingleHashes(col("text"), 5).as("sh"))
        .filter(size(col("sh")) > 0).localCheckpoint(true)
    }
    println("docs=" + sh.count())
    val toks = sh.select(col("id"), explode(col("sh")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    println("distinct toks=" + time("freq")(freq.count()))
    val ordered = time("rerank") {
      toks.join(freq, "tok").groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ft"))
        .withColumn("len", size(col("ft"))).localCheckpoint(true)
    }
    val prefix = time("prefix+pin") {
      ordered
        .withColumn("p",
          (col("len") - ceil(lit(threshold) * col("len")) + 1).cast("int"))
        .withColumn("p_mid",
          (col("len") - ceil(lit(2 * threshold / (1 + threshold)) * col("len")) + 1)
            .cast("int"))
        .select(col("id"), col("len"), col("p_mid"),
          posexplode(slice(col("ft"), lit(1), col("p"))).as(Seq("pos", "e")))
        .select(col("e.tok").as("tok"), col("id"), col("len"), col("pos"),
          col("p_mid"))
        .localCheckpoint(true)
    }
    println("prefix rows=" + prefix.count())
    val sideSmall = prefix.filter(col("pos") < col("p_mid"))
      .select(col("tok"), col("id").as("id_a"), col("len").as("len_a"),
        col("pos").as("pos_a"))
    val sideLarge = prefix.select(col("tok"), col("id").as("id_b"),
      col("len").as("len_b"), col("pos").as("pos_b"))
    val alpha = ceil(lit(threshold) / (1 + threshold) *
      (col("len_a") + col("len_b")))
    val joined = sideSmall.join(sideLarge, "tok")
      .filter(col("len_a") < col("len_b") ||
        (col("len_a") === col("len_b") && col("id_a") < col("id_b")))
    println("joined(post role-order)=" + time("join count")(joined.count()))
    val rows = joined
      .filter(col("len_b") >= ceil(lit(threshold) * col("len_a")) &&
        col("len_a") >= ceil(lit(threshold) * col("len_b")))
      .filter(least(col("len_a") - col("pos_a"),
        col("len_b") - col("pos_b")) >= alpha)
    println("rows(post per-row filters)=" + time("row-filter count")(rows.count()))
    val grouped = rows
      .groupBy(col("id_a"), col("id_b"), col("len_a"), col("len_b"))
      .agg(count(lit(1)).as("__c"),
        max(col("pos_a")).as("__mpa"), max(col("pos_b")).as("__mpb"))
    println("pairs(post dedup)=" + time("group count")(grouped.count()))
    val cand = grouped
      .filter(col("__c") + least(col("len_a") - 1 - col("__mpa"),
        col("len_b") - 1 - col("__mpb")) >= alpha)
      .select(col("id_a"), col("id_b"))
    println("pairs(post accumulated bound)=" + time("acc-filter count")(cand.count()))
    val verified = cand
      .join(broadcast(sh.select(col("id").as("id_a"), col("sh").as("sh_a"))), "id_a")
      .join(broadcast(sh.select(col("id").as("id_b"), col("sh").as("sh_b"))), "id_b")
      .withColumn("jaccard", jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
    println("pairs(verified)=" + time("verify")(verified.count()))
    spark.stop()
  }
}
