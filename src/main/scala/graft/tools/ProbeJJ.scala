package graft.tools

import graft.GraftFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where do jaccard_join_exact's seconds go at sf0.1? */
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
    println("tokens=" + time("explode count")(toks.count()))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    println("distinct toks=" + time("freq")(freq.count()))
    val ordered = time("rerank") {
      toks.join(freq, "tok").groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ft"))
        .withColumn("len", size(col("ft"))).localCheckpoint(true)
    }
    val prefix = time("prefix") {
      ordered.withColumn("p",
          (col("len") - ceil(lit(threshold) * col("len")) + 1).cast("int"))
        .select(col("id"), col("len"),
          posexplode(slice(col("ft"), lit(1), col("p"))).as(Seq("pos", "e")))
        .select(col("e.tok").as("tok"), col("id"), col("len"), col("pos"))
        .localCheckpoint(true)
    }
    println("prefix rows=" + prefix.count())
    def side(n: String) = prefix.select(col("tok"), col("id").as(s"id_$n"),
      col("len").as(s"len_$n"), col("pos").as(s"pos_$n"))
    val alpha = ceil(lit(threshold) / (1 + threshold) * (col("len_a") + col("len_b")))
    val raw = side("a").join(side("b"), "tok").filter(col("id_a") < col("id_b"))
    println("raw joined=" + time("raw join count")(raw.count()))
    val cand = raw
      .filter(col("len_b") >= ceil(lit(threshold) * col("len_a")) &&
        col("len_a") >= ceil(lit(threshold) * col("len_b")))
      .filter(least(col("len_a") - col("pos_a"), col("len_b") - col("pos_b")) >= alpha)
      .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
    println("candidates=" + time("cand")(cand.count()))
    val verified = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
    println("pairs=" + time("verify")(verified.count()))
    spark.stop()
  }
}
