package graft.tools

import graft.diffy.{BigDiffy, DiffOptions}
import org.apache.spark.sql.SparkSession

/** Scratch probe: map + keyed-array diff through the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("== map diff (changed value, one-sided keys, empty map, null map):")
    val l = Seq(
      (1L, Map("a" -> 1.0, "b" -> 2.0)),
      (2L, Map.empty[String, Double]),
      (3L, Map("x" -> 9.0))).toDF("k", "m")
    val r = Seq(
      (1L, Map("a" -> 1.0, "b" -> 3.5, "c" -> 7.0)),
      (2L, Map("only" -> 1.0)),
      (3L, Map("x" -> 9.0))).toDF("k", "m")
    BigDiffy.diff(l, r, Seq("k")).deltas.orderBy("key", "field").show(false)

    println("== keyed-array diff with one-sided element (ANSI path):")
    val la = Seq((1L, Seq((10L, 1.0)))).toDF("k", "arr")
    val ra = Seq((1L, Seq((10L, 1.0), (20L, 5.0)))).toDF("k", "arr")
    BigDiffy.diff(la, ra, Seq("k"),
      DiffOptions(unorderedFieldKeys = Map("arr" -> "_1")))
      .deltas.show(false)

    println("== map value type string (levenshtein/numeric-parse inside map):")
    val ls = Seq((1L, Map("p" -> "kitten", "q" -> "5"))).toDF("k", "m")
    val rs = Seq((1L, Map("p" -> "sitting", "q" -> "9"))).toDF("k", "m")
    BigDiffy.diff(ls, rs, Seq("k")).deltas.orderBy("field").show(false)
    spark.stop()
  }
}
