package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class FrequentSpec extends SparkSpec {
  import spark.implicits._

  behavior of "MisraGries"

  it should "survive the classic k+1-distinct adversary" in {
    // k counters, k+1 distinct items arriving round-robin: every counter
    // gets decremented repeatedly, but the planted majority item must hold
    val mg = new Frequent.MisraGries(3)
    val stream = (1 to 50).flatMap(_ => Seq("a", "b", "c", "d")) ++
      (1 to 120).map(_ => "heavy")
    val sketch = stream.foldLeft(mg.zero)(mg.reduce)
    sketch.keySet should contain("heavy")
    sketch.size should be <= 3
  }

  it should "merge partial sketches without losing guaranteed items" in {
    val mg = new Frequent.MisraGries(4)
    val r = new Random(7)
    // 2000 noise draws over 40 items + 900 planted: planted freq ~31% >>
    // N/(k+1) = 20%, so it must survive any partition split + merge order
    val data = r.shuffle(
      (1 to 2000).map(_ => s"n${r.nextInt(40)}") ++
        (1 to 900).map(_ => "planted"))
    val parts = data.grouped(137).toList
    val merged = parts.map(_.foldLeft(mg.zero)(mg.reduce))
      .reduceLeft(mg.merge)
    merged.keySet should contain("planted")
    merged.size should be <= 4
    // undercount bound: estimate >= true - N/(k+1)
    merged("planted") should be >= (900L - (data.size / 5L))
  }

  behavior of "heavyHitters"

  it should "match a full exact groupBy on random skewed data" in {
    val r = new Random(11)
    // Zipf-ish: item i with weight ~ 1/i over 200 items
    val data = (1 to 20000).map { _ =>
      val u = r.nextDouble()
      s"w${math.min(199, (1.0 / (u + 0.005)).toInt)}"
    }
    val df = data.toDF("item").repartition(8)
    val ppm = 10000L // 1%
    val got = Frequent.heavyHitters(df, "item", ppm)
      .as[(String, Long)].collect().toMap
    val n = data.size.toLong
    val want = data.groupBy(identity).view
      .mapValues(_.size.toLong)
      .filter { case (_, c) => c * 1000000L >= ppm * n }
      .toMap
    got shouldBe want
  }

  it should "be exact even when every item is rare except one" in {
    val df = ((1 to 5000).map(i => s"unique$i") ++ (1 to 600).map(_ => "top"))
      .toDF("item").repartition(16)
    val got = Frequent.heavyHitters(df, "item", minFreqPpm = 100000L) // 10%
      .as[(String, Long)].collect()
    got shouldBe Array(("top", 600L))
  }

  it should "bound every approxTopK estimate by the MG guarantee" in {
    val r = new Random(23)
    val data = (1 to 30000).map { _ =>
      val u = r.nextDouble()
      s"z${math.min(499, (1.0 / (u + 0.002)).toInt)}"
    }
    val df = data.toDF("item").repartition(16)
    val k = 32
    val est = Frequent.approxTopK(df, "item", k)
      .as[(String, Long, Long)].collect()
    est.length should be <= k
    est should not be empty
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = math.ceil(data.size.toDouble / (k + 1)).toLong
    est.foreach { case (item, e, mu) =>
      mu shouldBe bound
      e should be <= truth(item)
      truth(item) should be <= (e + mu)
    }
  }

  it should "return an empty frame on empty or all-null input" in {
    val empty = Seq.empty[String].toDF("item")
    Frequent.heavyHitters(empty, "item", 1000L).count() shouldBe 0L
    val nulls = Seq[Option[String]](None, None).toDF("item")
    Frequent.heavyHitters(nulls, "item", 1000L).count() shouldBe 0L
  }

  it should "extract frequent words from text via heavyWords" in {
    val docs = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark jobs run on spark clusters"),
      (3L, "one two three four five six")).toDF("id", "text")
    // 17 words, spark x5 = 29%; threshold 20%
    val got = Frequent.heavyWords(docs, "text", minFreqPpm = 200000L)
      .as[(String, Long)].collect()
    got shouldBe Array(("spark", 5L))
  }
}
