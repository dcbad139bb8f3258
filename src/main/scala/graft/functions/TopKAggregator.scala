package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, NullType, StructField, StructType}

/** k-bounded top-k-by-score aggregation.
  *
  * The scale fix for `row_number() over (partition by query_id)`: a window
  * rank funnels each query's ENTIRE candidate set through one task's sort
  * (unbounded in corpus size for IVF, where candidates per query ≈
  * corpus × nprobe / nlist). An `Aggregator` instead runs as a hash
  * aggregate with map-side partial buffers: every task keeps at most k
  * (score, id) pairs per query it sees, the shuffle carries those O(k)
  * buffers, and the final merge per query touches ≤ k × upstream-partitions
  * rows total — no single-task sort of the candidate set anywhere.
  *
  * Engine extension (ANN path of the training-data surface); the bounded-
  * heap idea mirrors the reference's memory-capped `topByKey`
  * (ratatool-sampling/src/main/scala/com/spotify/ratatool/samplers/util/
  * SamplerSCollectionFunctions.scala:220,260) applied per query instead of
  * per stratum.
  */
object TopK {

  /** One ranked neighbor: rank is 1-based, assigned at finish. */
  case class Hit[I](neighbor_id: I, cosine_sim: Double, rank: Int)

  /** Keeps the k best (score desc, id asc on ties) pairs seen. The buffer
    * is a sorted list of length ≤ k — for top-k search k is small, so
    * ordered insertion beats heap bookkeeping and the buffer stays a flat
    * Catalyst array when a partial result must serialize for the shuffle.
    */
  class ByScore[I: TypeTag](k: Int)(implicit idOrd: Ordering[I])
    extends Aggregator[(I, Double), List[(Double, I)], Seq[Hit[I]]] {
    require(k >= 1, s"top-k needs k >= 1, got $k")

    // strict "a ranks before b": higher score first, lower id on ties
    private def before(a: (Double, I), b: (Double, I)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && idOrd.lt(a._2, b._2))

    override def zero: List[(Double, I)] = Nil

    override def reduce(buf: List[(Double, I)], in: (I, Double)): List[(Double, I)] = {
      val e = (in._2, in._1)
      if (buf.lengthCompare(k) >= 0 && !before(e, buf.last)) buf
      else {
        val (hi, lo) = buf.span(before(_, e))
        (hi ::: e :: lo).take(k)
      }
    }

    override def merge(a: List[(Double, I)], b: List[(Double, I)]): List[(Double, I)] =
      (a ::: b).sortWith(before).take(k)

    override def finish(buf: List[(Double, I)]): Seq[Hit[I]] =
      buf.iterator.zipWithIndex
        .map { case ((s, id), i) => Hit(id, s, i + 1) }.toSeq

    override def bufferEncoder: Encoder[List[(Double, I)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Hit[I]]] = ExpressionEncoder()
  }

  /** Keeps the k smallest FULL rows per group under a lexicographic
    * ascending ordering over the `ordIdx` field positions (nulls first,
    * Spark's `asc` default). Schema-generic: input, buffer, and output all
    * ride the untyped Row encoder, so any DataFrame can use it without a
    * case class. Same scale shape as [[ByScore]]: ObjectHashAggregate with
    * map-side partial buffers — every task carries at most k rows per group
    * it sees, and the shuffle moves those O(k) buffers instead of the
    * group's whole candidate set (the `row_number() over (partition by
    * key)` funnel this replaces, reference SamplerSCollectionFunctions
    * .scala:220,260's bounded per-key heap).
    *
    * Ordering fields must be atomic Comparable externals (numeric, string,
    * decimal, date, timestamp) — exactly what an ORDER BY tuple is.
    */
  class SmallestRows(k: Int, schema: StructType, ordIdx: Seq[Int])
    extends Aggregator[Row, Row, Row] {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    require(ordIdx.nonEmpty, "SmallestRows needs at least one ordering field")
    ordIdx.foreach { i =>
      val f = schema(i)
      // BinaryType is scalar but its external Array[Byte] is not Comparable
      val comparable = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | NullType |
             BinaryType => false
        case _ => true
      }
      require(comparable,
        s"SmallestRows: ordering field '${f.name}' of type " +
          s"${f.dataType.catalogString} is not comparable; order by scalar " +
          "non-binary columns")
    }

    private val ord = ordIdx.toArray

    // strict "a orders before b" on the ordering tuple
    private def before(a: Row, b: Row): Boolean = {
      var i = 0
      while (i < ord.length) {
        val x = a.get(ord(i))
        val y = b.get(ord(i))
        if (x == null || y == null) {
          if ((x == null) != (y == null)) return x == null
        } else {
          val c = x.asInstanceOf[Comparable[Any]].compareTo(y)
          if (c != 0) return c < 0
        }
        i += 1
      }
      false
    }

    private def rows(b: Row): List[Row] = b.getSeq[Row](0).toList

    override def zero: Row = Row(Nil)

    override def reduce(b: Row, a: Row): Row = {
      val buf = rows(b)
      if (buf.lengthCompare(k) >= 0 && !before(a, buf.last)) b
      else {
        val (hi, lo) = buf.span(before(_, a))
        Row((hi ::: a :: lo).take(k))
      }
    }

    override def merge(a: Row, b: Row): Row =
      Row((rows(a) ::: rows(b)).sortWith(before).take(k))

    override def finish(b: Row): Row = b

    private val bufSchema =
      StructType(Seq(StructField("rows", ArrayType(schema))))
    override def bufferEncoder: Encoder[Row] = Encoders.row(bufSchema)
    override def outputEncoder: Encoder[Row] = Encoders.row(bufSchema)
  }
}
