package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

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
}
