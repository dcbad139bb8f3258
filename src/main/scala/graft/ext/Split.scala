package graft.ext

import graft.GraftFunctions.hashDice
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — train/val/test assignment as a pure
  * column expression.
  *
  * Engine extension (100 TB training-data surface): the reference's
  * deterministic hash sampler (BigSampler.scala:59-90) generalizes from
  * one keep/drop threshold to an ordered label partition of [0, 1): each
  * row's hash-dice position picks the first label whose cumulative
  * fraction exceeds it. Properties that matter at scale:
  *
  *   - ZERO shuffle, zero state: assignment is a codegen'd expression at
  *     scan speed, usable in batch and (unchanged) on a stream;
  *   - stable under reruns, appends, and repartitioning — a document's
  *     split never changes when the corpus around it does (the property
  *     random-number splits lack);
  *   - GROUP-ATOMIC leakage control: key the dice on a group column
  *     (near-dup cluster id from [[Dedup.clusterNearDups]], a domain, a
  *     user id) and every member lands in the same split, so
  *     train/test contamination via near-duplicates is structurally
  *     impossible rather than probabilistically unlikely.
  */
object Split {

  /** Append `splitCol` labeling each row with the first `fractions` label
    * whose cumulative fraction exceeds the row's deterministic hash-dice
    * position over `keyCols`. Fractions must be positive and sum to 1
    * (±1e-9). Rows where every key column is null share one dice value —
    * key on columns that are never all-null, or pre-filter.
    *
    * `seed` re-deals the assignment wholesale (murmur-seeded hash instead
    * of farm) — two pipelines seeding differently get independent splits
    * of the same corpus. */
  def hashSplit(df: DataFrame, keyCols: Seq[String],
                fractions: Seq[(String, Double)],
                splitCol: String = "split",
                seed: Option[Int] = None): DataFrame =
    df.withColumn(splitCol, splitLabel(keyCols.map(col), fractions, seed))

  /** The labeling expression itself, for streams or nested use. */
  def splitLabel(keys: Seq[Column], fractions: Seq[(String, Double)],
                 seed: Option[Int] = None): Column = {
    require(keys.nonEmpty, "split needs at least one key column")
    require(fractions.nonEmpty, "split needs at least one labeled fraction")
    require(fractions.forall(_._2 > 0.0),
      s"fractions must be positive: $fractions")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"fractions must sum to 1, got $total")
    val dice = seed match {
      case Some(s) => hashDice(keys, "murmur", Some(s))
      case None    => hashDice(keys)
    }
    // first label whose cumulative bound exceeds the dice; the last label
    // is the unconditional fallback so dice == 1.0 (hash == Long.Max)
    // and accumulated float error both land somewhere
    val bounds = fractions.init.scanLeft(0.0)(_ + _._2).tail
    fractions.init.zip(bounds)
      .foldRight(lit(fractions.last._1)) { case (((label, _), cum), rest) =>
        when(dice < cum, label).otherwise(rest)
      }
  }
}
