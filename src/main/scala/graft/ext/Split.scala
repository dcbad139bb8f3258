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

  /** Near-dup-aware train/val/test split: label every row so that NO
    * near-duplicate pair straddles a split boundary — the split is keyed
    * on the document's near-dup cluster ([[Dedup.clusterNearDups]]: banded
    * minhash candidates, exact shingle-Jaccard verify, connected
    * components), so an eval document's near-copies are structurally
    * locked into the same split rather than probabilistically unlikely to
    * leak. Returns the input plus `clusterCol` (the cluster handle, kept
    * for auditing — drop it if unwanted) and `splitCol`.
    *
    * Fractions apply to CLUSTERS, not rows: a 10-member cluster moves
    * atomically, so realized row fractions drift by the dup mass (the
    * usual curation stance — near-dup mass belongs to one side; dedup it
    * there or keep it, but never let it vote twice across the boundary).
    * Assignment is the same zero-shuffle [[splitLabel]] dice once the
    * cluster column exists; the near-dup detection is the only shuffling
    * stage, with [[Dedup.minhashNearDups]]'s banded/capped scale shape —
    * including its pre-flight candidate pricing: pass `maxCandidates` to
    * fail fast before a recall-tuned banding goes quadratic on a
    * shared-vocabulary corpus.
    *
    * Already have components (from simhash, embeddings, or a persisted
    * run)? Use [[leakageSafeSplitByComponents]] and skip the detection. */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       fractions: Seq[(String, Double)],
                       splitCol: String = "split",
                       clusterCol: String = "cluster",
                       seed: Option[Int] = None,
                       numHashes: Int = 64, bands: Int = 16,
                       shingleLen: Int = 5, threshold: Double = 0.8,
                       minhashSeed: Int = 0,
                       maxBucketSize: Int = 1000,
                       maxCandidates: Option[Long] = Dedup.DefaultMaxCandidates): DataFrame = {
    val clustered = Dedup.clusterNearDups(df, idCol, textCol, numHashes,
      bands, shingleLen, threshold, minhashSeed, maxBucketSize, clusterCol,
      maxCandidates)
    clustered.withColumn(splitCol,
      splitLabel(Seq(col(clusterCol)), fractions, seed))
  }

  /** [[leakageSafeSplit]] from a PRE-COMPUTED (id, component) labeling —
    * the composition primitive: any pair source ([[Dedup.minhashNearDups]],
    * [[Dedup.simhashNearDups]], [[Dedup.embeddingNearDups]] — all three
    * candidate-priced with the same `maxCandidates` fail-fast (default
    * [[Dedup.DefaultMaxCandidates]]) — or
    * a persisted [[DedupIndex]] search) fed through
    * [[Dedup.connectedComponents]] plugs in here. Rows absent from `components` are singletons keyed on
    * their own id. Pure column logic after one left join against the
    * (typically tiny) labeling — broadcast-sized in the usual case where
    * only the duplicated minority appears in `components`. */
  def leakageSafeSplitByComponents(df: DataFrame, idCol: String,
                                   components: DataFrame,
                                   fractions: Seq[(String, Double)],
                                   splitCol: String = "split",
                                   clusterCol: String = "cluster",
                                   seed: Option[Int] = None): DataFrame = {
    require(!df.columns.contains(clusterCol),
      s"clusterCol '$clusterCol' already exists on the input")
    val comp = components
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    df.join(comp, df(idCol) === col("__cc_id"), "left")
      .withColumn(clusterCol, coalesce(col("__cc_comp"), df(idCol)))
      .drop("__cc_id", "__cc_comp")
      .withColumn(splitCol, splitLabel(Seq(col(clusterCol)), fractions, seed))
  }

  /** Deterministic global training-order shuffle: every row gets a
    * pseudo-random but reproducible `orderCol` (md5 of salt + keys) and a
    * `shardCol` derived from it; rows come back clustered by shard and
    * sorted by (shard, order key) within each task. The global training
    * order is BY DEFINITION ascending (shard, order_key) — a pure
    * function of the values, independent of Spark's partition placement.
    * To materialize one file per shard, write the result with
    * `.write.partitionBy(shardCol)` (directory-per-shard); consuming
    * `shard=0, shard=1, …` directories in order replays the permutation.
    * (The internal `repartition(numShards, shard)` co-locates each shard
    * for parallelism but hash-placement may pack two shards into one
    * task — the within-task sort leads with `shardCol` precisely so that
    * collided shards still come out contiguous and ordered.)
    *
    * Why an md5 sort key instead of `orderBy(rand())`:
    *   - REPRODUCIBLE: the permutation is a pure function of (salt, keys)
    *     — reruns, retries, and speculative tasks all agree, and a
    *     different salt (e.g. `"epoch3"`) re-deals the whole permutation
    *     for the next epoch with zero coordination;
    *   - RESUMABLE: "continue from position p" is a FILTER on the
    *     position PAIR — `shard > s OR (shard = s AND order_key > k)` —
    *     not a count-based skip into a nondeterministic sort (the order
    *     key alone is not global: it restarts within each shard);
    *   - SCALE-SHAPED: one hash shuffle + a per-partition sort — no
    *     global total-order sort, no range-boundary sampling job, no
    *     single-task funnel anywhere. Shard sizes concentrate tightly
    *     (multinomial, ±√ per shard) because md5 bits are uniform.
    *
    * Both derivations are engine-portable arithmetic (md5 hex + base-16
    * digits), so a reader in ANY system — DuckDB, Trino, Python — can
    * reproduce the exact (shard, order_key) assignment and therefore the
    * same global order; the `train_order` gate hash-matches the full
    * assignment against DuckDB.
    *
    * Keys must be row-unique (e.g. the document id) for a true
    * permutation; duplicate keys sort adjacent, which is occasionally
    * wanted (grouped curricula) but usually a caller bug. */
  def trainOrder(df: DataFrame, keyCols: Seq[String], salt: String,
                 numShards: Int, orderCol: String = "order_key",
                 shardCol: String = "shard"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val keyed = df
      .withColumn(orderCol, orderKey(keyCols.map(col), salt))
      .withColumn(shardCol, shardOf(col(orderCol), numShards))
    keyed.repartition(numShards, col(shardCol))
      .sortWithinPartitions(shardCol, orderCol)
  }

  /** The reproducible order key itself (md5 hex of salt + ":"-joined
    * keys), for streams or nested use — a pure codegen'd expression. */
  def orderKey(keys: Seq[Column], salt: String): Column = {
    require(keys.nonEmpty, "trainOrder needs at least one key column")
    md5(concat_ws(":", (lit(salt) +: keys.map(_.cast("string"))): _*))
  }

  /** Shard of an [[orderKey]]: the key's first 6 hex digits as an integer,
    * mod `numShards` — plain base-16 arithmetic any engine reproduces. */
  def shardOf(orderKey: Column, numShards: Int): Column =
    (conv(substring(orderKey, 1, 6), 16, 10).cast("long") % numShards)
      .cast("int")
}
