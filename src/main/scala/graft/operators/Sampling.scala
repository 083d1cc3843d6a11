package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling and dataset splitting.
  *
  * Training-data pipelines need sampling that is REPRODUCIBLE: the same row
  * must land in the same sample/split on every run, on any cluster layout,
  * and after any repartition — `df.sample()`/`sampleBy()` (seeded partition
  * RNG) give none of that. Content-hash sampling derives the decision from
  * the row's own key: keep iff md5-hash(key + salt) mod 1e6 < rate * 1e6.
  *
  * Properties that matter at 100 TB:
  *  - pure map-side column expression — no shuffle, no driver state;
  *  - stable under re-runs, re-partitioning, and incremental appends
  *    (a re-ingested row keeps its split — no train/test leakage);
  *  - different `salt` values give independent samples (sample vs split
  *    decisions don't correlate);
  *  - portable (md5 + hex parse), so sampling decisions are reproducible
  *    in any engine — the q51 oracle replays them in SQL.
  */
object Sampling {

  private val Denom = 1000000L

  /** Uniform hash in [0, 1e6) from the row key and a salt. */
  def hashUnit(key: Column, salt: String): Column =
    Dedup.md5Hash48(concat(key.cast("string"), lit("#" + salt))) % Denom

  /** Keep predicate for a `rate` in [0, 1]: deterministic per (key, salt). */
  def hashSample(key: Column, rate: Double, salt: String = "sample"): Column =
    hashUnit(key, salt) < (rate * Denom).toLong

  /** Deterministic stratified k-sample: within each stratum, the k rows
    * with the smallest md5(key + salt) — a reproducible stand-in for
    * "k random rows per group" (hash uniformity = uniform sampling), with
    * the same stability properties as [[hashSample]]. Returns the input
    * columns plus `sample_rank` (1-based within the stratum).
    *
    * Plan: one row_number window partitioned by the strata column. The
    * full md5 hex string (not the 48-bit prefix) orders candidates, so
    * rank ties are practically impossible; `key` breaks them anyway.
    * Scale: the shuffle is keyed by stratum — with few, huge strata the
    * sort dominates; there a per-partition top-k aggregation (bounded
    * k-heap, same shape as Windowed.topKPerGroup's scale note) replaces
    * the window without changing the result.
    */
  def stratifiedTake(df: org.apache.spark.sql.DataFrame, strata: Column,
      key: Column, k: Int, salt: String = "strat")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(key.cast("string"), lit("#" + salt)))
    df.withColumn("sample_rank",
        row_number().over(Window.partitionBy(strata).orderBy(h, key)))
      .filter(col("sample_rank") <= k)
  }

  /** The UNBOUNDED-stratum form of [[stratifiedTake]] — identical rows and
    * ranks, different plan: a bounded k-buffer aggregation
    * ([[graft.functions.Aggregators.BoundedMinK]]) selects each stratum's
    * k smallest (md5, key) pairs with map-side partial aggregation (at
    * most k pairs per stratum leave each partition — no per-stratum sort,
    * no billion-row window), then the kept keys join back to recover the
    * full rows. Two narrow shuffles bounded by strata*k instead of one
    * stratum-keyed sort of the corpus.
    *
    * Preconditions for row-for-row identity with [[stratifiedTake]]:
    * `keyCol` must be a UNIQUE, NON-NULL integral id (the shape every
    * sampling call site uses). A duplicated key would match every kept
    * copy on the join-back and multiply rows; a null key hashes to null
    * and is never selected, where the window form would rank it. Null
    * STRATA are fine: the join uses null-safe equality, so a null stratum
    * is one partition in both forms.
    */
  def stratifiedTakeHeap(df: org.apache.spark.sql.DataFrame, strataCol: String,
      keyCol: String, k: Int, salt: String = "strat")
      : org.apache.spark.sql.DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(String, Long)]()
    val topk = udaf(graft.functions.Aggregators.BoundedMinK(k), enc)
    val kept = df
      .select(col(strataCol).as("__s"),
        md5(concat(col(keyCol).cast("string"), lit("#" + salt))).as("__h"),
        col(keyCol).cast("long").as("__k"))
      .groupBy(col("__s"))
      .agg(topk(col("__h"), col("__k")).as("__kept"))
      .select(col("__s"), posexplode(col("__kept")).as(Seq("__pos", "__k")))
      .select(col("__s"), col("__k"), (col("__pos") + 1).as("sample_rank"))
    df.join(broadcast(kept),
        col(strataCol) <=> col("__s") && col(keyCol).cast("long") === col("__k"))
      .drop("__s", "__k")
  }

  /** Split assignment from cumulative fractions, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Fractions must sum
    * to 1; the last split absorbs rounding.
    */
  def splitColumn(key: Column, fractions: Seq[(String, Double)],
      salt: String = "split"): Column = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $fractions")
    val h = hashUnit(key, salt)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail.map(c => (c * Denom).toLong)
    fractions.init.zip(cuts.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), cut), rest) =>
      when(h < cut, name).otherwise(rest)
    }
  }

  /** Leakage-safe split: assign splits per DUPLICATE-CLUSTER, not per row.
    *
    * A per-row hash split puts two near-duplicates in different splits
    * with probability 2·p·(1-p) each — at corpus scale the eval set is
    * guaranteed to contain training data (the contamination Lee et al.
    * 2021 measure). Here every document is keyed by its duplicate-cluster
    * root (connected components over the supplied near-dup `pairs`;
    * documents in no pair are their own root) and [[splitColumn]] hashes
    * the ROOT — a near-dup group moves between splits as a unit and can
    * never straddle, structurally.
    *
    * Returns the input plus `root`, `is_dup` (member of any near-dup
    * pair) and `split`. 100 TB: `pairs` comes
    * from the LSH candidate path (`Dedup.jaccardPairs`, bucket-bounded);
    * components are the bounded-round min-label propagation shared with
    * q52/q89; the root join is id-keyed; the split itself stays one
    * map-side hash. Oracle-replayable end to end (q110).
    */
  def leakageSafeSplit(df: org.apache.spark.sql.DataFrame, idCol: String,
      pairs: org.apache.spark.sql.DataFrame,
      fractions: Seq[(String, Double)], salt: String = "split")
      : org.apache.spark.sql.DataFrame = {
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("label").as("__dup_label"))
    df.join(comp, Seq(idCol), "left")
      .withColumn("root", coalesce(col("__dup_label"), col(idCol)))
      .withColumn("is_dup", col("__dup_label").isNotNull)
      .drop("__dup_label")
      .withColumn("split", splitColumn(col("root"), fractions, salt))
  }
}
