package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Aggregators, TextOps}

/** Corpus-level overlap estimation with bottom-k (KMV) sketches — the
  * "how much does snapshot B repeat snapshot A" question every recurring
  * crawl/training-mix pipeline asks before mixing datasets, answered
  * WITHOUT materializing or joining the corpora's shingle sets.
  *
  * Method (Bar-Yossef et al. 2002; Beyer et al. 2007, "On synopses for
  * distinct-value estimation"): hash every distinct k-word shingle of a
  * corpus and keep only the k smallest distinct hash values (the KMV
  * sketch). For two corpora A and B, the k smallest values of
  * sketch(A) ∪ sketch(B) are exactly the k smallest hashes of the UNION
  * set, and the fraction of them present in BOTH sketches is an unbiased
  * estimator of the Jaccard similarity |A∩B| / |A∪B| — the sketch is a
  * uniform sample of the union under the hash ordering.
  *
  * 100 TB story: each corpus collapses map-side to <= k longs (the
  * [[Aggregators.BoundedMinKDistinctLong]] buffer never exceeds k, and
  * partial aggregation ships one sketch per partition per corpus), so the
  * only shuffle is |corpora| rows of k longs; the pairwise matrix is a
  * self-join of that one-row-per-corpus frame with pure array expressions
  * inside — no shingle-level join EVER happens, which is the entire point
  * vs the exact q25-style inverted index (linear in corpus size, not in
  * overlap). Sketches are mergeable (union = insert-all), so per-shard or
  * per-day sketches roll up without touching raw text — the incremental
  * form [[graft.streaming.StreamingOps]] exposes for intake streams.
  *
  * Hashes are the portable md5-prefix form (15 hex chars -> BIGINT, the
  * q27 discipline) so a SQL oracle replays every sketch value bit-for-bit.
  */
object CorpusOverlap {

  /** Portable shingle hash: first 15 hex chars of md5 as a non-negative
    * BIGINT (DuckDB: `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`).
    */
  def shingleHash(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 15), 16, 10).cast("long")

  /** One KMV sketch row per corpus: (corpus, sketch array<long> ascending,
    * at most k distinct values). `n_docs` rides along for context.
    */
  def sketches(docs: DataFrame, corpusCol: String, textCol: String,
      k: Int = 256, shingleK: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val minK = udaf(Aggregators.BoundedMinKDistinctLong(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    docs
      .select(col(corpusCol).as("corpus"),
        explode(TextOps.shingleSet(col(textCol), shingleK)).as("s"))
      .select(col("corpus"), shingleHash(col("s")).as("h"))
      .groupBy("corpus")
      .agg(minK(col("h")).as("sketch"))
  }

  /** EXACT KMV sketch merge: the k smallest distinct values of A ∪ B are
    * entirely determined by the k smallest of each side, so merging two
    * sketches IS re-sketching the combined input — bit-for-bit, no
    * approximation stacking (pinned in OperatorsSpec). This is what makes
    * per-shard / per-day sketches roll up into corpus versions without
    * ever touching raw text again (the q125 corpus-versioning discipline
    * on the overlap axis).
    */
  def mergeSketches(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Pairwise overlap matrix over a PREBUILT one-row-per-corpus sketch
    * frame `(corpus, sketch)` — the artifact-consuming half (sketches may
    * arrive from [[sketches]], a reloaded parquet artifact, or a
    * [[mergeSketches]] roll-up; the math cannot tell, which is the point).
    */
  def overlapMatrixOf(sk: DataFrame, k: Int = 256): DataFrame = {
    val a = sk.select(col("corpus").as("corpus_a"), col("sketch").as("ska"))
    val b = sk.select(col("corpus").as("corpus_b"), col("sketch").as("skb"))
    a.join(b, col("corpus_a") < col("corpus_b"))
      .withColumn("__merged",
        slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .select(col("corpus_a"), col("corpus_b"),
        size(col("__merged")).cast("long").as("m"),
        size(array_intersect(array_intersect(col("__merged"), col("ska")),
          col("skb"))).cast("long").as("n_common"))
      // m == 0 is unreachable from [[sketches]] (a shingle-less corpus
      // emits no sketch row) but reachable through a hand-built artifact
      // with two empty sketches: NULL like the oracle's NULLIF division,
      // never a 0/0 NaN (ADVICE r11)
      .withColumn("jaccard_est",
        when(col("m") === 0, lit(null: java.lang.Double))
          .otherwise(round(col("n_common").cast("double") / col("m"), 6)))
  }

  /** Pairwise overlap matrix over the corpora of `corpusCol`: one row per
    * unordered corpus pair (corpus_a < corpus_b) with the merged-sample
    * size `m` (= min(k, |union sketch values|)), the number of merged
    * values present in both sketches `n_common`, and the Jaccard estimate
    * n_common / m rounded to 6 places (the q25 ratio discipline).
    */
  def overlapMatrix(docs: DataFrame, corpusCol: String, textCol: String,
      k: Int = 256, shingleK: Int = 3): DataFrame =
    overlapMatrixOf(sketches(docs, corpusCol, textCol, k, shingleK), k)
}
