package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
  * distribution resembles a small, trusted TARGET corpus.
  *
  *   1. '''Feature''': every word bigram hashes into one of `buckets`
  *      buckets ([[bigramBuckets]]) — the paper's hashed n-gram features.
  *      The hash is the repo's portable 48-bit md5 family
  *      ([[Dedup.md5Hash48]]), so the whole pipeline replays verbatim in
  *      the DuckDB oracle.
  *   2. '''Fit''' ([[bucketLogRatios9]]): Laplace-smoothed bucket
  *      distributions for the target (`p`) and raw (`q`) corpora, and the
  *      per-bucket log importance ratio `ln(p[b]/q[b])`, floor-quantized
  *      to 1e-9 longs — the q96/q101/q104 discipline that absorbs the
  *      sub-ulp `ln()` disagreement between engines while keeping every
  *      downstream sum an exact, order-independent long addition.
  *   3. '''Score''' ([[importanceWeights9]]): a document's log importance
  *      weight is the sum of its bigram occurrences' ratios — one
  *      broadcast join against the `buckets`-row ratio table and one
  *      map-side-combined aggregation keyed by document.
  *   4. '''Resample''' ([[gumbelTopK]]): sampling k documents without
  *      replacement with probability ∝ exp(w) is exactly "top-k by
  *      w + Gumbel(0,1) noise" (the Gumbel-max trick). The noise is
  *      derandomized through the same portable hash (`u` from
  *      md5(doc_id:seed), `g = -ln(-ln(u))`), floor-quantized like the
  *      ratios, so the "random" sample is reproducible in both engines
  *      and across cluster re-runs — resampling a 100 TB corpus must not
  *      depend on task scheduling.
  *
  * Scale shape: fitting is two aggregations to `buckets` rows (map-side
  * combined, broadcastable); scoring is one pass over the raw corpus with
  * no join wider than the ratio table; resampling is `TakeOrderedAndProject`
  * (per-partition heaps, never a global sort). Overflow bound: |lambda9|
  * <= ln(n+B)*1e9 (~3e10 at a trillion bigrams), so a document needs
  * ~3e8 bigrams to overflow the long sum — document-length bounds hit
  * first by orders of magnitude.
  */
object Dsir {

  /** One row per bigram OCCURRENCE: (doc_id, bucket). Multiplicity matters —
    * DSIR's unigram-of-bigrams model counts occurrences, not the distinct
    * set (a doc repeating target-like phrasing scores higher).
    *
    * `spread` (the Winnow convention): the bucket hash is CPU-bound (one
    * md5 per bigram), so a compact doc scan — one small parquet split —
    * would hash the whole corpus on one core; spreading round-robins the
    * cheap PRE-explosion doc rows across defaultParallelism first. The
    * exchange is SIZE-GATED on logical plan statistics ([[Spread]]), so
    * full-scale scans stay untouched even at the default; spread = false
    * disables it unconditionally.
    */
  def bigramBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, spread: Boolean = true): DataFrame = {
    Spread(docs, spread).select(col(idCol).as("doc_id"),
        explode(TextOps.shingles(col(textCol), 2)).as("bg"))
      .select(col("doc_id"),
        (Dedup.md5Hash48(col("bg")) % buckets).as("bucket"))
  }

  /** (bucket, lambda9) for every bucket in [0, buckets): the floor-1e-9
    * quantized log ratio of the Laplace-smoothed target and raw bucket
    * probabilities. Buckets unseen in either corpus still get a (nonzero)
    * ratio from the smoothing — the spine is generated, not joined from
    * observed buckets. The whole fit is one aggregation pass per corpus;
    * it stays a zero-action lazy plan (the LogReg discipline).
    */
  def bucketLogRatios9(targetBg: DataFrame, rawBg: DataFrame,
      buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = targetBg.sparkSession
    def counts(bg: DataFrame, c: String) =
      bg.groupBy("bucket").agg(count(lit(1)).as(c))
    val spine = spark.range(buckets).select(col("id").as("bucket"))
    val b = lit(buckets.toDouble)
    // corpus totals are the SUM of the per-bucket counts — computed as a
    // window over the spine-joined `buckets`-row frame (bounded by
    // construction, the PSI-spine discipline), NOT as separate one-row
    // aggregations: a second agg per corpus would re-explode every bigram,
    // turning the two-pass fit into four passes over the corpora
    val w = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val tc = coalesce(col("tc"), lit(0L))
    val rc = coalesce(col("rc"), lit(0L))
    spine
      .join(counts(targetBg, "tc"), Seq("bucket"), "left")
      .join(counts(rawBg, "rc"), Seq("bucket"), "left")
      .select(col("bucket"),
        floor(log(
          ((tc + lit(1.0)) / (sum(tc).over(w) + b)) /
            ((rc + lit(1.0)) / (sum(rc).over(w) + b)))
          * lit(1e9)).cast("long").as("lambda9"))
  }

  /** Per-raw-document log importance weight: (doc_id, n_bigrams, w9).
    * `targetPred` splits `docs` into the target corpus (true) and the raw
    * pool (false); every raw document survives — zero-bigram docs carry
    * w9 = 0 via the left join, they don't silently vanish from the pool.
    */
  def importanceWeights9(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int, spread: Boolean = true): DataFrame = {
    val lam = bucketLogRatios9(
      bigramBuckets(docs.filter(targetPred), idCol, textCol, buckets, spread),
      bigramBuckets(docs.filter(!targetPred), idCol, textCol, buckets, spread),
      buckets)
    val scored = bigramBuckets(docs.filter(!targetPred), idCol, textCol,
        buckets, spread)
      .join(broadcast(lam), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lambda9").as("w9"))
    docs.filter(!targetPred).select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("w9"), lit(0L)).as("w9"))
  }

  /** The fitted ratio table as BOUNDED driver state: `buckets` longs in
    * bucket order, for inlining into a stateless scoring expression (the
    * w12/w15 "model as literals" discipline — the collect is bounded by
    * the bucket count, a construction parameter, never by data size).
    */
  def collectRatios9(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int, spread: Boolean = true): Array[Long] =
    bucketLogRatios9(
      bigramBuckets(docs.filter(targetPred), idCol, textCol, buckets, spread),
      bigramBuckets(docs.filter(!targetPred), idCol, textCol, buckets, spread),
      buckets)
      .orderBy("bucket").select("lambda9")
      .collect().map(_.getLong(0))

  /** Per-ROW importance weight as a pure column expression: sum of the
    * inlined ratio table over the text's bigram occurrences. Long addition
    * is exactly associative, so this equals [[importanceWeights9]]'s
    * explode+join w9 bit-for-bit (DsirSpec pins the parity) — but with no
    * shuffle and no state, which is what a streaming intake filter needs.
    * The array literal is bound once per row via letCol (HOF lambdas
    * re-evaluate captured expressions per element).
    */
  def scoreCol9(text: Column, lam9: Seq[Long], buckets: Int): Column =
    TextOps.letCol(array(lam9.map(lit(_)): _*)) { lam =>
      aggregate(TextOps.shingles(text, 2), lit(0L),
        (acc, bg) => acc +
          element_at(lam, (Dedup.md5Hash48(bg) % buckets).cast("int") + 1))
    }

  /** 2^48 and 2^48 + 1 as exact double literals for the uniform transform. */
  private val HashSpan = 281474976710656.0

  /** Derandomized Gumbel noise for `doc_id` under `seed`, floor-quantized:
    * u = (md5_48(doc_id:seed) + 1) / (2^48 + 1) lies strictly in (0, 1),
    * so -ln(-ln(u)) is finite; both engines build u from exact integer
    * doubles with one correctly-rounded division each.
    */
  def gumbel9(docId: Column, seed: String): Column =
    floor(-log(-log(
      (Dedup.md5Hash48(concat(docId.cast("string"), lit(":" + seed)))
        + lit(1.0)) / lit(HashSpan + 1.0)))
      * lit(1e9)).cast("long")

  /** Gumbel-top-k resample over a (doc_id, w9) frame: key9 = w9 + g9 and
    * take the k largest (doc_id tie-break). Equivalent to drawing k docs
    * without replacement with probability proportional to exp(w9/1e9),
    * but deterministic given `seed` — and a per-partition top-k heap
    * under Spark's `TakeOrderedAndProject`, never a global sort.
    */
  def gumbelTopK(weights: DataFrame, k: Int, seed: String): DataFrame = {
    val g = weights
      .withColumn("g9", gumbel9(col("doc_id"), seed))
      .withColumn("key9", col("w9") + col("g9"))
    g.orderBy(col("key9").desc, col("doc_id")).limit(k)
  }
}
