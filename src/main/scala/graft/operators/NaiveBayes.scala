package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Multinomial Naive Bayes text classifier — the deterministic,
  * count-table cousin of the fastText/logistic-regression quality and
  * domain classifiers used to filter pretraining corpora (GPT-3's
  * reference-corpus quality filter, CCNet's domain buckets): train
  * per-class word counts on a labeled reference slice, score every
  * document by log prior + sum of add-one-smoothed log likelihoods,
  * predict the argmax class. Because the model is two count tables and
  * the scores are floor-scaled exact longs, training AND inference
  * replay in portable SQL — the oracle grades the full confusion matrix.
  *
  * Plan shape, reading 100 TB: the model is FULLY LAZY — the count
  * tables, the vocabulary size, and the doc total are unresolved plans
  * (the scalars live in a one-row frame cross-joined into the score
  * plan), so fit + inference is ONE Spark job with no eager driver
  * actions. Training is one (word, class) groupBy plus one class groupBy
  * (vocab-/class-bounded shuffles with map-side combine); scoring is a
  * map-side explode crossed with the tiny class list (prior and
  * smoothing constants ride along), joined against the broadcast count
  * table, then one per-(doc, class) partial-aggregable sum.
  */
object NaiveBayes {

  /** Trained model: every member is an unresolved plan — nothing executes
    * until a scoring action runs. `classCounts` rows: (cls, n_docs_c,
    * n_words_c); `wordCounts` rows: (w, cls, c_wc); `stats` is ONE row
    * (v = distinct train words clamped >= 1, n = train docs).
    */
  final case class Model(wordCounts: DataFrame, classCounts: DataFrame,
      stats: DataFrame) {
    /** Driver probe for tests/inspection — runs a job. */
    def vocabSize: Long = stats.head.getLong(0)
    /** Driver probe for tests/inspection — runs a job. */
    def nDocs: Long = stats.head.getLong(1)
  }

  private def tokens(text: Column): Column = TextOps.words(lower(text))

  /** Fit on `train` with labels in `classCol`. Rows with a NULL label or
    * NULL text contribute nothing (explode drops them).
    */
  def train(trainDocs: DataFrame, classCol: String,
      textCol: String): Model = {
    val labeled = trainDocs.filter(col(classCol).isNotNull)
    val toks = labeled
      .select(col(classCol).as("cls"), explode(tokens(col(textCol))).as("w"))
    val wc = toks.groupBy("w", "cls").agg(count(lit(1)).as("c_wc"))
    val cc = labeled
      .groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_docs_c"),
        sum(coalesce(size(tokens(col(textCol))), lit(0))).as("n_words_c"))
    // empty-corpus degeneracy: v clamps to 1 (uniform 1-symbol model) so
    // the smoothing denominator never hits ln(0) — same contract as
    // NgramLm.crossEntropy
    val stats = labeled
      .select(explode(tokens(col(textCol))).as("w"))
      .agg(greatest(countDistinct(col("w")), lit(1L)).as("v"))
      .crossJoin(labeled.agg(count(lit(1)).as("n")))
    Model(wc, cc, stats)
  }

  /** Score + predict: one row per (idCol) with the argmax class under
    * floor-scaled add-one log scores. Ties (exact long-score equality)
    * break to the lexicographically smallest class — deterministic, and
    * replayed identically by the oracle's min-struct.
    *
    * Coverage contract: documents with NULL text or zero tokens emit NO
    * prediction row (the explode drops them before scoring) — coverage is
    * the tokenizable subset, not the input row count. Callers joining
    * predictions back must left-join; prior-only scoring for empty docs
    * would be the alternative if full coverage is ever wanted.
    *
    * `broadcastModel`: the (w, cls) count table is Zipf-bounded for
    * natural language (MBs) and broadcasts by default; for open-vocab
    * corpora where it is not, pass false and the same plan degrades to a
    * shuffle join on (w, cls) — semantics identical (mirrors
    * NgramLm.crossEntropy's flag). The per-class prior frame is
    * class-count-bounded and always broadcasts.
    */
  def predict(model: Model, docs: DataFrame, idCol: String,
      textCol: String, broadcastModel: Boolean = true,
      spread: Boolean = true): DataFrame = {
    // per-class constants (prior, word total) + the global scalars in one
    // broadcast class-count-bounded frame that rides the cross join
    val priors = model.classCounts.crossJoin(model.stats)
      .select(col("cls"), col("n_words_c"), col("v"),
        floor(log(col("n_docs_c") / col("n").cast("double")) * 1e9)
          .cast("long").as("prior9"))
    // scoring fans each doc out |classes| x |words|-fold from a compact
    // scan — spread the pre-explosion rows across cores first (same
    // explicit-parameter discipline as SpanDedup.grams: no partition
    // probe, which would force physical planning of the upstream frame)
    val spreadDocs = Spread(docs, spread)
    val docWords = spreadDocs
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("w"))
    // every (doc word) x every class, so unseen (w, cls) pairs score the
    // smoothed floor ln(1/(n_words_c + V)) instead of silently dropping
    val counts =
      if (broadcastModel) broadcast(model.wordCounts) else model.wordCounts
    docWords
      .crossJoin(broadcast(priors))
      .join(counts, Seq("w", "cls"), "left")
      .select(col("__id"), col("cls"), col("prior9"),
        floor(log((coalesce(col("c_wc"), lit(0L)) + 1.0) /
          (col("n_words_c") + col("v").cast("double"))) * 1e9)
          .cast("long").as("l9"))
      .groupBy("__id", "cls")
      // prior9 is constant within the (__id, cls) group; min() folds it
      // into the same aggregation instead of a second join
      .agg((sum(col("l9")) + min(col("prior9"))).as("score9"))
      .groupBy(col("__id").as(idCol))
      .agg(min(struct((-col("score9")).as("ns"), col("cls").as("c")))
        .as("m"))
      .select(col(idCol), col("m.c").as("predicted"),
        (-col("m.ns")).as("score9"))
  }
}
