package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** CCNet-style n-gram language-model quality filter: train an add-one
  * smoothed bigram LM on a reference slice of the corpus, score every
  * document by its per-bigram cross-entropy under that model, and drop (or
  * down-weight) the tail. This is the classic perplexity filter used to
  * select "reference-like" web text for LLM pretraining (CCNet trains
  * KenLM on Wikipedia and buckets Common Crawl by perplexity); the bigram
  * form keeps the model a pair of count tables, so the whole pipeline —
  * training included — is replayable as portable SQL and graded
  * cell-exactly by the oracle (q101).
  *
  * Plan shape, reading 100 TB:
  *  - TRAIN is two `groupBy` counts over exploded bigrams (map-side
  *    partial aggregation; the shuffle is bounded by the DISTINCT bigram
  *    vocabulary — Zipf-bounded, like q49's inverted index — not by the
  *    corpus).
  *  - SCORE is a map-side explode joined against the model tables. The
  *    model is broadcast by default (a bigram table over a natural-language
  *    vocabulary is MBs, not GBs); for open-vocab corpora where it is not,
  *    pass `broadcastModel = false` and the same plan runs as a shuffle
  *    join on `w1` — semantics identical.
  *  - All model probabilities flow through floor-scaled 1e9 longs
  *    (`floor(ln(p) * 1e9)`), so per-doc sums are order-independent exact
  *    integer arithmetic — the established float discipline (see BM25 in
  *    LlmOracleSql.bm25Scored).
  *
  * Smoothing: P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), where c(w1·) is
  * the count of w1 AS A LEFT CONTEXT (= sum over w2 of c(w1,w2), so the
  * distribution normalizes) and V is the distinct-token count of the
  * training slice. Unseen contexts degrade gracefully to uniform 1/V.
  * ln((c12+1)/(c1+V)) is strictly negative: c1 >= c12 and V >= 2 make the
  * ratio < 1, so the floor-scaled long never sits on the 0 boundary.
  */
object NgramLm {

  /** Trained model: every member is an unresolved plan — nothing executes
    * until a scoring action runs (same fully-lazy discipline as
    * NaiveBayes.Model: fit + score is ONE Spark job). `stats` is one row
    * carrying `v` = distinct training tokens clamped >= 1; it rides the
    * score plan as a broadcast cross join instead of an eager driver
    * scalar.
    */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
      stats: DataFrame) {
    /** Driver probe for tests/inspection — runs a job. */
    def vocabSize: Long = stats.head.getLong(0)
  }

  /** Lower-cased whitespace words, matching the q101 oracle's
    * `string_split_regex(lower(text), '\s+')` exactly.
    */
  private def tokens(text: Column): Column = TextOps.words(lower(text))

  /** (w1, w2) bigram rows for each document: zip the word array against
    * itself shifted by one — a per-row map-side transform, no join.
    * The slice length clamps at 0: a ZERO-token document (empty or
    * all-whitespace text — blank lines are routine in a real corpus)
    * would otherwise feed slice a length of -1 and fail the whole job at
    * runtime (caught by the PropertySpec random-corpus generator).
    */
  def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__ws"))
      .select(col("__id"),
        explode(TextOps.letCol(col("__ws")) { ws =>
          arrays_zip(slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
            slice(ws, lit(2), greatest(size(ws) - 1, lit(0))))
        }).as("__bg"))
      .select(col("__id"), col("__bg.0").as("w1"), col("__bg.1").as("w2"))

  /** Fit the bigram LM on `train`. Lazy end to end: the count tables AND
    * the vocabulary scalar are unresolved plans (the scalar is a one-row
    * frame), so fit runs no job — everything executes with the first
    * scoring action. An empty training corpus degrades to v = 1 (uniform
    * 1-symbol model) via the in-plan clamp, same contract as NaiveBayes.
    */
  def train(trainDocs: DataFrame, idCol: String, textCol: String): Model = {
    val bg = bigrams(trainDocs, idCol, textCol)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val stats = trainDocs
      .select(explode(tokens(col(textCol))).as("w"))
      .agg(greatest(countDistinct(col("w")), lit(1L)).as("v"))
    Model(c2, c1, stats)
  }

  /** Score `docs` against `model`: one row per document that has at least
    * one bigram — (idCol, n_bigrams, cross_entropy), where cross_entropy
    * is the mean negative log-likelihood in nats (exp of it = perplexity).
    * Lower = closer to the training distribution; a pretraining filter
    * keeps the low-entropy head or buckets by quantile (CCNet's
    * head/middle/tail).
    */
  def crossEntropy(model: Model, docs: DataFrame, idCol: String,
      textCol: String, broadcastModel: Boolean = true): DataFrame = {
    // an EMPTY training corpus (no counts, v clamped to 1) degrades to the
    // uniform 1-symbol model rather than throwing: scoring any non-empty
    // doc then reports ln(1) = 0 per bigram, and the empty-lake contract
    // (every query completes on empty inputs) holds because the score side
    // has no bigrams either
    def side(m: DataFrame) = if (broadcastModel) broadcast(m) else m
    bigrams(docs, idCol, textCol)
      .join(side(model.bigrams), Seq("w1", "w2"), "left")
      .join(side(model.contexts), Seq("w1"), "left")
      // one-row stats frame: always broadcast regardless of the model flag
      .crossJoin(broadcast(model.stats))
      .select(col("__id"),
        floor(log((coalesce(col("c12"), lit(0L)) + 1.0) /
          (coalesce(col("c1"), lit(0L)) + col("v").cast("double")))
          * 1e9).cast("long").as("l9"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("l9")).cast("double") / count(lit(1)) / 1e9)
          .as("cross_entropy"))
  }
}
