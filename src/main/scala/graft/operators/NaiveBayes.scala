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
  * Plan shape, reading 100 TB: training is one (word, class) groupBy
  * plus one class groupBy (both vocab-/class-bounded shuffles with
  * map-side combine); scoring is a map-side explode crossed with the
  * tiny class list, joined against the broadcast count table, then one
  * per-(doc, class) partial-aggregable sum. Nothing driver-side except
  * the vocab-size and class-prior scalars (class-count-bounded).
  */
object NaiveBayes {

  /** Trained model. `classCounts` rows: (cls, n_docs_c, n_words_c);
    * `wordCounts` rows: (w, cls, c_wc); `vocabSize` = distinct train
    * words; `nDocs` = training documents (prior denominator).
    */
  final case class Model(wordCounts: DataFrame, classCounts: DataFrame,
      vocabSize: Long, nDocs: Long)

  private def tokens(text: Column): Column = TextOps.words(lower(text))

  /** Fit on `train` with labels in `classCol`. Rows with a NULL label or
    * NULL text contribute nothing (explode drops them).
    */
  def train(trainDocs: DataFrame, classCol: String,
      textCol: String): Model = {
    val toks = trainDocs
      .filter(col(classCol).isNotNull)
      .select(col(classCol).as("cls"), explode(tokens(col(textCol))).as("w"))
    val wc = toks.groupBy("w", "cls").agg(count(lit(1)).as("c_wc"))
    val cc = trainDocs
      .filter(col(classCol).isNotNull)
      .groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_docs_c"),
        sum(coalesce(size(tokens(col(textCol))), lit(0))).as("n_words_c"))
    val v = toks.agg(countDistinct(col("w"))).head.getLong(0)
    val n = trainDocs.filter(col(classCol).isNotNull).count()
    Model(wc, cc, v, n)
  }

  /** Score + predict: one row per (idCol) with the argmax class under
    * floor-scaled add-one log scores. Ties (exact long-score equality)
    * break to the lexicographically smallest class — deterministic, and
    * replayed identically by the oracle's min-struct.
    */
  def predict(model: Model, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val v = math.max(model.vocabSize, 1L)
    // per-class constant: floor-scaled ln prior (class-count-bounded rows)
    val priors = model.classCounts.select(col("cls"), col("n_words_c"),
      floor(log(col("n_docs_c") / lit(model.nDocs.toDouble)) * 1e9)
        .cast("long").as("prior9"))
    val docWords = docs
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("w"))
    // every (doc word) x every class, so unseen (w, cls) pairs score the
    // smoothed floor ln(1/(n_words_c + V)) instead of silently dropping
    val scored = docWords
      .crossJoin(broadcast(priors.select("cls", "n_words_c")))
      .join(broadcast(model.wordCounts), Seq("w", "cls"), "left")
      .select(col("__id"), col("cls"),
        floor(log((coalesce(col("c_wc"), lit(0L)) + 1.0) /
          (col("n_words_c") + lit(v.toDouble))) * 1e9)
          .cast("long").as("l9"))
      .groupBy("__id", "cls")
      .agg(sum(col("l9")).as("ll9"))
      .join(broadcast(priors.select("cls", "prior9")), "cls")
      .select(col("__id"), col("cls"),
        (col("ll9") + col("prior9")).as("score9"))
    scored.groupBy(col("__id").as(idCol))
      .agg(min(struct((-col("score9")).as("ns"), col("cls").as("c")))
        .as("m"))
      .select(col(idCol), col("m.c").as("predicted"),
        (-col("m.ns")).as("score9"))
  }
}
