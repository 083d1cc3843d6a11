package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.{TextOps, VectorOps}
import graft.operators.{Dedup, Similarity}
import graft.queries.LlmOracleSql._

/** Trainable quality classifiers and their evaluation: bigram-LM perplexity, Naive Bayes, GD logistic regression with exact AUC / PR curve / calibration grades.
  *
  * Split out of the monolithic LlmQueries (r9 verdict #7) along its
  * family banners; the aggregate inventory, its portable-hash contract
  * scaladoc, and the shared oracle CTE builders live in [[LlmQueries]]
  * and [[LlmOracleSql]].
  */
object LlmEvalQueries {
  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- Naive Bayes domain/source classifier ---------------------------
    // The deterministic stand-in for the fastText-style corpus-filter
    // classifier: multinomial NB trained on the doc_id % 3 != 0 slice with
    // class = source, then EVERY doc classified and the confusion matrix
    // graded (same reporting shape as q30 langid). Training counts,
    // priors, smoothing, floor-scaled log scores, and the min-struct
    // argmax all replay in the oracle.
    "q104_nb_source_classifier" -> QueryDef(
      (s, dir) => {
        import graft.operators.NaiveBayes
        val docs = t(s, dir, "documents")
        val model = NaiveBayes.train(docs.filter(col("doc_id") % 3 =!= 0),
          "source", "text")
        NaiveBayes.predict(model, docs, "doc_id", "text")
          .join(docs.select("doc_id", "source"), "doc_id")
          .groupBy("source", "predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy("source", "predicted")
      },
      Some("""WITH w AS (SELECT doc_id, source,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> len(x) > 0) AS ws FROM documents),
        tr AS (SELECT * FROM w WHERE doc_id % 3 <> 0),
        tok AS (SELECT source AS cls, unnest(ws) AS w FROM tr),
        wc AS (SELECT w, cls, COUNT(*) AS c_wc FROM tok GROUP BY 1, 2),
        cc AS (SELECT source AS cls, COUNT(*) AS n_docs_c,
            SUM(len(ws)) AS n_words_c FROM tr GROUP BY 1),
        vv AS (SELECT COUNT(DISTINCT w) AS v FROM tok),
        nn AS (SELECT COUNT(*) AS n FROM tr),
        pri AS (SELECT cls, n_words_c,
            CAST(FLOOR(ln(CAST(n_docs_c AS DOUBLE) / nn.n) * 1e9) AS BIGINT)
              AS prior9
          FROM cc CROSS JOIN nn),
        dw AS (SELECT doc_id, unnest(ws) AS w FROM w),
        sc AS (SELECT dw.doc_id, p.cls,
            CAST(FLOOR(ln((COALESCE(wc.c_wc, 0) + 1.0)
              / (p.n_words_c + vv.v)) * 1e9) AS BIGINT) AS l9
          FROM dw CROSS JOIN pri p
          LEFT JOIN wc ON wc.w = dw.w AND wc.cls = p.cls
          CROSS JOIN vv),
        tot AS (SELECT doc_id, cls, SUM(l9) AS ll9 FROM sc GROUP BY 1, 2),
        fin AS (SELECT tot.doc_id, tot.cls, ll9 + pri.prior9 AS score9
          FROM tot JOIN pri USING (cls)),
        pred AS (SELECT doc_id,
            struct_extract(MIN({'ns': -score9, 'c': cls}), 'c') AS predicted
          FROM fin GROUP BY doc_id)
        SELECT d.source, p.predicted, COUNT(*) AS n
        FROM pred p JOIN documents d USING (doc_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- Trainable linear classifier: logistic regression by GD ---------
    // Full-batch gradient descent on 8 embedding dims + bias (y = label<5),
    // three iterations, weights floor-quantized to 1e-6 longs after every
    // step. The ENTIRE training loop is part of the graded surface: the
    // oracle CTE chain recomputes every gradient (decimal-exact sums),
    // every quantized update, and every iteration's training accuracy —
    // the NaiveBayes/NgramLm oracle standard applied to an ITERATIVE fit.
    // Fit is fully lazy (chained one-row broadcast aggregations — zero
    // jobs until the action); see operators/LogReg.scala for the 100 TB
    // plan shape (k+1 decimal cells per pass, broadcast model state).
    "q108_logreg_classifier" -> QueryDef(
      (s, dir) => {
        import graft.operators.LogReg
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        LogReg.trainTrajectory(feats, (0 to 8).map(j => s"x$j"), "y",
          lr = 0.5, iters = 3).orderBy("iter")
      },
      Some(logRegOracleSql)),

    // ---- Exact distributed ROC-AUC of the trained classifier ------------
    // Train (same config as q108), score every example, quantize z to
    // 1e-9, and compute the tie-corrected Mann-Whitney AUC via the
    // two-phase distributed rank (operators/MlMetrics.scala — the global
    // sort never funnels through one task). The oracle replays training,
    // scoring, the rank spans, and the integer AUC division; train +
    // score + rank + grade is still ONE lazy plan.
    "q108b_logreg_auc" -> QueryDef(
      (s, dir) => {
        import graft.operators.{LogReg, MlMetrics}
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val w = LogReg.train(feats, xs, "y", lr = 0.5, iters = 3)
        val scored = LogReg.score(feats, w, xs)
          .select(col("y"), floor(col("z") * lit(1e9)).as("z9"))
        MlMetrics.rocAuc9(scored, "z9", "y")
      },
      Some(logRegAucOracleSql)),

    // ---- Exact precision-recall curve of the trained classifier ---------
    // The companion grade to q108b for imbalanced filtering: one row per
    // distinct quantized score, grading "keep when score >= s9" with
    // integer-exact tp/fp/fn and floor-quantized precision/recall. The
    // threshold sweep rides ONE packed distributed prefix sum over the
    // distinct-score frame (MlMetrics.prCurve9) — never a data-sized
    // single-partition sort; the oracle replays it with a window cumsum.
    "q108d_logreg_pr_curve" -> QueryDef(
      (s, dir) => {
        import graft.operators.{LogReg, MlMetrics}
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val w = LogReg.train(feats, xs, "y", lr = 0.5, iters = 3)
        val scored = LogReg.score(feats, w, xs)
          .select(col("y"), floor(col("z") * lit(1e9)).as("z9"))
        MlMetrics.prCurve9(scored, "z9", "y")
      },
      Some(logRegPrCurveOracleSql)),

    // ---- Bounded operating points: the curve's 100 TB configuration ----
    // A corpus with millions of distinct quantized scores doesn't want a
    // million-row curve: prCurvePoints9 keeps the first threshold
    // entering each of 25 equal COVERAGE buckets (quantile-spaced
    // operating points, where the curve actually moves), selected AFTER
    // the prefix sum so every kept row carries exactly the full curve's
    // values — an exact subset, not an approximation. The oracle replays
    // the same integer coverage-bucket filter.
    "q108f_logreg_pr_points" -> QueryDef(
      (s, dir) => {
        import graft.operators.{LogReg, MlMetrics}
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val w = LogReg.train(feats, xs, "y", lr = 0.5, iters = 3)
        val scored = LogReg.score(feats, w, xs)
          .select(col("y"), floor(col("z") * lit(1e9)).as("z9"))
        MlMetrics.prCurvePoints9(scored, "z9", "y", maxPoints = 25)
      },
      Some(logRegPrCurveOracleSqlAt(Some(25)))),

    // ---- Calibration (reliability) table of the trained classifier ------
    // Equal-width probability bins decided by comparing the RAW score z
    // against precomputed logit boundaries — no exp() in either engine,
    // so the floor-quantized observed rates hash-match exactly. A
    // well-calibrated filter has obs_rate9 within [p_lo9, p_hi9); this is
    // what turns a score threshold into a defensible keep-probability at
    // corpus scale (one B-group map-side aggregation).
    "q108e_logreg_calibration" -> QueryDef(
      (s, dir) => {
        import graft.operators.{LogReg, MlMetrics}
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        // standardized + lr 4.0 x 6 iters: spreads the sigmoid across
        // the bins (see the oracle builder note) — 4 non-empty bins with
        // a monotone observed rate at sf0.01
        val std = LogReg.standardize(feats, (1 to 8).map(j => s"x$j"))
        val w = LogReg.train(std, xs, "y", lr = 4.0, iters = 6)
        MlMetrics.logitCalibration9(
          LogReg.score(std, w, xs), "z", "y", bins = 10)
      },
      Some(logRegCalibrationOracleSql)),

    // ---- Standardized-feature training (the production pipeline) -------
    // Same GD config over z-scored features: LogReg.standardize derives
    // per-feature mean/std from ONE decimal-sum aggregation in-plan (zero
    // jobs — standardize + fit + grade is still one action), constant
    // columns fall back to std = 1. The oracle replays the stats CTE, the
    // per-row standardization doubles, and the full quantized trajectory.
    // Standardization is what makes a fixed learning rate safe when raw
    // feature scales differ — the engine-side prerequisite for running
    // this classifier on arbitrary quality features at corpus scale.
    "q108c_logreg_standardized" -> QueryDef(
      (s, dir) => {
        import graft.operators.LogReg
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val std = LogReg.standardize(feats, (1 to 8).map(j => s"x$j"))
        LogReg.trainTrajectory(std, (0 to 8).map(j => s"x$j"), "y",
          lr = 0.5, iters = 3).orderBy("iter")
      },
      Some(logRegStdOracleSql)),

    // ---- CCNet-style n-gram LM perplexity filter ------------------------
    // Train an add-one bigram LM on the reference slice (doc_id % 3 != 0 —
    // a deterministic stand-in for "the curated corpus"), score EVERY doc
    // by mean negative log-likelihood, surface the worst 15 (the tail a
    // perplexity filter would cut). Training itself is part of the graded
    // surface: the oracle recomputes the count tables, the vocab size, and
    // every floor-scaled ln() contribution. See operators/NgramLm.scala
    // for the 100 TB plan shape (vocab-bounded shuffles, broadcast model).
    "q101_lm_perplexity" -> QueryDef(
      (s, dir) => {
        import graft.operators.NgramLm
        val docs = t(s, dir, "documents")
        val model = NgramLm.train(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text")
        NgramLm.crossEntropy(model, docs, "doc_id", "text")
          .orderBy(col("cross_entropy").desc, col("doc_id"))
          .limit(15)
      },
      Some("""WITH w AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> len(x) > 0) AS ws FROM documents),
        g AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
          FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w)),
        tr AS (SELECT * FROM g WHERE doc_id % 3 <> 0),
        c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM tr GROUP BY 1, 2),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM tr GROUP BY 1),
        vv AS (SELECT COUNT(DISTINCT x) AS v
          FROM (SELECT unnest(ws) AS x FROM w WHERE doc_id % 3 <> 0)),
        sc AS (SELECT g.doc_id,
            CAST(FLOOR(ln((COALESCE(c2.c12, 0) + 1.0)
              / (COALESCE(c1.c1, 0) + vv.v)) * 1e9) AS BIGINT) AS l9
          FROM g LEFT JOIN c2 ON g.w1 = c2.w1 AND g.w2 = c2.w2
          LEFT JOIN c1 ON g.w1 = c1.w1
          CROSS JOIN vv)
        SELECT doc_id, COUNT(*) AS n_bigrams,
          CAST(-SUM(l9) AS DOUBLE) / COUNT(*) / 1e9 AS cross_entropy
        FROM sc GROUP BY doc_id
        ORDER BY cross_entropy DESC, doc_id LIMIT 15"""))
  )
}
