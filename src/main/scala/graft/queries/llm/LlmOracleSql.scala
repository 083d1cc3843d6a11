package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.{TextOps, VectorOps}
import graft.operators.{Dedup, Similarity}

/** Shared fixtures of the LLM-query inventory: the `t` table loader and
  * every DuckDB oracle CTE builder (word arrays, Lloyd chains, logistic-
  * regression trajectories, DSIR tables, quality scores) that more than
  * one family file replays — split out of the monolithic LlmQueries
  * (r9 verdict #7) so the per-family query files stay readable while the
  * oracle definitions cannot diverge between them.
  */
object LlmOracleSql {
  // Shared DuckDB word-array CTE mirroring TextOps.words.
  private[queries] val WordsCte =
    """WITH w AS (SELECT doc_id, lang, source, text,
      list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS ws
      FROM documents)"""

  private[queries] def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- q108 family oracle builder ------------------------------------
  // The quantized-GD training loop as a DuckDB CTE chain, GENERATED from
  // the same (k, iters, lr, scale) parameters the Spark side uses so the
  // arithmetic text cannot drift from LogReg's column expressions (z is
  // the identical left-associated sum, gradients the identical
  // DECIMAL(38,18) casts, updates the identical floor(w * 1e6) grid).
  private[queries] val LrK = 9
  private[queries] val LrIters = 3
  private[queries] val LrScaleSql = "1000000.0"
  private[queries] val LrRateSql = "0.5"
  private[queries] def lrZ: String = lrZAt("")

  /** The linear score with the weight columns under a CTE-chain prefix
    * (two-model oracles — q116 — run two training chains in one query).
    */
  private[queries] def lrZAt(p: String): String =
    (0 until LrK).map(j => s"${p}wq_$j/$LrScaleSql*x$j").mkString(" + ")

  /** Training CTEs: feature CTE (optionally z-scored the way
    * `LogReg.standardize` does it — decimal sums/sum-of-squares, double
    * mean/variance in the same operation order, unit fallback below eps;
    * bias x0 untouched), zero weights, and per-iteration gradient/update
    * (+ accuracy when `withAccuracy`). The feature CTE in scope of g/a is
    * always named `f`.
    */
  private[queries] def logRegCtes(standardize: Boolean, withAccuracy: Boolean,
      trainWhere: String = "", idCol: Boolean = false,
      iters: Int = LrIters, rateSql: String = LrRateSql,
      prefix: String = ""): Seq[String] = {
    val p = prefix // prefixes every CTE name AND the wq_j/g_j columns, so
    // two chains (q116's pool + holdout models) compose in one query
    val raw = s"${p}f0 AS (SELECT ${if (idCol) "vec_id, " else ""}" +
      "CAST(label < 5 AS INT) AS y, 1.0 AS x0, " +
      (1 to 8).map(j => s"CAST(embedding[$j] AS DOUBLE) AS x$j")
        .mkString(", ") + " FROM embeddings)"
    val filt = if (trainWhere.isEmpty) "" else s" $trainWhere"
    val stdCtes = if (!standardize) Seq(s"${p}f AS (SELECT * FROM ${p}f0$filt)")
    else Seq(
      s"${p}st AS (SELECT COUNT(*) AS sn, " +
        (1 to 8).map(j =>
          s"SUM(CAST(x$j AS DECIMAL(38,18))) AS s_$j, " +
            s"SUM(CAST(x$j*x$j AS DECIMAL(38,18))) AS q_$j").mkString(", ") +
        s" FROM ${p}f0$filt)",
      s"${p}f AS (SELECT ${if (idCol) "vec_id, " else ""}y, x0, " +
        (1 to 8).map { j =>
          val m = s"CAST(s_$j AS DOUBLE)/sn"
          val v = s"CAST(q_$j AS DOUBLE)/sn - ($m)*($m)"
          s"(x$j - $m) / (CASE WHEN ($v) <= 1e-12 THEN 1.0 " +
            s"ELSE SQRT($v) END) AS x$j"
        }.mkString(", ") + s" FROM ${p}f0 CROSS JOIN ${p}st$filt)")
    val w0 = s"${p}w0 AS (SELECT " +
      (0 until LrK).map(j => s"CAST(0 AS BIGINT) AS ${p}wq_$j")
        .mkString(", ") + ")"
    val iterCtes = (1 to iters).flatMap { t =>
      Seq(
        s"${p}g$t AS (SELECT COUNT(*) AS n, " +
          (0 until LrK).map(j =>
            s"SUM(CAST((1.0/(1.0+EXP(-(${lrZAt(p)}))) - y)*x$j " +
              s"AS DECIMAL(38,18))) " +
              s"AS ${p}g_$j").mkString(", ") +
          s" FROM ${p}f CROSS JOIN ${p}w${t - 1})",
        s"${p}w$t AS (SELECT " +
          (0 until LrK).map(j =>
            s"CAST(FLOOR((${p}wq_$j/$LrScaleSql - " +
              s"$rateSql*CAST(${p}g_$j AS DOUBLE)/n)*$LrScaleSql) " +
              s"AS BIGINT) AS ${p}wq_$j").mkString(", ") +
          s" FROM ${p}w${t - 1} CROSS JOIN ${p}g$t)") ++
        (if (withAccuracy) Seq(
          s"${p}a$t AS (SELECT COUNT(CASE WHEN ((${lrZAt(p)}) >= 0.0) " +
            s"= (y = 1) " +
            s"THEN 1 END) AS n_correct FROM ${p}f CROSS JOIN ${p}w$t)")
         else Seq.empty)
    }
    Seq(raw) ++ stdCtes ++ Seq(w0) ++ iterCtes
  }

  private[queries] def lrTrajectorySelects: String =
    (1 to LrIters).map { t =>
      s"SELECT CAST($t AS BIGINT) AS iter, " +
        (0 until LrK).map(j => s"wq_$j").mkString(", ") +
        s", n_correct FROM w$t CROSS JOIN a$t"
    }.mkString(" UNION ALL ")

  /** q108 oracle: the trajectory (per-iteration weights + accuracy). */
  private[queries] def logRegOracleSql: String =
    s"WITH ${logRegCtes(standardize = false, withAccuracy = true)
      .mkString(", ")} $lrTrajectorySelects ORDER BY iter"

  /** q108c oracle: the same trajectory over z-scored features. */
  private[queries] def logRegStdOracleSql: String =
    s"WITH ${logRegCtes(standardize = true, withAccuracy = true)
      .mkString(", ")} $lrTrajectorySelects ORDER BY iter"

  /** q108b oracle: replay the training chain (weights CTEs only), then
    * score every example with the final weights, quantize z to 1e-9, and
    * recompute the tie-corrected Mann-Whitney AUC exactly — DuckDB's
    * window cumsum stands in for the engine's two-phase distributed rank
    * (MlMetrics.rocAuc9). SUMs are cast back to BIGINT: DuckDB widens
    * integer SUM to HUGEINT, which the compare harness reads as float.
    */
  private[queries] def logRegAucOracleSql: String = {
    val score = Seq(
      s"sc AS (SELECT y, CAST(FLOOR(($lrZ)*1000000000.0) AS BIGINT) AS z9" +
        s" FROM f CROSS JOIN w$LrIters)",
      "gr AS (SELECT z9, COUNT(*) AS cnt," +
        " COUNT(CASE WHEN y = 1 THEN 1 END) AS npos FROM sc GROUP BY z9)",
      "rk AS (SELECT cnt, npos, CAST(SUM(cnt) OVER (ORDER BY z9) AS BIGINT)" +
        " AS cum_end FROM gr)",
      "ag AS (SELECT CAST(COALESCE(SUM(npos), 0) AS BIGINT) AS n_pos," +
        " CAST(COALESCE(SUM(cnt - npos), 0) AS BIGINT) AS n_neg," +
        " CAST(COALESCE(SUM(npos * (2*(cum_end - cnt) + cnt + 1)), 0)" +
        " AS BIGINT) AS rank2_pos_sum FROM rk)")
    s"WITH ${(logRegCtes(standardize = false, withAccuracy = false) ++ score)
      .mkString(", ")} " +
      // HUGEINT mirrors the engine's DECIMAL(38,0) widening: 2R*1e9 is
      // exact wide-integer math in both engines, floored by // / DIV
      "SELECT n_pos, n_neg, rank2_pos_sum, " +
      "CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(-1 AS BIGINT) " +
      "ELSE CAST((CAST(rank2_pos_sum AS HUGEINT) - " +
      "CAST(n_pos AS HUGEINT)*(n_pos+1)) * 1000000000 " +
      "// (2*CAST(n_pos AS HUGEINT)*n_neg) AS BIGINT) END AS auc9 FROM ag"
  }

  /** q108g oracle: replay the training chain, then score every example
    * and rank by the floor-quantized EL2N error norm |sigmoid(z) - y| —
    * the identical double op sequence the Spark column computes.
    */
  private[queries] def logRegEl2nOracleSql: String = {
    val score = Seq(
      s"sc AS (SELECT vec_id, y, " +
        s"ABS(1.0/(1.0+EXP(-($lrZ))) - y) AS e" +
        s" FROM f CROSS JOIN w$LrIters)")
    s"WITH ${(logRegCtes(standardize = false, withAccuracy = false,
        idCol = true) ++ score).mkString(", ")} " +
      "SELECT vec_id, y, CAST(FLOOR(e*1000000000.0) AS BIGINT) AS el2n9 " +
      "FROM sc ORDER BY el2n9 DESC, vec_id LIMIT 20"
  }

  /** q116 oracle: TWO training chains in one query — the pool model
    * (vec_id % 4 <> 0, unprefixed CTEs) and the held-out irreducible-loss
    * model (vec_id % 4 = 0, `h_`-prefixed CTEs) — then every pool example
    * scored by both and ranked on the floor-quantized excess error.
    */
  private[queries] def logRegRhoOracleSql: String = {
    val pool = logRegCtes(standardize = false, withAccuracy = false,
      trainWhere = "WHERE vec_id % 4 <> 0", idCol = true)
    val hold = logRegCtes(standardize = false, withAccuracy = false,
      trainWhere = "WHERE vec_id % 4 = 0", idCol = true, prefix = "h_")
    val score = Seq(
      s"sc AS (SELECT vec_id, y, " +
        s"ABS(1.0/(1.0+EXP(-(${lrZAt("")}))) - y) - " +
        s"ABS(1.0/(1.0+EXP(-(${lrZAt("h_")}))) - y) AS e " +
        s"FROM f CROSS JOIN w$LrIters CROSS JOIN h_w$LrIters)")
    s"WITH ${(pool ++ hold ++ score).mkString(", ")} " +
      "SELECT vec_id, y, CAST(FLOOR(e*1000000000.0) AS BIGINT) AS rho9 " +
      "FROM sc ORDER BY rho9 DESC, vec_id LIMIT 20"
  }

  /** q117 oracle: replay the pool-model chain, derive the validation-mean
    * gradient over the held-out slice (decimal sums, final weights), and
    * score every pool example by the gradient dot product — the identical
    * left-associated double arithmetic the Spark columns compute.
    */
  private[queries] def logRegTracinOracleSql: String = {
    val ctes = logRegCtes(standardize = false, withAccuracy = false,
      trainWhere = "WHERE vec_id % 4 <> 0", idCol = true)
    val gval = s"gv AS (SELECT COUNT(*) AS nv, " +
      (0 until LrK).map(j =>
        s"SUM(CAST((1.0/(1.0+EXP(-($lrZ))) - y)*x$j AS DECIMAL(38,18))) " +
          s"AS v_$j").mkString(", ") +
      s" FROM f0 CROSS JOIN w$LrIters WHERE vec_id % 4 = 0)"
    val dot = (0 until LrK)
      .map(j => s"x$j*(CAST(v_$j AS DOUBLE)/nv)").mkString(" + ")
    val infl = s"sc AS (SELECT vec_id, y, " +
      s"(1.0/(1.0+EXP(-($lrZ))) - y) * ($dot) AS infl " +
      s"FROM f CROSS JOIN w$LrIters CROSS JOIN gv)"
    s"WITH ${(ctes ++ Seq(gval, infl)).mkString(", ")} " +
      "SELECT vec_id, y, CAST(FLOOR(infl*1000000000.0) AS BIGINT) AS infl9 " +
      "FROM sc ORDER BY infl9 DESC, vec_id LIMIT 20"
  }

  /** q118 oracle: replay the full-corpus chain, score every example with
    * EACH iteration's weights (w1..w3 aliased per-iteration so the three
    * one-row frames compose in one FROM), and fold the per-iteration
    * correctness flags into the forgetting-event histogram.
    */
  private[queries] def logRegForgetOracleSql: String = {
    // the q108e training config (standardized, lr 4.0, 6 iters): the hot
    // learning rate makes the decision boundary actually OSCILLATE, so
    // forgetting events exist to histogram — the cool q108 fit learns
    // monotonically and grades a degenerate two-row table
    val iters = 6
    val ctes = logRegCtes(standardize = true, withAccuracy = false,
      iters = iters, rateSql = "4.0")
    val aliased = (1 to iters).map { t =>
      s"(SELECT " + (0 until LrK)
        .map(j => s"wq_$j AS w${t}q_$j").mkString(", ") + s" FROM w$t) t$t"
    }.mkString(" CROSS JOIN ")
    def z(t: Int): String =
      (0 until LrK).map(j => s"w${t}q_$j/$LrScaleSql*x$j").mkString(" + ")
    def c(t: Int): String = s"((${z(t)}) >= 0.0) = (y = 1)"
    def ci(t: Int): String = s"CASE WHEN ${c(t)} THEN 1 ELSE 0 END"
    val forgets = (1 until iters)
      .map(t => s"CASE WHEN ${c(t)} AND NOT (${c(t + 1)}) THEN 1 ELSE 0 END")
      .mkString(" + ")
    val flags = s"fl AS (SELECT CAST(${(1 to iters).map(ci).mkString(" + ")}" +
      s" AS BIGINT) AS n_correct_iters, CAST($forgets AS BIGINT) AS n_forget," +
      s" CAST(${ci(iters)} AS BIGINT) AS final_correct" +
      s" FROM f CROSS JOIN $aliased)"
    s"WITH ${(ctes :+ flags).mkString(", ")} " +
      "SELECT n_correct_iters, n_forget, final_correct, " +
      "COUNT(*) AS n_examples FROM fl GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
  }

  /** q119 oracle: replay the q118 chain (standardized, hot rate), score
    * every example's TRUE-class probability with each iteration's weights,
    * and derive cartography confidence (mean) and variability (population
    * std, `E[p^2] - E[p]^2` in the fixed order the engine computes).
    */
  private[queries] def logRegCartographyOracleSql: String = {
    val iters = 6
    val ctes = logRegCtes(standardize = true, withAccuracy = false,
      iters = iters, rateSql = "4.0", idCol = true)
    val aliased = (1 to iters).map { t =>
      s"(SELECT " + (0 until LrK)
        .map(j => s"wq_$j AS w${t}q_$j").mkString(", ") + s" FROM w$t) t$t"
    }.mkString(" CROSS JOIN ")
    def z(t: Int): String =
      (0 until LrK).map(j => s"w${t}q_$j/$LrScaleSql*x$j").mkString(" + ")
    def pt(t: Int): String =
      s"(CASE WHEN y = 1 THEN 1.0/(1.0+EXP(-(${z(t)}))) " +
        s"ELSE 1.0 - 1.0/(1.0+EXP(-(${z(t)}))) END)"
    val s1 = (1 to iters).map(pt).mkString(" + ")
    val s2 = (1 to iters).map(t => s"${pt(t)} * ${pt(t)}").mkString(" + ")
    val sc = s"sc AS (SELECT vec_id, y, ($s1) AS s1, ($s2) AS s2 " +
      s"FROM f CROSS JOIN $aliased)"
    val vExpr = s"(s2/$iters.0 - (s1/$iters.0)*(s1/$iters.0))"
    s"WITH ${(ctes :+ sc).mkString(", ")} " +
      "SELECT vec_id, y, " +
      s"CAST(FLOOR((s1/$iters.0)*1000000000.0) AS BIGINT) AS conf9, " +
      s"CAST(FLOOR(SQRT(CASE WHEN $vExpr < 0.0 THEN 0.0 ELSE $vExpr END)" +
      "*1000000000.0) AS BIGINT) AS var9 " +
      "FROM sc ORDER BY var9 DESC, vec_id LIMIT 20"
  }

  /** q120 oracle: replay BOTH q116 chains (pool + held-out reference),
    * then per-domain mean losses as decimal sums (partitioning-invariant),
    * the excess-loss softmax with its denominator ALSO a decimal sum (the
    * 10-row total must not depend on reduction order), and floor-quantized
    * weights. Domains come from re-joining embeddings on vec_id.
    */
  private[queries] def logRegDoremiOracleSql: String = {
    val pool = logRegCtes(standardize = false, withAccuracy = false,
      trainWhere = "WHERE vec_id % 4 <> 0", idCol = true)
    val hold = logRegCtes(standardize = false, withAccuracy = false,
      trainWhere = "WHERE vec_id % 4 = 0", idCol = true, prefix = "h_")
    val body = Seq(
      s"sc AS (SELECT e.label AS domain, " +
        s"ABS(1.0/(1.0+EXP(-(${lrZAt("")}))) - y) AS lp, " +
        s"ABS(1.0/(1.0+EXP(-(${lrZAt("h_")}))) - y) AS lh " +
        s"FROM f JOIN embeddings e ON f.vec_id = e.vec_id " +
        s"CROSS JOIN w$LrIters CROSS JOIN h_w$LrIters)",
      "d AS (SELECT domain, COUNT(*) AS n, " +
        "SUM(CAST(lp AS DECIMAL(38,18))) AS sp, " +
        "SUM(CAST(lh AS DECIMAL(38,18))) AS sh FROM sc GROUP BY domain)",
      "e2 AS (SELECT domain, CAST(sp AS DOUBLE)/n - CAST(sh AS DOUBLE)/n " +
        "AS excess FROM d)",
      "ew AS (SELECT domain, excess, EXP(10.0*excess) AS expw FROM e2)",
      // the softmax total as an UNPARTITIONED window over the bounded
      // per-domain frame (<= |domains| rows) — one pass over the lineage;
      // an agg + re-join would evaluate the whole two-fit chain twice
      "wt AS (SELECT domain, excess, expw, " +
        "SUM(CAST(expw AS DECIMAL(38,18))) OVER () AS tot FROM ew)")
    s"WITH ${(pool ++ hold ++ body).mkString(", ")} " +
      "SELECT domain, " +
      "CAST(FLOOR(excess*1000000000.0) AS BIGINT) AS excess9, " +
      "CAST(FLOOR(expw/CAST(tot AS DOUBLE)*1000000000.0) AS BIGINT) " +
      "AS weight9 FROM wt ORDER BY domain"
  }

  /** q108d oracle: replay training + scoring (the q108b chain), then the
    * threshold sweep as a DESC-ordered window cumsum — DuckDB's window
    * stands in for the engine's packed two-phase prefix sum
    * (MlMetrics.prCurve9). All ratios are integer floor-divisions.
    */
  private[queries] def logRegPrCurveOracleSql: String =
    logRegPrCurveOracleSqlAt(None)

  /** With maxPoints set, replays prCurvePoints9's coverage-bucket filter
    * (step = ceil(n/points), keep the first threshold entering each
    * bucket) — integer arithmetic, so the kept set matches exactly.
    */
  private[queries] def logRegPrCurveOracleSqlAt(
      maxPoints: Option[Int]): String = {
    val score = Seq(
      s"sc AS (SELECT y, CAST(FLOOR(($lrZ)*1000000000.0) AS BIGINT) AS z9" +
        s" FROM f CROSS JOIN w$LrIters)",
      "gr AS (SELECT z9, COUNT(*) AS cnt," +
        " COUNT(CASE WHEN y = 1 THEN 1 END) AS npos FROM sc GROUP BY z9)",
      "rk AS (SELECT z9, cnt," +
        " CAST(SUM(npos) OVER (ORDER BY z9 DESC) AS BIGINT) AS tp," +
        " CAST(SUM(cnt) OVER (ORDER BY z9 DESC) AS BIGINT) AS pp FROM gr)",
      "tot AS (SELECT CAST(COALESCE(SUM(npos), 0) AS BIGINT) AS tpos," +
        " CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS tn FROM gr)")
    // CTE chain gains stp/kept when downsampling; the final select then
    // reads `kept` instead of `rk` (prCurvePoints9's exact filter)
    val stpCte = maxPoints.fold(Seq.empty[String]) { p =>
      Seq(s"stp AS (SELECT GREATEST((tn + ${p - 1}) // $p, 1) AS step" +
        " FROM tot)",
        "kept AS (SELECT rk.* FROM rk CROSS JOIN stp" +
          " WHERE pp = cnt OR (pp - 1) // step <> (pp - cnt - 1) // step)")
    }
    val src = if (maxPoints.isEmpty) "rk" else "kept"
    s"WITH ${(logRegCtes(standardize = false, withAccuracy = false) ++
        score ++ stpCte).mkString(", ")} " +
      s"SELECT z9 AS s9, tp, pp - tp AS fp, tpos - tp AS fn, " +
      "CAST(tp * 1000000000 // pp AS BIGINT) AS precision9, " +
      "CASE WHEN tpos = 0 THEN CAST(-1 AS BIGINT) " +
      "ELSE CAST(tp * 1000000000 // tpos AS BIGINT) END AS recall9 " +
      s"FROM $src CROSS JOIN tot ORDER BY s9"
  }

  /** q108e oracle: score with the final weights and bin by comparing the
    * RAW z against logit boundaries — literal doubles generated from the
    * same math.log the engine operator uses, so no exp() runs in either
    * engine and the bin decision is identical double arithmetic.
    */
  private[queries] def logRegCalibrationOracleSql: String = {
    val bins = 10
    val binExpr = (1 until bins)
      .map(i => s"(CASE WHEN z >= ${math.log(i.toDouble / (bins - i))} " +
        "THEN 1 ELSE 0 END)")
      .mkString(" + ")
    // standardized features + a longer/hotter fit (lr 4.0, 6 iters) so
    // the score distribution actually SPANS the probability bins — the
    // 3-iteration q108 config leaves every sigmoid within [0.49, 0.55]
    // and a one-row reliability table grades nothing
    s"WITH ${logRegCtes(standardize = true, withAccuracy = false,
        iters = 6, rateSql = "4.0").mkString(", ")}, " +
      s"scz AS (SELECT y, ($lrZ) AS z FROM f CROSS JOIN w6), " +
      s"b AS (SELECT y, CAST($binExpr AS BIGINT) AS bin FROM scz) " +
      s"SELECT bin, bin * ${1000000000L / bins} AS p_lo9, " +
      s"(bin + 1) * ${1000000000L / bins} AS p_hi9, COUNT(*) AS n, " +
      "COUNT(CASE WHEN y = 1 THEN 1 END) AS n_pos, " +
      "CAST(CAST(COUNT(CASE WHEN y = 1 THEN 1 END) AS HUGEINT) " +
      "* 1000000000 // COUNT(*) AS BIGINT) AS obs_rate9 " +
      "FROM b GROUP BY bin ORDER BY bin"
  }

  /** w15 oracle: train on the even slice, score BOTH slices with the final
    * weights, bin the scores on the even slice's [lo, hi] range, and emit
    * the q105-shaped per-bin PSI table — the batch replay of the streaming
    * model-score drift monitor (end-of-stream complete-mode counts equal
    * the batch counts, the w10/w11 argument).
    */
  private[queries] def logRegScoreDriftOracleSql: String = {
    val ctes = logRegCtes(standardize = false, withAccuracy = false,
      trainWhere = "WHERE vec_id % 2 = 0", idCol = true)
    val score = Seq(
      s"sall AS (SELECT vec_id % 2 AS par, ($lrZ) AS z" +
        s" FROM f0 CROSS JOIN w$LrIters)",
      "rng AS (SELECT MIN(z) AS lo, MAX(z) AS hi FROM sall WHERE par = 0)",
      "b AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin)",
      "rc AS (SELECT LEAST(GREATEST(CAST(FLOOR((z - lo)" +
        " / ((hi - lo) / 10)) AS INT), 0), 9) AS bin, COUNT(*) AS ref_n" +
        " FROM sall CROSS JOIN rng WHERE par = 0 GROUP BY 1)",
      "lc AS (SELECT LEAST(GREATEST(CAST(FLOOR((z - lo)" +
        " / ((hi - lo) / 10)) AS INT), 0), 9) AS bin, COUNT(*) AS live_n" +
        " FROM sall CROSS JOIN rng WHERE par = 1 GROUP BY 1)",
      "n AS (SELECT (SELECT COUNT(*) FROM sall WHERE par = 0) AS rn," +
        " (SELECT COUNT(*) FROM sall WHERE par = 1) AS lvn)",
      "j AS (SELECT b.bin, COALESCE(rc.ref_n, 0) AS ref_n," +
        " COALESCE(lc.live_n, 0) AS live_n" +
        " FROM b LEFT JOIN rc USING (bin) LEFT JOIN lc USING (bin))")
    s"WITH ${(ctes ++ score).mkString(", ")} " +
      """SELECT bin, CAST(ref_n AS BIGINT) AS ref_n,
          CAST(live_n AS BIGINT) AS live_n,
          CAST(FLOOR(((ref_n + 1.0) / (rn + 10)
              - (live_n + 1.0) / (lvn + 10))
            * LN(((ref_n + 1.0) / (rn + 10))
              / ((live_n + 1.0) / (lvn + 10))) * 1e9) AS BIGINT) AS psi9
        FROM j CROSS JOIN n ORDER BY bin"""
  }

  /** w16 oracle: train on the even slice, score the odd slice with the
    * final weights at the z >= 0 operating threshold (the q108 accuracy
    * rule), and emit the one-row confusion + floor-quantized precision/
    * recall — the batch replay of the streaming realized-quality monitor
    * (end-of-stream complete-mode counts equal the batch counts).
    */
  private[queries] def logRegStreamPrOracleSql: String = {
    val ctes = logRegCtes(standardize = false, withAccuracy = false,
      trainWhere = "WHERE vec_id % 2 = 0", idCol = true)
    val score = Seq(
      s"sc AS (SELECT y, CASE WHEN ($lrZ) >= 0.0 THEN 1 ELSE 0 END AS pred" +
        s" FROM f0 CROSS JOIN w$LrIters WHERE vec_id % 2 = 1)",
      "cm AS (SELECT " +
        "CAST(COUNT(CASE WHEN pred = 1 AND y = 1 THEN 1 END) AS BIGINT) AS tp, " +
        "CAST(COUNT(CASE WHEN pred = 1 AND y = 0 THEN 1 END) AS BIGINT) AS fp, " +
        "CAST(COUNT(CASE WHEN pred = 0 AND y = 1 THEN 1 END) AS BIGINT) AS fn, " +
        "CAST(COUNT(CASE WHEN pred = 0 AND y = 0 THEN 1 END) AS BIGINT) AS tn" +
        " FROM sc)")
    s"WITH ${(ctes ++ score).mkString(", ")} " +
      "SELECT tp, fp, fn, tn, " +
      "CASE WHEN tp + fp = 0 THEN CAST(-1 AS BIGINT) ELSE " +
      "CAST(CAST(tp AS HUGEINT) * 1000000000 // (tp + fp) AS BIGINT) END " +
      "AS precision9, " +
      "CASE WHEN tp + fn = 0 THEN CAST(-1 AS BIGINT) ELSE " +
      "CAST(CAST(tp AS HUGEINT) * 1000000000 // (tp + fn) AS BIGINT) END " +
      "AS recall9 FROM cm"
  }

  // The Carter–Wegman (a, b) coefficients behind minHashCandidates, inlined
  // into the q26 oracle as a VALUES list so DuckDB replays the exact family.
  private[queries] val MinHashCoeffSql: String = Dedup.minHashCoeffs(64).zipWithIndex
    .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  // Exact mean of a double metric: decimal-cast sum (order-independent)
  // divided by count, no rounding (see QueryDef.davg rationale).
  private[queries] def decAvg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(24, 15))).cast("double") / count(lit(1))

  /** Shared BM25 scoring (q54 + the q93 hybrid fusion): per-doc
    * (doc_id, n_terms, score9) over the query `terms`, floor-scaled per
    * term so the sum is order-independent. See q54's comment for the plan
    * and float-discipline rationale.
    */
  private[queries] def bm25Scored(s: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), TextOps.words(lower(col("text"))).as("lws"))
    val stats = d.agg(count(lit(1)), sum(size(col("lws")))).head
    val n = stats.getLong(0)
    // SUM over an empty corpus is NULL; avgdl is only a denominator
    // for rows that then don't exist, so any finite placeholder works
    val avgdl = if (n == 0) 1.0 else stats.getLong(1).toDouble / n
    val tf = d.select(col("doc_id"), size(col("lws")).as("dl"),
        explode(col("lws")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfT), "w")
      .withColumn("contrib9", floor(
        log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
          * 1e9).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib9")).as("score9"))
  }

  // CASE-guarded quality-score formula (TextOps.qualityScore replica,
  // null text -> NULL) — shared by the q72 and q79 oracles so the formula
  // cannot silently diverge between them. Expects `text` and the word
  // array `ws` in scope.
  private[queries] val QualityScoreSql: String =
    """CASE WHEN text IS NULL THEN NULL ELSE
            LEAST(CAST(len(text) AS DOUBLE) / 500.0, 1.0) * 0.4
              + (CASE WHEN CAST(len(text) - len(regexp_replace(text,
                    '[.,;:!?()''"-]', '', 'g')) AS DOUBLE)
                  / CAST(GREATEST(len(text), 1) AS DOUBLE) < 0.2
                THEN 1.0 ELSE 0.0 END) * 0.3
              + LEAST(CAST(len(list_filter(ws, x -> list_contains(
                    ['the', 'a', 'and', 'of', 'to', 'in', 'is', 'data'],
                    lower(x)))) AS DOUBLE)
                  / CAST(GREATEST(len(ws), 1) AS DOUBLE) * 5.0, 1.0) * 0.3
              END"""

  // Recursive connected-components CTE chain over exhaustive Jaccard pairs
  // (threshold 0.2, 3-shingles) — shared by the q52 and q79 oracles so the
  // clustering definition cannot silently diverge between them. Expects
  // the WordsCte `w` binding; yields comp(node, label).
  private[queries] val ComponentsCte: String =
    """g AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS i, ws FROM w),
      sh AS (SELECT DISTINCT doc_id,
        ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle FROM g),
      sz AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
      pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      p AS (SELECT id_a, id_b FROM pr
        JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        WHERE CAST(shared AS DOUBLE)/(sa.set_size + sb.set_size - shared)
          >= 0.2),
      e AS (SELECT id_a AS src, id_b AS dst FROM p
        UNION SELECT id_b, id_a FROM p),
      nd AS (SELECT DISTINCT src AS id FROM e),
      reach AS (SELECT id AS node, id AS root FROM nd
        UNION SELECT e.dst AS node, r.root FROM reach r
          JOIN e ON e.src = r.node),
      comp AS (SELECT node, MIN(root) AS label FROM reach GROUP BY node)"""

  // The full 2-iteration Lloyd fit as DuckDB CTEs ending at
  // a2(id, cid, dist9) — shared by the q57/q103/q103b oracles so the
  // clustering definition cannot silently diverge between them. Mirrors
  // KMeans.fit: md5-smallest-k seeds, per-term floor-scaled long
  // distances (floor((x-c)^2*1e9) — identical IEEE doubles in both
  // engines), per-term decimal sums for the centroid means, min-struct
  // assignment. Expects `embeddings` in scope; also binds e(id, v).
  // `kSql` is the centroid count as a SQL expression — a literal for the
  // fixed-k oracles, a scalar subquery replaying SemDedup.deriveK for the
  // derived-k one.
  private[queries] def kmeansA2Cte(kSql: String): String =
    s"""e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        idxs AS (SELECT CAST(unnest(range(1, len(embedding) + 1)) AS INT)
          AS dim FROM (SELECT embedding FROM embeddings LIMIT 1)),
        ${kmeansChainCte("", "e", kSql)}"""

  // The same Lloyd chain over an ARBITRARY source CTE `src`(id, v) with a
  // CTE-name prefix — the re-clustering building block the two-fit D4
  // oracles need (fit #2 runs over fit #1's survivors, so its seed
  // ranking and centroid sums must scan `surv`, not `e`). Expects the
  // global `idxs` CTE already bound; yields {p}a2(id, cid, dist9). With
  // an empty prefix over `e` this IS kmeansA2Cte's chain.
  private[queries] def kmeansChainCte(p: String, src: String, kSql: String): String =
    s"""${p}px AS (SELECT id, dim, v[dim] AS x FROM $src, idxs),
        ${p}sr AS (SELECT id, v, CAST(ROW_NUMBER() OVER
            (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS INT) AS cid
          FROM $src),
        ${p}c0 AS (SELECT cid, dim, v[dim] AS c FROM ${p}sr, idxs
          WHERE cid < ($kSql)),
        ${p}d1 AS (SELECT id, cid,
            CAST(SUM(CAST(FLOOR((x - c) * (x - c) * 1e9) AS BIGINT))
              AS BIGINT) AS dist9
          FROM ${p}px JOIN ${p}c0 USING (dim) GROUP BY id, cid),
        ${p}a1 AS (SELECT id, struct_extract(m, 'cid') AS cid
          FROM (SELECT id, MIN({'dist9': dist9, 'cid': cid}) AS m
            FROM ${p}d1 GROUP BY id)),
        ${p}c1 AS (SELECT cid, dim,
            CAST(SUM(CAST(x AS DECIMAL(24,15))) AS DOUBLE) / COUNT(*) AS c
          FROM ${p}px JOIN ${p}a1 USING (id) GROUP BY cid, dim),
        ${p}d2 AS (SELECT id, cid,
            CAST(SUM(CAST(FLOOR((x - c) * (x - c) * 1e9) AS BIGINT))
              AS BIGINT) AS dist9
          FROM ${p}px JOIN ${p}c1 USING (dim) GROUP BY id, cid),
        ${p}a2 AS (SELECT id, struct_extract(m, 'cid') AS cid,
            struct_extract(m, 'dist9') AS dist9
          FROM (SELECT id, MIN({'dist9': dist9, 'cid': cid}) AS m
            FROM ${p}d2 GROUP BY id))"""

  private[queries] val KMeansA2Cte: String = kmeansA2Cte("8")

  /** q121 oracle: the shared k-means replay, then within-cluster hardness
    * ranking (dist9 DESC, id tiebreak) and the integral 50%-keep cut —
    * COUNT/ROW_NUMBER windows and `//` mirror the engine's long
    * arithmetic exactly.
    */
  private[queries] def kmeansPrototypePruneOracleSql: String =
    s"""WITH $KMeansA2Cte,
      rk AS (SELECT cid, id, dist9,
          ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dist9 DESC, id)
            AS rk,
          COUNT(*) OVER (PARTITION BY cid) AS n
        FROM a2)
      SELECT cid AS cluster, MAX(n) AS n, COUNT(*) AS n_kept,
        MIN(dist9) AS cut_dist9
      FROM rk WHERE rk <= (n * 50) // 100
      GROUP BY cid ORDER BY cluster"""

  // One BPE round as DuckDB CTEs: from s{k-1}(word, cnt, seq) derive the
  // argmax pair best{k}, the leftmost-greedy merge application s{k}, and
  // the post-merge weighted symbol total tot{k}. Mirrors Bpe.applyMerge
  // step for step (match -> run id -> run-offset parity -> consume).
  private[queries] def bpeRoundSql(k: Int): String = {
    val p = k - 1
    s"""pc$k AS (SELECT ts[i] || ' ' || ts[i+1] AS pair, SUM(cnt) AS pc
        FROM (SELECT cnt, string_split(seq, ' ') AS ts,
            CAST(unnest(range(1, len(string_split(seq, ' ')))) AS INT) AS i
          FROM s$p)
        GROUP BY 1),
      best$k AS (SELECT pair, pc, string_split(pair, ' ')[1] AS p1,
          string_split(pair, ' ')[2] AS p2
        FROM pc$k ORDER BY pc DESC, pair LIMIT 1),
      tk$k AS (SELECT word, cnt, i, ts[i] AS tok
        FROM (SELECT word, cnt, string_split(seq, ' ') AS ts,
            CAST(unnest(range(1, len(string_split(seq, ' ')) + 1)) AS INT)
              AS i
          FROM s$p)),
      m$k AS (SELECT word, cnt, i, tok, lead(tok) OVER w AS nxt,
          (lead(tok) OVER w IS NOT NULL
            AND tok = (SELECT p1 FROM best$k)
            AND lead(tok) OVER w = (SELECT p2 FROM best$k)) AS mtch
        FROM tk$k WINDOW w AS (PARTITION BY word ORDER BY i)),
      r$k AS (SELECT *, CASE WHEN mtch
            AND NOT COALESCE(lag(mtch) OVER w, false)
          THEN 1 ELSE 0 END AS rs
        FROM m$k WINDOW w AS (PARTITION BY word ORDER BY i)),
      rr$k AS (SELECT *, SUM(rs) OVER (PARTITION BY word ORDER BY i
          ROWS UNBOUNDED PRECEDING) AS rid FROM r$k),
      mg$k AS (SELECT *, (mtch AND (i - MIN(CASE WHEN mtch THEN i END)
            OVER (PARTITION BY word, rid)) % 2 = 0) AS merged
        FROM rr$k),
      em$k AS (SELECT word, cnt, i,
          CASE WHEN merged THEN tok || nxt ELSE tok END AS emit
        FROM (SELECT *, COALESCE(lag(merged)
              OVER (PARTITION BY word ORDER BY i), false) AS consumed
          FROM mg$k)
        WHERE NOT consumed),
      s$k AS (SELECT word, cnt, string_agg(emit, ' ' ORDER BY i) AS seq
        FROM em$k GROUP BY word, cnt),
      tot$k AS (SELECT SUM(len(string_split(seq, ' ')) * cnt) AS tot
        FROM s$k)"""
  }

  private[queries] val BpeOracleSql: String = {
    val rounds = (1 to 3).map(bpeRoundSql).mkString(",\n      ")
    val rows = (1 to 3).map { k =>
      s"""UNION ALL SELECT $k, (SELECT pair FROM best$k),
          CAST((SELECT pc FROM best$k) AS BIGINT),
          CAST((SELECT tot FROM tot$k) AS BIGINT)"""
    }.mkString("\n        ")
    s"""$WordsCte,
      tok AS (SELECT unnest(list_transform(ws, x -> lower(x))) AS word
        FROM w),
      s0 AS (SELECT word, COUNT(*) AS cnt,
          trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
        FROM tok GROUP BY word),
      tot0 AS (SELECT SUM(len(string_split(seq, ' ')) * cnt) AS tot FROM s0),
      $rounds
      SELECT 0 AS round, '<base>' AS pair, CAST(0 AS BIGINT) AS pair_count,
        CAST((SELECT tot FROM tot0) AS BIGINT) AS total_symbols
        $rows
      ORDER BY round"""
  }



  /** DSIR target corpus: the trusted slice the raw pool is scored against
    * (Spark predicate + its verbatim SQL for the oracle CTEs). `def`s, not
    * `val`s: `defs` above initializes eagerly and interpolates [[DsirCtes]]
    * — a later-declared val would still be null at that point.
    */
  /** q123/w19 shared messy-URL fixture: one deterministic crawl URL per
    * document, deliberately exercising every canonicalization rule
    * (mixed-case scheme/host, userinfo credentials, www., default and
    * non-default ports, shuffled and VALUE-LESS tracking params,
    * fragments — including fragments containing '?', the SPA hash-route
    * shape — empty paths, and multi-label public-suffix TLDs:
    * `.co.uk` / `.github.io` hosts must register as distinct publishers,
    * not collapse into one `co.uk` domain) over a SKEWED host-size
    * distribution (one bighost with half the corpus, three mid hosts, a
    * small-host tail) — skew is what domain caps exist for. The Spark
    * expression and the SQL CTE are kept adjacent so they cannot drift;
    * [[UrlDomainCte]] is the registered-domain replay (generated from
    * UrlOps' own suffix table via registeredDomainSql).
    */
  private[queries] def messyUrlCol: Column = {
    val d = col("doc_id")
    val site = when(d % 4 < 2, lit("bighost"))
      .when(d % 4 === 2, concat(lit("mid"), (d % 3).cast("string")))
      .otherwise(concat(lit("tail"), (d % 25).cast("string")))
    // .foo.ck exercises the PSL WILDCARD rule (*.ck: foo.ck is a public
    // suffix, so each site registers as <site>.foo.ck — distinct
    // publishers, not one ck bucket); .www.ck exercises the EXCEPTION
    // rule (!www.ck beats the wildcard: every such host collapses onto
    // the single registrable domain www.ck — cap pressure by design)
    val tld = when(d % 7 === 3, lit(".co.uk"))
      .when(d % 7 === 5, lit(".github.io"))
      .when(d % 7 === 1, lit(".foo.ck"))
      .when(d % 7 === 6, lit(".www.ck"))
      .otherwise(lit(".COM"))
    concat(
      when(d % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
      lit("://"),
      when(d % 11 === 7, lit("u:pw@")).otherwise(lit("")),
      when(d % 3 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit("."),
      when(d % 2 === 0, upper(site)).otherwise(site), tld,
      when(d % 4 === 0, lit(":443"))
        .when(d % 8 === 1, lit(":8080")).otherwise(lit("")),
      when(d % 6 === 0, lit(""))
        .otherwise(concat(lit("/a/"), (d % 40).cast("string"))),
      when(d % 2 === 0, concat(lit("?utm_source=feed&page="),
          (d % 3).cast("string"), lit("&b=2")))
        .otherwise(concat(lit("?page="), (d % 3).cast("string"),
          lit("&utm_campaign=x&b=2"))),
      when(d % 9 === 2, lit("&fbclid")).otherwise(lit("")),
      when(d % 5 === 0, concat(lit("#Sec"), d.cast("string"),
          when(d % 10 === 0, lit("?x=1")).otherwise(lit(""))))
        .otherwise(lit("")))
  }

  /** SQL replay of [[messyUrlCol]]: binds u(doc_id, url) over documents. */
  private[queries] val MessyUrlCte: String =
    """u0 AS (SELECT doc_id, source,
          CASE WHEN doc_id % 4 < 2 THEN 'bighost'
               WHEN doc_id % 4 = 2 THEN 'mid' || CAST(doc_id % 3 AS VARCHAR)
               ELSE 'tail' || CAST(doc_id % 25 AS VARCHAR) END AS site,
          CASE WHEN doc_id % 7 = 3 THEN '.co.uk'
               WHEN doc_id % 7 = 5 THEN '.github.io'
               WHEN doc_id % 7 = 1 THEN '.foo.ck'
               WHEN doc_id % 7 = 6 THEN '.www.ck'
               ELSE '.COM' END AS tld
          FROM documents),
        u AS (SELECT doc_id,
            (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
            || '://'
            || (CASE WHEN doc_id % 11 = 7 THEN 'u:pw@' ELSE '' END)
            || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
            || source || '.'
            || (CASE WHEN doc_id % 2 = 0 THEN upper(site) ELSE site END)
            || tld
            || (CASE WHEN doc_id % 4 = 0 THEN ':443'
                     WHEN doc_id % 8 = 1 THEN ':8080' ELSE '' END)
            || (CASE WHEN doc_id % 6 = 0 THEN ''
                     ELSE '/a/' || CAST(doc_id % 40 AS VARCHAR) END)
            || (CASE WHEN doc_id % 2 = 0
                  THEN '?utm_source=feed&page=' || CAST(doc_id % 3 AS VARCHAR)
                    || '&b=2'
                  ELSE '?page=' || CAST(doc_id % 3 AS VARCHAR)
                    || '&utm_campaign=x&b=2' END)
            || (CASE WHEN doc_id % 9 = 2 THEN '&fbclid' ELSE '' END)
            || (CASE WHEN doc_id % 5 = 0
                  THEN '#Sec' || CAST(doc_id AS VARCHAR)
                    || (CASE WHEN doc_id % 10 = 0 THEN '?x=1' ELSE '' END)
                  ELSE '' END) AS url
          FROM u0)"""

  /** SQL replay of UrlOps.registeredDomain over `u`: binds
    * dom(doc_id, domain). The host normalization (userinfo strip, port
    * strip, case fold) is spelled here; the public-suffix CASE is
    * GENERATED from UrlOps' own suffix table.
    */
  private[queries] val UrlDomainCte: String =
    """dom AS (SELECT doc_id, """ +
      graft.operators.UrlOps.registeredDomainSql("host") +
      """ AS domain FROM
          (SELECT doc_id, regexp_replace(regexp_replace(lower(
              regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
              '^[^@]*@', ''), ':[0-9]+$', '') AS host FROM u))"""

  /** w14/q124 shared oracle: the winnow-sketch x Bloom intake replay
    * (corpus = doc_id % 3 == 0, stream = the rest, minHits = 5). q124
    * probes the RELOADED parquet index — the artifact round trip must be
    * invisible, so both queries replay the identical SQL.
    */
  private[queries] val winnowIntakeOracleSql: String =
    """WITH gc AS (SELECT doc_id, i, len(text) AS n,
          CAST(('0x' || substr(md5(substring(text, CAST(i AS INT), 20)),
            1, 10)) AS BIGINT) * 8388608 + (8388607 - i) AS comb
          FROM (SELECT doc_id, text, unnest(range(1, len(text) - 18)) AS i
            FROM documents WHERE len(text) >= 27 AND doc_id % 3 = 0)),
        sc AS (SELECT doc_id, i, n,
            MIN(comb) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS sel
          FROM gc),
        cfp AS (SELECT DISTINCT sel // 8388608 AS h
          FROM sc WHERE i <= n - 26),
        bpos AS (SELECT DISTINCT CAST(CAST(('0x'
              || substr(md5(CAST(h AS VARCHAR) || '#bloom'
                || CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 1048576 AS INT)
            AS p
          FROM cfp CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        gs AS (SELECT doc_id, i, len(text) AS n,
          CAST(('0x' || substr(md5(substring(text, CAST(i AS INT), 20)),
            1, 10)) AS BIGINT) * 8388608 + (8388607 - i) AS comb
          FROM (SELECT doc_id, text, unnest(range(1, len(text) - 18)) AS i
            FROM documents WHERE len(text) >= 27 AND doc_id % 3 <> 0)),
        ss AS (SELECT doc_id, i, n,
            MIN(comb) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS sel
          FROM gs),
        sfp AS (SELECT DISTINCT doc_id, 8388607 - (sel % 8388608) AS pos,
            sel // 8388608 AS h
          FROM ss WHERE i <= n - 26),
        sp AS (SELECT doc_id, pos, h,
            CAST(CAST(('0x' || substr(md5(CAST(h AS VARCHAR) || '#bloom'
              || CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 1048576 AS INT)
            AS bp
          FROM sfp CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        hit AS (SELECT doc_id, pos, h,
            MIN(CASE WHEN bp IN (SELECT p FROM bpos) THEN 1 ELSE 0 END)
              AS ok
          FROM sp GROUP BY 1, 2, 3),
        agg AS (SELECT doc_id, COUNT(*) AS n_fp, SUM(ok) AS n_hits
          FROM hit GROUP BY 1)
        SELECT d.doc_id, d.lang,
          CAST(COALESCE(a.n_fp, 0) AS INT) AS n_fp,
          CAST(COALESCE(a.n_hits, 0) AS INT) AS n_hits,
          COALESCE(a.n_hits, 0) >= 5 AS suspect
        FROM documents d LEFT JOIN agg a USING (doc_id)
        WHERE d.doc_id % 3 <> 0
        ORDER BY d.doc_id"""

  private[queries] def DsirTargetPred: Column =
    col("lang") === "en" && col("source").isin("src1", "src2", "src3")
  private[queries] def DsirTargetSql =
    "lang = 'en' AND source IN ('src1', 'src2', 'src3')"

  /** w17 oracle: the batch replay of the streaming DSIR intake — every
    * raw-pool doc with its importance weight and the selection flag (the
    * stream scores rows statelessly with the same fitted table, and long
    * sums are order-independent, so end-of-stream equals batch exactly).
    */
  private[queries] def dsirIntakeOracleSql: String =
    s"""$DsirCtes
      SELECT d.doc_id AS doc_id, d.lang AS lang,
        CAST(COALESCE(w.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(w.w9, 0) AS BIGINT) AS w9,
        COALESCE(w.w9, 0) >= 0 AS selected
      FROM documents d LEFT JOIN wts w ON d.doc_id = w.doc_id
      WHERE NOT ($DsirTargetSql)
      ORDER BY d.doc_id"""

  /** q114 oracle: the k-center greedy trajectory as a generated CTE chain
    * (the q108 logRegCtes discipline — built from the SAME k the Spark
    * side uses, so the arithmetic text cannot drift from
    * `Coreset.kCenterGreedy`'s column expressions). Step i computes every
    * unselected point's min squared distance to centers c1..c_{i-1} via
    * the identical three-dot formula and LEAST chain, takes the argmax
    * with the identical (dmin DESC, vec_id ASC) tie-break, and binds it
    * as center c_i carrying its selection radius.
    */
  private[queries] def kCenterSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings),
      c1 AS (SELECT vec_id, v FROM e
        WHERE vec_id = (SELECT MIN(vec_id) FROM e))"""
    for (i <- 2 to k) {
      val prior = (1 until i).map(j => s"c$j")
      val dexpr = prior.map(cj =>
        s"((list_dot_product(e.v, e.v) + list_dot_product($cj.v, $cj.v))" +
          s" - 2.0 * list_dot_product(e.v, $cj.v))")
      val least =
        if (dexpr.size == 1) dexpr.head
        else s"LEAST(${dexpr.mkString(", ")})"
      val crossJ = prior.map(cj => s"CROSS JOIN $cj").mkString(" ")
      val notIn = prior.map(cj => s"SELECT vec_id FROM $cj")
        .mkString(" UNION ALL ")
      sb ++= s""",
      d$i AS (SELECT e.vec_id, $least AS dmin FROM e $crossJ
        WHERE e.vec_id NOT IN ($notIn)),
      p$i AS (SELECT vec_id, dmin FROM d$i
        ORDER BY dmin DESC, vec_id LIMIT 1),
      c$i AS (SELECT e.vec_id, e.v, p$i.dmin FROM e
        JOIN p$i ON e.vec_id = p$i.vec_id)"""
    }
    val branches =
      "SELECT 1 AS step, vec_id, CAST(NULL AS DOUBLE) AS radius_sq FROM c1" +:
        (2 to k).map(i =>
          s"SELECT $i AS step, vec_id, dmin AS radius_sq FROM c$i")
    sb ++= "\n      " + branches.mkString("\n      UNION ALL ") +
      "\n      ORDER BY step"
    sb.toString
  }

  /** Shared CTE chain for the q111 family: bigram buckets, the smoothed
    * per-bucket log ratios over a generated 256-bucket spine, per-doc
    * weights, and the raw pool (zero-bigram docs included at w9 = 0).
    */
  private[queries] def DsirCtes: String =
    s"""$WordsCte,
      g AS (SELECT doc_id, lang, source,
          CAST(unnest(range(1, len(ws))) AS INT) AS i, ws FROM w),
      bg AS (SELECT doc_id, lang, source,
          CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 12))
            AS BIGINT) % 256 AS bucket FROM g),
      tb AS (SELECT bucket FROM bg WHERE $DsirTargetSql),
      rb AS (SELECT doc_id, bucket FROM bg WHERE NOT ($DsirTargetSql)),
      spine AS (SELECT CAST(unnest(range(0, 256)) AS BIGINT) AS bucket),
      tc AS (SELECT bucket, COUNT(*) AS c FROM tb GROUP BY 1),
      rc AS (SELECT bucket, COUNT(*) AS c FROM rb GROUP BY 1),
      tn AS (SELECT COUNT(*) AS n FROM tb),
      rn AS (SELECT COUNT(*) AS n FROM rb),
      lam AS (SELECT s.bucket,
          CAST(FLOOR(LN(((COALESCE(tc.c, 0) + 1.0) / (tn.n + 256.0)) /
            ((COALESCE(rc.c, 0) + 1.0) / (rn.n + 256.0))) * 1e9) AS BIGINT)
            AS lambda9
        FROM spine s LEFT JOIN tc ON s.bucket = tc.bucket
          LEFT JOIN rc ON s.bucket = rc.bucket CROSS JOIN tn CROSS JOIN rn),
      wts AS (SELECT rb.doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(lam.lambda9) AS BIGINT) AS w9
        FROM rb JOIN lam ON rb.bucket = lam.bucket GROUP BY 1),
      pool AS (SELECT doc_id FROM documents WHERE NOT ($DsirTargetSql))"""
}
