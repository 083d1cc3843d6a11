package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed model-evaluation metrics.
  *
  * ROC-AUC is the standard grade for the quality classifiers that gate a
  * training corpus (LogReg/NaiveBayes scores), and the textbook
  * computation — rank every example by score — is a global sort that
  * naive plans funnel through a single-partition window. Here the rank
  * statistic rides [[Windowed.distributedCumsum]]'s two-phase prefix-sum
  * discipline instead, and the tie correction (average ranks) falls out
  * of per-score-GROUP aggregation, so nothing data-sized ever sorts on
  * one task:
  *
  *   1. group by the quantized score: (score9, cnt, n_pos) — one row per
  *      DISTINCT score, the only frame the prefix sum touches;
  *   2. distributed cumsum of `cnt` in score order -> each group's rank
  *      span [cum_end - cnt + 1, cum_end];
  *   3. Mann-Whitney with tie correction, exactly and in integers:
  *      a tied group's average rank is (first + last)/2, so
  *      2 * sum(ranks of positives) =
  *        sum over groups of n_pos * (2*(cum_end - cnt) + cnt + 1),
  *      and AUC = (2R - n_pos*(n_pos+1)) / (2 * n_pos * n_neg).
  *
  * Scores must arrive PRE-QUANTIZED to longs (floor(z * 1e9) — the
  * engine's floor-scale discipline): cross-engine tie structure is then
  * exact, so the oracle replays rank spans bit-for-bit. The rank sums
  * are all-long (exact to n ~ 2e9, the count-accumulation bound); the
  * final `auc9` ratio is computed in DECIMAL(38,0) — `2R * 1e9` reaches
  * ~4e27 at that n, past a long but far inside decimal-38 — and floors
  * back to a long via integral division, so ONE code path serves the
  * bench grade and a 100 TB corpus (no silent overflow past 9.5e4 rows,
  * which the previous all-long form had).
  *
  * 100 TB: one hash aggregation (distinct scores), one prefix sum over
  * the DISTINCT-score frame (bounded by score-grid cardinality, not row
  * count), one final global aggregation. No explode, no cartesian, no
  * single-partition data window.
  */
object MlMetrics {

  /** One-row AUC grade: (n_pos, n_neg, rank2_pos_sum, auc9) where auc9 =
    * floor(AUC * 1e9) and rank2_pos_sum = 2 * sum of positives' average
    * ranks (always integral). Degenerate single-class inputs emit
    * auc9 = -1 (AUC undefined), matching the q45/q102c sentinel style.
    *
    * @param df       input frame
    * @param score9Col long column: the quantized classifier score
    * @param labelCol  0/1 int column (1 = positive)
    */
  def rocAuc9(df: DataFrame, score9Col: String, labelCol: String): DataFrame = {
    // NULL scores are unrankable, not "lowest" (the ks9 convention): an
    // unfiltered null group would sort first in the cumsum and corrupt
    // every rank
    val grouped = df.filter(col(score9Col).isNotNull)
      .groupBy(col(score9Col).as("__s9"))
      .agg(count(lit(1)).as("__cnt"),
        count(when(col(labelCol) === 1, 1)).as("__npos"))
    val ranked = Windowed.distributedCumsum(grouped, "__s9", "__cnt")
    ranked.agg(
        coalesce(sum("__npos"), lit(0L)).as("n_pos"),
        coalesce(sum(col("__cnt") - col("__npos")), lit(0L)).as("n_neg"),
        coalesce(sum(col("__npos") *
          (lit(2) * (col("cumsum") - col("__cnt")) + col("__cnt") + 1)),
          lit(0L)).as("rank2_pos_sum"))
      .select(col("n_pos"), col("n_neg"), col("rank2_pos_sum"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(-1L))
          // DECIMAL(38,0) keeps 2R*1e9 exact to n ~ 2e9; `div` (integral
          // divide) floors the exact quotient back to a long
          .otherwise(expr(
            "(CAST(rank2_pos_sum AS DECIMAL(38,0)) - " +
              "CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000000 " +
              "DIV (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)"))
          .as("auc9"))
  }

  /** Exact precision-recall curve — the standard companion grade to
    * ROC-AUC for IMBALANCED corpus filtering, where AUC alone hides a
    * collapsed positive class. One row per distinct quantized score
    * `s9`, grading the classifier "predict positive when score >= s9":
    * (s9, tp, fp, fn, precision9, recall9), all integer-exact
    * (floor(ratio * 1e9) via integral division).
    *
    * Plan shape — the same two-phase prefix-sum discipline as [[rocAuc9]]
    * / `Drift.ks9`: group by distinct score, pack each group's
    * (n_pos, n) pair into one long `npos * 2^31 + cnt`, ONE distributed
    * cumsum over the NEGATED score order (so the running sums accumulate
    * from the best score down — exactly the threshold sweep), unpack
    * with DIV / MOD. True totals ride un-packed alongside (plain long
    * sums), so when total rows reach the 2^31 pack bound the ratios emit
    * the loud -2 sentinel instead of unpacking garbage — the ks9
    * convention; recall9 is -1 when there are no positives at all.
    *
    * 100 TB: one partial-aggregable groupBy, one prefix sum over the
    * DISTINCT-score frame, no data-sized single-partition sort.
    */
  def prCurve9(df: DataFrame, score9Col: String, labelCol: String): DataFrame =
    prCurve9Impl(df, score9Col, labelCol, 1L << 31, None)

  /** [[prCurve9]] downsampled to ~`maxPoints` operating points — the
    * 100 TB configuration: a corpus whose quantized scores span millions
    * of distinct values does not need (or want) a million-row curve.
    * Selection is EXACT and deterministic, not sampled: coverage space
    * [0, n) is cut into `maxPoints` equal buckets and the FIRST
    * threshold whose cumulative row coverage enters each bucket is kept
    * — i.e. thresholds at the quantiles of the score distribution, where
    * the curve actually moves. Kept rows carry exactly the values the
    * full curve has at those thresholds (the filter runs AFTER the
    * prefix sum), so the downsampled curve is a subset, never an
    * approximation.
    */
  def prCurvePoints9(df: DataFrame, score9Col: String, labelCol: String,
      maxPoints: Int): DataFrame = {
    require(maxPoints >= 2, s"need >= 2 operating points, got $maxPoints")
    prCurve9Impl(df, score9Col, labelCol, 1L << 31, Some(maxPoints))
  }

  /** [[prCurve9]] with the pack base exposed (testable overflow guard). */
  private[graft] def prCurve9Impl(df: DataFrame, score9Col: String,
      labelCol: String, packK: Long,
      maxPoints: Option[Int] = None): DataFrame = {
    val K = packK
    // NULL scores drop (the ks9/rocAuc9 convention): a null group would
    // sort FIRST under __negs and its counts would pollute every
    // threshold's cumulative tp/pp
    val grouped = df.filter(col(score9Col).isNotNull)
      .groupBy(col(score9Col).as("s9"))
      .agg(count(lit(1)).as("__cnt"),
        count(when(col(labelCol) === 1, 1)).as("__npos"))
      // cumulate from the TOP score down: the threshold sweep order
      .withColumn("__negs", -col("s9"))
      .withColumn("__packed", col("__npos") * K + col("__cnt"))
    val cum = Windowed.distributedCumsum(grouped, "__negs", "__packed")
      .withColumn("__tp", expr(s"cumsum DIV $K"))   // positives at >= s9
      .withColumn("__pp", expr(s"cumsum % $K"))     // predicted positive
    val totals = cum.agg(
      coalesce(sum("__cnt"), lit(0L)).as("__tn"),       // true row total
      coalesce(sum("__npos"), lit(0L)).as("__tpos"))    // true positives
    val joined = cum.crossJoin(broadcast(totals))
    // operating-point downsampling: keep the first threshold entering
    // each of `maxPoints` equal coverage buckets (step = ceil(n/points));
    // a row covers rows (pp - cnt, pp], so it opens a bucket iff the
    // bucket index of pp-1 differs from that of pp-cnt-1 (pp = cnt marks
    // the first threshold, kept unconditionally — its predecessor index
    // would be negative). Pure integer arithmetic, oracle-replayable.
    val pointed = maxPoints match {
      case None => joined
      case Some(p) =>
        joined.withColumn("__step",
            greatest(expr(s"(__tn + ${p - 1}) DIV $p"), lit(1L)))
          .filter(col("__pp") === col("__cnt") ||
            expr("(__pp - 1) DIV __step") =!=
              expr("(__pp - __cnt - 1) DIV __step"))
    }
    pointed
      .select(col("s9"), col("__tp").as("tp"),
        (col("__pp") - col("__tp")).as("fp"),
        (col("__tpos") - col("__tp")).as("fn"),
        when(col("__tn") >= K, lit(-2L))
          .otherwise(expr("__tp * 1000000000 DIV __pp")).as("precision9"),
        when(col("__tn") >= K, lit(-2L))
          .when(col("__tpos") === 0, lit(-1L))
          .otherwise(expr("__tp * 1000000000 DIV __tpos")).as("recall9"))
      .orderBy("s9")
  }

  /** Calibration (reliability) table for a LOGISTIC score: does the
    * model's predicted probability match the observed positive rate?
    * Bins are equal-width in PROBABILITY space ([i/B, (i+1)/B)), but a
    * row's bin is decided by comparing its raw score `z` against the
    * LOGIT of each boundary — constants computed once and compared with
    * plain `>=`, so no exp() ever runs inside either engine (exp is the
    * one libm call whose last-ulp differences would break cross-engine
    * floor-quantized hashing; basic double arithmetic is IEEE-identical).
    *
    * Output per non-empty bin: (bin, p_lo9, p_hi9, n, n_pos, obs_rate9)
    * with obs_rate9 = floor(n_pos/n * 1e9) exact in integers. A
    * well-calibrated classifier has obs_rate9 inside [p_lo9, p_hi9].
    *
    * 100 TB: one map-side-partial groupBy over at most B groups.
    */
  def logitCalibration9(df: DataFrame, zCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 calibration bins, got $bins")
    require(1000000000L % bins == 0,
      s"bins must divide 1e9 for an exact probability grid, got $bins")
    // logit boundaries: z >= ln(i/(B-i)) <=> sigmoid(z) >= i/B
    val bounds = (1 until bins).map(i => math.log(i.toDouble / (bins - i)))
    val bin = bounds.map(b => when(col(zCol) >= lit(b), 1).otherwise(0))
      .reduce(_ + _)
    // NULL logits drop rather than silently landing in bin 0 (every
    // boundary comparison is null -> otherwise(0)) — the ks9 convention
    df.filter(col(zCol).isNotNull).groupBy(bin.cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        count(when(col(labelCol) === 1, 1)).as("n_pos"))
      .select(col("bin"),
        (col("bin") * (1000000000L / bins)).as("p_lo9"),
        ((col("bin") + 1) * (1000000000L / bins)).as("p_hi9"),
        col("n"), col("n_pos"),
        // decimal: a single bin can hold > 9.2e9 rows at corpus scale,
        // where n_pos * 1e9 would wrap a long (the auc9 discipline)
        expr("CAST(n_pos AS DECIMAL(38,0)) * 1000000000 DIV n")
          .as("obs_rate9"))
      .orderBy("bin")
  }
}
