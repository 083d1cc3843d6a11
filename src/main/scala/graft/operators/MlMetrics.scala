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
    val grouped = df.groupBy(col(score9Col).as("__s9"))
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
}
