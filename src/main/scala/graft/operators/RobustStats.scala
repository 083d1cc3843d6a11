package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact robust statistics: median / quantiles / trimmed mean ("midmean").
  *
  * The reference computes medians and an inter-quartile trimmed mean in
  * linear power space (`midmean`, `/root/reference/demos/
  * 3gpp_detect_and_sync.ipynb` cell 4; median aggregations in
  * `demos/dask_processing.ipynb` cell 3). The DuckDB oracle computes exact
  * quantiles, so we use Spark's exact sort-based `percentile` aggregate (NOT
  * `percentile_approx`) — interpolating, matching DuckDB's `quantile_cont`.
  *
  * Scale notes: exact percentile collects each group's values into a buffer —
  * fine when group cardinality is bounded (traces, per-flag stats). For
  * unbounded groups at 100 TB, switch call sites to `percentile_approx` and
  * drop oracle hash-matching, or pre-bucket values (the reference's data has
  * ~15-17 captures/sweep so groups stay small).
  */
object RobustStats {
  /** Exact interpolated percentile aggregate expression. */
  def exactPercentile(c: Column, p: Double): Column =
    percentile(c, lit(p))

  /** Several exact percentiles of ONE column from ONE buffered sort:
    * `percentile(c, array(...))` — N separate [[exactPercentile]] calls
    * over the same column would buffer (and sort) the group N times.
    * Returns an array aligned with `ps`.
    */
  def exactPercentiles(c: Column, ps: Seq[Double]): Column =
    percentile(c, array(ps.map(lit): _*))

  /** Robust outlier detection per group: a value is an outlier when its
    * absolute deviation from the group median exceeds `thresh` x MAD
    * (median absolute deviation) — the standard heavy-tail-safe anomaly
    * rule (3.5 is the conventional cut). Three passes, each one
    * aggregation plus a broadcast join of the group-level stats (group
    * cardinality bounded, same contract as [[trimmedMean]]). Returns
    * groupCols ++ (n, median, mad, n_outliers).
    */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      thresh: Double = 3.5): DataFrame = {
    val gc = groupCols.map(col)
    val med = df.groupBy(gc: _*)
      .agg(exactPercentile(col(valueCol), 0.5).as("med"))
    val wd = df.join(broadcast(med), groupCols)
      .withColumn("__ad", abs(col(valueCol) - col("med")))
    val mad = wd.groupBy(gc: _*)
      .agg(exactPercentile(col("__ad"), 0.5).as("mad"))
    wd.join(broadcast(mad), groupCols)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("median"),
        first(col("mad")).as("mad"),
        sum(when(col("__ad") > col("mad") * thresh, lit(1L))
          .otherwise(lit(0L))).as("n_outliers"))
  }

  /** Trimmed mean per group: mean of values within the group's exact
    * [pLow, pHigh] quantile band (inclusive). Two-pass: quantiles per group,
    * broadcast-joined back, conditional mean. Returns groupCols ++
    * (q_low, q_high, trimmed_mean).
    */
  def trimmedMean(df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLow: Double = 0.25, pHigh: Double = 0.75): DataFrame = {
    val q = df.groupBy(groupCols.map(col): _*)
      .agg(
        exactPercentile(col(valueCol), pLow).as("q_low"),
        exactPercentile(col(valueCol), pHigh).as("q_high"))
    df.join(broadcast(q), groupCols)
      .filter(col(valueCol) >= col("q_low") && col(valueCol) <= col("q_high"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        first(col("q_low")).as("q_low"),
        first(col("q_high")).as("q_high"),
        avg(col(valueCol)).as("trimmed_mean"))
  }
}
