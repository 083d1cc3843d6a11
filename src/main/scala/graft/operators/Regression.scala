package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form least-squares and correlation from sufficient statistics.
  *
  * OLS slope/intercept and Pearson r need only (n, Σx, Σy, Σxy, Σx², Σy²) —
  * one partial-aggregable pass, no iteration, no matrix library. Each
  * product is decimal-cast per row before summing, so the statistics are
  * order-independent (bit-identical under repartitioning). Spark's built-in
  * `regr_slope`/`corr` aggregate in floating point (partition-order-
  * dependent, not hash-matchable); at 100 TB either works, but the decimal
  * formulation costs one extra wide column and buys determinism.
  *
  * Cross-ENGINE caveat: the slope/corr numerators subtract nearly-equal
  * large terms, which amplifies the one-ulp decimal→double cast difference
  * between Spark (string-based) and DuckDB (binary) to ~1e-12 relative —
  * q63/q64 therefore round the derived estimates to 9 decimals on both
  * sides (the statistics themselves hash-match unrounded).
  *
  * Callers should pre-shift x to a small origin (slope/corr are invariant
  * under shifts) so x² stays inside the decimal precision.
  */
object Regression {
  private val Dec = DecimalType(28, 12)

  /** Sufficient statistics per group: n, sx, sy, sxy, sxx, syy (doubles
    * from exact decimal sums).
    */
  def sufficientStats(df: DataFrame, groupCols: Seq[String],
      x: Column, y: Column): DataFrame = {
    val xd = x.cast("double"); val yd = y.cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(xd.cast(Dec)).cast("double").as("sx"),
        sum(yd.cast(Dec)).cast("double").as("sy"),
        sum((xd * yd).cast(Dec)).cast("double").as("sxy"),
        sum((xd * xd).cast(Dec)).cast("double").as("sxx"),
        sum((yd * yd).cast(Dec)).cast("double").as("syy"))
  }

  /** OLS slope from the stats columns: (n·Σxy − Σx·Σy)/(n·Σx² − Σx²). */
  def slope: Column =
    (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))

  /** OLS intercept given `slopeCol`: (Σy − slope·Σx)/n. */
  def intercept(slopeCol: Column): Column =
    (col("sy") - slopeCol * col("sx")) / col("n")

  /** Pearson correlation from the stats columns. */
  def pearson: Column =
    (col("n") * col("sxy") - col("sx") * col("sy")) /
      sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
        (col("n") * col("syy") - col("sy") * col("sy")))

  /** The matching DuckDB aggregate SQL for [[sufficientStats]] over
    * pre-projected columns named `x`, `y` (oracle replay).
    */
  val StatsSql: String =
    """COUNT(*) AS n,
      CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
      CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
      CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
      CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
      CAST(SUM(CAST(y * y AS DECIMAL(28,12))) AS DOUBLE) AS syy"""
}
