package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.9): exact one-pass-collect aggregators
  * for the robust statistics the reference computes with numpy
  * (median/quantile/trimmed mean, dask_processing cell 3 and 3gpp cell 4).
  *
  * These buffer the group's values (like Spark's own exact `percentile`),
  * so they are for bounded groups — per-trace or per-capture cardinalities
  * (hundreds), not unbounded keys. The SQL-level alternative used by the
  * inventory queries is `percentile(...)`; these Aggregators exist for the
  * typed Dataset API surface and for fused quantile bundles (one sort, many
  * outputs).
  */
object Aggregators {

  /** Exact interpolated quantile of doubles (matches numpy/DuckDB
    * `quantile_cont` linear interpolation).
    */
  final case class QuantileAgg(p: Double)
      extends Aggregator[Double, List[Double], Double] {
    def zero: List[Double] = Nil
    def reduce(b: List[Double], a: Double): List[Double] = a :: b
    def merge(b1: List[Double], b2: List[Double]): List[Double] = b1 ::: b2
    def finish(b: List[Double]): Double = interpolate(b.toArray.sorted, p)
    def bufferEncoder: Encoder[List[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Exact inter-quantile trimmed mean ("midmean", reference 3gpp cell 4):
    * mean of values within the [pLow, pHigh] interpolated quantile band.
    */
  final case class TrimmedMeanAgg(pLow: Double = 0.25, pHigh: Double = 0.75)
      extends Aggregator[Double, List[Double], Double] {
    def zero: List[Double] = Nil
    def reduce(b: List[Double], a: Double): List[Double] = a :: b
    def merge(b1: List[Double], b2: List[Double]): List[Double] = b1 ::: b2
    def finish(b: List[Double]): Double = {
      val sorted = b.toArray.sorted
      val lo = interpolate(sorted, pLow)
      val hi = interpolate(sorted, pHigh)
      val kept = sorted.filter(v => v >= lo && v <= hi)
      if (kept.isEmpty) Double.NaN else kept.sum / kept.length
    }
    def bufferEncoder: Encoder[List[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Linear interpolation at quantile `p` over a sorted array. */
  def interpolate(sorted: Array[Double], p: Double): Double = {
    require(sorted.nonEmpty, "quantile of empty group")
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }
}
