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

  /** Fused exact quantile bundle: every requested quantile from ONE
    * buffered sort (the reference computes min/q1/median/q3/max in a
    * single numpy `quantile` call — this is that shape for the typed API;
    * N separate QuantileAggs would sort the group N times).
    */
  final case class QuantileBundleAgg(ps: Seq[Double])
      extends Aggregator[Double, List[Double], Seq[Double]] {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantiles must be in [0, 1]: $ps")
    def zero: List[Double] = Nil
    def reduce(b: List[Double], a: Double): List[Double] = a :: b
    def merge(b1: List[Double], b2: List[Double]): List[Double] = b1 ::: b2
    def finish(b: List[Double]): Seq[Double] = {
      val sorted = b.toArray.sorted
      ps.map(interpolate(sorted, _))
    }
    def bufferEncoder: Encoder[List[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
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

  /** Bounded k-smallest (rank, key) aggregator — the UNBOUNDED-stratum
    * scale path for deterministic sampling ([[graft.operators.Sampling
    * .stratifiedTakeHeap]]): unlike the window-rank form, the buffer never
    * exceeds k entries, so a billion-row stratum costs one pass + a
    * k-element merge per partition instead of a full per-stratum sort.
    * Partial-aggregable: each map task ships at most k pairs per group.
    * Output is the kept keys ordered by (rank, key) — identical selection
    * and order to `row_number().over(orderBy(rank, key)) <= k`.
    */
  final case class BoundedMinK(k: Int)
      extends Aggregator[(String, Long), List[(String, Long)], Seq[Long]] {
    require(k >= 1, s"k must be >= 1, got $k")
    def zero: List[(String, Long)] = Nil
    def reduce(b: List[(String, Long)], a: (String, Long)): List[(String, Long)] =
      insert(b, a)
    def merge(b1: List[(String, Long)], b2: List[(String, Long)])
        : List[(String, Long)] = b2.foldLeft(b1)(insert)
    def finish(b: List[(String, Long)]): Seq[Long] = b.map(_._2)
    // buffer kept sorted ascending; k is sampling-sized (tens), so the
    // insertion re-sort is effectively an insertion step
    private def insert(b: List[(String, Long)], a: (String, Long)) = {
      if (b.lengthCompare(k) >= 0 && implicitly[Ordering[(String, Long)]]
          .gteq(a, b.last)) b
      else ((a :: b).sorted).take(k)
    }
    def bufferEncoder: Encoder[List[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Long)]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** [[BoundedMinK]] over a NUMERIC sort value — the unbounded-group scale
    * path for top-k-per-group ([[graft.operators.Windowed
    * .topKPerGroupHeap]]): keeps the k smallest (sortValue, key) pairs with
    * a never-more-than-k buffer, so a billion-row group costs one pass +
    * a k-element merge per partition instead of the window form's full
    * per-group sort. Descending orderings negate the sort value; `key`
    * breaks ties exactly like the window's trailing order column.
    */
  final case class BoundedMinKByValue(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[Long]] {
    require(k >= 1, s"k must be >= 1, got $k")
    def zero: List[(Double, Long)] = Nil
    def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
      insert(b, a)
    def merge(b1: List[(Double, Long)], b2: List[(Double, Long)])
        : List[(Double, Long)] = b2.foldLeft(b1)(insert)
    def finish(b: List[(Double, Long)]): Seq[Long] = b.map(_._2)
    private def insert(b: List[(Double, Long)], a: (Double, Long)) = {
      if (b.lengthCompare(k) >= 0 && implicitly[Ordering[(Double, Long)]]
          .gteq(a, b.last)) b
      else ((a :: b).sorted).take(k)
    }
    def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** [[BoundedMinKByValue]] specialized to LONG ids ordered by their own
    * value — the exact smallest-k-ids-per-group rule
    * ([[graft.operators.UrlOps.domainCapKept]]) with no double-precision
    * round trip: ids above 2^53 would collide or reorder through a
    * Double key, diverging from the oracle's ROW_NUMBER-by-id rule
    * (ADVICE r10). Same never-more-than-k buffer and map-side combine.
    */
  /** Buffer for the bounded min-k long aggregators: the kept values
    * ascending, plus their COUNT and the current k-th minimum carried
    * alongside — so the saturated-reject test is genuinely two scalar
    * compares, never a list traversal (ADVICE r11: lengthCompare +
    * `.last` were O(k) pointer chases per arriving row on the hot
    * sketch path). `thr` is Long.MaxValue until the buffer saturates.
    */
  final case class MinKBuf(n: Int, thr: Long, asc: List[Long])

  final case class BoundedMinKLong(k: Int)
      extends Aggregator[Long, MinKBuf, Seq[Long]] {
    require(k >= 1, s"k must be >= 1, got $k")
    def zero: MinKBuf = MinKBuf(0, Long.MaxValue, Nil)
    def reduce(b: MinKBuf, a: Long): MinKBuf = insert(b, a)
    def merge(b1: MinKBuf, b2: MinKBuf): MinKBuf =
      b2.asc.foldLeft(b1)(insert)
    def finish(b: MinKBuf): Seq[Long] = b.asc
    private def insert(b: MinKBuf, a: Long): MinKBuf = {
      // O(1) saturated reject: once n == k, an arrival >= the k-th
      // minimum cannot enter (ties reject correctly — inserting an
      // equal value and dropping the last leaves the multiset unchanged)
      if (b.n >= k && a >= b.thr) b
      else {
        val asc = ((a :: b.asc).sorted).take(k)
        val n = math.min(b.n + 1, k)
        MinKBuf(n, if (n >= k) asc.last else Long.MaxValue, asc)
      }
    }
    def bufferEncoder: Encoder[MinKBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MinKBuf]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** [[BoundedMinKLong]] with SET semantics — the bottom-k (KMV) sketch
    * buffer ([[graft.operators.CorpusOverlap]]): keeps the k smallest
    * DISTINCT values seen, so the finished buffer is exactly the k
    * minimum values of the input's value SET (the K-Minimum-Values
    * sketch of Bar-Yossef et al. 2002 / Beyer et al. 2007's unbiased
    * distinct-and-Jaccard estimator family). Distinctness must live in
    * the aggregator — a KMV sketch over a multiset is a sketch of the
    * multiset's set, and pushing a `.distinct()` upstream would cost the
    * full-cardinality shuffle the sketch exists to avoid.
    *
    * Cost shape: once the buffer saturates at k values, an arriving
    * value >= the current k-th minimum rejects in O(1) — two scalar
    * compares against the [[MinKBuf]]-carried count and threshold
    * (ADVICE r11: the reject path never touches the list). By the KMV
    * growth bound only ~k·ln(n/k) of n arrivals ever pass that test, so
    * the per-partition cost is one comparison per row plus a vanishing
    * number of O(k) distinct-check-and-inserts. Map-side combinable:
    * each partition ships at most k longs per group, and `merge` is the
    * sketch union.
    */
  final case class BoundedMinKDistinctLong(k: Int)
      extends Aggregator[Long, MinKBuf, Seq[Long]] {
    require(k >= 1, s"k must be >= 1, got $k")
    def zero: MinKBuf = MinKBuf(0, Long.MaxValue, Nil)
    def reduce(b: MinKBuf, a: Long): MinKBuf = insert(b, a)
    def merge(b1: MinKBuf, b2: MinKBuf): MinKBuf =
      b2.asc.foldLeft(b1)(insert)
    def finish(b: MinKBuf): Seq[Long] = b.asc
    private def insert(b: MinKBuf, a: Long): MinKBuf = {
      if (b.n >= k && a >= b.thr) b
      else if (b.asc.contains(a)) b
      else {
        val asc = ((a :: b.asc).sorted).take(k)
        val n = math.min(b.n + 1, k)
        MinKBuf(n, if (n >= k) asc.last else Long.MaxValue, asc)
      }
    }
    def bufferEncoder: Encoder[MinKBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MinKBuf]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Dense-bitmap OR over bit positions — the [[graft.operators.Bloom
    * .buildPacked]] assembly. The relational assembly (per-word bit_or +
    * map_from_entries + a sequence/element_at expansion) pays an O(words)
    * MAP lookup per output word — O(words^2) per filter, measured seconds
    * at m = 2^20 — where this buffer sets each bit in O(1) and merges by
    * a straight word-wise OR. Fixed m/8-byte state per group; OR is
    * idempotent, so the upstream explode needs NO distinct, and the
    * aggregation is fully partial-aggregable (map-side combine ships one
    * bitmap per group per partition).
    */
  final case class BitmapOr(nWords: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(nWords >= 1, s"nWords must be >= 1, got $nWords")
    def zero: Array[Long] = new Array[Long](nWords)
    def reduce(b: Array[Long], pos: Long): Array[Long] = {
      b((pos >>> 6).toInt) |= 1L << (pos & 63); b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < nWords) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
