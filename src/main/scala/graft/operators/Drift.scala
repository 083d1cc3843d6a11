package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring: Population Stability Index (PSI) between
  * a REFERENCE table and a LIVE table over a numeric column — the standard
  * "has my corpus shifted since the model was trained / the last snapshot"
  * check a production data pipeline runs on every ingest batch (rule of
  * thumb: PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).
  *
  * Binning is B fixed-width bins over the REFERENCE min/max (live values
  * clamp into the edge bins, so out-of-range mass is visible as edge-bin
  * drift); both sides get add-one smoothing so empty bins contribute a
  * finite, portable value. Per-bin contributions (p-q)*ln(p/q) are
  * floor-scaled exact longs — the whole computation replays in SQL.
  *
  * Plan shape, reading 100 TB: one scalar aggregate for the reference
  * range (driver-bounded), then ONE partial-aggregable groupBy per side
  * whose key space is B bins — the shuffle is bin-count-bounded exactly
  * like Count-Min (shuffle bounded by sketch size, not corpus size). The
  * side totals refN/liveN are NOT separate count() actions: clamping puts
  * every row in some bin, so each total is the sum of its own B-row
  * bin-count frame, computed by an unbounded window over the joined spine
  * (B rows — driver-trivial). Each side is therefore scanned exactly once
  * inside the PSI plan (the reference pays one extra bounded scan for the
  * range scalars). The bin spine is a B-row literal frame, so zero-count
  * bins surface without any outer join against data. The same property
  * makes the LIVE side STREAMABLE: a watermark-free complete-mode groupBy
  * over the bin column holds at most B state rows for the life of the
  * stream (w11).
  */
object Drift {

  /** Reference range (min, max) as driver scalars; (0, 0) on empty. */
  def referenceRange(ref: DataFrame, valueCol: String): (Double, Double) = {
    val r = ref.agg(min(col(valueCol).cast("double")),
      max(col(valueCol).cast("double"))).head
    if (r.isNullAt(0)) (0.0, 0.0) else (r.getDouble(0), r.getDouble(1))
  }

  /** Clamped fixed-width bin index for a value column — usable in batch
    * AND streaming plans (pure expression). `width` 0 (degenerate
    * reference) maps everything to bin 0. NULL values clamp to bin 0
    * (Spark's greatest/least skip NULLs) — callers that want the
    * documented NULLs-excluded semantics must filter `isNotNull` BEFORE
    * binning, as [[psiBins]] does.
    */
  def binCol(c: Column, lo: Double, width: Double, bins: Int): Column =
    if (width == 0.0) lit(0)
    else least(greatest(floor((c.cast("double") - lit(lo)) / lit(width))
      .cast("int"), lit(0)), lit(bins - 1))

  /** Final PSI table from per-bin counts: (bin, ref_n, live_n, psi9)
    * ordered by bin. `refCounts`/`liveCounts` carry (bin, ref_n) /
    * (bin, live_n); missing bins fill as 0 against the literal spine.
    *
    * The side totals are derived IN-PLAN by summing the bin counts over
    * the joined spine (an unbounded window over B rows) — clamping
    * guarantees every source row landed in some bin, so the sums equal
    * the side cardinalities without any extra scan or driver action.
    */
  def psiFromBinned(spark: SparkSession, refCounts: DataFrame,
      liveCounts: DataFrame, bins: Int): DataFrame = {
    val spine = spark.range(bins).select(col("id").cast("int").as("bin"))
    val joined = spine
      .join(refCounts, Seq("bin"), "left")
      .join(liveCounts, Seq("bin"), "left")
      .na.fill(0L, Seq("ref_n", "live_n"))
    // B-row total window: the only unpartitioned window in the plan, and
    // it runs over exactly `bins` rows post-aggregation — driver-trivial.
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val withTotals = joined
      .withColumn("__ref_total", sum(col("ref_n")).over(all))
      .withColumn("__live_total", sum(col("live_n")).over(all))
    val p = (col("ref_n") + 1.0) /
      (col("__ref_total").cast("double") + lit(bins.toDouble))
    val q = (col("live_n") + 1.0) /
      (col("__live_total").cast("double") + lit(bins.toDouble))
    withTotals.select(col("bin"), col("ref_n"), col("live_n"),
        floor((p - q) * log(p / q) * 1e9).cast("long").as("psi9"))
      .orderBy("bin")
  }

  /** [[psiFromBinned]] with one INDEPENDENT monitor per key (w24: one
    * PSI per principal component): the spine is keys × bins, the totals
    * window partitions by the key, the formula is per-key otherwise
    * identical. Keys are driver literals (bounded model state — the
    * components of a reloaded axes artifact), so the spine needs no
    * scan.
    */
  def psiFromBinnedGrouped(spark: SparkSession, keys: Seq[Int],
      refCounts: DataFrame, liveCounts: DataFrame, bins: Int,
      keyCol: String): DataFrame = {
    import spark.implicits._
    val spine = keys.flatMap(kk => (0 until bins).map(b => (kk, b)))
      .toDF(keyCol, "bin")
    val joined = spine
      .join(refCounts, Seq(keyCol, "bin"), "left")
      .join(liveCounts, Seq(keyCol, "bin"), "left")
      .na.fill(0L, Seq("ref_n", "live_n"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).rowsBetween(Long.MinValue, Long.MaxValue)
    val withTotals = joined
      .withColumn("__ref_total", sum(col("ref_n")).over(all))
      .withColumn("__live_total", sum(col("live_n")).over(all))
    val p = (col("ref_n") + 1.0) /
      (col("__ref_total").cast("double") + lit(bins.toDouble))
    val q = (col("live_n") + 1.0) /
      (col("__live_total").cast("double") + lit(bins.toDouble))
    withTotals.select(col(keyCol), col("bin"), col("ref_n"), col("live_n"),
        floor((p - q) * log(p / q) * 1e9).cast("long").as("psi9"))
      .orderBy(keyCol, "bin")
  }

  /** Per-bin PSI table between two batch frames; sum(psi9)/1e9 is the
    * headline PSI. Rows whose value is NULL are filtered out BEFORE
    * binning and are therefore excluded from both the histogram and the
    * side totals (the totals are the binned mass, not the raw row count).
    * The explicit filter — rather than relying on how NULL flows through
    * the clamp — keeps the semantics portable: engines disagree on
    * whether GREATEST propagates or skips NULL.
    */
  def psiBins(ref: DataFrame, live: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val (lo, hi) = referenceRange(ref, valueCol)
    val width = (hi - lo) / bins
    def counts(df: DataFrame, out: String) =
      df.filter(col(valueCol).isNotNull)
        .groupBy(binCol(col(valueCol), lo, width, bins).as("bin"))
        .agg(count(lit(1)).as(out))
    psiFromBinned(ref.sparkSession, counts(ref, "ref_n"),
      counts(live, "live_n"), bins)
  }

  /** Categorical PSI between two batch frames over a (string-castable)
    * column — the domain-mix / language-mix drift check. The bin spine is
    * the top-`topB` REFERENCE categories by count (ties break
    * lexicographically — deterministic, oracle-replayable) plus a
    * reserved `__other` bucket that absorbs everything else, so state and
    * shuffle stay bounded at topB+1 rows per side no matter how
    * long-tailed the live distribution gets (a new live-side category is
    * visible as `__other` drift, the categorical analog of psiBins' edge
    * bins). NULL categories fold into `__other`. Smoothing denominators
    * use the actual spine size, derived in-plan.
    *
    * Plan shape, reading 100 TB: one vocabulary-bounded groupBy per side
    * (partial aggregation — the shuffle carries distinct categories, not
    * rows), a TakeOrderedAndProject top-B over the distinct-category frame
    * (partial top-B per partition — no single-partition sort even on an
    * adversarial high-cardinality column), and a broadcast join of the
    * <= topB spine back into the count frames.
    * Output: (cat, ref_n, live_n, psi9) ordered by cat; sum(psi9)/1e9 is
    * the headline PSI.
    */
  def psiCategories(ref: DataFrame, live: DataFrame, catCol: String,
      topB: Int = 20): DataFrame = {
    require(topB >= 1, s"topB must be >= 1, got $topB")
    val spark = ref.sparkSession
    def cats(df: DataFrame) = df.select(
      coalesce(col(catCol).cast("string"), lit("__other")).as("c"))
    val rc0 = cats(ref).groupBy("c").agg(count(lit(1)).as("n"))
    // orderBy().limit() (not a row_number() window): Catalyst plans this as
    // TakeOrderedAndProject — partial top-B per partition, merged on the
    // driver — so an adversarial high-cardinality column never funnels the
    // whole distinct-category frame through one partition's sort. Same
    // deterministic order (count desc, category asc), same result.
    val top = rc0.orderBy(col("n").desc, col("c")).limit(topB).select("c")
    val spine = top.select(col("c").as("cat"))
      .unionByName(spark.range(1).select(lit("__other").as("cat")))
      .distinct()
    def mapped(df: DataFrame, out: String) =
      cats(df)
        .join(broadcast(top.select(col("c").as("cat"),
          lit(1).as("__in"))), col("c") === col("cat"), "left")
        .select(when(col("__in").isNotNull, col("c"))
          .otherwise(lit("__other")).as("cat"))
        .groupBy("cat").agg(count(lit(1)).as(out))
    psiFromCategoryCounts(spine, mapped(ref, "ref_n"),
      mapped(live, "live_n"))
  }

  /** Final categorical PSI table from per-category counts against a
    * spine frame: (cat, ref_n, live_n, psi9) ordered by cat. Totals and
    * the smoothing denominator (actual spine size) derive in-plan from
    * the <= B+1-row frames — no driver actions, same discipline as
    * [[psiFromBinned]]. Shared by the batch form ([[psiCategories]]) and
    * the streaming monitor (w12), so the two cannot diverge.
    */
  def psiFromCategoryCounts(spine: DataFrame, refCounts: DataFrame,
      liveCounts: DataFrame): DataFrame = {
    val joined = spine
      .join(refCounts, Seq("cat"), "left")
      .join(liveCounts, Seq("cat"), "left")
      .na.fill(0L, Seq("ref_n", "live_n"))
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val withTotals = joined
      .withColumn("__ref_total", sum(col("ref_n")).over(all))
      .withColumn("__live_total", sum(col("live_n")).over(all))
      .withColumn("__b", count(lit(1)).over(all))
    val p = (col("ref_n") + 1.0) /
      (col("__ref_total") + col("__b")).cast("double")
    val q = (col("live_n") + 1.0) /
      (col("__live_total") + col("__b")).cast("double")
    withTotals.select(col("cat"), col("ref_n"), col("live_n"),
        floor((p - q) * log(p / q) * 1e9).cast("long").as("psi9"))
      .orderBy("cat")
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between a reference and
    * a live table over an integral column — the bin-free complement to
    * [[psiBins]]: PSI needs a bin grid and misses shape changes inside a
    * bin; KS is the sup-distance between the two EMPIRICAL CDFs and needs
    * no binning decision at all.
    *
    * Computation (all integer-exact, one row out):
    *   1. group both sides by the value — the only frame downstream work
    *      touches is one row per DISTINCT value;
    *   2. BOTH running counts ride ONE distributed prefix sum
    *      ([[Windowed.distributedCumsum]] — no single-partition window):
    *      the per-value (ref, live) count pair packs into a single long
    *      `ref * 2^31 + live` (exact while each side holds < 2^31 rows
    *      per prefix, i.e. any corpus this side of 2 billion rows), and
    *      the cumsum unpacks back with DIV / MOD;
    *   3. per distinct value the quantized CDF gap is
    *      |cum_ref*1e9 DIV n_ref - cum_live*1e9 DIV n_live| — each term
    *      floors an exact integer ratio onto the 1e-9 grid, so ks9 is a
    *      deterministic, engine-portable quantization of sup|F_r - F_l|
    *      (within 2e-9 of the real-valued statistic); n_ref/n_live come
    *      from the LAST cumsum row, not separate count() actions.
    *
    * Output: (n_ref, n_live, ks9); a side with zero rows emits the
    * undefined-statistic sentinel ks9 = -1 (the q45/q108b convention).
    * A side with >= 2^31 rows would corrupt the packed cumsum, so the
    * TRUE per-side totals (plain long sums, exact to 2^63 rows) are
    * carried alongside and ks9 emits the overflow sentinel -2 instead
    * of a silently wrong statistic — n_ref/n_live stay correct either
    * way, so the caller sees exactly why the statistic was refused.
    *
    * 100 TB: one partial-aggregable groupBy per side merged by value, a
    * prefix sum over the distinct-value frame (bounded by value-grid
    * cardinality, not row count), one global max. Doubles must be
    * pre-quantized to longs by the caller (floor-scale — the engine's
    * standard discipline), which is also what makes cross-engine tie
    * structure exact.
    */
  def ks9(ref: DataFrame, live: DataFrame, valueCol: String): DataFrame =
    ks9Impl(ref, live, valueCol, 1L << 31)

  /** [[ks9]] with the pack base exposed so the overflow sentinel is
    * testable without materializing 2^31 rows (OperatorsSpec runs it at a
    * tiny base and asserts -2 fires while n_ref/n_live stay exact).
    */
  private[graft] def ks9Impl(ref: DataFrame, live: DataFrame,
      valueCol: String, packK: Long): DataFrame = {
    val vt = ref.schema(valueCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(vt.typeName),
      s"ks9 needs an integral valueCol, got ${vt.simpleString} — " +
        "floor-scale to integer units first")
    val K = packK
    val tagged = ref.select(col(valueCol).as("__v"), lit(1L).as("__r"),
        lit(0L).as("__l"))
      .unionByName(live.select(col(valueCol).as("__v"), lit(0L).as("__r"),
        lit(1L).as("__l")))
    // __pr/__pl ride along un-packed: their plain-long sums are the TRUE
    // per-side totals (exact far past 2^31), which both report n_ref /
    // n_live and arm the pack-overflow guard below
    val perValue = tagged.filter(col("__v").isNotNull)
      .groupBy("__v")
      .agg((sum("__r") * K + sum("__l")).as("__packed"),
        sum("__r").as("__pr"), sum("__l").as("__pl"))
    val cum = Windowed.distributedCumsum(perValue, "__v", "__packed")
      .withColumn("__cr", expr(s"cumsum DIV $K"))
      .withColumn("__cl", expr(s"cumsum % $K"))
    // totals = the largest cumsum row (every row's counts are included
    // exactly once); gap floors AFTER the guard so an empty side never
    // divides by zero in either engine
    val totals = cum.agg(coalesce(max("cumsum"), lit(0L)).as("__t"))
      .select(expr(s"__t DIV $K").as("__nr"), expr(s"__t % $K").as("__nl"))
    cum.crossJoin(broadcast(totals))
      .agg(coalesce(sum(col("__pr")), lit(0L)).as("n_ref"),
        coalesce(sum(col("__pl")), lit(0L)).as("n_live"),
        coalesce(max(when(col("__nr") > 0 && col("__nl") > 0,
          abs(expr("__cr * 1000000000 DIV __nr") -
            expr("__cl * 1000000000 DIV __nl")))), lit(-1L)).as("ks9"))
      .select(col("n_ref"), col("n_live"),
        when(col("n_ref") === 0 || col("n_live") === 0, lit(-1L))
          // packed-cumsum precondition: either side at K wraps into the
          // other's lane — refuse loudly instead of unpacking garbage
          .when(col("n_ref") >= K || col("n_live") >= K, lit(-2L))
          .otherwise(col("ks9")).as("ks9"))
  }
}
