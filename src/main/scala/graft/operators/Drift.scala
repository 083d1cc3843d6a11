package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Plan shape, reading 100 TB: two scalar aggregates for the reference
  * range (driver-bounded), then ONE partial-aggregable groupBy per side
  * whose key space is B bins — the shuffle is bin-count-bounded exactly
  * like Count-Min (shuffle bounded by sketch size, not corpus size). The
  * bin spine is a B-row literal frame, so zero-count bins surface without
  * any outer join against data.
  */
object Drift {

  /** Per-bin PSI table: (bin, ref_n, live_n, psi9) ordered by bin, where
    * psi9 = floor((p - q) * ln(p / q) * 1e9) and p, q are the add-one
    * smoothed bin shares. Sum(psi9)/1e9 is the headline PSI.
    */
  def psiBins(ref: DataFrame, live: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = ref.sparkSession
    val Row2 = ref.agg(min(col(valueCol).cast("double")),
      max(col(valueCol).cast("double"))).head
    // empty reference: the bin spine still exists; everything lands in
    // bin 0 and only count smoothing contributes (finite, well-defined)
    val (lo, hi) =
      if (Row2.isNullAt(0)) (0.0, 0.0)
      else (Row2.getDouble(0), Row2.getDouble(1))
    val width = (hi - lo) / bins
    def binOf(c: Column): Column =
      if (width == 0.0) lit(0)
      else least(greatest(floor((c.cast("double") - lit(lo)) / lit(width))
        .cast("int"), lit(0)), lit(bins - 1))
    def counts(df: DataFrame, out: String) =
      df.groupBy(binOf(col(valueCol)).as("bin"))
        .agg(count(lit(1)).as(out))
    val spine = spark.range(bins).select(col("id").cast("int").as("bin"))
    val refN = ref.count(); val liveN = live.count()
    val joined = spine
      .join(counts(ref, "ref_n"), Seq("bin"), "left")
      .join(counts(live, "live_n"), Seq("bin"), "left")
      .na.fill(0L, Seq("ref_n", "live_n"))
    val p = (col("ref_n") + 1.0) / lit((refN + bins).toDouble)
    val q = (col("live_n") + 1.0) / lit((liveN + bins).toDouble)
    joined.select(col("bin"), col("ref_n"), col("live_n"),
        floor((p - q) * log(p / q) * 1e9).cast("long").as("psi9"))
      .orderBy("bin")
  }
}
