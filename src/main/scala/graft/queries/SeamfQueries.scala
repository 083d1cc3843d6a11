package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.DbMath
import graft.operators.{AsOfJoin, TddSync, Windowed}
import graft.seamf.{SeamfFixtures, SeamfReader}

/** seamf ingest + analytics inventory (SURVEY.md §2.1 S1-S14 and the
  * demo-derived analytics surface) exercised over a deterministic synthetic
  * archive (SeamfFixtures.sharedArchive — FIXTURES.md §A.5: 8 sweeps at 90 s
  * cadence, one omitted slot, one corrupt-sha member, one non-sigmf file).
  *
  * DuckDB cannot decode seamf containers, so these run as rows-only checks;
  * exact decoded values are pinned by the ScalaTest specs
  * (src/test/scala/graft/seamf/). All aggregates use order-independent
  * accumulation (decimal sums / min / max) so outputs are bit-stable.
  */
object SeamfQueries {

  /** Exact linear-space dB mean: decimal accumulation then back to dB. */
  private def dbMeanExact(c: org.apache.spark.sql.Column) =
    lit(10.0) * log10(
      sum(pow(lit(10.0), c / 10.0).cast(DecimalType(38, 12))).cast("double") /
        count(lit(1)))

  private def fixture(): String = SeamfFixtures.sharedArchive()

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- S1/S5/S6: full decode -> long PSD table + A1-style agg --------
    "s01_seamf_psd_summary" -> QueryDef(
      (s, _) => {
        val psd = SeamfReader.tables(s, fixture())("psd")
        psd.groupBy("frequency", "capture_statistic")
          .agg(count(lit(1)).as("n"),
            round(dbMeanExact(col("psd_dbm_per_hz")), 6).as("db_mean"),
            min(col("psd_dbm_per_hz")).as("db_min"),
            max(col("psd_dbm_per_hz")).as("db_max"))
          .orderBy("frequency", "capture_statistic")
      }, None),

    // ---- A8/J1: capture_summary (dask_processing.ipynb cell 3) ---------
    "s02_seamf_capture_summary" -> QueryDef(
      (s, _) => {
        val t = SeamfReader.tables(s, fixture())
        val pvt = t("pvt")
          .groupBy("datetime", "frequency", "detector")
          .agg(max(col("power_dbm")).as("peak_power"),
            round(dbMeanExact(col("power_dbm")), 6).as("mean_power"))
          .groupBy("datetime", "frequency")
          .pivot("detector", Seq("peak", "rms"))
          .agg(first(col("peak_power")).as("max"), first(col("mean_power")).as("mean"))
        val cal = t("channel_metadata")
          .select(col("datetime"), col("frequency"), col("overload"),
            col("cal_noise_figure_dB"), col("cal_gain_dB"),
            col("cal_temperature_degC"))
        pvt.join(cal, Seq("datetime", "frequency"))
          // kTB thermal noise floor from cal temperature + noise figure
          // (F2, seamf_quickplot.ipynb cell 5)
          .withColumn("noise_floor_dbm_per_hz",
            round(DbMath.ktbNoiseFloorDbmPerHz(
              col("cal_temperature_degC"), col("cal_noise_figure_dB")), 6))
          .withColumn("datetime_us", unix_micros(col("datetime"))).drop("datetime")
          .orderBy("datetime_us", "frequency")
      }, None),

    // ---- S3: metadata-only scan ----------------------------------------
    "s03_seamf_sweep_metadata" -> QueryDef(
      (s, _) => {
        SeamfReader.sweepMetadata(s, fixture())
          .select(
            regexp_extract(col("file"), "([^/]+)\\.sigmf$", 1).as("name"),
            col("version"), col("schema_generation"), col("num_channels"),
            col("task"), col("schedule_interval_sec"),
            col("timezone"), col("n_captures"))
          .orderBy("name")
      }, None),

    // ---- S2/S9: integrity + permissive error mode ----------------------
    "s04_seamf_error_tolerant" -> QueryDef(
      (s, _) => {
        val all = SeamfReader.sweepMetadata(s, fixture(), checkHash = false)
          .agg(count(lit(1)).as("n_parseable"))
        val ok = SeamfReader.sweepMetadata(s, fixture(), checkHash = true)
          .agg(count(lit(1)).as("n_hash_ok"))
        all.crossJoin(ok)
          .withColumn("n_corrupt", col("n_parseable") - col("n_hash_ok"))
      }, None),

    // ---- A9: acquisition gap detection ---------------------------------
    "s05_seamf_gaps" -> QueryDef(
      (s, _) => {
        val sm = SeamfReader.sweepMetadata(s, fixture())
          .withColumn("t0", timestamp_micros(col("schedule_start_us")))
        Windowed.gaps(sm, Seq.empty, "t0", 91.0)
          .select(unix_micros(col("t0")).as("t0_us"), col("gap_sec"))
          .orderBy("t0_us")
      }, None),

    // ---- O4/A4: spectrogram pivot + frequency-axis downsample ----------
    "s06_seamf_spectrogram" -> QueryDef(
      (s, _) => {
        val psd = SeamfReader.tables(s, fixture())("psd")
        psd
          .withColumn("bin", floor((col("baseband_hz") + 4.992e6) / (16e3 * 25)))
          .groupBy("datetime", "frequency", "bin")
          .pivot("capture_statistic", Seq("max", "mean"))
          .agg(round(dbMeanExact(col("psd_dbm_per_hz")), 6))
          // absolute RF axis = channel center + baseband bin offset
          // (plots.py:148-164)
          .withColumn("abs_hz_start",
            col("frequency") - 4.992e6 + col("bin") * (16e3 * 25))
          .withColumn("datetime_us", unix_micros(col("datetime"))).drop("datetime")
          .orderBy("datetime_us", "frequency", "bin")
      }, None),

    // ---- F11/O5: APD Rayleigh axis transform ---------------------------
    "s07_seamf_apd_transform" -> QueryDef(
      (s, _) => {
        val apd = SeamfReader.tables(s, fixture())("apd")
        apd
          .withColumn("p", col("probability_pct").cast("double") / 100.0)
          .withColumn("rayleigh_x",
            round(DbMath.apdRayleighX(col("amplitude_dbm"), col("p")), 6))
          .filter(col("rayleigh_x").isNotNull)
          .groupBy("frequency")
          .agg(count(lit(1)).as("n"),
            min(col("rayleigh_x")).as("x_min"),
            max(col("rayleigh_x")).as("x_max"))
          .orderBy("frequency")
      }, None),

    // ---- J2: as-of join of cal metadata onto pfp aggregate times -------
    "s08_seamf_asof_cal" -> QueryDef(
      (s, _) => {
        val t = SeamfReader.tables(s, fixture())
        val pfpAgg = t("pfp")
          .groupBy("datetime", "frequency")
          .agg(max(col("power_dbm")).as("frame_peak_dbm"))
        val cal = t("channel_metadata")
          .groupBy("frequency", "datetime")
          .agg(max(col("cal_noise_figure_dB")).as("cal_noise_figure_dB"))
        AsOfJoin.backward(pfpAgg, cal, Seq("frequency"), "datetime", "datetime",
            Seq("cal_noise_figure_dB"))
          .withColumn("datetime_us", unix_micros(col("datetime"))).drop("datetime")
          .orderBy("frequency", "datetime_us")
      }, None),

    // ---- A7: declared vs recomputed channel-power parity ---------------
    // The metadata carries per-channel summary powers
    // (ntia-nasctn-sea:max_of_max_channel_powers); recompute them from the
    // decoded PSD traces and compare — the reference-recommended integrity
    // check (SURVEY A7).
    "s10_seamf_power_parity" -> QueryDef(
      (s, _) => {
        val recomputed = SeamfReader.traces(s, fixture()).toDF()
          .filter(col("table") === "psd" && col("capture_statistic") === "max")
          .select(col("file"), col("frequency"),
            array_max(col("trace")).cast("double").as("recomputed_max"))
        val chanIdx = org.apache.spark.sql.expressions.Window
          .partitionBy("file").orderBy("frequency")
        val withIdx = recomputed
          .withColumn("channel", row_number().over(chanIdx) - 1)
        val declared = SeamfReader.sweepMetadata(s, fixture())
          .select(col("file"),
            posexplode(col("max_of_max_channel_powers"))
              .as(Seq("channel", "declared_max")))
        withIdx.join(declared, Seq("file", "channel"))
          .withColumn("matches",
            abs(col("recomputed_max") - col("declared_max")) < 0.01)
          .select(
            regexp_extract(col("file"), "([^/]+)\\.sigmf$", 1).as("name"),
            col("channel"), col("declared_max"), col("recomputed_max"),
            col("matches"))
          .orderBy("name", "channel")
      }, None),

    // ---- P4/J3: cell-wise boolean mask via broadcast mask join ---------
    // Per-timestamp frame format selects one of 2 mask templates; the mask
    // NaNs-out non-downlink samples before aggregating (reference
    // 3gpp_detect_and_sync.ipynb cell 11).
    "s11_seamf_masked_agg" -> QueryDef(
      (s, _) => {
        import s.implicits._
        val pfp = SeamfReader.traces(s, fixture())
          .filter(t => t.table == "pfp" && t.detector == "rms" &&
            t.capture_statistic == "mean")
          .toDF()
        val n = 112 // fixture pfp trace length
        val masks = TddSync.defaultTemplates(n).zipWithIndex
          .map { case (m, i) => (i, m.map(_.toFloat).toSeq) }
          .toDF("frame_format", "mask")
        // frame format per trace from the sync operator, then mask join
        val synced = TddSync.syncTraces(pfp, "trace")
        synced.join(broadcast(masks), Seq("frame_format"))
          .withColumn("masked_db_mean",
            round(lit(10.0) * log10(
              aggregate(
                zip_with(col("aligned"), col("mask"),
                  (x, m) => pow(lit(10.0), x / 10.0) * m),
                lit(0.0), (acc, x) => acc + x) /
                aggregate(col("mask"), lit(0.0), (acc, m) => acc + m)), 6))
          .groupBy("frequency", "frame_format")
          .agg(count(lit(1)).as("n"),
            min(col("masked_db_mean")).as("min_masked_db"),
            max(col("masked_db_mean")).as("max_masked_db"))
          .orderBy("frequency", "frame_format")
      }, None),

    // ---- F7: flattened diagnostics map -> long rows (MapType ops) ------
    "s13_seamf_diagnostics" -> QueryDef(
      (s, _) => {
        SeamfReader.sweepMetadata(s, fixture())
          .select(
            regexp_extract(col("file"), "([^/]+)\\.sigmf$", 1).as("name"),
            explode(col("diagnostics")).as(Seq("key", "value")))
          .groupBy("key")
          .agg(count(lit(1)).as("n_files"),
            countDistinct(col("value")).as("n_distinct_values"))
          .orderBy("key")
      }, None),

    // ---- S7: zip-archive scan ------------------------------------------
    "s14_seamf_zip_scan" -> QueryDef(
      (s, _) => {
        val zdir = {
          val d = java.nio.file.Paths.get(
            System.getProperty("java.io.tmpdir"), "graft_seamf_zipfix")
          val marker = d.resolve(".complete")
          if (!java.nio.file.Files.exists(marker)) {
            graft.seamf.SeamfFixtures.writeZipArchive(d.toString)
            java.nio.file.Files.write(marker, Array.emptyByteArray)
          }
          d.toString
        }
        SeamfReader.tracesFromZips(s, zdir).toDF()
          .groupBy("table")
          .agg(count(lit(1)).as("n_traces"),
            countDistinct(col("file")).as("n_members"))
          .orderBy("table")
      }, None),

    // ---- A9: coverage statistics vs the 90 s schedule cadence ----------
    "s12_seamf_coverage" -> QueryDef(
      (s, _) => {
        val sm = SeamfReader.sweepMetadata(s, fixture())
          .withColumn("t0", timestamp_micros(col("schedule_start_us")))
          .withColumn("all", lit(1))
        Windowed.coverage(sm, Seq("all"), "t0", cadenceSec = 90.0)
          .select(col("n_obs"), col("ideal"), col("coverage_pct"))
      }, None),

    // ---- W4: TDD frame correlation / alignment -------------------------
    "s09_seamf_tdd_sync" -> QueryDef(
      (s, _) => {
        import s.implicits._
        val traces = SeamfReader.traces(s, fixture())
          .filter(t => t.table == "pfp" && t.detector == "rms" &&
            t.capture_statistic == "mean")
          .toDF()
        TddSync.syncTraces(traces, "trace")
          .groupBy("frequency", "frame_format")
          .agg(count(lit(1)).as("n"),
            min(col("shift")).as("min_shift"),
            max(col("shift")).as("max_shift"))
          .orderBy("frequency", "frame_format")
      }, None)
  )
}
