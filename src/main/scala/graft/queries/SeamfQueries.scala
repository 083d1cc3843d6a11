package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{AsOfJoin, TddSync}
import graft.seamf.{SeamfDump, SeamfFixtures, SeamfReader}

/** seamf ingest + analytics inventory (SURVEY.md §2.1 S1-S14 and the
  * demo-derived analytics surface) exercised over a deterministic synthetic
  * archive (SeamfFixtures.sharedArchive — FIXTURES.md §A.5: 8 sweeps at 90 s
  * cadence, one omitted slot, one corrupt-sha member, one non-sigmf file).
  *
  * DuckDB cannot decode seamf containers, but it can query decoded parquet:
  * [[graft.seamf.SeamfDump]] decodes the fixture once and dumps the long
  * tables; each query here reads that dump and carries DuckDB oracle SQL
  * over the SAME files — so the analytics are hash-checked cell-for-cell.
  * The decode itself is pinned by SeamfGoldenSpec against the reference's
  * real example_v{1..6}.sigmf files. Only the two TddSync-dependent queries
  * (s09, s11 — the sanctioned correlation UDF) stay rows-only.
  *
  * dB means use the log-sum-exp discipline proven by q21: per-group max
  * normalization + DECIMAL(38,18) sums, bit-stable across partitionings and
  * engines.
  */
object SeamfQueries {

  private val D = SeamfDump.root
  private def rp(t: String) = s"read_parquet('$D/$t/*.parquet')"

  // s16 prune window: first 4 sweep slots (the fixture staggers captures
  // <= 2 s past each 90 s slot start) and the two lower of the three
  // channel frequencies. Shared by the Spark predicate and the oracle SQL.
  // Declared BEFORE `defs` — the oracle string interpolates these at map
  // construction time, and a val declared later would still be 0 here.
  private[graft] val PruneCutUs: Long =
    graft.seamf.SeamfMetadata.isoToMicros("2023-09-21T00:05:00Z")
  private[graft] val PruneMaxFreq: Double = 3.566e9

  private def dump(s: SparkSession, table: String): DataFrame = {
    SeamfDump.ensure(s)
    s.read.parquet(s"$D/$table")
  }

  /** Exact linear-space dB mean: log-sum-exp with per-group max
    * normalization (`vmax` must be a window max over the same keys as the
    * enclosing groupBy) + decimal accumulation.
    */
  private def lin(v: Column, vmax: Column): Column =
    pow(lit(10.0), (v - vmax) / 10.0).cast(DecimalType(38, 18))

  private def dbMeanAgg(vmax: Column, linCol: Column): Column =
    round(max(vmax) + lit(10.0) *
      log10(sum(linCol).cast("double") / count(lit(1))), 6)

  /** The matching DuckDB SQL fragment (v, vmax column names in scope). */
  private def sqlDbMean(v: String, vmax: String): String =
    s"ROUND(MAX($vmax) + 10.0*LOG10(CAST(SUM(CAST(POW(10.0, ($v - $vmax)/10.0)" +
      s" AS DECIMAL(38,18))) AS DOUBLE)/COUNT(*)), 6)"

  private def fixture(): String = SeamfFixtures.sharedArchive()

  // Oracle SQL shared between a dump-path analytic and its DSv2-connector
  // twin (s22-s24, VERDICT r8 #2): the SAME DuckDB replay grades both, so
  // a hash match proves the connector path — with its optimizer-driven
  // decode pruning — computes cell-for-cell what the library path does.
  private val S01OracleSql =
    s"""WITH b AS (SELECT frequency, capture_statistic, psd_dbm_per_hz,
        MAX(psd_dbm_per_hz) OVER (PARTITION BY frequency, capture_statistic)
          AS vmax FROM ${rp("psd")})
        SELECT frequency, capture_statistic, COUNT(*) AS n,
          ${sqlDbMean("psd_dbm_per_hz", "vmax")} AS db_mean,
          MIN(psd_dbm_per_hz) AS db_min, MAX(psd_dbm_per_hz) AS db_max
        FROM b GROUP BY 1, 2 ORDER BY 1, 2"""

  private val S02OracleSql =
    s"""WITH b AS (SELECT datetime_us, frequency, detector, power_dbm,
        MAX(power_dbm) OVER (PARTITION BY datetime_us, frequency, detector)
          AS vmax FROM ${rp("pvt")}),
      a AS (SELECT datetime_us, frequency, detector,
        MAX(power_dbm) AS peak_power,
        ${sqlDbMean("power_dbm", "vmax")} AS mean_power
        FROM b GROUP BY 1, 2, 3),
      p AS (SELECT datetime_us, frequency,
        MAX(peak_power) FILTER (WHERE detector = 'peak') AS peak_max,
        MAX(mean_power) FILTER (WHERE detector = 'peak') AS peak_mean,
        MAX(peak_power) FILTER (WHERE detector = 'rms') AS rms_max,
        MAX(mean_power) FILTER (WHERE detector = 'rms') AS rms_mean
        FROM a GROUP BY 1, 2)
      SELECT p.datetime_us, p.frequency, p.peak_max, p.peak_mean, p.rms_max,
        p.rms_mean, c.overload, c.cal_noise_figure_dB, c.cal_gain_dB,
        c.cal_temperature_degC,
        ROUND(10.0*LOG10((c.cal_temperature_degC + 273.15)*1.380649e-23)
          + 30.0 + c.cal_noise_figure_dB, 6) AS noise_floor_dbm_per_hz,
        CASE WHEN c.overload THEN -1 ELSE 1 END AS overload_sign
      FROM p JOIN ${rp("channel_metadata")} c
        ON p.datetime_us = c.datetime_us AND p.frequency = c.frequency
      ORDER BY 1, 2"""

  private val S16OracleSql =
    s"""SELECT frequency, capture_statistic,
          COUNT(DISTINCT datetime_us) AS n_traces, COUNT(*) AS n_points,
          MAX(psd_dbm_per_hz) AS max_db,
          MIN(datetime_us) AS min_dt, MAX(datetime_us) AS max_dt
        FROM ${rp("psd")}
        WHERE datetime_us <= $PruneCutUs AND frequency <= $PruneMaxFreq
        GROUP BY 1, 2 ORDER BY 1, 2"""

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- S1/S5/S6: full decode -> long PSD table + A1-style agg --------
    "s01_seamf_psd_summary" -> QueryDef(
      (s, _) => {
        val w = Window.partitionBy("frequency", "capture_statistic")
        dump(s, "psd")
          .withColumn("__vmax", max(col("psd_dbm_per_hz")).over(w))
          .withColumn("__lin", lin(col("psd_dbm_per_hz"), col("__vmax")))
          .groupBy("frequency", "capture_statistic")
          .agg(count(lit(1)).as("n"),
            dbMeanAgg(col("__vmax"), col("__lin")).as("db_mean"),
            min(col("psd_dbm_per_hz")).as("db_min"),
            max(col("psd_dbm_per_hz")).as("db_max"))
          .orderBy("frequency", "capture_statistic")
      },
      Some(S01OracleSql)),

    // ---- A8/J1: capture_summary (dask_processing.ipynb cell 3) ---------
    // Includes F2 (kTB noise floor) and F8 (overload -> {-1, 1} categorical
    // map, colormap_plots.ipynb cell 5).
    "s02_seamf_capture_summary" -> QueryDef(
      (s, _) => {
        val w = Window.partitionBy("datetime_us", "frequency", "detector")
        val agg = dump(s, "pvt")
          .withColumn("__vmax", max(col("power_dbm")).over(w))
          .withColumn("__lin", lin(col("power_dbm"), col("__vmax")))
          .groupBy("datetime_us", "frequency", "detector")
          .agg(max(col("power_dbm")).as("peak_power"),
            dbMeanAgg(col("__vmax"), col("__lin")).as("mean_power"))
        val piv = agg.groupBy("datetime_us", "frequency")
          .pivot("detector", Seq("peak", "rms"))
          .agg(first(col("peak_power")).as("max"), first(col("mean_power")).as("mean"))
        val cal = dump(s, "channel_metadata")
          .select(col("datetime_us"), col("frequency"), col("overload"),
            col("cal_noise_figure_dB"), col("cal_gain_dB"),
            col("cal_temperature_degC"))
        piv.join(cal, Seq("datetime_us", "frequency"))
          // kTB thermal noise floor (F2, seamf_quickplot.ipynb cell 5)
          .withColumn("noise_floor_dbm_per_hz",
            round(graft.functions.DbMath.ktbNoiseFloorDbmPerHz(
              col("cal_temperature_degC"), col("cal_noise_figure_dB")), 6))
          // F8: overload boolean -> {-1, 1} (colormap_plots.ipynb cell 5)
          .withColumn("overload_sign", when(col("overload"), -1).otherwise(1))
          .orderBy("datetime_us", "frequency")
      },
      Some(S02OracleSql)),

    // ---- S3: metadata-only scan ----------------------------------------
    "s03_seamf_sweep_metadata" -> QueryDef(
      (s, _) => {
        dump(s, "sweep_metadata")
          .select(col("file_name").as("name"),
            col("version"), col("schema_generation"), col("num_channels"),
            col("task"), col("schedule_interval_sec"),
            col("timezone"), col("n_captures"))
          .orderBy("name")
      },
      Some(s"""SELECT file_name AS name, version, schema_generation,
        num_channels, task, schedule_interval_sec, timezone, n_captures
        FROM ${rp("sweep_metadata")} ORDER BY 1""")),

    // ---- S2/S9: integrity + permissive error mode ----------------------
    "s04_seamf_error_tolerant" -> QueryDef(
      (s, _) => {
        dump(s, "sweep_metadata")
          .agg(count(lit(1)).as("n_parseable"),
            count(when(col("sha512_ok"), lit(1))).as("n_hash_ok"))
          .withColumn("n_corrupt", col("n_parseable") - col("n_hash_ok"))
      },
      Some(s"""SELECT COUNT(*) AS n_parseable,
        COUNT(*) FILTER (WHERE sha512_ok) AS n_hash_ok,
        COUNT(*) - COUNT(*) FILTER (WHERE sha512_ok) AS n_corrupt
        FROM ${rp("sweep_metadata")}""")),

    // ---- A9: acquisition gap detection ---------------------------------
    // Global consecutive-diff over one-row-per-FILE metadata: at 10^6+
    // files a bare Window.orderBy funnels the table through one task, so
    // the lag runs as Windowed.distributedLag (range partition + broadcast
    // per-partition boundary maxima — two-phase, no global window).
    "s05_seamf_gaps" -> QueryDef(
      (s, _) => {
        graft.operators.Windowed.distributedLag(
            dump(s, "sweep_metadata").select(col("schedule_start_us")),
            "schedule_start_us")
          .withColumn("gap_sec",
            (col("schedule_start_us") - col("prev")).cast("double") / 1e6)
          .filter(col("gap_sec") > 91.0)
          .select(col("schedule_start_us").as("t0_us"), col("gap_sec"))
          .orderBy("t0_us")
      },
      Some(s"""WITH b AS (SELECT schedule_start_us,
        (schedule_start_us - LAG(schedule_start_us, 1) OVER
          (ORDER BY schedule_start_us)) / 1000000.0 AS gap_sec
        FROM ${rp("sweep_metadata")})
        SELECT schedule_start_us AS t0_us, gap_sec FROM b
        WHERE gap_sec > 91.0 ORDER BY 1""")),

    // ---- O4/A4: spectrogram pivot + frequency-axis downsample ----------
    "s06_seamf_spectrogram" -> QueryDef(
      (s, _) => {
        val w = Window.partitionBy("datetime_us", "frequency", "bin",
          "capture_statistic")
        dump(s, "psd")
          .withColumn("bin", floor((col("baseband_hz") + 4.992e6) / (16e3 * 25)))
          .withColumn("__vmax", max(col("psd_dbm_per_hz")).over(w))
          .withColumn("__lin", lin(col("psd_dbm_per_hz"), col("__vmax")))
          .groupBy("datetime_us", "frequency", "bin")
          .pivot("capture_statistic", Seq("max", "mean"))
          .agg(dbMeanAgg(col("__vmax"), col("__lin")))
          // absolute RF axis = channel center + baseband bin offset
          // (plots.py:148-164)
          .withColumn("abs_hz_start",
            col("frequency") - 4.992e6 + col("bin") * (16e3 * 25))
          .orderBy("datetime_us", "frequency", "bin")
      },
      Some(s"""WITH b AS (SELECT datetime_us, frequency, capture_statistic,
        psd_dbm_per_hz,
        CAST(FLOOR((baseband_hz + 4992000.0) / 400000.0) AS BIGINT) AS bin
        FROM ${rp("psd")}),
      v AS (SELECT *, MAX(psd_dbm_per_hz) OVER (PARTITION BY datetime_us,
        frequency, bin, capture_statistic) AS vmax FROM b),
      g AS (SELECT datetime_us, frequency, bin, capture_statistic,
        ${sqlDbMean("psd_dbm_per_hz", "vmax")} AS db FROM v
        GROUP BY 1, 2, 3, 4)
      SELECT datetime_us, frequency, bin,
        MAX(db) FILTER (WHERE capture_statistic = 'max') AS "max",
        MAX(db) FILTER (WHERE capture_statistic = 'mean') AS "mean",
        frequency - 4992000.0 + bin * 400000.0 AS abs_hz_start
      FROM g GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ---- F11/O5: APD Rayleigh axis transform ---------------------------
    "s07_seamf_apd_transform" -> QueryDef(
      (s, _) => {
        dump(s, "apd")
          .withColumn("p", col("probability_pct").cast("double") / 100.0)
          .withColumn("rayleigh_x",
            round(graft.functions.DbMath.apdRayleighX(
              col("amplitude_dbm"), col("p")), 6))
          .filter(col("rayleigh_x").isNotNull)
          .groupBy("frequency")
          .agg(count(lit(1)).as("n"),
            min(col("rayleigh_x")).as("x_min"),
            max(col("rayleigh_x")).as("x_max"))
          .orderBy("frequency")
      },
      Some(s"""WITH b AS (SELECT frequency,
        CASE WHEN CAST(probability_pct AS DOUBLE)/100.0 > 0.0
              AND CAST(probability_pct AS DOUBLE)/100.0 < 1.0
          THEN ROUND(amplitude_dbm - 10.0*LOG10(
            -LN(CAST(probability_pct AS DOUBLE)/100.0)), 6) END AS rayleigh_x
        FROM ${rp("apd")})
        SELECT frequency, COUNT(*) AS n, MIN(rayleigh_x) AS x_min,
          MAX(rayleigh_x) AS x_max
        FROM b WHERE rayleigh_x IS NOT NULL GROUP BY 1 ORDER BY 1""")),

    // ---- J2: as-of join of cal metadata onto pfp aggregate times -------
    // The oracle is DuckDB's native ASOF JOIN — an independent
    // implementation of the backward as-of semantics.
    "s08_seamf_asof_cal" -> QueryDef(
      (s, _) => {
        val pfpAgg = dump(s, "pfp")
          .groupBy("datetime_us", "frequency")
          .agg(max(col("power_dbm")).as("frame_peak_dbm"))
        val cal = dump(s, "channel_metadata")
          .groupBy("frequency", "datetime_us")
          .agg(max(col("cal_noise_figure_dB")).as("cal_noise_figure_dB"))
        AsOfJoin.backward(pfpAgg, cal, Seq("frequency"), "datetime_us",
            "datetime_us", Seq("cal_noise_figure_dB"))
          .orderBy("frequency", "datetime_us")
      },
      Some(s"""WITH pa AS (SELECT datetime_us, frequency,
        MAX(power_dbm) AS frame_peak_dbm FROM ${rp("pfp")} GROUP BY 1, 2),
      c AS (SELECT frequency, datetime_us,
        MAX(cal_noise_figure_dB) AS cal_noise_figure_dB
        FROM ${rp("channel_metadata")} GROUP BY 1, 2)
      SELECT pa.datetime_us, pa.frequency, pa.frame_peak_dbm,
        c.cal_noise_figure_dB
      FROM pa ASOF LEFT JOIN c
        ON pa.frequency = c.frequency AND pa.datetime_us >= c.datetime_us
      ORDER BY 2, 1""")),

    // ---- A7: declared vs recomputed channel-power parity ---------------
    // The metadata carries per-channel summary powers; recompute the
    // max-of-max from the decoded PSD long table and compare (SURVEY A7).
    "s10_seamf_power_parity" -> QueryDef(
      (s, _) => {
        val rec = dump(s, "psd")
          .filter(col("capture_statistic") === "max")
          .groupBy("file_name", "frequency")
          .agg(max(col("psd_dbm_per_hz")).cast("double").as("recomputed_max"))
          .withColumn("channel", row_number().over(
            Window.partitionBy("file_name").orderBy("frequency")) - 1)
        val declared = dump(s, "sweep_metadata")
          .select(col("file_name"),
            posexplode(col("max_of_max_channel_powers"))
              .as(Seq("channel", "declared_max")))
        rec.join(declared, Seq("file_name", "channel"))
          .withColumn("matches",
            abs(col("recomputed_max") - col("declared_max")) < 0.01)
          .select(col("file_name").as("name"), col("channel"),
            col("declared_max"), col("recomputed_max"), col("matches"))
          .orderBy("name", "channel")
      },
      Some(s"""WITH rec AS (SELECT file_name, frequency,
        CAST(MAX(psd_dbm_per_hz) AS DOUBLE) AS recomputed_max
        FROM ${rp("psd")} WHERE capture_statistic = 'max' GROUP BY 1, 2),
      idx AS (SELECT file_name, recomputed_max,
        CAST(ROW_NUMBER() OVER (PARTITION BY file_name ORDER BY frequency)
          - 1 AS INTEGER) AS channel FROM rec),
      dec AS (SELECT file_name,
        CAST(unnest(range(len(max_of_max_channel_powers))) AS INTEGER)
          AS channel,
        unnest(max_of_max_channel_powers) AS declared_max
        FROM ${rp("sweep_metadata")})
      SELECT idx.file_name AS name, idx.channel, dec.declared_max,
        idx.recomputed_max,
        ABS(idx.recomputed_max - dec.declared_max) < 0.01 AS matches
      FROM idx JOIN dec
        ON idx.file_name = dec.file_name AND idx.channel = dec.channel
      ORDER BY 1, 2""")),

    // ---- P4/J3: cell-wise boolean mask via broadcast mask join ---------
    // Per-timestamp frame format selects one of 2 mask templates; the mask
    // zeroes non-downlink samples before aggregating (reference
    // 3gpp_detect_and_sync.ipynb cell 11). The oracle replays the TddSync
    // argmax (shared CTE), then the masked linear mean: round(…, 6)
    // absorbs the double-vs-decimal accumulation-order difference.
    "s11_seamf_masked_agg" -> QueryDef(
      (s, _) => {
        import s.implicits._
        val n = 112 // fixture pfp trace length
        val masks = TddSync.defaultTemplates(n).zipWithIndex
          .map { case (m, i) => (i, m.map(_.toFloat).toSeq) }
          .toDF("frame_format", "mask")
        // frame format per trace from the sync operator, then mask join
        val synced = TddSync.syncTraces(pfpTraces(s), "trace")
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
      },
      Some(s"""$TddSyncCte,
        mk AS (SELECT sel.file_name, sel.datetime_us, sel.frequency,
            sel.frame_format, s.lin,
            CAST((s.m - sel.shift + s.n) % s.n AS DOUBLE) / s.n AS frac
          FROM sel JOIN s ON s.file_name = sel.file_name
            AND s.datetime_us = sel.datetime_us
            AND s.frequency = sel.frequency),
        mm AS (SELECT file_name, datetime_us, frequency, frame_format,
            SUM(CAST(lin * (CASE WHEN frame_format = 0 THEN
                CASE WHEN frac < 0.6 OR (frac >= 0.7 AND frac < 0.8)
                  THEN 1.0 ELSE 0.0 END
              ELSE
                CASE WHEN frac < 0.3 OR (frac >= 0.5 AND frac < 0.8)
                  THEN 1.0 ELSE 0.0 END
              END) AS DECIMAL(38,30))) AS num,
            SUM(CASE WHEN frame_format = 0 THEN
                CASE WHEN frac < 0.6 OR (frac >= 0.7 AND frac < 0.8)
                  THEN 1.0 ELSE 0.0 END
              ELSE
                CASE WHEN frac < 0.3 OR (frac >= 0.5 AND frac < 0.8)
                  THEN 1.0 ELSE 0.0 END
              END) AS den
          FROM mk GROUP BY 1, 2, 3, 4),
        md AS (SELECT frequency, frame_format,
            ROUND(10.0 * LOG10(CAST(num AS DOUBLE) / den), 6)
              AS masked_db_mean
          FROM mm)
        SELECT frequency, frame_format, COUNT(*) AS n,
          MIN(masked_db_mean) AS min_masked_db,
          MAX(masked_db_mean) AS max_masked_db
        FROM md GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- F7: flattened diagnostics map -> long rows --------------------
    "s13_seamf_diagnostics" -> QueryDef(
      (s, _) => {
        dump(s, "diagnostics")
          .groupBy("key")
          .agg(count(lit(1)).as("n_files"),
            countDistinct(col("value")).as("n_distinct_values"))
          .orderBy("key")
      },
      Some(s"""SELECT "key", COUNT(*) AS n_files,
        COUNT(DISTINCT "value") AS n_distinct_values
        FROM ${rp("diagnostics")} GROUP BY 1 ORDER BY 1""")),

    // ---- S7: zip-archive scan ------------------------------------------
    "s14_seamf_zip_scan" -> QueryDef(
      (s, _) => {
        dump(s, "zip_traces")
          .groupBy("product")
          .agg(count(lit(1)).as("n_traces"),
            countDistinct(col("file_name")).as("n_members"))
          .orderBy("product")
      },
      Some(s"""SELECT product, COUNT(*) AS n_traces,
        COUNT(DISTINCT file_name) AS n_members
        FROM ${rp("zip_traces")} GROUP BY 1 ORDER BY 1""")),

    // ---- A9: coverage statistics vs the 90 s schedule cadence ----------
    "s12_seamf_coverage" -> QueryDef(
      (s, _) => {
        dump(s, "sweep_metadata")
          .agg(count(lit(1)).as("n_obs"),
            min(col("schedule_start_us")).as("t_min"),
            max(col("schedule_start_us")).as("t_max"))
          .withColumn("ideal",
            floor((col("t_max") - col("t_min")).cast("double") / 1e6 / 90.0) + 1)
          .withColumn("coverage_pct",
            round(col("n_obs").cast("double") / col("ideal").cast("double")
              * 100.0, 4))
          .select(col("n_obs"), col("ideal"), col("coverage_pct"))
      },
      Some(s"""WITH b AS (SELECT COUNT(*) AS n_obs,
        CAST(FLOOR((MAX(schedule_start_us) - MIN(schedule_start_us))
          / 1000000.0 / 90.0) AS BIGINT) + 1 AS ideal
        FROM ${rp("sweep_metadata")})
        SELECT n_obs, ideal,
          ROUND(CAST(n_obs AS DOUBLE) / CAST(ideal AS DOUBLE) * 100.0, 4)
            AS coverage_pct
        FROM b""")),

    // ---- W4: TDD frame correlation / alignment -------------------------
    // The sanctioned correlation UDF, reconstructed from the decoded dump
    // so the oracle can replay the circular-correlation argmax in SQL.
    // Masks are 0/1, so each correlation is a subset-sum of per-sample
    // linear powers: the oracle accumulates in DECIMAL(38,30)
    // (order-independent) while the UDF sums doubles sequentially —
    // argmax-stable because correlation peaks are well-separated.
    "s09_seamf_tdd_sync" -> QueryDef(
      (s, _) => {
        TddSync.syncTraces(pfpTraces(s), "trace")
          .groupBy("frequency", "frame_format")
          .agg(count(lit(1)).as("n"),
            min(col("shift")).as("min_shift"),
            max(col("shift")).as("max_shift"))
          .orderBy("frequency", "frame_format")
      },
      Some(s"""$TddSyncCte
        SELECT frequency, frame_format, COUNT(*) AS n,
          CAST(MIN(shift) AS INT) AS min_shift,
          CAST(MAX(shift) AS INT) AS max_shift
        FROM sel GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- §2.8: incremental seamf ingest -> windowed capture summary ----
    // The landing dir streams through the SAME decode (SeamfStream), then a
    // watermarked 1-minute window aggregates PVT peaks — the incremental
    // formulation of s02. The oracle recomputes the windows batch-side from
    // the decoded dump: streaming-vs-batch parity for the seamf pipeline
    // itself, not just the events fixture.
    "s15_seamf_stream_summary" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s) // oracle reads the dump of the same fixture
        val streamed = graft.streaming.StreamingOps.runToMemory(s,
          graft.seamf.SeamfStream.captureSummaryStream(s, fixture()),
          "s15_mem", outputMode = "complete")
        streamed.select(unix_micros(col("minute")).as("minute_us"),
            col("frequency"), col("peak_dbm"), col("n_traces"))
          .orderBy("minute_us", "frequency")
      },
      Some(s"""SELECT
          CAST(FLOOR(datetime_us / 60000000) AS BIGINT) * 60000000
            AS minute_us,
          frequency, MAX(power_dbm) AS peak_dbm,
          COUNT(DISTINCT file_name || '#' || CAST(datetime_us AS VARCHAR)
            || '#' || detector) AS n_traces
        FROM ${rp("pvt")} GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- S3 stretch: decode-time predicate pruning (VERDICT r5 #7) -----
    // tracesPruned evaluates a (table, time-range, frequency-band)
    // predicate against parsed METADATA: the 4 fixture sweeps outside the
    // 5-minute window skip XZ decompression entirely (accumulator-counted;
    // SeamfSpec asserts the counts), and within decoded files only the psd
    // slots of the two in-band channels are sliced. The oracle applies the
    // SAME predicate as a WHERE clause over the full-decode dump, so a
    // hash match proves pruned-decode ≡ decode-then-filter.
    "s16_seamf_pruned_decode" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s) // oracle reads the dump of the same fixture
        val pruned = SeamfReader.tracesPruned(s, fixture(),
          SeamfReader.TracePrune(tables = Some(Set("psd")),
            maxDatetimeUs = Some(PruneCutUs),
            maxFrequency = Some(PruneMaxFreq)))
        pruned.toDF()
          .groupBy("frequency", "capture_statistic")
          .agg(count(lit(1)).as("n_traces"),
            sum(size(col("trace"))).as("n_points"),
            max(array_max(col("trace"))).as("max_db"),
            min(col("datetime_us")).as("min_dt"),
            max(col("datetime_us")).as("max_dt"))
          .orderBy("frequency", "capture_statistic")
      },
      Some(S16OracleSql)),

    // ---- S12/S13 on the hash surface: lake export round trip ------------
    // exportAll decodes the fixture ONCE (persisted shared scan) and writes
    // all seven products date-partitioned; the query reads the psd product
    // BACK from the partitioned layout (including the derived `date`
    // partition column) and aggregates it. The oracle computes the same
    // aggregation over the full-decode dump, so a hash match proves every
    // decoded row landed in the correct date partition with values intact
    // through the zstd parquet round trip.
    "s17_seamf_lake_roundtrip" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        // fixed path + overwrite, not createTempDirectory (q98 discipline:
        // repeated bench/verify runs must not accumulate /tmp copies)
        val out = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft_lake_roundtrip").toString
        graft.seamf.SeamfLake.exportAll(s, fixture(), out, validate = false)
        s.read.parquet(s"$out/psd")
          // partition date as STRING: a date32 cell normalizes differently
          // from DuckDB's DATE through pandas (datetime.date vs Timestamp)
          .groupBy(date_format(col("date"), "yyyy-MM-dd").as("part_date"),
            col("frequency"), col("capture_statistic"))
          .agg(count(lit(1)).as("n_points"),
            countDistinct(col("datetime")).as("n_captures"),
            min(col("psd_dbm_per_hz")).as("min_db"),
            max(col("psd_dbm_per_hz")).as("max_db"),
            max(col("baseband_hz")).as("max_hz"))
          .orderBy("part_date", "frequency", "capture_statistic")
      },
      Some(s"""SELECT strftime(make_timestamp(datetime_us), '%Y-%m-%d')
            AS part_date,
          frequency, capture_statistic, COUNT(*) AS n_points,
          COUNT(DISTINCT datetime_us) AS n_captures,
          MIN(psd_dbm_per_hz) AS min_db, MAX(psd_dbm_per_hz) AS max_db,
          MAX(baseband_hz) AS max_hz
        FROM ${rp("psd")}
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ---- DataSource V2 surface: format("seamf") with optimizer-driven ----
    // decode pruning (graft.sources.SeamfSource). The predicates below
    // arrive at the scan via SupportsPushDownFilters and prune files from
    // metadata alone (strict bounds exercise the successor/superset push
    // rules); the aggregation shape mirrors s16 so a hash match proves the
    // connector path decodes the same cells as the mapPartitions path the
    // rest of the inventory rides on. Oracle replays over the decoded dump.
    "s18_seamf_dsv2_scan" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s) // oracle reads the dump of the same fixture
        s.read.format("seamf").load(fixture())
          .filter(col("table") === "pvt" &&
            col("datetime_us") > PruneCutUs && col("frequency") > 3.5e9)
          .groupBy("frequency", "detector")
          .agg(count(lit(1)).as("n_traces"),
            sum(size(col("trace"))).as("n_points"),
            max(array_max(col("trace"))).as("max_db"),
            min(col("datetime_us")).as("min_dt"),
            max(col("datetime_us")).as("max_dt"))
          .orderBy("frequency", "detector")
      },
      Some(s"""SELECT frequency, detector,
          COUNT(DISTINCT datetime_us) AS n_traces, COUNT(*) AS n_points,
          MAX(power_dbm) AS max_db,
          MIN(datetime_us) AS min_dt, MAX(datetime_us) AS max_dt
        FROM ${rp("pvt")}
        WHERE datetime_us > $PruneCutUs AND frequency > 3.5e9
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- DSv2 metadata-only path on the hash surface --------------------
    // No trace column in the projection, so SupportsPushDownRequiredColumns
    // turns the whole scan metadata-only: every XZ payload is skipped
    // (SeamfSourceSpec pins the metric; here the RESULT is hash-graded).
    // Capture inventory per channel from trace-slot metadata must agree
    // with the independently decoded channel_metadata dump — including the
    // corrupt-sha member being dropped on both paths.
    "s19_seamf_dsv2_meta_scan" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        s.read.format("seamf").load(fixture())
          .select("datetime_us", "frequency")
          .groupBy("frequency")
          .agg(countDistinct(col("datetime_us")).as("n_captures"),
            min(col("datetime_us")).as("min_dt"),
            max(col("datetime_us")).as("max_dt"))
          .orderBy("frequency")
      },
      Some(s"""SELECT frequency, COUNT(DISTINCT datetime_us) AS n_captures,
          MIN(datetime_us) AS min_dt, MAX(datetime_us) AS max_dt
        FROM ${rp("channel_metadata")}
        GROUP BY 1 ORDER BY 1""")),

    // ---- DSv2 aggregate pushdown on the hash surface --------------------
    // COUNT/MIN/MAX grouped by table push INTO the connector
    // (SupportsPushDownAggregates): each file answers from its offset
    // table and capture list — no payload decode, no per-slot rows
    // (SeamfSourceSpec pins the plan + metrics; here the VALUES are
    // graded). Oracle replays over the slot-level trace_inventory dump,
    // written by the independent mapPartitions decode path.
    "s20_seamf_dsv2_agg_pushdown" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        s.read.format("seamf").load(fixture())
          .groupBy("table")
          .agg(count(lit(1)).as("n_slots"),
            min(col("datetime_us")).as("min_dt"),
            max(col("datetime_us")).as("max_dt"),
            min(col("frequency")).as("min_f"),
            max(col("frequency")).as("max_f"))
          .orderBy("table")
      },
      Some(s"""SELECT "table", COUNT(*) AS n_slots,
          MIN(datetime_us) AS min_dt, MAX(datetime_us) AS max_dt,
          MIN(frequency) AS min_f, MAX(frequency) AS max_f
        FROM ${rp("trace_inventory")}
        GROUP BY 1 ORDER BY 1""")),

    // ---- zip container through the connector (S7 on the DSv2 surface) --
    // The reference's primary input is zip archives of sweeps; the
    // connector enumerates central directories on the driver and scans at
    // MEMBER granularity. COUNT per product pushes into the scan
    // (metadata-only, per the s20 machinery) over the zip members; the
    // oracle replays against the zip_traces dump written by the library's
    // tracesFromZips path over the SAME archive — two independent decode
    // paths, one hash.
    "s21_seamf_dsv2_zip_scan" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        s.read.format("seamf").load(SeamfFixtures.sharedZipArchive())
          .groupBy("table")
          .agg(count(lit(1)).as("n_slots"))
          .orderBy("table")
      },
      Some(s"""SELECT product AS "table", COUNT(*) AS n_slots
        FROM ${rp("zip_traces")}
        GROUP BY 1 ORDER BY 1""")),

    // ---- s01 THROUGH the connector (VERDICT r8 #2) ----------------------
    // The full PSD summary analytic with format("seamf") as the scan: the
    // `table = 'psd'` predicate pushes into the connector and prunes the
    // non-psd slots at decode time (only psd payload ranges are sliced),
    // the trace arrays explode to points engine-side, and the SAME DuckDB
    // oracle as s01 grades the result — optimizer-driven decode pruning
    // exercised by a real analytic, not a probe.
    "s22_seamf_dsv2_psd_summary" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        val w = Window.partitionBy("frequency", "capture_statistic")
        s.read.format("seamf").load(fixture())
          .filter(col("table") === "psd")
          .select(col("frequency"), col("capture_statistic"),
            explode(col("trace")).as("psd_dbm_per_hz"))
          .withColumn("__vmax", max(col("psd_dbm_per_hz")).over(w))
          .withColumn("__lin", lin(col("psd_dbm_per_hz"), col("__vmax")))
          .groupBy("frequency", "capture_statistic")
          .agg(count(lit(1)).as("n"),
            dbMeanAgg(col("__vmax"), col("__lin")).as("db_mean"),
            min(col("psd_dbm_per_hz")).as("db_min"),
            max(col("psd_dbm_per_hz")).as("db_max"))
          .orderBy("frequency", "capture_statistic")
      },
      Some(S01OracleSql)),

    // ---- s02 THROUGH the connector (VERDICT r8 #2) ----------------------
    // capture_summary with the PVT decode on the connector path (pushed
    // `table = 'pvt'` prune) joined to the independently decoded cal
    // metadata dump; s02's oracle grades it cell-for-cell.
    "s23_seamf_dsv2_capture_summary" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        val w = Window.partitionBy("datetime_us", "frequency", "detector")
        val agg = s.read.format("seamf").load(fixture())
          .filter(col("table") === "pvt")
          .select(col("datetime_us"), col("frequency"), col("detector"),
            explode(col("trace")).as("power_dbm"))
          .withColumn("__vmax", max(col("power_dbm")).over(w))
          .withColumn("__lin", lin(col("power_dbm"), col("__vmax")))
          .groupBy("datetime_us", "frequency", "detector")
          .agg(max(col("power_dbm")).as("peak_power"),
            dbMeanAgg(col("__vmax"), col("__lin")).as("mean_power"))
        val piv = agg.groupBy("datetime_us", "frequency")
          .pivot("detector", Seq("peak", "rms"))
          .agg(first(col("peak_power")).as("max"), first(col("mean_power")).as("mean"))
        val cal = dump(s, "channel_metadata")
          .select(col("datetime_us"), col("frequency"), col("overload"),
            col("cal_noise_figure_dB"), col("cal_gain_dB"),
            col("cal_temperature_degC"))
        piv.join(cal, Seq("datetime_us", "frequency"))
          .withColumn("noise_floor_dbm_per_hz",
            round(graft.functions.DbMath.ktbNoiseFloorDbmPerHz(
              col("cal_temperature_degC"), col("cal_noise_figure_dB")), 6))
          .withColumn("overload_sign", when(col("overload"), -1).otherwise(1))
          .orderBy("datetime_us", "frequency")
      },
      Some(S02OracleSql)),

    // ---- s16 THROUGH the connector (VERDICT r8 #2) ----------------------
    // The pruned-decode analytic where ALL THREE predicates push: `table`
    // membership, the inclusive datetime bound, and the inclusive
    // frequency bound fold exactly into the scan's TracePrune, so sweeps
    // outside the window never decompress — and the s16 oracle proves
    // pruned-decode ≡ decode-then-filter on the connector path too.
    "s24_seamf_dsv2_pruned_decode" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        s.read.format("seamf").load(fixture())
          .filter(col("table") === "psd" &&
            col("datetime_us") <= PruneCutUs &&
            col("frequency") <= PruneMaxFreq)
          .groupBy("frequency", "capture_statistic")
          .agg(count(lit(1)).as("n_traces"),
            sum(size(col("trace"))).as("n_points"),
            max(array_max(col("trace"))).as("max_db"),
            min(col("datetime_us")).as("min_dt"),
            max(col("datetime_us")).as("max_dt"))
          .orderBy("frequency", "capture_statistic")
      },
      Some(S16OracleSql)),

    // ---- s15 THROUGH the connector (VERDICT r8 #4) ----------------------
    // readStream.format("seamf"): the connector's MicroBatchStream treats
    // the landing dir's file arrivals (90 s schedule cadence) as offsets —
    // one long per checkpoint, zip members expanded per batch — feeding
    // the same watermarked 1-minute capture summary as s15. The oracle
    // recomputes the windows batch-side from the decoded dump, so this is
    // streaming-vs-batch parity for the CONNECTOR ingest path.
    "s25_seamf_dsv2_stream" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        val summary = s.readStream.format("seamf").load(fixture())
          .filter(col("table") === "pvt")
          .withColumn("datetime", timestamp_micros(col("datetime_us")))
          .withWatermark("datetime", "10 minutes")
          .groupBy(window(col("datetime"), "1 minute"), col("frequency"))
          .agg(max(array_max(col("trace"))).as("peak_dbm"),
            count(lit(1)).as("n_traces"))
          .select(col("window.start").as("minute"), col("frequency"),
            col("peak_dbm"), col("n_traces"))
        graft.streaming.StreamingOps.runToMemory(s, summary,
            "s25_mem", outputMode = "complete")
          .select(unix_micros(col("minute")).as("minute_us"),
            col("frequency"), col("peak_dbm"), col("n_traces"))
          .orderBy("minute_us", "frequency")
      },
      Some(s"""SELECT
          CAST(FLOOR(datetime_us / 60000000) AS BIGINT) * 60000000
            AS minute_us,
          frequency, MAX(power_dbm) AS peak_dbm,
          COUNT(DISTINCT file_name || '#' || CAST(datetime_us AS VARCHAR)
            || '#' || detector) AS n_traces
        FROM ${rp("pvt")} GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- streaming decode pruning (SeamfStreamingPrune) ----------------
    // The same metadata inventory as s20, but STREAMED: Spark never runs
    // V2ScanRelationPushDown for streaming scans, so without the graft
    // optimizer rule this query would decompress every XZ payload just to
    // read slot metadata. SeamfStreamingPrune swaps the relation's
    // scan+stream for a pruned clone per micro-batch — `trace` never
    // decodes, the `table` membership folds into the decode prune — and
    // the oracle replays over the independently decoded trace_inventory
    // dump, so the rewrite is hash-graded, not just plan-asserted
    // (SeamfSourceSpec pins the plan shape).
    "s26_seamf_dsv2_stream_pruned" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        val counts = s.readStream.format("seamf").load(fixture())
          .filter(col("table").isin("psd", "pvt"))
          .groupBy("table")
          .agg(count(lit(1)).as("n_slots"),
            min(col("datetime_us")).as("min_dt"),
            max(col("datetime_us")).as("max_dt"))
        graft.streaming.StreamingOps.runToMemory(s, counts, "s26_mem",
            outputMode = "complete")
          .orderBy("table")
      },
      Some(s"""SELECT "table", COUNT(*) AS n_slots,
          MIN(datetime_us) AS min_dt, MAX(datetime_us) AS max_dt
        FROM ${rp("trace_inventory")}
        WHERE "table" IN ('psd', 'pvt') GROUP BY 1 ORDER BY 1""")),

    // ---- the connector on the SQL surface (CREATE TABLE USING seamf) ---
    // The full DDL story: a catalog table over the archive directory, so
    // plain SQL users query sweeps with zero Scala — and every connector
    // optimization still applies (this aggregation pushes into the scan
    // exactly as s20's DataFrame form does; the EXPLAIN shape is pinned by
    // SeamfSourceSpec). Oracle replays over the independently decoded
    // slot inventory.
    "s27_seamf_sql_table" -> QueryDef(
      (s, _) => {
        SeamfDump.ensure(s)
        s.sql("DROP TABLE IF EXISTS seamf_sweeps")
        s.sql(s"CREATE TABLE seamf_sweeps USING seamf " +
          s"OPTIONS (path '${fixture()}')")
        s.sql("""SELECT `table`, COUNT(*) AS n_slots,
            MIN(frequency) AS min_f, MAX(frequency) AS max_f
          FROM seamf_sweeps GROUP BY 1 ORDER BY 1""")
      },
      Some(s"""SELECT "table", COUNT(*) AS n_slots,
          MIN(frequency) AS min_f, MAX(frequency) AS max_f
        FROM ${rp("trace_inventory")} GROUP BY 1 ORDER BY 1"""))
  )

  /** pfp rms/mean traces reconstructed from the decoded dump: one row per
    * trace with the `array<float>` dB trace in frame order.
    */
  private def pfpTraces(s: SparkSession): DataFrame =
    dump(s, "pfp")
      .filter(col("detector") === "rms" && col("capture_statistic") === "mean")
      .groupBy("file_name", "datetime_us", "frequency")
      .agg(array_sort(collect_list(struct(col("frame_s"), col("power_dbm"))))
        .as("sp"))
      .select(col("file_name"), col("datetime_us"), col("frequency"),
        transform(col("sp"), x => x.getField("power_dbm")).as("trace"))

  /** Shared oracle CTE chain: per-trace circular-correlation argmax over the
    * two TDD mask templates (mirrors TddSync.correlate — t-then-lag scan
    * order, strict > = first maximal (t, lag) wins -> ORDER BY corr DESC,
    * t, lag). acc = sum_j lin[(j+lag)%n]*tpl[j] re-indexed to
    * sum_m lin[m]*tpl[(m-lag+n)%n] so each sample row contributes once.
    * Ends with `sel`: (file_name, datetime_us, frequency, frame_format,
    * shift) plus sample CTE `s` in scope.
    */
  private def TddSyncCte: String =
    s"""WITH p AS (SELECT file_name, datetime_us, frequency, frame_s,
        power_dbm FROM ${rp("pfp")}
        WHERE detector = 'rms' AND capture_statistic = 'mean'),
      s AS (SELECT file_name, datetime_us, frequency,
          CAST(ROW_NUMBER() OVER (PARTITION BY file_name, datetime_us,
            frequency ORDER BY frame_s) - 1 AS INT) AS m,
          POW(10.0, power_dbm / 10.0) AS lin,
          CAST(COUNT(*) OVER (PARTITION BY file_name, datetime_us, frequency)
            AS INT) AS n
        FROM p),
      lags AS (SELECT CAST(unnest(range(0, 112)) AS INT) AS lag),
      tpls AS (SELECT CAST(unnest(range(0, 2)) AS INT) AS t),
      c0 AS (SELECT s.file_name, s.datetime_us, s.frequency, tt.t, l.lag,
          s.lin,
          CAST((s.m - l.lag + s.n) % s.n AS DOUBLE) / s.n AS frac
        FROM s CROSS JOIN lags l CROSS JOIN tpls tt WHERE l.lag < s.n),
      acc AS (SELECT file_name, datetime_us, frequency, t, lag,
          SUM(CAST(lin * (CASE WHEN t = 0 THEN
              CASE WHEN frac < 0.6 OR (frac >= 0.7 AND frac < 0.8)
                THEN 1.0 ELSE 0.0 END
            ELSE
              CASE WHEN frac < 0.3 OR (frac >= 0.5 AND frac < 0.8)
                THEN 1.0 ELSE 0.0 END
            END) AS DECIMAL(38,30))) AS corr
        FROM c0 GROUP BY 1, 2, 3, 4, 5),
      best AS (SELECT file_name, datetime_us, frequency, t, lag,
          ROW_NUMBER() OVER (PARTITION BY file_name, datetime_us, frequency
            ORDER BY corr DESC, t, lag) AS rk
        FROM acc),
      sel AS (SELECT file_name, datetime_us, frequency,
          t AS frame_format, lag AS shift
        FROM best WHERE rk = 1)"""
}
