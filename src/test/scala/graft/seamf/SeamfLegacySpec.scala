package graft.seamf

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Legacy schema generations (v1-v3): fixed TRACE_INFO layout, explicit-tz
  * requirement, and the v2/v3 two-trace APD (probability percentiles +
  * amplitudes zipped into the tabular form, seamf.py:541-570).
  */
class SeamfLegacySpec extends SparkSpec {

  private lazy val dirV2: String = {
    val d = Files.createTempDirectory("graft_legacy_v2").toString
    val t0 = SeamfMetadata.isoToMicros("2022-11-01T00:00:00Z")
    (0 until 3).foreach(i =>
      SeamfFixtures.writeLegacySweep(java.nio.file.Paths.get(d), gen = 2,
        fileIdx = i, t0Us = t0 + i * 90L * 1000000L))
    d
  }

  test("v2 decode requires an explicit timezone") {
    // permissive mode: every file fails tz resolution -> zero rows
    assert(SeamfReader.sweepMetadata(spark, dirV2).count() === 0)
    val ok = SeamfReader.sweepMetadata(spark, dirV2, tz = Some("America/New_York"))
    assert(ok.count() === 3)
    assert(ok.head().getAs[Int]("schema_generation") === 2)
  }

  test("v2 layout: 12 traces per capture, no declared data products") {
    val tr = SeamfReader.traces(spark, dirV2, tz = Some("UTC"))
    assert(tr.count() === 3L * 2 * 12) // 3 files x 2 ch x (2+2+6+2) traces
    val tables = tr.toDF().select("table").distinct()
      .collect().map(_.getString(0)).toSet
    assert(tables === Set("psd", "pvt", "pfp", "apd_prob", "apd_amp"))
  }

  test("v2/v3 APD zips probability and amplitude traces into tabular form") {
    val apd = SeamfReader.tables(spark, dirV2, tz = Some("UTC"))("apd")
    assert(apd.count() === 3L * 2 * 151)
    val row = apd.filter(col("frequency") === 3.555e9)
      .orderBy("datetime").limit(151).orderBy("probability_pct").head()
    // amplitude comes from the amplitude TRACE (trace idx 11), probability
    // from the percentile trace (idx 10) — not from a synthetic axis
    val expAmp = HalfFloat.toFloat(
      HalfFloat.fromFloat(SeamfFixtures.sampleValue(0, 11, 96)) & 0xffff)
    val expProb = HalfFloat.toFloat(
      HalfFloat.fromFloat(SeamfFixtures.sampleValue(0, 10, 96)) & 0xffff)
    assert(row.getAs[Double]("amplitude_dbm") === expAmp.toDouble)
    assert(row.getAs[Float]("probability_pct") === expProb)
  }

  test("annotation-derived channel metadata and pfp detectors (v1 loader semantics)") {
    val cm = SeamfReader.channelMetadata(spark, dirV2, tz = Some("UTC"))
      .orderBy("file", "frequency").collect()
    assert(cm.length === 6)
    // CalibrationAnnotation gain_sensor -> cal_gain_dB per channel
    assert(cm(0).getAs[Double]("cal_gain_dB") === 30.0)
    assert(cm(1).getAs[Double]("cal_gain_dB") === 30.5)
    assert(cm(0).getAs[Double]("cal_noise_figure_dB") === 5.0)
    assert(cm(0).getAs[Double]("sigan_attenuation_dB") === 0.0)
    // legacy PFP detectors are rms/peak, not the v5+ mean/max
    val dets = SeamfReader.traces(spark, dirV2, tz = Some("UTC")).toDF()
      .filter(org.apache.spark.sql.functions.col("table") === "pfp")
      .select("detector").distinct().collect().map(_.getString(0)).toSet
    assert(dets === Set("rms", "peak"))
  }

  test("v1 layout has no APD") {
    val d = Files.createTempDirectory("graft_legacy_v1").toString
    SeamfFixtures.writeLegacySweep(java.nio.file.Paths.get(d), gen = 1,
      fileIdx = 0, t0Us = SeamfMetadata.isoToMicros("2022-11-01T00:00:00Z"))
    val tr = SeamfReader.traces(spark, d, tz = Some("UTC"))
    assert(tr.count() === 2L * 10) // 2 ch x (2 psd + 2 pvt + 6 pfp)
    val apd = SeamfReader.tables(spark, d, tz = Some("UTC"))("apd")
    assert(apd.count() === 0)
  }
}
