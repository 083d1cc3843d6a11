package graft.seamf

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden-file decode tests against the reference's six REAL example files
  * (/root/reference/demos/data/example_v{1..6}.sigmf — the same files its
  * own tests decode, /root/reference/tests/test_seamf.py:16-34).
  *
  * These validate the full version dispatch + offset-table derivation
  * against reality, not self-authored fixtures. The strongest anchor is
  * external: metadata's declared `ntia-nasctn-sea:max_of_max_channel_powers`
  * (written by the original sensor pipeline) must equal the max over each
  * channel's decoded peak-detector PVT trace — if any offset, label, or
  * half-float decode step were wrong, they would not match.
  */
class SeamfGoldenSpec extends SparkSpec {

  private val goldenDir = "/root/reference/demos/data"
  private def golden(v: Int): String = s"$goldenDir/example_v$v.sigmf"

  private def decodeOne(v: Int, tz: Option[String] = None): SeamfReader.Decoded = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(golden(v)))
    SeamfReader.decodeFile(golden(v), bytes, tz, decodePayload = true,
      checkHash = true)
  }

  // (gen, nCaptures, nTabularTraces, firstFreq, firstDatetimeUs)
  private val expected = Map(
    1 -> ((15, 150, 3.555e9, 1666832432264000L)),
    2 -> ((15, 150, 3.555e9, 1674491700106000L)),
    3 -> ((15, 150, 3.555e9, 1676398296015000L)),
    4 -> ((15, 165, 3.555e9, 1680300058735000L)),
    5 -> ((17, 187, 3.545e9, 1687794254137000L)),
    6 -> ((17, 187, 3.545e9, 1694973546672000L)))

  test("all six golden files decode with sha512 ok and correct dispatch") {
    for (v <- 1 to 6) {
      val d = decodeOne(v, tz = if (v <= 3) Some("America/New_York") else None)
      val (nCaps, _, freq0, dt0) = expected(v)
      assert(d.sweep.schema_generation === v, s"v$v dispatch")
      assert(d.sweep.sha512_ok, s"v$v sha512")
      assert(d.sweep.n_captures === nCaps, s"v$v captures")
      assert(d.sweep.sample_rate === 14e6, s"v$v sample_rate")
      val first = d.channels.minBy(_.datetime_us)
      assert(first.frequency === freq0, s"v$v first frequency")
      assert(first.datetime_us === dt0, s"v$v first datetime")
    }
  }

  test("v1-v3 require an explicit timezone; v4+ infer Denver from geolocation") {
    for (v <- 1 to 3)
      intercept[IllegalArgumentException] { decodeOne(v) } // ValueError parity
    for (v <- 4 to 6)
      assert(decodeOne(v).sweep.timezone === Some("America/Denver"), s"v$v tz")
  }

  test("per-version trace tables, lengths, and normalized labels") {
    for (v <- 1 to 6) {
      val d = decodeOne(v, tz = if (v <= 3) Some("UTC") else None)
      val (nCaps, nTabular, _, _) = expected(v)
      val tabular = d.traces.filter(t => Set("psd", "pvt", "pfp", "apd")(t.table))
      assert(tabular.size === nTabular, s"v$v tabular trace count")
      // per-table trace counts and lengths (production 625/400/560/151 shape)
      def count(tab: String) = tabular.count(_.table == tab)
      assert(count("psd") === 2 * nCaps, s"v$v psd")
      assert(count("pvt") === 2 * nCaps, s"v$v pvt")
      assert(count("pfp") === 6 * nCaps, s"v$v pfp")
      assert(count("apd") === (if (v >= 4) nCaps else 0), s"v$v apd")
      assert(tabular.filter(_.table == "psd").forall(_.trace.length == 625))
      assert(tabular.filter(_.table == "pvt").forall(_.trace.length == 400))
      assert(tabular.filter(_.table == "pfp").forall(_.trace.length == 560))
      // normalized label sets unify across ALL generations (incl the v5/v6
      // "maximum" PVT token the reference leaves raw)
      assert(tabular.filter(_.table == "psd").map(_.capture_statistic).toSet
        === Set("max", "mean"), s"v$v psd stats")
      assert(tabular.filter(_.table == "pvt").map(_.detector).toSet
        === Set("peak", "rms"), s"v$v pvt detectors")
      assert(tabular.filter(_.table == "pfp")
        .map(t => (t.capture_statistic, t.detector)).toSet
        === (for (st <- Set("min", "max", "mean"); dt <- Set("peak", "rms"))
          yield (st, dt)), s"v$v pfp labels")
      // the legacy APD pair decodes as apd_prob/apd_amp (engine extension)
      if (v <= 3) {
        assert(d.traces.count(_.table == "apd_prob") === nCaps, s"v$v apd_prob")
        assert(d.traces.count(_.table == "apd_amp") === nCaps, s"v$v apd_amp")
      }
    }
  }

  test("unified baseband PSD axis and time axes across generations") {
    for (v <- 1 to 6) {
      val d = decodeOne(v, tz = if (v <= 3) Some("UTC") else None)
      val psd = d.traces.find(_.table == "psd").get
      assert(psd.axis_start === -4.992e6, s"v$v psd start")
      assert(psd.axis_step === 16e3, s"v$v psd step")
      val pvt = d.traces.find(_.table == "pvt").get
      assert(pvt.axis_start === 0.0 && math.abs(pvt.axis_step - 0.01) < 1e-12,
        s"v$v pvt axis")
      val pfp = d.traces.find(_.table == "pfp").get
      assert(math.abs(pfp.axis_step - 4.0 / 560 / 400) < 1e-18, s"v$v pfp axis")
      if (v >= 4) {
        val apd = d.traces.find(_.table == "apd").get
        assert(apd.axis_start === -180.0 && apd.axis_step === 1.0, s"v$v apd axis")
      }
    }
  }

  test("pinned first-capture PSD max-trace values (half->float widening)") {
    val pins = Map(
      1 -> Seq(-159.875f, -159.625f, -159.875f),
      2 -> Seq(-161.5f, -159.625f, -159.75f),
      3 -> Seq(-160.875f, -159.25f, -158.5f),
      4 -> Seq(-157.75f, -155.375f, -154.75f),
      5 -> Seq(-158.625f, -157.375f, -157.375f),
      6 -> Seq(-160.375f, -159.25f, -158.375f))
    for (v <- 1 to 6) {
      val d = decodeOne(v, tz = if (v <= 3) Some("UTC") else None)
      val firstUs = d.channels.map(_.datetime_us).min
      val trace = d.traces
        .find(t => t.table == "psd" && t.capture_statistic == "max" &&
          t.datetime_us == firstUs).get.trace
      assert(trace.take(3).toSeq === pins(v), s"v$v pinned psd values")
    }
  }

  test("declared max_of_max_channel_powers equals max over decoded peak PVT " +
    "traces (v4+, external end-to-end anchor)") {
    for (v <- 4 to 6) {
      val d = decodeOne(v)
      val declared = d.sweep.max_of_max_channel_powers
      assert(declared.nonEmpty, s"v$v declared powers present")
      // order traces by capture datetime (capture declaration order)
      val recomputed = d.traces
        .filter(t => t.table == "pvt" && t.detector == "peak")
        .sortBy(_.datetime_us)
        .map(_.trace.max.toDouble)
      assert(recomputed.size === declared.size, s"v$v channel count")
      declared.zip(recomputed).zipWithIndex.foreach { case ((dec, rec), i) =>
        assert(dec === rec, s"v$v channel $i declared=$dec recomputed=$rec")
      }
    }
  }

  test("golden files read end-to-end through the Spark reader") {
    val tr = SeamfReader.traces(spark, goldenDir, tz = Some("UTC"))
    // v1-v3 decode with the explicit tz; v4+ would too (explicit wins)
    assert(tr.count() === (150 + 150 + 150 + 165 + 187 + 187) +
      3 * 2 * 15) // tabular + legacy apd pairs
    val perGen = SeamfReader.sweepMetadata(spark, goldenDir, tz = Some("UTC"))
      .select("schema_generation").collect().map(_.getInt(0)).sorted
    assert(perGen.toSeq === Seq(1, 2, 3, 4, 5, 6))
  }
}
