package graft.seamf

import org.scalatest.funsuite.AnyFunSuite

class SeamfMetadataSpec extends AnyFunSuite {
  private val shape = SeamfFixtures.Shape()
  private def metaJson(idx: Int = 0, nCh: Int = 3): String =
    SeamfFixtures.buildMetaJson(idx,
      SeamfMetadata.isoToMicros("2023-09-21T00:00:00Z"), nCh, shape, "ab" * 64)

  test("parses v6 metadata: version, captures, schedule") {
    val m = SeamfMetadata.parse(metaJson())
    assert(m.version === "0.6.0")
    assert(m.schemaGeneration === 6)
    assert(m.captures.size === 3)
    assert(m.numChannels === 3)
    assert(m.scheduleIntervalSec === Some(90L))
    assert(m.task === Some(7000L))
    assert(m.captures.head.frequency === 3.555e9)
    assert(m.captures(1).datetimeUs - m.captures.head.datetimeUs === 1000000L)
    assert(m.captures.head.calGainDb === Some(30.0))
    assert(m.diagnostics.contains("diagnostics.preselector.noise_diode_temp"))
  }

  test("derives absolute trace slots from declared data products") {
    val m = SeamfMetadata.parse(metaJson())
    assert(m.slots.size === 3 * (2 + 2 + 6 + 1))
    val cap0 = m.slots.filter(_.captureIdx == 0)
    // PSD statistics normalized maximum->max; declared baseband axis
    assert(cap0(0) === SeamfMetadata.TraceSlot(0, 0L, shape.psdLen,
      "psd", "max", "", -4.992e6, 16e3))
    assert(cap0(1).captureStatistic === "mean")
    // PVT detectors normalized maximum->peak, mean->rms
    assert(cap0(2).table === "pvt" && cap0(2).detector === "peak")
    assert(cap0(3).detector === "rms")
    // PFP series split detector_statistic, both tokens normalized
    // (reference _trace_index, seamf.py:118-127)
    assert(cap0(4).table === "pfp" && cap0(4).captureStatistic === "min" &&
      cap0(4).detector === "rms")
    assert(cap0(7).detector === "peak" && cap0(7).captureStatistic === "min")
    // APD amplitude axis from y declaration
    assert(cap0.last.table === "apd" && cap0.last.axisStart === -180.0 &&
      cap0.last.axisStep === 1.0)
    // contiguous offsets; capture 1 starts where capture 0 ends
    assert(cap0.last.start + cap0.last.length === shape.perCapture.toLong)
    assert(m.slots.filter(_.captureIdx == 1).head.start === shape.perCapture.toLong)
    assert(m.requiredLength === 3L * shape.perCapture)
  }

  test("normalization maps match reference semantics (plus the maximum->peak fix)") {
    assert(SeamfMetadata.normalizeStatistic("maximum") === "max")
    assert(SeamfMetadata.normalizeStatistic("minimum") === "min")
    assert(SeamfMetadata.normalizeStatistic("mean") === "mean")
    assert(SeamfMetadata.normalizeDetector("max") === "peak")
    assert(SeamfMetadata.normalizeDetector("mean") === "rms")
    // reference's replace map misses the v5/v6 PVT "maximum" token
    // (documented engine deviation: normalize it too)
    assert(SeamfMetadata.normalizeDetector("maximum") === "peak")
  }

  test("timezone from longitude uses the reference's crude bands (seamf.py:37-46)") {
    val m = SeamfMetadata.parse(metaJson())
    assert(m.timezone === Some("America/Denver")) // lng -105.26
    assert(SeamfMetadata.timezoneFromLongitude(-117.5) === Some("America/Los_Angeles"))
    assert(SeamfMetadata.timezoneFromLongitude(-75.0) === Some("America/Boston"))
    // out-of-band longitudes are unresolvable (reference returns None)
    assert(SeamfMetadata.timezoneFromLongitude(-120.0) === None)
    assert(SeamfMetadata.timezoneFromLongitude(100.0) === None)
  }

  test("explicit tz overrides inference") {
    val m = SeamfMetadata.parse(metaJson(), Some("UTC"))
    assert(m.timezone === Some("UTC"))
  }

  test("files without geolocation require an explicit tz (ValueError parity)") {
    val t0 = SeamfMetadata.isoToMicros("2022-11-01T00:00:00Z")
    val legacy = SeamfFixtures.buildV2MetaJson(0, t0, 2,
      SeamfFixtures.LegacyShape(), "ab" * 64)
    intercept[IllegalArgumentException] { SeamfMetadata.parse(legacy) }
    val ok = SeamfMetadata.parse(legacy, Some("America/New_York"))
    assert(ok.schemaGeneration === 2)
    assert(ok.version === "v0.2")
    assert(ok.timezone === Some("America/New_York"))
  }

  test("version dispatch matches select_loader (seamf.py:927-978)") {
    val t0 = SeamfMetadata.isoToMicros("2022-11-01T00:00:00Z")
    val sh = SeamfFixtures.LegacyShape()
    // dict extensions without the nasctn key -> v1
    val v1 = SeamfMetadata.parse(
      SeamfFixtures.buildV1MetaJson(0, t0, 2, sh, "ab" * 64), Some("UTC"))
    assert(v1.schemaGeneration === 1 && v1.version === "v0.1")
    val v3 = SeamfMetadata.parse(
      SeamfFixtures.buildV3MetaJson(0, t0, 2, sh, "ab" * 64), Some("UTC"))
    assert(v3.schemaGeneration === 3)
    // unknown version string -> error (reference ValueError)
    val bad = SeamfFixtures.buildV2MetaJson(0, t0, 2, sh, "ab" * 64)
      .replace("\"ntia-nasctn-sea\":\"v0.2\"", "\"ntia-nasctn-sea\":\"v9.9\"")
    intercept[IllegalArgumentException] { SeamfMetadata.parse(bad, Some("UTC")) }
  }

  test("v5 JSON type-tag patch injects msgspec tags") {
    val raw = """{"a": {"filter_type": "IIR"}, "b": {"samples": 875}}"""
    val patched = SeamfMetadata.patchV5Json(raw)
    assert(patched.contains("\"type\": \"DigitalFilter\""))
    assert(patched.contains("\"type\": \"DFT\""))
  }

  test("iso8601 parse handles Z, fractional seconds, and explicit offsets") {
    assert(SeamfMetadata.isoToMicros("2023-09-21T00:00:00Z") ===
      1695254400000000L)
    assert(SeamfMetadata.isoToMicros("2023-09-21T00:00:00.123456Z") ===
      1695254400123456L)
    // negative UTC offset (ADVICE r1): -04:00 means 04:00:00 UTC
    assert(SeamfMetadata.isoToMicros("2023-01-01T00:00:00-04:00") ===
      SeamfMetadata.isoToMicros("2023-01-01T04:00:00Z"))
    assert(SeamfMetadata.isoToMicros("2023-01-01T12:00:00+05:30") ===
      SeamfMetadata.isoToMicros("2023-01-01T06:30:00Z"))
  }
}
