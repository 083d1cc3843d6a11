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

  test("derives the per-capture trace layout from declared data products") {
    val m = SeamfMetadata.parse(metaJson())
    val l = m.perCaptureLayout
    assert(l.size === 2 + 2 + 6 + 1)
    // PSD statistics normalized maximum->max
    assert(l(0) === SeamfMetadata.TraceInfo("psd", "max", "", shape.psdLen, -4.992e6, 16e3))
    assert(l(1).captureStatistic === "mean")
    // PVT detectors normalized maximum->peak, mean->rms
    assert(l(2) === SeamfMetadata.TraceInfo("pvt", "", "peak", shape.pvtLen, 0.0, 0.01))
    assert(l(3).detector === "rms")
    // PFP series split detector_statistic; detector NOT peak/rms-normalized
    assert(l(4) === SeamfMetadata.TraceInfo("pfp", "min", "mean", shape.pfpLen, 0.0, 1.7857e-5))
    assert(l(7).detector === "max" && l(7).captureStatistic === "min")
    // APD amplitude axis from y declaration
    assert(l.last === SeamfMetadata.TraceInfo("apd", "", "", shape.apdLen, -180.0, 1.0))
    assert(m.perCaptureLength === shape.perCapture)
  }

  test("normalization maps match reference semantics") {
    assert(SeamfMetadata.normalizeStatistic("maximum") === "max")
    assert(SeamfMetadata.normalizeStatistic("minimum") === "min")
    assert(SeamfMetadata.normalizeStatistic("mean") === "mean")
    assert(SeamfMetadata.normalizeDetector("max") === "peak")
    assert(SeamfMetadata.normalizeDetector("mean") === "rms")
  }

  test("timezone inferred from geolocation longitude bands") {
    val m = SeamfMetadata.parse(metaJson())
    assert(m.timezone === Some("America/Denver")) // lng -105.26
    assert(SeamfMetadata.timezoneFromLongitude(-120) === Some("America/Los_Angeles"))
    assert(SeamfMetadata.timezoneFromLongitude(-75) === Some("America/New_York"))
    assert(SeamfMetadata.timezoneFromLongitude(2.35) === None)
  }

  test("explicit tz overrides inference") {
    val m = SeamfMetadata.parse(metaJson(), Some("UTC"))
    assert(m.timezone === Some("UTC"))
  }

  test("v1-v3 metadata without explicit tz raises (reference ValueError parity)") {
    val legacy = metaJson().replace("\"version\":\"0.6.0\"", "\"version\":\"0.2.0\"")
      .replace("\"version\" : \"0.6.0\"", "\"version\" : \"0.2.0\"")
    assert(legacy.contains("0.2.0"))
    intercept[IllegalArgumentException] {
      SeamfMetadata.parse(legacy)
    }
    val ok = SeamfMetadata.parse(legacy, Some("America/New_York"))
    assert(ok.schemaGeneration === 2)
    // legacy layout is the fixed TRACE_INFO table
    assert(ok.perCaptureLayout.count(_.table === "psd") === 2)
    assert(ok.perCaptureLayout.count(_.table === "pfp") === 6)
    // v2/v3 APD: probability + amplitude trace pair (seamf.py:541-570)
    assert(ok.perCaptureLayout.exists(t => t.table === "apd_prob" && t.length === 151))
    assert(ok.perCaptureLayout.exists(t => t.table === "apd_amp" && t.length === 151))
  }

  test("v5 JSON type-tag patch injects msgspec tags") {
    val raw = """{"a": {"filter_type": "IIR"}, "b": {"samples": 875}}"""
    val patched = SeamfMetadata.patchV5Json(raw)
    assert(patched.contains("\"type\": \"DigitalFilter\""))
    assert(patched.contains("\"type\": \"DFT\""))
  }

  test("iso8601 parse handles trailing Z and fractional seconds") {
    assert(SeamfMetadata.isoToMicros("2023-09-21T00:00:00Z") ===
      1695254400000000L)
    assert(SeamfMetadata.isoToMicros("2023-09-21T00:00:00.123456Z") ===
      1695254400123456L)
  }
}
