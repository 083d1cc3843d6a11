package graft.seamf

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** v4 generation: object-style data_products with `traces` label objects
  * and a tabular APD (Metadata0_4, schemas.py:162-222).
  */
class SeamfV4Spec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def v4Json: String = {
    val root = mapper.createObjectNode()
    val g = root.putObject("global")
    g.put("core:version", "1.0.0")
    g.put("core:sample_rate", 14e6)
    g.put("core:num_channels", 1)
    val ext = g.putArray("core:extensions")
    val e = ext.addObject()
    e.put("name", "ntia-nasctn-sea"); e.put("version", "0.4.0")
    val geo = g.putObject("core:geolocation")
    val coords = geo.putArray("coordinates"); coords.add(-105.0); coords.add(40.0)
    val dp = g.putObject("ntia-algorithm:data_products")
    val psd = dp.putObject("power_spectral_density")
    psd.put("length", 625)
    val psdTr = psd.putArray("traces")
    psdTr.addObject().put("statistic", "maximum")
    psdTr.addObject().put("statistic", "mean")
    val pvt = dp.putObject("time_series_power")
    pvt.put("length", 400)
    val pvtTr = pvt.putArray("traces")
    pvtTr.addObject().put("detector", "max")
    pvtTr.addObject().put("detector", "mean")
    val pfp = dp.putObject("periodic_frame_power")
    pfp.put("length", 560)
    val pfpTr = pfp.putArray("traces")
    for (det <- Seq("rms", "peak"); st <- Seq("minimum", "maximum", "mean")) {
      val o = pfpTr.addObject(); o.put("detector", det); o.put("statistic", st)
    }
    val apd = dp.putObject("amplitude_probability_distribution")
    apd.put("length", 151)
    apd.put("min_amplitude", -180.0)
    apd.put("amplitude_bin_size", 1.0)
    val caps = root.putArray("captures")
    val cap = caps.addObject()
    cap.put("core:frequency", 3.555e9)
    cap.put("core:datetime", "2023-01-01T00:00:00Z")
    cap.put("core:sample_start", 0L)
    mapper.writeValueAsString(root)
  }

  test("v4 object-style data products derive the layout with keymapped labels") {
    val m = SeamfMetadata.parse(v4Json)
    assert(m.schemaGeneration === 4)
    val l = m.perCaptureLayout
    assert(l.size === 2 + 2 + 6 + 1)
    // psd statistic normalized maximum->max
    assert(l(0) === SeamfMetadata.TraceInfo("psd", "max", "", 625, -5e6, 10e6 / 625))
    // pvt detector normalized max->peak, mean->rms
    assert(l(2).detector === "peak" && l(3).detector === "rms")
    // pfp keeps raw detector, normalizes statistic
    assert(l(4) === SeamfMetadata.TraceInfo("pfp", "min", "rms", 560, 0.0, 0.01 / 560))
    // tabular APD amplitude axis from min/bin declarations
    assert(l.last === SeamfMetadata.TraceInfo("apd", "", "", 151, -180.0, 1.0))
    assert(m.perCaptureLength === 2 * 625 + 2 * 400 + 6 * 560 + 151)
  }
}
