package graft.seamf

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** v4 generation: object-style data_products with `traces` label objects
  * and a tabular APD (Metadata0_4, schemas.py:162-222; axes per
  * `_Loader_v4`, seamf.py:694-735).
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
    e.put("name", "ntia-nasctn-sea"); e.put("version", "v0.4")
    val geo = g.putObject("core:geolocation")
    val coords = geo.putArray("coordinates"); coords.add(-105.0); coords.add(40.0)
    val dp = g.putObject("ntia-algorithm:data_products")
    val psd = dp.putObject("power_spectral_density")
    psd.put("length", 625)
    psd.put("samples", 875)
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
    for (det <- Seq("mean", "max"); st <- Seq("minimum", "maximum", "mean")) {
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
    cap.put("ntia-sensor:duration", 4000.0)
    mapper.writeValueAsString(root)
  }

  test("v4 object-style data products derive the layout with keymapped labels") {
    val m = SeamfMetadata.parse(v4Json)
    assert(m.schemaGeneration === 4)
    val l = m.slots
    assert(l.size === 2 + 2 + 6 + 1)
    // psd statistic normalized maximum->max; baseband axis from
    // sample_rate/fft_samples (seamf.py:725-729; engine -(n/2)*step start)
    assert(l(0) === SeamfMetadata.TraceSlot(0, 0L, 625, "psd", "max", "",
      -4.992e6, 16e3))
    // pvt detector normalized max->peak, mean->rms; step = duration/length
    assert(l(2).detector === "peak" && l(2).axisStep === 0.01)
    assert(l(3).detector === "rms")
    // pfp detectors normalized mean->rms, max->peak (reference _trace_index
    // applies the detector replace map to every table, seamf.py:118-127)
    assert(l(4).table === "pfp" && l(4).captureStatistic === "min" &&
      l(4).detector === "rms")
    assert(l(7).detector === "peak" && l(7).captureStatistic === "min")
    assert(math.abs(l(4).axisStep - 4.0 / 560 / 400) < 1e-18)
    // tabular APD amplitude axis from min/bin declarations
    assert(l.last === SeamfMetadata.TraceSlot(0, (2 * 625 + 2 * 400 + 6 * 560).toLong,
      151, "apd", "", "", -180.0, 1.0))
    assert(m.requiredLength === 2 * 625 + 2 * 400 + 6 * 560 + 151)
  }
}
