package graft.seamf

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Versioned seamf metadata model + trace-layout derivation.
  *
  * The reference parses 5 metadata schema generations with msgspec structs
  * (/root/reference/src/sea_ingest/schemas.py:105-358) dispatched by
  * `select_loader` (seamf.py:927-978) on the `ntia-nasctn-sea` /
  * `ntia-sensor` extension version. We re-express the same semantics as a
  * Scala ADT + a Jackson tree-model parse (jackson ships with Spark): the
  * output of parsing is a [[SeamfMeta]] carrying captures, global info, and
  * the derived per-capture trace layout (offset table), which is all the
  * decoder needs.
  *
  * Versions v0.4+ declare their data products in metadata
  * (`_get_trace_metadata`, seamf.py:633-661, 794-840); earlier generations
  * use fixed trace tables (TRACE_INFO, seamf.py:240-265, 367-392). The v5
  * generation needs a byte-level JSON fixup for missing `type` tags on
  * `processing_info` entries (seamf.py:954-969) — reproduced here as a
  * string patch before parse.
  */
object SeamfMetadata {

  /** One trace slot within a capture block: target table + labels + axis. */
  final case class TraceInfo(
      table: String, // psd | pvt | pfp | apd
      captureStatistic: String, // max | mean | min | "" (n/a)
      detector: String, // peak | rms | mean | max | "" (n/a)
      length: Int,
      axisStart: Double,
      axisStep: Double)

  /** One capture (channel) entry. */
  final case class Capture(
      datetimeUs: Long,
      frequency: Double,
      sampleStart: Long,
      overload: Option[Boolean],
      calGainDb: Option[Double],
      calNoiseFigureDb: Option[Double],
      calTemperatureDegC: Option[Double],
      siganReferenceLevelDbm: Option[Double],
      siganAttenuationDb: Option[Double],
      siganPreampEnable: Option[Boolean],
      iqCaptureDurationMs: Option[Double])

  /** Parsed + derived file metadata. */
  final case class SeamfMeta(
      version: String, // extension version, e.g. "0.6.0"
      schemaGeneration: Int, // 1..6
      sampleRate: Double,
      numChannels: Int,
      task: Option[Long],
      scheduleName: Option[String],
      scheduleStartUs: Option[Long],
      scheduleIntervalSec: Option[Long],
      sha512Hex: Option[String],
      geolocation: Option[(Double, Double)], // (lng, lat)
      timezone: Option[String],
      captures: Seq[Capture],
      perCaptureLayout: Seq[TraceInfo],
      maxOfMaxChannelPowers: Seq[Double],
      medianOfMeanChannelPowers: Seq[Double],
      diagnostics: Map[String, String]) {
    /** Half-float slots per capture block. */
    def perCaptureLength: Int = perCaptureLayout.map(_.length).sum
    /** Total half-float slots in the payload. */
    def totalLength: Int = perCaptureLength * captures.size
  }

  private val mapper = new ObjectMapper()

  // ---- normalization maps (seamf.py:120-126, 474) ----------------------
  /** capture_statistic normalization: maximum->max, minimum->min. */
  def normalizeStatistic(s: String): String = s match {
    case "maximum" => "max"
    case "minimum" => "min"
    case other => other
  }

  /** detector normalization for PVT: max->peak, mean->rms. */
  def normalizeDetector(s: String): String = s match {
    case "max" | "maximum" | "peak" => "peak"
    case "mean" | "rms" => "rms"
    case other => other
  }

  /** Graph name -> long-table name (v4+ declared data products). */
  def tableForGraph(name: String): Option[String] = name match {
    case "Power Spectral Density" => Some("psd")
    case "Power vs. Time" => Some("pvt")
    case "Periodic Frame Power" => Some("pfp")
    case "Amplitude Probability Distribution" => Some("apd")
    case _ => None
  }

  /** The v5 byte-patch: `processing_info` entries missing msgspec `type`
    * tags get one injected based on a marker key (seamf.py:954-969).
    */
  def patchV5Json(json: String): String = {
    var s = json
    // DigitalFilter objects carry "filter_type"; DFT objects carry "samples".
    s = s.replace("{\"filter_type\":", "{\"type\": \"DigitalFilter\", \"filter_type\":")
    s = s.replace("{\"samples\":", "{\"type\": \"DFT\", \"samples\":")
    s
  }

  /** Timezone from longitude: the reference hard-codes US bands
    * (seamf.py:38-46). Same crude semantics: continental-US meridian bands;
    * anything else is unresolvable (caller must pass an explicit tz).
    */
  def timezoneFromLongitude(lng: Double): Option[String] =
    if (lng >= -125.0 && lng < -114.0) Some("America/Los_Angeles")
    else if (lng >= -114.0 && lng < -102.0) Some("America/Denver")
    else if (lng >= -102.0 && lng < -87.0) Some("America/Chicago")
    else if (lng >= -87.0 && lng < -65.0) Some("America/New_York")
    else None

  /** ISO-8601 (trailing Z or offset) -> epoch microseconds
    * (reference `_iso_to_datetime`, util.py:6-20).
    */
  def isoToMicros(iso: String): Long = {
    val inst = java.time.OffsetDateTime
      .parse(if (iso.endsWith("Z") || iso.contains("+")) iso else iso + "Z")
      .toInstant
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull)

  private def dOpt(n: JsonNode, f: String): Option[Double] = opt(n, f).map(_.asDouble)
  private def bOpt(n: JsonNode, f: String): Option[Boolean] = opt(n, f).map(_.asBoolean)

  /** Flatten a nested JSON object into dotted string keys
    * (reference `_flatten_dict`, util.py:86-94).
    */
  def flatten(node: JsonNode, prefix: String = ""): Map[String, String] = {
    if (node.isObject) {
      node.properties().asScala.flatMap { e =>
        val k = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
        flatten(e.getValue, k)
      }.toMap
    } else if (node.isArray) {
      node.elements().asScala.zipWithIndex.flatMap { case (v, i) =>
        flatten(v, s"$prefix.$i")
      }.toMap
    } else Map(prefix -> node.asText())
  }

  /** Sniff the ntia-nasctn-sea / ntia-sensor extension version and map it to
    * a schema generation 1..6 (seamf.py:927-978).
    */
  def schemaGenerationOf(version: String): Int = version match {
    case v if v.startsWith("v0.1") || v == "0.1.0" => 1
    case v if v.startsWith("v0.2") || v == "0.2.0" => 2
    case v if v.startsWith("v0.3") || v == "0.3.0" => 3
    case v if v.startsWith("v0.4") || v == "0.4.0" => 4
    case v if v.startsWith("v0.5") || v == "0.5.0" => 5
    case _ => 6 // 0.6+ reuses the v5 loader (seamf.py:971-976)
  }

  /** Fixed pre-v4 per-capture layout (TRACE_INFO, seamf.py:240-265,367-392):
    * 2x625 PSD + 2x400 PVT + 6x560 PFP; generations 2-3 add the APD as TWO
    * concatenated traces — probability percentiles then amplitudes
    * (seamf.py:541-570) — which the reader zips into the tabular APD form
    * (generation 1 has no APD).
    */
  def fixedLegacyLayout(gen: Int): Seq[TraceInfo] = {
    val psd = Seq("max", "mean").map(st =>
      TraceInfo("psd", st, "", 625, -4.992e6, 16e3))
    val pvt = Seq("peak", "rms").map(det =>
      TraceInfo("pvt", "", det, 400, 0.0, 0.01))
    // legacy PFP detectors are rms/peak (TRACE_INFO, seamf.py:240-265),
    // unlike the v5+ series names (mean/max)
    val pfp = for {
      det <- Seq("rms", "peak")
      st <- Seq("min", "max", "mean")
    } yield TraceInfo("pfp", st, det, 560, 0.0, 1.7857e-5)
    val apd =
      if (gen >= 2)
        Seq(TraceInfo("apd_prob", "", "", 151, 0.0, 1.0),
          TraceInfo("apd_amp", "", "", 151, -180.0, 1.0))
      else Nil
    psd ++ pvt ++ pfp ++ apd
  }

  /** v1/v2 trace-label -> (table, capture_statistic, detector) map (the
    * hard-coded TRACE_INFO tables, seamf.py:240-265 and 367-392; note legacy
    * PFP detectors are rms/peak, and v1 labels end in `_power`).
    */
  val legacyTraceLabels: Map[String, (String, String, String)] = {
    val v1 = Map(
      "psd_max_power" -> (("psd", "max", "")),
      "psd_mean_power" -> (("psd", "mean", "")),
      "pvt_max_power" -> (("pvt", "", "peak")),
      "pvt_mean_power" -> (("pvt", "", "rms")),
      "apd_p_pct" -> (("apd_prob", "", "")),
      "apd_a_dBm" -> (("apd_amp", "", ""))) ++
      (for (det <- Seq("rms", "peak"); st <- Seq("min", "max", "mean"))
        yield s"pfp_${det}_${st}_power" -> (("pfp", st, det)))
    val v2 = Map(
      "max_fft" -> (("psd", "max", "")),
      "mean_fft" -> (("psd", "mean", "")),
      "max_td_pwr_series" -> (("pvt", "", "peak")),
      "mean_td_pwr_series" -> (("pvt", "", "rms")),
      "apd_p" -> (("apd_prob", "", "")),
      "apd_a" -> (("apd_amp", "", ""))) ++
      (for (det <- Seq("rms", "peak"); st <- Seq("min", "max", "mean"))
        yield s"${st}_${det}_pfp" -> (("pfp", st, det)))
    v1 ++ v2
  }

  /** Trace label of a legacy detection annotation (`_trace_label`,
    * seamf.py:353-360): FrequencyDomainDetection -> "psd_" + detector minus
    * its "fft_" prefix; TimeDomainDetection -> "pvt_" + detector; otherwise
    * the literal core:label.
    */
  def legacyAnnotationLabel(a: JsonNode): Option[String] =
    opt(a, "ntia-core:annotation_type").map(_.asText) match {
      case Some("FrequencyDomainDetection") =>
        opt(a, "ntia-algorithm:detector").map(d => "psd_" + d.asText.drop(4))
      case Some("TimeDomainDetection") =>
        opt(a, "ntia-algorithm:detector").map(d => "pvt_" + d.asText)
      case _ => opt(a, "core:label").map(_.asText)
    }

  /** Derive the per-capture layout from declared v4+ data products
    * (Graph list; seamf.py:794-840). PFP series names like "mean_minimum"
    * split into (detector, statistic); the detector token is NOT
    * peak/rms-normalized for pfp (v5 behavior, seamf.py:824-830), while PVT
    * detectors ARE (seamf.py:120-126).
    */
  def layoutFromDataProducts(dataProducts: JsonNode): Seq[TraceInfo] = {
    dataProducts.elements().asScala.toSeq.flatMap { g =>
      val name = opt(g, "name").map(_.asText).getOrElse("")
      val length = opt(g, "length").map(_.asInt).getOrElse(0)
      def axis(of: String): (Double, Double) = {
        def head(f: String): Option[Double] = opt(g, f).flatMap { n =>
          if (n.isArray) n.elements().asScala.toSeq.headOption.map(_.asDouble)
          else Some(n.asDouble)
        }
        (head(s"${of}_start").getOrElse(0.0), head(s"${of}_step").getOrElse(1.0))
      }
      val series = opt(g, "series").map(_.elements().asScala.map(_.asText).toSeq)
        .getOrElse(Nil)
      tableForGraph(name).toSeq.flatMap {
        case "psd" =>
          val (s0, st) = axis("x")
          series.map(s => TraceInfo("psd", normalizeStatistic(s), "", length, s0, st))
        case "pvt" =>
          val (s0, st) = axis("x")
          series.map(s => TraceInfo("pvt", "", normalizeDetector(s), length, s0, st))
        case "pfp" =>
          val (s0, st) = axis("x")
          series.map { s =>
            val parts = s.split("_", 2)
            val det = parts(0)
            val stat = normalizeStatistic(if (parts.length > 1) parts(1) else "")
            TraceInfo("pfp", stat, det, length, s0, st)
          }
        case "apd" =>
          val (s0, st) = axis("y")
          Seq(TraceInfo("apd", "", "", length, s0, st))
        case _ => Nil
      }
    }
  }

  /** v4 layout: `data_products` is an OBJECT of per-product structs with
    * `traces` label objects (Metadata0_4, schemas.py:162-222; trace order
    * and field renames per `_Loader_v4._get_trace_metadata`,
    * seamf.py:633-661). APD is tabular: the amplitude axis comes from
    * min_amplitude + amplitude_bin_size (seamf.py:663-671).
    */
  def layoutFromDataProductsV4(dp: JsonNode): Seq[TraceInfo] = {
    val order = Seq(
      "psd" -> "power_spectral_density",
      "pvt" -> "time_series_power",
      "pfp" -> "periodic_frame_power",
      "apd" -> "amplitude_probability_distribution")
    order.flatMap { case (table, jsonName) =>
      opt(dp, jsonName).toSeq.flatMap { field =>
        val length = opt(field, "length").map(_.asInt).getOrElse(0)
        table match {
          case "apd" =>
            val a0 = dOpt(field, "min_amplitude").getOrElse(-180.0)
            val step = dOpt(field, "amplitude_bin_size").getOrElse(1.0)
            Seq(TraceInfo("apd", "", "", length, a0, step))
          case _ =>
            val traces = opt(field, "traces")
              .map(_.elements().asScala.toSeq).getOrElse(Nil)
            traces.map { tr =>
              val stat = opt(tr, "statistic").map(n => normalizeStatistic(n.asText))
                .getOrElse("")
              val detRaw = opt(tr, "detector").map(_.asText).getOrElse("")
              table match {
                case "psd" =>
                  TraceInfo("psd", if (stat.nonEmpty) stat
                    else normalizeStatistic(detRaw), "", length, -5e6, 10e6 / length)
                case "pvt" =>
                  TraceInfo("pvt", "", normalizeDetector(detRaw), length, 0.0, 0.01)
                case "pfp" =>
                  TraceInfo("pfp", stat, detRaw, length, 0.0,
                    0.01 / math.max(length, 1))
                case _ => TraceInfo(table, stat, detRaw, length, 0.0, 1.0)
              }
            }
        }
      }
    }
  }

  /** Parse a seamf metadata JSON document. */
  def parse(json: String, explicitTz: Option[String] = None): SeamfMeta = {
    val patched = if (json.contains("\"filter_type\":") &&
      !json.contains("\"type\": \"DigitalFilter\"")) patchV5Json(json) else json
    val root = mapper.readTree(patched)
    val global = root.get("global")
    require(global != null, "seamf metadata missing 'global'")

    val extensions = opt(global, "core:extensions")
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
    val version = extensions
      .find(e => Set("ntia-nasctn-sea", "ntia-sensor")
        .contains(opt(e, "name").map(_.asText).getOrElse("")))
      .flatMap(e => opt(e, "version").map(_.asText))
      .getOrElse("0.6.0")
    val gen = schemaGenerationOf(version)

    val geoloc = opt(global, "core:geolocation")
      .flatMap(g => opt(g, "coordinates"))
      .map(_.elements().asScala.map(_.asDouble).toSeq)
      .collect { case Seq(lng, lat, _*) => (lng, lat) }

    val tz = explicitTz.orElse(geoloc.flatMap(g => timezoneFromLongitude(g._1)))
    if (tz.isEmpty && explicitTz.isEmpty && geoloc.isEmpty && gen >= 4)
      throw new IllegalArgumentException(
        "cannot infer timezone: no geolocation in metadata and no explicit tz")
    if (gen < 4 && explicitTz.isEmpty)
      // v1-v3 have no geolocation -> explicit tz required
      // (parity with reference ValueError, tests/test_seamf.py:26-34)
      throw new IllegalArgumentException(
        s"schema generation $gen has no geolocation; pass an explicit timezone")

    val captures = opt(root, "captures")
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
      .map { c =>
        val cal = opt(c, "ntia-sensor:sensor_calibration")
        val sig = opt(c, "ntia-sensor:sigan_settings")
        Capture(
          datetimeUs = isoToMicros(c.get("core:datetime").asText),
          frequency = c.get("core:frequency").asDouble,
          sampleStart = opt(c, "core:sample_start").map(_.asLong).getOrElse(0L),
          overload = bOpt(c, "ntia-sensor:overload"),
          calGainDb = cal.flatMap(dOpt(_, "gain")),
          calNoiseFigureDb = cal.flatMap(dOpt(_, "noise_figure")),
          calTemperatureDegC = cal.flatMap(dOpt(_, "temperature")),
          siganReferenceLevelDbm = sig.flatMap(dOpt(_, "reference_level")),
          siganAttenuationDb = sig.flatMap(dOpt(_, "attenuation")),
          siganPreampEnable = sig.flatMap(bOpt(_, "preamp_enable")),
          iqCaptureDurationMs = dOpt(c, "ntia-sensor:duration"))
      }

    // Legacy annotations drive both the trace layout and the channel
    // metadata (v1 loader, seamf.py:268-332): CalibrationAnnotation /
    // SensorAnnotation entries attach cal fields to their capture (matched
    // on core:sample_start); detection annotations carry trace offsets.
    val annotations = opt(root, "annotations")
      .map(_.elements().asScala.toSeq).getOrElse(Nil)

    val capturesWithCal: Seq[Capture] =
      if (gen >= 4 || annotations.isEmpty) captures
      else {
        val byStart = captures.map(c => c.sampleStart -> c).toMap
        val updates = scala.collection.mutable.Map[Long, Capture]()
        annotations.foreach { a =>
          val tpe = opt(a, "ntia-core:annotation_type").map(_.asText).getOrElse("")
          val start = opt(a, "core:sample_start").map(_.asLong).getOrElse(-1L)
          byStart.get(start).foreach { cap0 =>
            val cap = updates.getOrElse(start, cap0)
            tpe match {
              case "CalibrationAnnotation" =>
                updates(start) = cap.copy(
                  calGainDb = dOpt(a, "ntia-sensor:gain_sensor")
                    .orElse(cap.calGainDb),
                  calNoiseFigureDb = dOpt(a, "ntia-sensor:noise_figure_sensor")
                    .orElse(cap.calNoiseFigureDb),
                  calTemperatureDegC = dOpt(a, "ntia-sensor:temperature")
                    .orElse(cap.calTemperatureDegC))
              case "SensorAnnotation" =>
                updates(start) = cap.copy(
                  overload = bOpt(a, "ntia-sensor:overload").orElse(cap.overload),
                  siganAttenuationDb =
                    dOpt(a, "ntia-sensor:attenuation_setting_sigan")
                      .orElse(cap.siganAttenuationDb))
              case _ => ()
            }
          }
        }
        captures.map(c => updates.getOrElse(c.sampleStart, c))
      }

    // annotation-derived per-capture layout (first capture block, ordered by
    // sample_start); falls back to the fixed TRACE_INFO layout
    def layoutFromAnnotations: Option[Seq[TraceInfo]] = {
      val secondStart = captures.sortBy(_.sampleStart).drop(1).headOption
        .map(_.sampleStart).getOrElse(Long.MaxValue)
      val dets = annotations.flatMap { a =>
        for {
          label <- legacyAnnotationLabel(a)
          info <- legacyTraceLabels.get(label)
          start <- opt(a, "core:sample_start").map(_.asLong)
          count <- opt(a, "core:sample_count").map(_.asInt)
          if start < secondStart
        } yield (start, info, count)
      }.sortBy(_._1)
      if (dets.isEmpty) None
      else Some(dets.map { case (_, (table, st, det), count) =>
        val (a0, step) = table match {
          case "psd" => (-5e6, 10e6 / count)
          case "pvt" => (0.0, 0.01)
          case "pfp" => (0.0, 0.01 / count)
          case _ => (0.0, 1.0)
        }
        TraceInfo(table, st, det, count, a0, step)
      })
    }

    val layout = opt(global, "ntia-algorithm:data_products") match {
      case Some(dp) if gen >= 4 && dp.isArray => layoutFromDataProducts(dp)
      case Some(dp) if gen >= 4 && dp.isObject => layoutFromDataProductsV4(dp)
      case _ => layoutFromAnnotations.getOrElse(fixedLegacyLayout(gen))
    }

    def dblList(f: String): Seq[Double] =
      opt(global, f).map(_.elements().asScala.map(_.asDouble).toSeq).getOrElse(Nil)

    val schedule = opt(global, "ntia-scos:schedule")
    SeamfMeta(
      version = version,
      schemaGeneration = gen,
      sampleRate = dOpt(global, "core:sample_rate").getOrElse(0.0),
      numChannels = opt(global, "core:num_channels").map(_.asInt)
        .getOrElse(captures.size),
      task = opt(global, "ntia-scos:task").map(_.asLong),
      scheduleName = schedule.flatMap(s => opt(s, "name").map(_.asText)),
      scheduleStartUs = schedule.flatMap(s => opt(s, "start").map(n => isoToMicros(n.asText))),
      scheduleIntervalSec = schedule.flatMap(s => opt(s, "interval").map(_.asLong)),
      sha512Hex = opt(global, "core:sha512").map(_.asText),
      geolocation = geoloc,
      timezone = tz,
      captures = capturesWithCal,
      perCaptureLayout = layout,
      maxOfMaxChannelPowers = dblList("ntia-nasctn-sea:max_of_max_channel_powers"),
      medianOfMeanChannelPowers = dblList("ntia-nasctn-sea:median_of_mean_channel_powers"),
      diagnostics = opt(global, "ntia-diagnostics:diagnostics")
        .map(flatten(_, "diagnostics")).getOrElse(Map.empty))
  }
}
