package graft.seamf

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Versioned seamf metadata model + trace-layout derivation.
  *
  * The reference parses 5 metadata schema generations with msgspec structs
  * (/root/reference/src/sea_ingest/schemas.py:105-358) dispatched by
  * `select_loader` (seamf.py:927-978) on the `ntia-nasctn-sea` extension
  * version: `core:extensions` is a **dict** in generations 1-3 (key absent →
  * v1, "v0.2" → v2, "v0.3" → v3) and a **list of {name, version} objects**
  * in 4+ ("v0.4" → v4, "v0.4.0" → v5 — "confusing but correct", seamf.py:953
  * — and "v0.6.0"/"0.6.0" → v6, which reuses the v5 loader).
  *
  * We re-express the same semantics as a Jackson tree-model parse (jackson
  * ships with Spark). The parse output is a [[SeamfMeta]] carrying captures,
  * global info, and the derived **absolute offset table** ([[TraceSlot]]s):
  * unlike a fixed per-capture layout, absolute slots handle the variable
  * per-capture APD regions of generations 1-3 (e.g. v3's per-capture
  * `sample_count` list, seamf.py:541-570), validated against the six real
  * `example_v{1..6}.sigmf` golden files (SeamfGoldenSpec).
  *
  * Label normalization follows `_trace_index` (seamf.py:118-127), which the
  * reference applies to every table at DataFrame assembly: statistic
  * maximum→max / minimum→min, detector max→peak / mean→rms. One documented
  * deviation: the reference's replace-map misses the literal token
  * "maximum" used by v5/v6 PVT series, leaving `detector="maximum"` in its
  * output; this engine normalizes it to "peak" so detector values are
  * {peak, rms} across all generations.
  *
  * Axis convention: the reference's PSD axis is 0-based for v1-v4
  * (`_psd_index`, seamf.py:104-116: RangeIndex * bandwidth/count) but
  * baseband-relative for v5/v6 (declared x_start = -4.992 MHz). This engine
  * unifies on the baseband axis: start = declared x_start where present,
  * else -(count/2)*step — identical values across generations for the
  * production 625 x 16 kHz shape.
  */
object SeamfMetadata {

  /** One trace slot: absolute half-float offset into the payload. */
  final case class TraceSlot(
      captureIdx: Int,
      start: Long,
      length: Int,
      table: String, // psd | pvt | pfp | apd | apd_prob | apd_amp
      captureStatistic: String, // max | mean | min | "" (n/a)
      detector: String, // peak | rms | "" (n/a)
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
      version: String, // extension version, e.g. "v0.6.0" ("v0.1" when absent)
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
      slots: Seq[TraceSlot],
      maxOfMaxChannelPowers: Seq[Double],
      medianOfMeanChannelPowers: Seq[Double],
      diagnostics: Map[String, String]) {
    /** Minimum payload length (half-float slots) the offset table requires. */
    def requiredLength: Long =
      if (slots.isEmpty) 0L else slots.map(s => s.start + s.length).max
  }

  private val mapper = new ObjectMapper()

  // ---- normalization maps (`_trace_index`, seamf.py:118-127) -------------
  /** capture_statistic normalization: maximum->max, minimum->min. */
  def normalizeStatistic(s: String): String = s match {
    case "maximum" => "max"
    case "minimum" => "min"
    case other => other
  }

  /** detector normalization: max->peak, mean->rms. The reference's replace
    * map (seamf.py:122) misses "maximum" (v5/v6 PVT series token), leaving
    * it raw in its output; normalizing it to "peak" here is the documented
    * engine deviation (see class doc).
    */
  def normalizeDetector(s: String): String = s match {
    case "max" | "maximum" | "peak" => "peak"
    case "mean" | "rms" => "rms"
    case other => other
  }

  /** The v5 byte-patch (seamf.py:954-969): `processing_info` entries missing
    * msgspec `type` tags get one injected. Only needed by the reference's
    * tagged-union msgspec decode; our Jackson tree parse never dereferences
    * `processing_info`, so this exists for API parity only.
    */
  def patchV5Json(json: String): String = {
    var s = json
    s = s.replace("{\"filter_type\":", "{\"type\": \"DigitalFilter\", \"filter_type\":")
    s = s.replace("{\"samples\":", "{\"type\": \"DFT\", \"samples\":")
    s
  }

  /** Timezone from longitude: reference `timezone_at` hard-codes three crude
    * meridian bands (seamf.py:37-46): (-119,-116) Los Angeles,
    * (-116,-80) Denver, (-80,60) "America/Boston"; else unresolvable.
    */
  def timezoneFromLongitude(lng: Double): Option[String] =
    if (lng > -119.0 && lng < -116.0) Some("America/Los_Angeles")
    else if (lng > -116.0 && lng < -80.0) Some("America/Denver")
    else if (lng > -80.0 && lng < 60.0) Some("America/Boston")
    else None

  /** ISO-8601 -> epoch microseconds (reference `_iso_to_datetime`,
    * util.py:6-20). Accepts trailing Z, explicit +HH:MM / -HH:MM offsets,
    * or a bare local time (treated as UTC, matching pandas utc=True).
    */
  private val explicitOffset = "[+-]\\d{2}:?\\d{2}$".r
  def isoToMicros(iso: String): Long = {
    val timePart = iso.indexOf('T') match {
      case -1 => iso
      case i => iso.substring(i + 1)
    }
    val hasOffset = iso.endsWith("Z") ||
      explicitOffset.findFirstIn(timePart).isDefined
    val inst = java.time.OffsetDateTime
      .parse(if (hasOffset) iso else iso + "Z")
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

  // ---- fixed legacy trace-label tables (TRACE_INFO) ----------------------
  /** v1 trace-label map (seamf.py:240-265). */
  private val v1TraceInfo: Map[String, (String, String, String)] = Map(
    "psd_max_power" -> (("psd", "max", "")),
    "psd_mean_power" -> (("psd", "mean", "")),
    "pvt_max_power" -> (("pvt", "", "peak")),
    "pvt_mean_power" -> (("pvt", "", "rms")),
    "apd_p_pct" -> (("apd_prob", "", "")),
    "apd_a_dBm" -> (("apd_amp", "", ""))) ++
    (for (det <- Seq("rms", "peak"); st <- Seq("min", "max", "mean"))
      yield s"pfp_${det}_${st}_power" -> (("pfp", st, det)))

  /** v2 trace-label map (seamf.py:367-392). */
  private val v2TraceInfo: Map[String, (String, String, String)] = Map(
    "max_fft" -> (("psd", "max", "")),
    "mean_fft" -> (("psd", "mean", "")),
    "max_td_pwr_series" -> (("pvt", "", "peak")),
    "mean_td_pwr_series" -> (("pvt", "", "rms")),
    "apd_p" -> (("apd_prob", "", "")),
    "apd_a" -> (("apd_amp", "", ""))) ++
    (for (det <- Seq("rms", "peak"); st <- Seq("min", "max", "mean"))
      yield s"${st}_${det}_pfp" -> (("pfp", st, det)))

  /** Trace label of a v1 annotation (`_trace_label`, seamf.py:353-360). */
  def legacyAnnotationLabel(a: JsonNode): Option[String] =
    opt(a, "ntia-core:annotation_type").map(_.asText) match {
      case Some("FrequencyDomainDetection") =>
        opt(a, "ntia-algorithm:detector").map(d => "psd_" + d.asText.drop(4))
      case Some("TimeDomainDetection") =>
        opt(a, "ntia-algorithm:detector").map(d => "pvt_" + d.asText)
      case _ => opt(a, "core:label").map(_.asText)
    }

  /** Engine baseband PSD axis: -(count/2)*step, matching the v5/v6 declared
    * x_start (-4.992 MHz = -312*16 kHz) for the production shape.
    */
  private def psdAxis(count: Int, step: Double): (Double, Double) =
    (-(count / 2) * step, step)

  // ---- per-generation slot builders --------------------------------------

  /** v1 (`_Loader_v1`, seamf.py:235-360): every trace is its own detection
    * annotation carrying absolute sample_start + sample_count; axes come
    * from annotation fields (PSD bandwidth 10 MHz; PVT duration =
    * number_of_samples / sample_rate; PFP hardcoded 400 x 4.0 s,
    * seamf.py:337-349).
    */
  private def slotsV1(annotations: Seq[JsonNode], captures: Seq[Capture],
      sampleRate: Double): Seq[TraceSlot] = {
    val capStarts = captures.map(_.sampleStart).zipWithIndex.sortBy(_._1)
    def captureOf(start: Long): Int =
      capStarts.takeWhile(_._1 <= start).lastOption.map(_._2).getOrElse(0)
    annotations.flatMap { a =>
      val tpe = opt(a, "ntia-core:annotation_type").map(_.asText).getOrElse("")
      if (tpe == "CalibrationAnnotation" || tpe == "SensorAnnotation") None
      else for {
        label <- legacyAnnotationLabel(a)
        info <- v1TraceInfo.get(label)
        start <- opt(a, "core:sample_start").map(_.asLong)
        count <- opt(a, "core:sample_count").map(_.asInt)
      } yield {
        val (table, st, det) = info
        val (a0, step) = table match {
          case "psd" => psdAxis(count, 10e6 / count)
          case "pvt" =>
            val dur = opt(a, "ntia-algorithm:number_of_samples")
              .map(_.asDouble / sampleRate).getOrElse(4.0)
            (0.0, dur / count)
          case "pfp" => (0.0, 4.0 / count / 400.0)
          case _ => (0.0, 1.0)
        }
        TraceSlot(captureOf(start), start, count, table, st, det, a0, step)
      }
    }.sortBy(_.start)
  }

  /** v2 (`_Loader_v2`, seamf.py:362-464): each capture carries explicit
    * `<trace>_sample_start` keys plus per-table sample counts; the APD pair
    * (apd_p/apd_a) has per-capture `apd_sample_count`.
    */
  private def slotsV2(captureNodes: Seq[JsonNode]): Seq[TraceSlot] =
    captureNodes.zipWithIndex.flatMap { case (c, ci) =>
      val fftN = opt(c, "fft_sample_count").map(_.asInt).getOrElse(625)
      val tdN = opt(c, "td_pwr_sample_count").map(_.asInt).getOrElse(400)
      val pfpN = opt(c, "pfp_sample_count").map(_.asInt).getOrElse(560)
      val apdN = opt(c, "apd_sample_count").map(_.asInt).getOrElse(0)
      val durS = opt(c, "iq_capture_duration_msec").map(_.asDouble / 1000.0)
        .getOrElse(4.0)
      c.properties().asScala.toSeq.flatMap { e =>
        val k = e.getKey
        if (!k.endsWith("_sample_start") || k.startsWith("core:")) None
        else v2TraceInfo.get(k.stripSuffix("_sample_start")).map {
          case (table, st, det) =>
            val (len, a0, step) = table match {
              case "psd" =>
                val (a, s) = psdAxis(fftN, 10e6 / fftN); (fftN, a, s)
              case "pvt" => (tdN, 0.0, durS / tdN)
              case "pfp" => (pfpN, 0.0, durS / pfpN / tdN)
              case _ => (apdN, 0.0, 1.0)
            }
            TraceSlot(ci, e.getValue.asLong, len, table, st, det, a0, step)
        }
      }
    }.sortBy(_.start)

  /** v3 (`_Loader_v3`, seamf.py:467-603): layout from the global
    * `data_products` object (per-group `detector` name lists +
    * `sample_count`); the APD pair sits after the tabular block with a
    * per-capture length list (the "messy hack", seamf.py:541-570).
    */
  private def slotsV3(dp: JsonNode, captures: Seq[Capture],
      sampleRate: Double): Seq[TraceSlot] = {
    val groups = Seq("psd" -> "power_spectral_density",
      "pvt" -> "time_series_power", "pfp" -> "periodic_frame_power")
    val durS = captures.headOption.flatMap(_.iqCaptureDurationMs)
      .map(_ / 1000.0).getOrElse(4.0)
    var off = 0L
    val rel = groups.flatMap { case (table, jsonName) =>
      opt(dp, jsonName).toSeq.flatMap { fld =>
        val count = opt(fld, "sample_count").map(_.asInt).getOrElse(0)
        val names = opt(fld, "detector")
          .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
        names.map { dn =>
          val split = dn.split("_")
          val (st, det) = table match {
            case "psd" => (split(0), "")
            case "pvt" => ("", normalizeDetector(split(0)))
            case "pfp" => (split(1), split(0))
            case _ => ("", "")
          }
          val (a0, step) = table match {
            case "psd" =>
              val fftN = opt(fld, "number_of_samples_in_fft").map(_.asInt)
                .getOrElse(875)
              psdAxis(count, sampleRate / fftN)
            case "pvt" => (0.0, durS / count)
            case "pfp" =>
              val tdN = opt(dp, "time_series_power")
                .flatMap(f => opt(f, "sample_count")).map(_.asInt).getOrElse(400)
              (0.0, durS / count / tdN)
            case _ => (0.0, 1.0)
          }
          val slot = (off, count, table, st, det, a0, step)
          off += count
          slot
        }
      }
    }
    val apdStart = off
    val apdCounts = opt(dp, "amplitude_probability_distribution")
      .flatMap(f => opt(f, "sample_count"))
      .map(_.elements().asScala.map(_.asInt).toSeq).getOrElse(Nil)
    captures.zipWithIndex.flatMap { case (cap, ci) =>
      val base = cap.sampleStart
      val tab = rel.map { case (o, n, table, st, det, a0, step) =>
        TraceSlot(ci, base + o, n, table, st, det, a0, step)
      }
      val apd =
        if (ci < apdCounts.size) {
          val n = apdCounts(ci)
          Seq(TraceSlot(ci, base + apdStart, n, "apd_prob", "", "", 0.0, 1.0),
            TraceSlot(ci, base + apdStart + n, n, "apd_amp", "", "", 0.0, 1.0))
        } else Nil
      tab ++ apd
    }.sortBy(_.start)
  }

  /** v4 (`_Loader_v4`, seamf.py:606-756): object-style `data_products` with
    * `traces` label objects in fixed group order; tabular APD with amplitude
    * axis from min_amplitude/amplitude_bin_size; PSD bandwidth =
    * sample_rate * length / samples (seamf.py:725-729).
    */
  private def relLayoutV4(dp: JsonNode, sampleRate: Double,
      durS: Double): Seq[(Int, String, String, String, Double, Double)] = {
    val order = Seq(
      "psd" -> "power_spectral_density",
      "pvt" -> "time_series_power",
      "pfp" -> "periodic_frame_power",
      "apd" -> "amplitude_probability_distribution")
    val pvtN = opt(dp, "time_series_power")
      .flatMap(f => opt(f, "length")).map(_.asInt).getOrElse(400)
    order.flatMap { case (table, jsonName) =>
      opt(dp, jsonName).toSeq.flatMap { fld =>
        val length = opt(fld, "length").map(_.asInt).getOrElse(0)
        table match {
          case "apd" =>
            val a0 = dOpt(fld, "min_amplitude").getOrElse(-180.0)
            val step = dOpt(fld, "amplitude_bin_size").getOrElse(1.0)
            Seq((length, "apd", "", "", a0, step))
          case _ =>
            val traces = opt(fld, "traces")
              .map(_.elements().asScala.toSeq).getOrElse(Nil)
            traces.map { tr =>
              val st = opt(tr, "statistic").map(_.asText).getOrElse("")
              val det = opt(tr, "detector").map(_.asText).getOrElse("")
              val (a0, step) = table match {
                case "psd" =>
                  val fftN = opt(fld, "samples").map(_.asInt).getOrElse(875)
                  psdAxis(length, sampleRate / fftN)
                case "pvt" => (0.0, durS / length)
                case _ => (0.0, durS / length / pvtN)
              }
              (length, table, st, det, a0, step)
            }
        }
      }
    }
  }

  /** v5/v6 (`_Loader_v5`, seamf.py:759-924): `data_products` is a list of
    * Graph objects in declared order; PSD/PVT/PFP axes from x_start/x_step,
    * APD from y_start/y_step; PFP series names split detector_statistic.
    */
  private def relLayoutV5(dp: JsonNode): Seq[(Int, String, String, String, Double, Double)] = {
    val nameMap = Map(
      "Power Spectral Density" -> "psd",
      "Power vs. Time" -> "pvt",
      "Periodic Frame Power" -> "pfp",
      "Amplitude Probability Distribution" -> "apd")
    dp.elements().asScala.toSeq.flatMap { g =>
      val name = opt(g, "name").map(_.asText).getOrElse("")
      val length = opt(g, "length").map(_.asInt).getOrElse(0)
      def head(f: String): Option[Double] = opt(g, f).flatMap { n =>
        if (n.isArray) n.elements().asScala.toSeq.headOption.map(_.asDouble)
        else Some(n.asDouble)
      }
      def axis(of: String): (Double, Double) =
        (head(s"${of}_start").getOrElse(0.0), head(s"${of}_step").getOrElse(1.0))
      nameMap.get(name).toSeq.flatMap {
        case "apd" =>
          val (a0, step) = axis("y")
          Seq((length, "apd", "", "", a0, step))
        case table =>
          val (a0, step) = axis("x")
          val series = opt(g, "series")
            .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
          series.map { s =>
            val (st, det) = table match {
              case "psd" => (s, "")
              case "pvt" => ("", s)
              case "pfp" =>
                val parts = s.split("_", 2)
                (if (parts.length > 1) parts(1) else "", parts(0))
            }
            (length, table, st, det, a0, step)
          }
      }
    }
  }

  /** Uniform per-capture relative layout -> absolute slots. */
  private def slotsFromRel(rel: Seq[(Int, String, String, String, Double, Double)],
      captures: Seq[Capture]): Seq[TraceSlot] =
    captures.zipWithIndex.flatMap { case (cap, ci) =>
      var off = cap.sampleStart
      rel.map { case (len, table, st, det, a0, step) =>
        val s = TraceSlot(ci, off, len, table, st, det, a0, step)
        off += len
        s
      }
    }

  /** Parse a seamf metadata JSON document.
    *
    * Timezone resolution mirrors `read_seamf` (seamf.py:1027-1036): explicit
    * tz wins; else geolocation longitude bands; no geolocation at all →
    * error (the reference ValueError — v1-v3 files never carry geolocation,
    * tests/test_seamf.py:26-34).
    */
  def parse(json: String, explicitTz: Option[String] = None): SeamfMeta = {
    val root = mapper.readTree(json)
    val global = root.get("global")
    require(global != null, "seamf metadata missing 'global'")

    // ---- version dispatch (select_loader, seamf.py:927-978) -------------
    val extNode = opt(global, "core:extensions")
    val extVersion: Option[String] = extNode.flatMap { n =>
      if (n.isArray)
        n.elements().asScala
          .find(e => opt(e, "name").map(_.asText).contains("ntia-nasctn-sea"))
          .flatMap(e => opt(e, "version").map(_.asText))
      else opt(n, "ntia-nasctn-sea").map(_.asText)
    }
    val gen = extVersion match {
      case None => 1
      case Some("v0.2") => 2
      case Some("v0.3") => 3
      case Some("v0.4") => 4
      case Some("v0.4.0") => 5 // "confusing but correct for v5" (seamf.py:953)
      case Some("v0.6.0") | Some("0.6.0") => 6
      case Some(other) =>
        throw new IllegalArgumentException(
          s"""unrecognized format version "$other"""")
    }
    val version = extVersion.getOrElse("v0.1")

    val geoloc = opt(global, "core:geolocation")
      .flatMap(g => opt(g, "coordinates"))
      .map(_.elements().asScala.map(_.asDouble).toSeq)
      .collect { case Seq(lng, lat, _*) => (lng, lat) }

    val tz = explicitTz.orElse(geoloc.flatMap(g => timezoneFromLongitude(g._1)))
    if (explicitTz.isEmpty && geoloc.isEmpty)
      throw new IllegalArgumentException(
        "could not automatically identify time zone, need to specify, " +
          """e.g., tz="America/New_York"""")

    val sampleRate = dOpt(global, "core:sample_rate").getOrElse(0.0)
    val captureNodes = opt(root, "captures")
      .map(_.elements().asScala.toSeq).getOrElse(Nil)

    val captures = captureNodes.map { c =>
      // v4+ nest calibration/sigan structs (CAPTURE_KEYMAP, seamf.py:614-623);
      // v2/v3 carry the flat back-compat keys directly on the capture.
      val cal = opt(c, "ntia-sensor:sensor_calibration")
      val sig = opt(c, "ntia-sensor:sigan_settings")
      Capture(
        datetimeUs = isoToMicros(c.get("core:datetime").asText),
        frequency = c.get("core:frequency").asDouble,
        sampleStart = opt(c, "core:sample_start").map(_.asLong).getOrElse(0L),
        overload = bOpt(c, "ntia-sensor:overload").orElse(bOpt(c, "overload")),
        calGainDb = cal.flatMap(dOpt(_, "gain")).orElse(dOpt(c, "cal_gain_dB")),
        calNoiseFigureDb = cal.flatMap(dOpt(_, "noise_figure"))
          .orElse(dOpt(c, "cal_noise_figure_dB")),
        calTemperatureDegC = cal.flatMap(dOpt(_, "temperature")),
        siganReferenceLevelDbm = sig.flatMap(dOpt(_, "reference_level"))
          .orElse(dOpt(c, "sigan_reference_level_dBm")),
        siganAttenuationDb = sig.flatMap(dOpt(_, "attenuation"))
          .orElse(dOpt(c, "sigan_attenuation_dB")),
        siganPreampEnable = sig.flatMap(bOpt(_, "preamp_enable"))
          .orElse(bOpt(c, "sigan_preamp_enable")),
        iqCaptureDurationMs = dOpt(c, "ntia-sensor:duration")
          .orElse(dOpt(c, "iq_capture_duration_msec")))
    }

    val annotations = opt(root, "annotations")
      .map(_.elements().asScala.toSeq).getOrElse(Nil)

    // v1: Calibration/Sensor annotations attach channel metadata
    // (seamf.py:294-320), matched on core:sample_start.
    val capturesWithCal: Seq[Capture] =
      if (gen >= 2 || annotations.isEmpty) captures
      else {
        val byStart = captures.zipWithIndex.map { case (c, i) => c.sampleStart -> i }.toMap
        val updated = captures.toArray
        annotations.foreach { a =>
          val tpe = opt(a, "ntia-core:annotation_type").map(_.asText).getOrElse("")
          val start = opt(a, "core:sample_start").map(_.asLong).getOrElse(-1L)
          byStart.get(start).foreach { i =>
            val cap = updated(i)
            tpe match {
              case "CalibrationAnnotation" =>
                updated(i) = cap.copy(
                  calGainDb = dOpt(a, "ntia-sensor:gain_sensor")
                    .orElse(cap.calGainDb),
                  calNoiseFigureDb = dOpt(a, "ntia-sensor:noise_figure_sensor")
                    .orElse(cap.calNoiseFigureDb),
                  calTemperatureDegC = dOpt(a, "ntia-sensor:temperature")
                    .orElse(cap.calTemperatureDegC))
              case "SensorAnnotation" =>
                updated(i) = cap.copy(
                  overload = bOpt(a, "ntia-sensor:overload").orElse(cap.overload),
                  siganAttenuationDb =
                    dOpt(a, "ntia-sensor:attenuation_setting_sigan")
                      .orElse(cap.siganAttenuationDb))
              case _ => ()
            }
          }
        }
        updated.toIndexedSeq
      }

    val durS = captures.headOption.flatMap(_.iqCaptureDurationMs)
      .map(_ / 1000.0).getOrElse(4.0)
    val rawSlots: Seq[TraceSlot] = gen match {
      case 1 => slotsV1(annotations, captures, sampleRate)
      case 2 => slotsV2(captureNodes)
      case 3 =>
        opt(global, "data_products")
          .map(slotsV3(_, captures, sampleRate)).getOrElse(Nil)
      case 4 =>
        opt(global, "ntia-algorithm:data_products")
          .map(dp => slotsFromRel(relLayoutV4(dp, sampleRate, durS), captures))
          .getOrElse(Nil)
      case _ =>
        opt(global, "ntia-algorithm:data_products")
          .map(dp => slotsFromRel(relLayoutV5(dp), captures))
          .getOrElse(Nil)
    }
    // unified label normalization (see class doc)
    val slots = rawSlots.map(s => s.copy(
      captureStatistic = normalizeStatistic(s.captureStatistic),
      detector = if (s.detector.isEmpty) "" else normalizeDetector(s.detector)))

    def dblList(f: String): Seq[Double] =
      opt(global, f).map(_.elements().asScala.map(_.asDouble).toSeq).getOrElse(Nil)

    val schedule = opt(global, "ntia-scos:schedule")
    SeamfMeta(
      version = version,
      schemaGeneration = gen,
      sampleRate = sampleRate,
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
      slots = slots,
      maxOfMaxChannelPowers = dblList("ntia-nasctn-sea:max_of_max_channel_powers")
        match {
          case Nil => dblList("max_channel_powers_dBm") // v3 global key
          case xs => xs
        },
      medianOfMeanChannelPowers = dblList("ntia-nasctn-sea:median_of_mean_channel_powers")
        match {
          case Nil => dblList("rms_channel_powers_dBm") // v3 global key
          case xs => xs
        },
      diagnostics = opt(global, "ntia-diagnostics:diagnostics")
        .orElse(opt(global, "diagnostics")) // v2/v3 un-prefixed key
        .map(flatten(_, "diagnostics")).getOrElse(Map.empty))
  }
}
