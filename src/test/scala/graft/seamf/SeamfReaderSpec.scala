package graft.seamf

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SeamfReaderSpec extends SparkSpec {
  private lazy val shape = SeamfFixtures.Shape()
  // 8 files, 1 corrupt sha -> 7 good; 3 channels each
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_seamf_test").toString
    SeamfFixtures.writeArchive(d, nFiles = 8, nChannels = 3, shape)
    d
  }

  test("decodes traces with exact half-float values and correct layout") {
    val tr = SeamfReader.traces(spark, dir).cache()
    // 7 good files x 3 channels x 11 traces
    assert(tr.count() === 7L * 3 * 11)
    val psdMax = tr.filter(col("table") === "psd" &&
        col("capture_statistic") === "max" && col("frequency") === 3.555e9)
      .orderBy("datetime_us").head()
    val trace = psdMax.trace.toSeq
    assert(trace.size === shape.psdLen)
    // expected value survives the half round-trip by construction
    val expect0 = HalfFloat.toFloat(
      HalfFloat.fromFloat(SeamfFixtures.sampleValue(0, 0, 0)) & 0xffff)
    assert(trace.head === expect0)
    val expect17 = HalfFloat.toFloat(
      HalfFloat.fromFloat(SeamfFixtures.sampleValue(0, 0, 17)) & 0xffff)
    assert(trace(17) === expect17)
  }

  test("permissive mode skips the corrupt-sha file; raise mode fails") {
    val okFiles = SeamfReader.sweepMetadata(spark, dir, checkHash = true)
      .select("file").distinct().count()
    assert(okFiles === 7)
    val ex = intercept[org.apache.spark.SparkException] {
      SeamfReader.decode(spark, dir, errors = "raise").count()
    }
    assert(ex.getMessage.contains("sha512") ||
      Option(ex.getCause).exists(_.getMessage.contains("sha512")))
  }

  test("metadata-only scan parses all parseable files without payload decode") {
    val sm = SeamfReader.sweepMetadata(spark, dir, checkHash = false)
    assert(sm.count() === 8) // corrupt sha not checked in metadata-only mode
    val row = sm.orderBy("file").head()
    assert(row.getAs[String]("version") === "0.6.0")
    assert(row.getAs[Int]("num_channels") === 3)
    assert(row.getAs[Long]("schedule_interval_sec") === 90L)
  }

  test("long tables have the FIXTURES §A.4 schemas and row counts") {
    val t = SeamfReader.tables(spark, dir)
    assert(t("psd").columns.toSeq ===
      Seq("file", "datetime", "frequency", "capture_statistic", "baseband_hz", "psd_dbm_per_hz"))
    assert(t("pvt").columns.toSeq ===
      Seq("file", "datetime", "frequency", "detector", "elapsed_s", "power_dbm"))
    assert(t("pfp").columns.toSeq ===
      Seq("file", "datetime", "frequency", "capture_statistic", "detector", "frame_s", "power_dbm"))
    assert(t("apd").columns.toSeq ===
      Seq("file", "datetime", "frequency", "amplitude_dbm", "probability_pct"))
    assert(t("psd").count() === 7L * 3 * 2 * shape.psdLen)
    assert(t("apd").count() === 7L * 3 * shape.apdLen)
    assert(t("channel_metadata").count() === 7L * 3)
    assert(t("sweep_metadata").count() === 7)
    // detector/statistic domains
    val dets = t("pvt").select("detector").distinct()
      .collect().map(_.getString(0)).toSet
    assert(dets === Set("peak", "rms"))
  }

  test("multi-archive union: comma-separated landing dirs scan as one source") {
    val d2 = Files.createTempDirectory("graft_seamf_second").toString
    SeamfFixtures.writeSweep(java.nio.file.Paths.get(d2), 99,
      SeamfMetadata.isoToMicros("2023-09-22T00:00:00Z"), nChannels = 2)
    val union = SeamfReader.sweepMetadata(spark, s"$dir,$d2", checkHash = true)
    assert(union.count() === 7 + 1)
  }

  test("zip-archive scan decodes .sigmf members, skips corrupt + non-sigmf") {
    val zdir = Files.createTempDirectory("graft_zip_test").toString
    SeamfFixtures.writeZipArchive(zdir, nFiles = 4, nChannels = 2)
    val tr = SeamfReader.tracesFromZips(spark, zdir)
    // 3 good members (1 corrupt sha) x 2 channels x 11 traces
    assert(tr.count() === 3L * 2 * 11)
    // member provenance: path!member naming
    assert(tr.head().file.contains(".zip!"))
  }

  test("one multi-member zip fans out across >1 task (member-level splits)") {
    val zdir = Files.createTempDirectory("graft_zip_split").toString
    SeamfFixtures.writeZipArchive(zdir, nFiles = 8, nChannels = 2)
    val tr = SeamfReader.tracesFromZips(spark, zdir, membersPerSplit = 2)
    // partition ids are assigned by the member-split repartition and are
    // still visible after the decode mapPartitions (no shuffle in between)
    val partsPerZip = tr.toDF()
      .select(col("file"), org.apache.spark.sql.functions.spark_partition_id()
        .as("pid"))
      .distinct().collect()
    assert(partsPerZip.map(_.getInt(1)).distinct.length > 1,
      s"single archive decoded in one task: ${partsPerZip.mkString(",")}")
    // and every good member decoded exactly once
    assert(tr.toDF().select("file").distinct().count() === 7)
  }

  test("gap detection finds the omitted 90s slot (A9)") {
    val sm = SeamfReader.sweepMetadata(spark, dir)
      .withColumn("t0", timestamp_micros(col("schedule_start_us")))
    val gaps = graft.operators.Windowed.gaps(sm, Seq.empty, "t0", 91.0)
    // slots: 0,1,2,3,(skip),5,6,7,8 -> exactly one 180 s gap
    val g = gaps.collect()
    assert(g.length === 1)
    assert(g.head.getAs[Double]("gap_sec") === 180.0)
  }

  test("pruned decode equals decode-then-filter and skips out-of-window XZ work") {
    val cut = SeamfMetadata.isoToMicros("2023-09-21T00:05:00Z") // slots 0-3
    val prune = SeamfReader.TracePrune(tables = Some(Set("psd")),
      maxDatetimeUs = Some(cut), maxFrequency = Some(3.566e9))
    val (ds, counters) = SeamfReader.tracesPrunedCounted(spark, dir, prune)
    val got = ds.collect()
    val full = SeamfReader.traces(spark, dir).collect()
    val want = full.filter(r => r.table == "psd" && r.datetime_us <= cut &&
      r.frequency <= 3.566e9)
    def key(r: SeamfReader.TraceRow) =
      (r.file, r.datetime_us, r.frequency, r.capture_statistic)
    assert(got.map(key).toSet === want.map(key).toSet)
    assert(got.nonEmpty && got.length === want.length)
    // decoded values identical, not just keys
    val gotByKey = got.map(r => key(r) -> r.trace.toSeq).toMap
    assert(want.forall(r => gotByKey(key(r)) == r.trace.toSeq))
    // files at slots 5, 6, 8 are outside the window and skip XZ entirely
    // (the corrupt-sha file, also out-of-window, fails before pruning and
    // lands in failed_files instead)
    assert(counters.prunedFiles.value === 3)
    assert(counters.decodedFiles.value === 4)
    // within decoded files, only the psd slots of the 2 in-band channels
    // survive; everything else is slot-pruned
    val decodedFiles = got.map(_.file).toSet
    val slotsInDecoded = full.count(r => decodedFiles.contains(r.file))
    assert(counters.prunedTraces.value === (slotsInDecoded - got.length).toLong)
  }

  test("empty landing dir decodes to zero rows, not an error") {
    val empty = Files.createTempDirectory("graft_seamf_empty").toString
    assert(SeamfReader.traces(spark, empty).count() === 0L)
    assert(SeamfReader.tracesPruned(spark, empty,
      SeamfReader.TracePrune(tables = Some(Set("psd")))).count() === 0L)
    assert(SeamfReader.sweepMetadata(spark, empty).count() === 0L)
    assert(SeamfReader.channelMetadata(spark, empty).count() === 0L)
    val emptyZip = Files.createTempDirectory("graft_zip_empty").toString
    assert(SeamfReader.tracesFromZips(spark, emptyZip).count() === 0L)
  }
}
