package graft

/** Pin exact row counts for every rows-only inventory query (the driver can
  * only count these, so a silent semantic regression would otherwise pass;
  * oracle-checked queries are covered cell-exactly by the DuckDB harness).
  * Counts are at sf0.01, the driver's correctness scale factor. The seamf
  * fixture queries are sf-independent (synthetic archive).
  */
class RowsOnlySpec extends SparkSpec {
  private val expected = Map(
    "s01_seamf_psd_summary" -> 6L,
    "s02_seamf_capture_summary" -> 21L,
    "s03_seamf_sweep_metadata" -> 8L,
    "s04_seamf_error_tolerant" -> 1L,
    "s05_seamf_gaps" -> 1L,
    "s06_seamf_spectrogram" -> 105L,
    "s07_seamf_apd_transform" -> 3L,
    "s08_seamf_asof_cal" -> 21L,
    "s09_seamf_tdd_sync" -> 3L,
    "s10_seamf_power_parity" -> 21L,
    "s11_seamf_masked_agg" -> 3L,
    "s12_seamf_coverage" -> 1L,
    "s13_seamf_diagnostics" -> 2L,
    "s14_seamf_zip_scan" -> 4L,
    "s15_seamf_stream_summary" -> 21L,
    "q45_dedup_recall" -> 2L,
    // 12 = 4 query images (doc_id < 15 with doc_id % 4 == 0) x k=3
    "m02_media_knn" -> 12L)

  test("rows-only inventory queries keep their pinned sf0.01 row counts") {
    val sfDir = sf("sf0.01")
    expected.toSeq.sortBy(_._1).foreach { case (name, want) =>
      val got = SparkEntry.queries(name)(spark, sfDir).count()
      withClue(name) { assert(got === want) }
    }
  }

  test("q45 grades the approximate dedup paths with non-degenerate recall") {
    val rows = SparkEntry.queries("q45_dedup_recall")(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.toString.toDouble)))
      .toMap
    // exact baselines must find something at these thresholds, else the
    // recall grade is vacuous
    assert(rows("jaccard_minhash")._1 > 0)
    assert(rows("embedding_lsh")._1 > 0)
    // found <= exact always; recall defined whenever exact is non-empty
    rows.values.foreach { case (ex, found, pct) =>
      assert(found <= ex)
      assert(pct.isDefined)
    }
  }
}
