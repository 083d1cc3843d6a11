package graft.seamf

import graft.SparkSpec
import graft.queries.SeamfQueries

/** Smoke-run every seamf inventory query (rows-only in the driver gate, so
  * pin row counts here).
  */
class SeamfQueriesSpec extends SparkSpec {
  test("all seamf inventory queries run and return rows") {
    SeamfQueries.defs.foreach { case (name, d) =>
      val n = d.fn(spark, sf()).count()
      withClue(name) {
        assert(n > 0, s"$name returned no rows")
      }
    }
  }

  test("the connector-path analytics (s22-s24) push their predicates into " +
      "the scan as decode prunes (VERDICT r8 #2)") {
    def planOf(name: String): String =
      SeamfQueries.defs(name).fn(spark, sf())
        .queryExecution.executedPlan.toString
    // s22: the table predicate prunes non-psd slot decode; payload needed
    val p22 = planOf("s22_seamf_dsv2_psd_summary")
    assert(p22.contains("table IN {psd}"), p22)
    assert(p22.contains("PayloadDecode: full"), p22)
    // s23: pvt-only decode feeding the capture summary join
    val p23 = planOf("s23_seamf_dsv2_capture_summary")
    assert(p23.contains("table IN {pvt}"), p23)
    // s24: all three predicates fold exactly (inclusive bounds)
    val p24 = planOf("s24_seamf_dsv2_pruned_decode")
    assert(p24.contains("table IN {psd}"), p24)
    assert(p24.contains("datetime_us <= "), p24)
    assert(p24.contains("frequency <= "), p24)
  }
}
