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
}
