package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.LlmQueries

/** Pins the q89 scale-path clustering contract: LSH-candidate pairs
  * (32 bands x 2 rows, exact-verified) feed connectedComponents and must
  * recover the exhaustive clusters intact on the fixture corpus — the
  * property the q89 oracle asserts in SQL. A banding regression (recall
  * drop) fails here before it fails the driver gate.
  */
class LshClusterSpec extends SparkSpec {

  test("q89 LSH clustering recovers every exhaustive cluster intact") {
    val rows = LlmQueries.defs("q89_dup_clusters_lsh")
      .fn(spark, sf())
      .collect()
    assert(rows.nonEmpty, "fixture corpus must contain duplicate clusters")
    rows.foreach { r =>
      val root = r.getAs[Long]("true_root")
      assert(r.getAs[Boolean]("intact"), s"cluster $root split by LSH path")
      assert(r.getAs[Long]("n_clustered") == r.getAs[Long]("n_docs"),
        s"cluster $root has members the LSH path never clustered")
    }
    Dedup.unpersistAll()
  }

  test("q52 emits comparator-safe scalar doc_ids (no array columns)") {
    val schema = LlmQueries.defs("q52_dup_clusters").fn(spark, sf()).schema
    assert(schema("doc_ids").dataType ==
      org.apache.spark.sql.types.StringType)
    // numeric sort order inside the joined string, not lexicographic
    val ids = LlmQueries.defs("q52_dup_clusters").fn(spark, sf())
      .select(col("doc_ids")).as[String](org.apache.spark.sql.Encoders.STRING)
      .collect()
    ids.foreach { s =>
      val xs = s.split(',').map(_.toLong)
      assert(xs.sameElements(xs.sorted), s"doc_ids not numerically sorted: $s")
    }
    Dedup.unpersistAll()
  }
}
