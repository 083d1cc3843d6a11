package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.plans.AsOfJoinPhysical

/** The physical as-of join operator (LogicalPlan + Strategy + ExecNode) must
  * agree with the window-based formulation and plan as a single merge with
  * one exchange+sort per side.
  */
class AsOfJoinPhysicalSpec extends AnyFunSuite {
  private lazy val ext: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-asof-exec")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("AsOfJoinExec matches the window formulation on the events fixture") {
    import ext.implicits._
    try {
      val ev = Tables.load(ext, "/root/testdata/sf0.001", "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "ts", "user_id")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("purchase_value"))

      val physical = AsOfJoinPhysical.backward(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("purchase_value"))
      val windowed = AsOfJoin.backward(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("purchase_value"))

      // the physical plan is OUR operator: one AsOfJoinExec, exchanges only
      // below it (inserted by EnsureRequirements)
      val planStr = physical.queryExecution.executedPlan.toString
      assert(planStr.contains("AsOfJoin ["), planStr) // SparkPlan nodeName strips "Exec"

      val p = physical.select("event_id", "purchase_value")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      val w = windowed.select("event_id", "purchase_value")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(p === w)
      assert(p.nonEmpty)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("key groups with no earlier right rows yield nulls") {
    import ext.implicits._
    try {
      val left = Seq((1L, 100L), (1L, 50L), (2L, 10L), (3L, 99L))
        .toDF("k", "ts")
      val right = Seq((1L, 60L, 6.0), (3L, 99L, 9.0)).toDF("k", "ts", "v")
      val got = AsOfJoinPhysical.backward(left, right, Seq("k"), "ts", "ts", Seq("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
      assert(got === Set(
        (1L, 100L, Some(6.0)),
        (1L, 50L, None),       // before the only right row
        (2L, 10L, None),       // key absent on the right
        (3L, 99L, Some(9.0)))) // tie: rightTs == leftTs is inclusive
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
