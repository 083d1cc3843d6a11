package graft

import org.apache.spark.sql.functions._
import graft.functions.DbMath
import graft.plans.SimplifyDbRoundTrips

/** The dB-algebra optimizer rule: tested both as a standalone
  * Rule[LogicalPlan] application and via SparkSessionExtensions injection.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("rule cancels dbToPow(powToDb(x)) round-trips in the plan") {
    val df = Seq(0.5, 2.0, 123.25).toDF("x")
      .select(
        DbMath.dbToPow(DbMath.powToDb(col("x"))).as("rt1"),
        DbMath.powToDb(DbMath.dbToPow(col("x"))).as("rt2"),
        DbMath.dbToEnv(DbMath.envToDb(col("x"))).as("rt3"))
    val before = df.queryExecution.analyzed
    val after = SimplifyDbRoundTrips(before)
    val s = after.toString
    withClue(s) {
      assert(!s.contains("LOG10") && !s.toLowerCase.contains("pow"))
    }
  }

  test("rule leaves mismatched power/envelope scales alone") {
    val df = Seq(10.0).toDF("x")
      .select(DbMath.dbToPow(DbMath.envToDb(col("x"))).as("y"))
    val s = SimplifyDbRoundTrips(df.queryExecution.analyzed).toString
    assert(s.contains("LOG10") || s.toLowerCase.contains("pow"))
  }

  test("extension injection wires the rule into a session's optimizer") {
    // a session created with GraftExtensions optimizes the round-trip away
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val ext = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import ext.implicits._
      val df = Seq(1.5).toDF("x")
        .select(DbMath.dbToPow(DbMath.powToDb(col("x"))).as("y"))
      val opt = df.queryExecution.optimizedPlan.toString
      withClue(opt) {
        assert(!opt.contains("LOG10") && !opt.toLowerCase.contains("pow"))
      }
      assert(df.head().getDouble(0) === 1.5) // exact: ops eliminated
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      // restore the shared vanilla session as default for later suites
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
