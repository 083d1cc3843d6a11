package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the relational fixture tables (see TESTDATA.md / FIXTURES.md).
  *
  * Scale notes (100 TB design):
  *  - Loads are plain parquet scans: column pruning + predicate pushdown reach
  *    the scan via Catalyst, so callers should filter/select on the returned
  *    DataFrame rather than materializing it.
  *  - `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark cannot
  *    read natively; we read it as a raw long (`nanosAsLong`) and floor-divide
  *    to microseconds. This stays inside whole-stage codegen (no UDF).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Read one fixture table; `events` gets its nanosecond timestamp converted
    * to Spark-native microsecond TimestampType (truncation, matching DuckDB's
    * CAST(ts_ns AS TIMESTAMP)).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(dir, name))
        // integer division: ts is ~1.7e18 ns, double division would lose
        // precision below the microsecond
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(path(dir, name))
    }
  }

  /** Time-sliced events scan with the range predicate expressed against the
    * RAW nanosecond long — so it reaches the parquet scan as a pushed filter
    * (row-group min/max pruning). Filtering the post-conversion timestamp
    * column would evaluate above the scan and read every row group; at
    * 100 TB the difference is the whole game (this is the engine analog of
    * the reference's divisions-based `.loc` pruning, SURVEY §3.3).
    */
  def eventsTimeSlice(spark: SparkSession, dir: String,
      startIsoUtc: String, endIsoUtc: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def ns(iso: String): Long =
      java.time.Instant.parse(iso).getEpochSecond * 1000000000L +
        java.time.Instant.parse(iso).getNano
    spark.read.parquet(path(dir, "events"))
      .filter(col("ts") >= ns(startIsoUtc) && col("ts") < ns(endIsoUtc))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every fixture table as a temp view for spark.sql queries. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
