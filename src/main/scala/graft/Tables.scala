package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the relational fixture tables (see TESTDATA.md / FIXTURES.md).
  *
  * Scale notes (100 TB design):
  *  - Loads are plain parquet scans: column pruning + predicate pushdown reach
  *    the scan via Catalyst, so callers should filter/select on the returned
  *    DataFrame rather than materializing it.
  *  - `events.ts` has shipped under two encodings: parquet TIMESTAMP(NANOS)
  *    (unreadable natively by Spark — we read the raw long via `nanosAsLong`
  *    and floor-divide to microseconds) and plain TIMESTAMP(MICROS) with
  *    isAdjustedToUTC=false (Spark reads TIMESTAMP_NTZ; under the UTC
  *    session zone a cast to TimestampType is the identity on the epoch
  *    micros, matching DuckDB's CAST(ts AS TIMESTAMP)). The loader detects
  *    which encoding is on disk from the footer schema and normalizes both
  *    to Spark-native TimestampType inside whole-stage codegen (no UDF).
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
      normalizeTs(spark.read.parquet(path(dir, name)))
    } else {
      spark.read.parquet(path(dir, name))
    }
  }

  /** Normalize the on-disk `ts` encoding to Spark-native TimestampType:
    * raw nanosecond longs floor-divide to micros (integer division — ts is
    * ~1.7e18 ns, double division would lose precision below the
    * microsecond); TIMESTAMP_NTZ casts (identity micros under the UTC
    * session zone); native timestamps pass through.
    */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Time-sliced events scan with the range predicate expressed against the
    * RAW on-disk column type — so it reaches the parquet scan as a pushed
    * filter (row-group min/max pruning). Filtering the post-conversion
    * timestamp column would evaluate above the scan and read every row
    * group; at 100 TB the difference is the whole game (this is the engine
    * analog of the reference's divisions-based `.loc` pruning, SURVEY §3.3).
    */
  def eventsTimeSlice(spark: SparkSession, dir: String,
      startIsoUtc: String, endIsoUtc: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val start = java.time.Instant.parse(startIsoUtc)
    val end = java.time.Instant.parse(endIsoUtc)
    val raw = spark.read.parquet(path(dir, "events"))
    val sliced = raw.schema("ts").dataType match {
      case LongType =>
        def ns(i: java.time.Instant): Long =
          i.getEpochSecond * 1000000000L + i.getNano
        raw.filter(col("ts") >= ns(start) && col("ts") < ns(end))
      case TimestampNTZType =>
        // NTZ wall clock is UTC by fixture convention: compare against
        // LocalDateTime literals so the pushed filter type-matches the scan
        def ldt(i: java.time.Instant) =
          java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
        raw.filter(col("ts") >= lit(ldt(start)) && col("ts") < lit(ldt(end)))
      case _ =>
        raw.filter(col("ts") >= lit(start) && col("ts") < lit(end))
    }
    normalizeTs(sliced)
  }

  /** Register every fixture table as a temp view for spark.sql queries. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
