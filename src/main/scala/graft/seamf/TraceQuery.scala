package graft.seamf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query ergonomics mirroring the reference's selector utilities.
  *
  * `trace()` (util.py:97-128): dict-key pick + level-equality selection +
  * column projection over the long tables. `timeSlice` reproduces the
  * partial-string time slicing of the demos (`.loc["2023-09-21 20:50":...]`,
  * dask_processing cell 6) as range predicates that prune date partitions
  * when reading from a [[SeamfLake]] layout.
  */
object TraceQuery {

  /** Level-equality selection + projection (reference `trace()`).
    *
    * @param levels equality predicates on label columns, e.g.
    *               Map("detector" -> "rms", "frequency" -> 3.555e9)
    * @param columns projection (empty = all remaining columns); selected
    *               level columns are dropped like pandas `.xs`.
    */
  def trace(tables: Map[String, DataFrame], product: String,
      levels: Map[String, Any], columns: Seq[String] = Nil): DataFrame = {
    val df = tables.getOrElse(product,
      throw new IllegalArgumentException(s"no such product: $product"))
    val filtered = levels.foldLeft(df) { case (d, (k, v)) => d.filter(col(k) === v) }
    val dropped = filtered.drop(levels.keys.toSeq: _*)
    if (columns.isEmpty) dropped else dropped.select(columns.map(col): _*)
  }

  /** Partial-string-style time slice: [start, end) on a timestamp column,
    * ISO strings (UTC). A date-only string means the whole day.
    */
  def timeSlice(df: DataFrame, tsCol: String, start: String, end: String): DataFrame = {
    def ts(s: String, endOfDay: Boolean): String =
      if (s.length == 10) (if (endOfDay) s + "T23:59:59.999999Z" else s + "T00:00:00Z")
      else if (s.endsWith("Z")) s else s.replace(" ", "T") + "Z"
    df.filter(col(tsCol) >= lit(java.sql.Timestamp.from(
        java.time.Instant.parse(ts(start, endOfDay = false)))) &&
      col(tsCol) <= lit(java.sql.Timestamp.from(
        java.time.Instant.parse(ts(end, endOfDay = true)))))
  }

  /** Read one product from a [[SeamfLake]] layout with the day range pushed
    * into the `date` partition column (the Spark analog of Dask divisions
    * pruning, SURVEY §3.3): only matching `date=` directories are listed.
    */
  def readTimeRange(spark: org.apache.spark.sql.SparkSession, lakeDir: String,
      table: String, startDay: String, endDay: String): DataFrame =
    spark.read.parquet(s"$lakeDir/$table")
      .filter(col("date") >= startDay && col("date") <= endDay)
}
