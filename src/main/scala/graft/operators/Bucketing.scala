package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffling fact tables by their join key at
  * write time so repeated joins/aggregations on that key run with NO
  * exchange (SURVEY §4: "co-locate joins via bucketing").
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every query and shuffling it once at ingest: bucket both sides of a
  * recurring join on the same key and bucket count, and Catalyst plans a
  * SortMergeJoin over the existing layout.
  */
object Bucketing {

  /** Write `df` as a bucketed (+sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("compression", "zstd")
      .format("parquet")
      .saveAsTable(table)

  /** True if the executed plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
