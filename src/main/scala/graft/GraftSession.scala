package graft

import org.apache.spark.sql.SparkSession

/** User-facing session factory with the engine's recommended configuration
  * (what a production deployment would set; local[n] for single-node use).
  */
object GraftSession {
  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.parquet.compression.codec", "zstd")

  /** Build and register the engine's SQL surface (custom expressions +
    * the composite operator functions).
    */
  def create(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    graft.functions.expressions.DecodeExpressions.registerAll(spark)
    graft.functions.SqlFunctions.registerAll(spark)
    spark
  }
}
