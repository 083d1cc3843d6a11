package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export: the corpus layout a data loader actually reads.
  *
  * Documents are hash-bucketed into `nShards` shards (deterministic in
  * doc_id — re-running the export reproduces the same shard membership,
  * which is what makes mid-training restarts and data ablations
  * reproducible) and written one directory per shard, rows ordered by a
  * salted content hash so every shard is internally pre-shuffled: a loader
  * can stream a shard sequentially and still see an unbiased sample mix.
  *
  * Scale: one shuffle on the shard id (the write's `repartition`), files
  * sized by `maxRecordsPerFile` so a 100 TB corpus lands as uniformly-sized
  * parquet parts regardless of executor count. No global sort: ordering is
  * `sortWithinPartitions`, local to each shard's writer task.
  */
object CorpusExport {

  def writeShards(docs: DataFrame, idCol: String, outDir: String,
      nShards: Int, maxRecordsPerFile: Int = 1000000,
      orderSalt: String = "shard0"): Unit = {
    docs
      .withColumn("shard",
        pmod(xxhash64(col(idCol)), lit(nShards.toLong)).cast("int"))
      .withColumn("__ord",
        md5(concat(col(idCol).cast("string"), lit("#" + orderSalt))))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "__ord")
      .drop("__ord")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy("shard")
      .parquet(outDir)
  }
}
