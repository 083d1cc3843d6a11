package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Count-Min frequency sketch, relational formulation.
  *
  * A sketch is a depth x width counter TABLE (d, bucket, c) rather than an
  * opaque blob: counters are mergeable by cell-wise sum (partition-order
  * invariant — builds are deterministic under any repartitioning), the
  * whole thing is depth*width rows (a few hundred — broadcastable model
  * state), and the hash family is the same Carter–Wegman
  * `(a·x + b) mod 2³¹-1` the MinHash operators use
  * ([[Dedup.minHashCoeffs]]), so build AND estimate replay verbatim in
  * DuckDB SQL (q92's oracle grades the estimates cell-exactly, no
  * tolerance needed).
  *
  * Plan shape: build = explode `depth` (d, bucket) rows per key -> one
  * partial-aggregable groupBy(d, bucket); the shuffle is bounded by
  * depth*width regardless of corpus size. Estimate = broadcast the counter
  * table, left-join each query key's depth buckets, take the row-wise MIN
  * — the heavy-hitter / frequency-estimation primitive for streams and
  * 100 TB corpora where an exact per-key groupBy is the thing being
  * avoided.
  *
  * CMS guarantee: estimates NEVER underestimate (every bucket a key hashes
  * to counts at least all of that key's weight); overestimate ≤ 2N/width
  * with probability 1 - 2^-depth.
  */
object CountMin {
  import Dedup.MinHashP

  /** 48-bit portable key hash reduced into the Carter–Wegman domain. */
  def keyHash(key: Column): Column = Dedup.md5Hash48(key) % MinHashP

  /** The sketch row of key-hash `x` for function `d`:
    * ((a_d·x + b_d) mod p) mod width. a_d < p and x < p keep the product
    * under 2⁶² (no long overflow; same argument as MinHash).
    */
  def bucket(x: Column, d: Int, width: Int): Column = {
    val (a, b) = Dedup.minHashCoeffs(d + 1)(d)
    (((lit(a) * x + lit(b)) % MinHashP) % width).cast("int")
  }

  /** Build the counter table (d, bucket, c) over `keyCol`, each key
    * contributing `weight` (pass a count column to build from pre-grouped
    * keys; defaults to 1 per row).
    */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int,
      weight: Column = lit(1L)): DataFrame = {
    val x = keyHash(col(keyCol))
    df.select(weight.cast("long").as("__w"),
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("d"), bucket(x, d, width).as("bucket"))): _*))
          .as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(sum(col("__w")).as("c"))
  }

  /** Point-estimate the frequency of every key in `queries(keyCol)`
    * against a built counter table: adds `estCol` = min over d of the
    * key's counters (0 for buckets no key ever touched). The counter
    * table is broadcast — estimation is map-side except the final
    * per-key min aggregation over depth rows.
    */
  def estimate(queries: DataFrame, keyCol: String, counters: DataFrame,
      depth: Int, width: Int, estCol: String = "cms_estimate"): DataFrame = {
    val x = keyHash(col(keyCol))
    val probed = queries
      .withColumn("__db", explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(x, d, width).as("bucket"))): _*)))
      .select(queries.columns.map(col) :+ col("__db.d").as("d") :+
        col("__db.bucket").as("bucket"): _*)
      .join(broadcast(counters), Seq("d", "bucket"), "left")
    probed
      .groupBy(queries.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as(estCol))
  }
}
