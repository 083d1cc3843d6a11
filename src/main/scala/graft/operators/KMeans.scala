package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed Lloyd's k-means over `array<float>` embedding columns.
  *
  * The reference pipelines hand embedding workloads to single-node libraries;
  * here each Lloyd iteration is two Spark aggregations over the LONG format
  * (id, dim, value):
  *
  *   distances: explode once -> broadcast-join the k x dim centroid table on
  *     `dim` (map-side; centroids are model state, k*dim rows) -> one
  *     partial+final aggregation keyed (id, cid). Shuffle carries n*k
  *     scalar rows, never vectors.
  *   assignment: argmin as `min(struct(dist, cid))` — partial-aggregable,
  *     no window sort; ties (only possible for bit-identical distances)
  *     break on the lower cluster id in both engines.
  *   update: one aggregation keyed (cid, dim) over the assigned points.
  *
  * Determinism/oracle discipline: per-term decimal casts make every sum
  * order-independent, so centroids and inertia are bit-identical across
  * partitionings AND across engines — the whole 2-iteration fit is replayed
  * by a DuckDB CTE chain in q57's oracle. Seeds are the k ids with the
  * smallest `md5(id)` (portable deterministic init, k-means++-style spread
  * via hash uniformity).
  *
  * Scale: per iteration, the only data-sized shuffles are (id, cid, dist)
  * and the filtered (cid, dim, x) partial sums. The exploded points frame
  * is persisted once across all iterations (each Lloyd round scans it
  * twice: distance join + mean update); release with [[unpersistAll]].
  */
object KMeans {
  private val Dec = DecimalType(24, 15)

  // persisted exploded-points frames from fit(); released via
  // [[unpersistAll]] (same ownership contract as Dedup/Windowed)
  private val cachedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Release every exploded-points frame persisted by [[fit]]. */
  def unpersistAll(): Unit = {
    var df = cachedFrames.poll()
    while (df != null) {
      df.unpersist(blocking = false); df = cachedFrames.poll()
    }
  }

  /** Long-format view of a vector column: (id, dim [1-based], x double). */
  def explodeVec(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("pos", "xf")))
      .select(col("id"), (col("pos") + 1).as("dim"),
        col("xf").cast("double").as("x"))

  /** Seed centroid table (cid, dim, c): the k ids with the smallest
    * md5(id), cid = rank in that order. The ranking window runs over k
    * pre-limited rows (TakeOrderedAndProject), not the corpus.
    */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame = {
    val seeds = df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        md5(col(idCol).cast("string")).as("h"))
      .orderBy(col("h"), col("id"))
      .limit(k)
      .withColumn("cid",
        row_number().over(Window.orderBy(col("h"), col("id"))) - 1)
    seeds.select(col("cid"), posexplode(col("v")).as(Seq("pos", "cf")))
      .select(col("cid"), (col("pos") + 1).as("dim"),
        col("cf").cast("double").as("c"))
  }

  /** Squared L2 distance of every point to every centroid: (id, cid, dist).
    * Decimal per-term sums keep the result order-independent.
    */
  def distances(points: DataFrame, centroids: DataFrame): DataFrame =
    points.join(broadcast(centroids), "dim")
      .withColumn("t", ((col("x") - col("c")) * (col("x") - col("c"))).cast(Dec))
      .groupBy("id", "cid")
      .agg(sum(col("t")).cast("double").as("dist"))

  /** Nearest-centroid assignment: (id, cid, dist). */
  def assign(dists: DataFrame): DataFrame =
    dists.groupBy("id")
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("cid"), col("m.dist").as("dist"))

  /** Mean-update centroids from an assignment: (cid, dim, c). */
  def recompute(points: DataFrame, assignment: DataFrame): DataFrame =
    points.join(assignment.select("id", "cid"), "id")
      .groupBy("cid", "dim")
      .agg((sum(col("x").cast(Dec)).cast("double") / count(lit(1))).as("c"))

  /** Run `iters` Lloyd iterations from the md5 seeds; returns the final
    * assignment (id, cid, dist).
    *
    * Standard Lloyd's behavior on empty clusters: a cid that captures no
    * points after a reassignment drops out of the recomputed centroid
    * table and is never reconsidered, so the result can have fewer than
    * `k` distinct cids (no re-seeding). Callers sizing an IVF index must
    * read the cluster set from the assignment, not assume exactly k.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int)
      : DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val pts = explodeVec(df, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cachedFrames.add(pts)
    var centroids = seedCentroids(df, idCol, vecCol, k)
    var assignment = assign(distances(pts, centroids))
    var i = 1
    while (i < iters) {
      centroids = recompute(pts, assignment)
      assignment = assign(distances(pts, centroids))
      i += 1
    }
    assignment
  }

  /** Exact-summable inertia contribution: floor(dist * 1e6) as a long. */
  def inertia6(dist: Column): Column =
    floor(dist * 1e6).cast("long")
}
