package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): cluster the embedding space
  * with k-means, then remove near-duplicate members WITHIN each cluster by
  * pairwise cosine — the clustering makes the quadratic step tractable by
  * construction, because k grows with the corpus so per-cluster size stays
  * bounded (the paper uses ~10k clusters for LAION-scale data). Where
  * [[Dedup.embeddingNearDups]] answers "which PAIRS are near-dups"
  * (LSH-bucketed), SemDeDup answers "which ROWS survive semantic
  * deduplication" with a deterministic keep rule.
  *
  * Keep rule: within a cluster, a row is removed iff some SMALLER id in
  * the same cluster is within `minCosine` of it (the paper keeps one
  * random representative per similar group; min-id is the deterministic,
  * oracle-replayable equivalent).
  *
  * Plan shape, reading 100 TB:
  *  - the k-means fit is [[KMeans.fit]]'s broadcast-centroid plan (no
  *    explode, no point-id shuffle);
  *  - the within-cluster self-join shuffles BOTH sides once on `cid` and
  *    is quadratic only per cluster — sized by n/k, held bounded by
  *    scaling k with the corpus; a skew-collapsed cluster (everything in
  *    one cell) is an input-quality signal, and the fallback is the LSH
  *    pair path, not a bigger join;
  *  - cosine runs on the codegen'd [[VectorOps.dot]]; pairs carry only
  *    (cid, id) beyond the filter.
  */
object SemDedup {

  // persisted assignment frames from clusterStats/survivorsAuto; released
  // via [[unpersistAll]] (same ownership contract as Dedup/KMeans). The
  // k-means assignment is reused by several branches of each entry point
  // (size spine, survivor anti-side, both sides of the within-cluster
  // self-join) — unpersisted, every branch would recompute the whole
  // iterative fit (measured 20 s -> 3.5 s for q103b at bench scale).
  private val cachedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Release every assignment frame persisted by the entry points. */
  def unpersistAll(): Unit = {
    var df = cachedFrames.poll()
    while (df != null) {
      df.unpersist(blocking = false); df = cachedFrames.poll()
    }
  }

  private def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cachedFrames.add(p)
    p
  }

  /** Distinct removed ids per cluster: (cid, id) — rows that have a
    * same-cluster neighbor with a smaller id at cosine >= `minCosine`.
    */
  def removals(emb: DataFrame, idCol: String, vecCol: String,
      assignment: DataFrame, minCosine: Double): DataFrame = {
    val m = assignment.select(col("id"), col("cid"))
      .join(emb.select(col(idCol).as("id"), col(vecCol).as("__v")), "id")
    m.as("a").join(m.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .filter(VectorOps.cosine(col("a.__v"), col("b.__v")) >= minCosine)
      .select(col("b.cid").as("cid"), col("b.id").as("id"))
      .distinct()
  }

  /** Full SemDeDup pass: fit k-means (`k`, `iters` — md5-deterministic
    * seeds, see [[KMeans.fit]]), remove within-cluster near-dups, report
    * per-cluster (cluster, n, n_removed, n_kept).
    */
  def clusterStats(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, minCosine: Double): DataFrame = {
    val a = persisted(KMeans.fit(emb, idCol, vecCol, k, iters))
    val rem = removals(emb, idCol, vecCol, a, minCosine)
      .groupBy("cid").agg(count(lit(1)).as("n_removed"))
    a.groupBy("cid").agg(count(lit(1)).as("n"))
      .join(rem, Seq("cid"), "left")
      .na.fill(0L, Seq("n_removed"))
      .select(col("cid").as("cluster"), col("n"), col("n_removed"),
        (col("n") - col("n_removed")).as("n_kept"))
      .orderBy("cluster")
  }

  /** The surviving rows themselves (id column only — join back to the
    * source for payloads): everything not in [[removals]].
    */
  def survivors(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, minCosine: Double): DataFrame = {
    val a = persisted(KMeans.fit(emb, idCol, vecCol, k, iters))
    a.select("id").except(
      removals(emb, idCol, vecCol, a, minCosine).select("id"))
      .select(col("id").as(idCol))
  }

  /** The scale contract, executable: k = ceil(n / targetClusterSize),
    * clamped to >= 1 — so per-cluster size stays bounded BY CONSTRUCTION
    * as the corpus grows, instead of being asserted in prose. ONE bounded
    * count() parameterizes the fit (the centroid count must be a literal
    * for the k-means seed ranking) — the same justification as
    * [[Dedup.embeddingNearDups]]'s size gate.
    */
  def deriveK(emb: DataFrame, targetClusterSize: Int): Int = {
    require(targetClusterSize >= 1,
      s"targetClusterSize must be >= 1, got $targetClusterSize")
    val n = emb.count()
    math.max(1L, (n + targetClusterSize - 1) / targetClusterSize).toInt
  }

  /** [[removals]] with the per-cluster size cap the scaladoc promises:
    * clusters whose population exceeds `maxClusterSize` (skew collapse —
    * an input-quality signal, e.g. a constant-embedding corpus) skip the
    * quadratic self-join and fall back to the LSH pair path
    * ([[Dedup.embeddingNearDupsLsh]]) restricted to same-cluster pairs, so
    * the worst case is the banded-candidate join, never a quadratic
    * explosion. Within-cap clusters are byte-identical to [[removals]];
    * over-cap clusters trade exactness for the LSH recall curve (graded by
    * q45's recall harness).
    */
  def removalsGuarded(emb: DataFrame, idCol: String, vecCol: String,
      assignment: DataFrame, minCosine: Double, maxClusterSize: Int)
      : DataFrame = {
    // the over-cap cluster set is <= k rows (model state, like the
    // centroid table) — collect it once so the common no-skew case plans
    // the pure exact path with zero LSH machinery (bucketing, dimOf scan)
    val hot = assignment.groupBy("cid").agg(count(lit(1)).as("__cn"))
      .filter(col("__cn") > maxClusterSize)
      .select("cid").collect().map(_.get(0))
    if (hot.isEmpty)
      return removals(emb, idCol, vecCol, assignment, minCosine)
    val base = assignment.select(col("id"), col("cid"))
    val small = base.filter(!col("cid").isInCollection(hot.toSeq))
    val large = base.filter(col("cid").isInCollection(hot.toSeq))
    val exact = removals(emb, idCol, vecCol, small, minCosine)
    val largeEmb = emb
      .select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(large.select("id"), "id")
    val lshRemoved = Dedup
      .embeddingNearDupsLsh(largeEmb, "id", "__v", minCosine)
      .join(large.select(col("id").as("id_a"), col("cid").as("cid_a")),
        "id_a")
      .join(large.select(col("id").as("id_b"), col("cid").as("cid_b")),
        "id_b")
      .filter(col("cid_a") === col("cid_b"))
      .select(col("cid_b").as("cid"), col("id_b").as("id"))
      .distinct()
    // the two branches cover disjoint cluster sets — union, no re-dedup
    exact.unionByName(lshRemoved)
  }

  /** Full derived-k SemDeDup pass: fit with k from [[deriveK]], remove
    * within-cluster near-dups under the [[removalsGuarded]] cap
    * (`maxClusterFactor` x the target size), return survivors. This is
    * the production entry point — the fixed-k [[survivors]] is the
    * benchmark/oracle form for a known corpus.
    */
  def survivorsAuto(emb: DataFrame, idCol: String, vecCol: String,
      targetClusterSize: Int, iters: Int, minCosine: Double,
      maxClusterFactor: Int = 8): DataFrame = {
    val k = deriveK(emb, targetClusterSize)
    val a = persisted(KMeans.fit(emb, idCol, vecCol, k, iters))
    val cap = math.max(targetClusterSize.toLong * maxClusterFactor,
      targetClusterSize.toLong).min(Int.MaxValue).toInt
    a.select("id").except(
      removalsGuarded(emb, idCol, vecCol, a, minCosine, cap).select("id"))
      .select(col("id").as(idCol))
  }
}
