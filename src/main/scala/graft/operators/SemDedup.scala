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
    val a = KMeans.fit(emb, idCol, vecCol, k, iters)
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
    val a = KMeans.fit(emb, idCol, vecCol, k, iters)
    a.select("id").except(
      removals(emb, idCol, vecCol, a, minCosine).select("id"))
      .select(col("id").as(idCol))
  }
}
