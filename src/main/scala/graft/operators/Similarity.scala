package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Two strategies:
  *  - [[bruteForceTopK]]: exact cosine top-k via a (queries x corpus) join.
  *    Queries are broadcast (they are the small side by construction), the
  *    corpus streams through map-side — no shuffle of the corpus, and the
  *    per-query top-k is a windowed rank over (query, corpus) scores. Exact
  *    baseline + the right plan when |queries| is small even at 100 TB corpus.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing (deterministic,
  *    hash-derived hyperplanes so executors need no shared state). Corpus and
  *    queries are bucketed; only same-bucket candidates are scored across
  *    `nTables` independent tables, trading recall for a ~2^nBits reduction
  *    in comparisons. This is the 100 TB scale path; the shuffle key is
  *    (table, bucket).
  */
object Similarity {
  /** Exact top-k cosine neighbors for each query vector.
    * Output: query_id, neighbor_id, rank, cosine.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.cosine(col("qv"), col("cv")))
    Windowed.topKPerGroup(scored, Seq("query_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** IVF-style approximate top-k: the corpus is partitioned into `nCells`
    * Voronoi cells around pseudo-centroids (a deterministic hash-sample of
    * corpus vectors — at 100 TB a real k-means fit would run as a periodic
    * batch job, but cell assignment/probing is identical); queries probe the
    * `nProbe` nearest cells and re-rank exactly within them.
    *
    * Plan shape: centroids are a tiny broadcast; corpus assignment is one
    * map-side argmin per row (no shuffle); the probe join shuffles only on
    * cell id. Comparisons drop by ~nCells/nProbe vs brute force.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    // deterministic pseudo-centroids: the nCells corpus vectors with the
    // smallest xxhash64(id) — stable, data-dependent, skew-free
    val centroids = corpus
      .select(col(idCol).as("cent_src"), col(vecCol).as("cent_vec"))
      .withColumn("__h", xxhash64(col("cent_src")))
      .orderBy("__h").limit(nCells)
      .withColumn("cell", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("__h")) - 1)
      .select("cell", "cent_vec")

    def assign(df: DataFrame, id: String, vec: String, n: Int): DataFrame = {
      val scored = df.select(col(idCol).as(id), col(vecCol).as(vec))
        .join(broadcast(centroids))
        .withColumn("__sim", VectorOps.cosine(col(vec), col("cent_vec")))
      Windowed.topKPerGroup(scored, Seq(id),
          Seq(col("__sim").desc, col("cell").asc), n)
        .select(col(id), col(vec), col("cell"))
    }

    val corpusCells = assign(corpus, "neighbor_id", "cv", 1)
    val queryCells = assign(queries, "query_id", "qv", nProbe)
    val cand = corpusCells.join(queryCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .distinct()
      .withColumn("cosine", VectorOps.cosine(col("qv"), col("cv")))
    Windowed.topKPerGroup(cand, Seq("query_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** LSH-bucketed approximate top-k cosine neighbors.
    * `nTables` independent hash tables of `nBits` hyperplane bits each;
    * candidates = same bucket in any table; exact cosine re-rank of the
    * candidate set.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nBits: Int = 8, nTables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          explode(array((0 until nTables).map { t =>
            struct(lit(t).as("table"),
              VectorOps.hyperplaneBucket(col(vecCol), nBits, t * 1000).as("bucket"))
          }: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.table"), col("tb.bucket"))

    val c = bucketed(corpus, "neighbor_id", "cv")
    val q = bucketed(queries, "query_id", "qv")
    val cand = c.join(q, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .distinct()
      .withColumn("cosine", VectorOps.cosine(col("qv"), col("cv")))
    Windowed.topKPerGroup(cand, Seq("query_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
