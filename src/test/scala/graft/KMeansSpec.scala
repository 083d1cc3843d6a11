package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Sampling}

/** Lloyd k-means invariants (determinism under repartitioning, monotone
  * inertia, exhaustive assignment) and stratified-sample properties.
  */
class KMeansSpec extends SparkSpec {

  private def emb = Tables.load(spark, sf(), "embeddings")

  test("assignment covers every point exactly once and inertia improves") {
    val n = emb.count()
    val a1 = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 1)
    val a2 = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    assert(a1.count() === n)
    assert(a2.count() === n)
    assert(a2.select(countDistinct(col("id"))).head.getLong(0) === n)
    val i1 = a1.agg(sum("dist9")).head.getLong(0)
    val i2 = a2.agg(sum("dist9")).head.getLong(0)
    // Lloyd's algorithm never increases total inertia between iterations;
    // each scaled-floor term is within 1 of the true scaled value, so
    // allow dim slack per point on the 1e9 scale
    assert(i2 <= i1 + 64L * n, s"inertia rose: $i1 -> $i2")
  }

  test("fit is bit-identical under repartitioning") {
    val base = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("id").collect()
    val shuffled = KMeans.fit(emb.repartition(7), "vec_id", "embedding",
      k = 4, iters = 2).orderBy("id").collect()
    assert(base.sameElements(shuffled))
  }

  test("seed centroids are the k smallest md5 ids, ranked") {
    val seeds = KMeans.seedCentroids(emb, "vec_id", "embedding", 3)
    // k=3 seeds x 64 dims
    assert(seeds.count() === 3 * 64)
    assert(seeds.select(countDistinct(col("cid"))).head.getLong(0) === 3)
    assert(seeds.agg(min("cid"), max("cid")).head ===
      org.apache.spark.sql.Row(0, 2))
  }

  test("stratifiedTake returns k per stratum, stable under repartition") {
    val docs = Tables.load(spark, sf(), "documents")
    val take = Sampling.stratifiedTake(docs, col("lang"), col("doc_id"), 3)
    val perLang = take.groupBy("lang").count().collect()
    assert(perLang.forall(_.getLong(1) <= 3))
    val again = Sampling
      .stratifiedTake(docs.repartition(5), col("lang"), col("doc_id"), 3)
      .select("lang", "sample_rank", "doc_id").orderBy("lang", "sample_rank")
      .collect()
    val base = take.select("lang", "sample_rank", "doc_id")
      .orderBy("lang", "sample_rank").collect()
    assert(base.sameElements(again))
  }
}
