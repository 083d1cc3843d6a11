package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance resampling (operators/Dsir.scala): ratio-sign semantics,
  * weight ordering, zero-bigram survival, derandomized Gumbel determinism,
  * and the no-global-sort plan shape of the top-k.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target docs repeat "alpha beta", raw docs repeat "gamma delta"; one raw
  // doc speaks the target's language and must outrank its pool
  private lazy val docs = Seq(
    (1L, "alpha beta alpha beta alpha beta", "t"),
    (2L, "alpha beta alpha beta", "t"),
    (10L, "gamma delta gamma delta gamma delta", "r"),
    (11L, "gamma delta gamma delta", "r"),
    (12L, "alpha beta alpha beta alpha beta alpha beta", "r"),
    (13L, "solo", "r")
  ).toDF("doc_id", "text", "grp")

  private def weights = Dsir.importanceWeights9(
    docs, "doc_id", "text", col("grp") === "t", buckets = 64)

  test("target-like raw doc outranks raw-like docs; zero-bigram doc survives at 0") {
    val w = weights.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.keySet == Set(10L, 11L, 12L, 13L))
    assert(w(12L) > w(10L) && w(12L) > w(11L),
      s"target-like doc must score highest: $w")
    assert(w(13L) == 0L, "a doc with no bigrams carries weight 0, not a dropped row")
    assert(w(10L) < 0L, "a raw-only doc scores negative (its buckets are raw-heavy)")
  }

  test("bucket log ratios: target-heavy buckets positive, raw-heavy negative") {
    val lam = Dsir.bucketLogRatios9(
      Dsir.bigramBuckets(docs.filter($"grp" === "t"), "doc_id", "text", 64),
      Dsir.bigramBuckets(docs.filter($"grp" === "r"), "doc_id", "text", 64),
      64)
    assert(lam.count() == 64, "one ratio per bucket, observed or not")
    // 'alpha beta' appears 5x in target, 4x in raw (doc 12); with equal-ish
    // totals its bucket must be positive, 'gamma delta' (0 in target) negative
    val abBucket = Dsir.bigramBuckets(
      Seq((0L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text", 64)
      .select("bucket").as[Long].head()
    val gdBucket = Dsir.bigramBuckets(
      Seq((0L, "gamma delta")).toDF("doc_id", "text"), "doc_id", "text", 64)
      .select("bucket").as[Long].head()
    val byBucket = lam.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBucket(abBucket) > 0L, s"target-heavy bucket: ${byBucket(abBucket)}")
    assert(byBucket(gdBucket) < 0L, s"raw-only bucket: ${byBucket(gdBucket)}")
  }

  test("gumbel resample is deterministic per seed and weight-biased") {
    val w = weights.select("doc_id", "w9")
    val a = Dsir.gumbelTopK(w, k = 2, seed = "s1").select("doc_id")
      .as[Long].collect().toSet
    val b = Dsir.gumbelTopK(w, k = 2, seed = "s1").select("doc_id")
      .as[Long].collect().toSet
    assert(a == b, "same seed, same selection")
    // widen the gaps so weight dominates the O(1e9-scale) gumbel noise:
    // the heavy doc must appear under EVERY seed
    val spread = w.withColumn("w9",
      when($"doc_id" === 12L, lit(100L * 1000000000L)).otherwise($"w9"))
    Seq("s1", "s2", "s3").foreach { s =>
      val sel = Dsir.gumbelTopK(spread, k = 1, seed = s).select("doc_id")
        .as[Long].collect()
      assert(sel.sameElements(Array(12L)), s"seed $s picked ${sel.toSeq}")
    }
  }

  test("scoreCol9 expression equals the explode+join scorer bit-for-bit") {
    val lam9 = Dsir.collectRatios9(docs, "doc_id", "text",
      col("grp") === "t", buckets = 64)
    assert(lam9.length == 64)
    val viaExpr = docs.filter($"grp" =!= "t")
      .select($"doc_id", Dsir.scoreCol9($"text", lam9.toSeq, 64).as("w9"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJoin = weights.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaExpr == viaJoin, s"$viaExpr vs $viaJoin")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = Dsir.gumbelTopK(weights.select("doc_id", "w9"), 5, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("scoring joins the ratio table broadcast (hash, not nested-loop)") {
    val plan = weights.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
