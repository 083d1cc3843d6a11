package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Coreset selection by k-center greedy (farthest-point sampling):
  * Gonzalez 1985's 2-approximation to the k-center cover, the standard
  * diversity-selection primitive for data pruning / active learning
  * (Sener & Savarese, ICLR 2018, arXiv:1708.00489).
  *
  * Algorithm: seed with the smallest id, then repeatedly add the corpus
  * point FARTHEST from the already-selected set (max over points of min
  * squared distance to any center). The chosen point's distance is the
  * squared coverage radius at that step — monotonically non-increasing,
  * and the sequence of radii is the quality curve of the selection.
  *
  * Distribution: each round is one map-side pass — min distance to the
  * <= k selected centers embedded as an ARRAY LITERAL (the
  * [[Similarity.assignCells]] discipline), so there is NO shuffle and no
  * window; the per-round argmax is a TakeOrdered over (dmin desc, id asc)
  * returning a single row. Driver state is k centers x dim floats —
  * bounded and tiny at any corpus size (the [[Similarity.centroidsOf]]
  * argument). k rounds = k jobs; at 100 TB you run this on the
  * representative sample / cluster-centroid table the pipeline already
  * maintains, not the raw corpus — the operator's cost model is k linear
  * passes whatever the input.
  *
  * Cross-engine determinism: the squared distance is composed ONLY of
  * native dot products — `(dot(v,v) + dot(c,c)) - 2*dot(v,c)` — the exact
  * double op sequence DuckDB's `list_dot_product` replays, so the greedy
  * trajectory (argmax ties broken by smallest id) is reproducible
  * cell-for-cell in portable SQL.
  */
object Coreset {

  /** Squared Euclidean distance via three dots — see determinism note. */
  private def dsq(a: Column, b: Column): Column =
    (VectorOps.dot(a, a) + VectorOps.dot(b, b)) - lit(2.0) * VectorOps.dot(a, b)

  /** Select `k` centers greedily. Output: one row per selection step,
    * ordered by step — (step, id-named-as-input, radius_sq) where
    * `radius_sq` is the squared distance from the chosen point to the
    * nearest prior center (NULL for the seed).
    */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k < 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))

    val seed = base.orderBy(col("id").asc).limit(1)
      .as[(Long, Array[Float])].collect()
    if (seed.isEmpty)
      return Seq.empty[(Int, Long, java.lang.Double)]
        .toDF("step", idCol, "radius_sq")
    var centers = Vector[(Long, Array[Float])](seed.head)
    var out = Vector[(Int, Long, java.lang.Double)](
      (1, seed.head._1, null))

    var step = 2
    var exhausted = false
    while (step <= k && !exhausted) {
      // explicit least-chain over per-center array literals: pairwise
      // least is exact min (no rounding), mirrors the oracle's n-ary LEAST
      val dmin = centers.map { case (_, v) =>
        dsq(col("v"), array(v.map(lit(_)): _*))
      }.reduce(least(_, _))
      val picked = base
        .filter(!col("id").isin(centers.map(_._1): _*))
        .withColumn("dmin", dmin)
        .orderBy(col("dmin").desc, col("id").asc).limit(1)
        .as[(Long, Array[Float], Double)].collect()
      if (picked.isEmpty) exhausted = true // corpus smaller than k
      else {
        val (id, v, d) = picked.head
        centers :+= ((id, v))
        out :+= ((step, id, Double.box(d)))
        step += 1
      }
    }
    out.toDF("step", idCol, "radius_sq")
  }
}
