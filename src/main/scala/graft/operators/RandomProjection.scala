package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Johnson–Lindenstrauss random projection for embedding compression.
  *
  * Projects dim-d vectors onto k pseudo-random hyperplanes (the same
  * md5-derived plane family as the LSH operators — deterministic, no
  * fitted model to ship, replayable in SQL). Distances contract by
  * ~sqrt(k/12)/|x| factors with bounded distortion (the JL lemma), which
  * is what makes 4x-16x cheaper ANN/dedup passes over compressed vectors
  * sound.
  *
  * The projection here uses the RELATIONAL formulation — explode to
  * (id, i, x), broadcast-join the k x d plane table, one partial-
  * aggregable (id, j) sum — with per-term decimal casts, so projections
  * are order-independent and engine-identical (q71's oracle derives the
  * SAME planes from md5 in SQL). A per-row HOF dot product (16 aggregates
  * x 64 terms, interpreted) would avoid the explode but run ~1024
  * interpreted ops/row; at 100 TB the winning variant is a codegen'd
  * custom Expression — the plan shape below is the portable middle.
  */
object RandomProjection {
  private val Dec = DecimalType(24, 15)

  /** Plane table (j, i, p): plane j, input dim i (1-based),
    * p = (md5_48("seed+j:i") mod 1e6)/1e6 - 0.5 — matches
    * functions.VectorOps.hyperplaneVals.
    */
  def planesDF(spark: SparkSession, k: Int, dim: Int, seedBase: Int)
      : DataFrame = {
    import spark.implicits._
    (0 until k).flatMap { j =>
      graft.functions.VectorOps.hyperplaneVals(seedBase + j, dim)
        .zipWithIndex.map { case (p, i) => (j, i + 1, p) }
    }.toDF("j", "i", "p")
  }

  /** Long-format projections (id, j, proj) of a vector column. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      planes: DataFrame): DataFrame =
    df.select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("pos", "xf")))
      .select(col("id"), (col("pos") + 1).as("i"),
        col("xf").cast("double").as("x"))
      .join(broadcast(planes), "i")
      .groupBy("id", "j")
      .agg(sum((col("x") * col("p")).cast(Dec)).cast("double").as("proj"))
}
