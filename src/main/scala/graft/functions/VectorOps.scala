package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns.
  *
  * All helpers are built from `zip_with` / `aggregate` higher-order functions:
  * they run inside Catalyst (no Scala UDF serialization), accumulate
  * left-to-right in index order (deterministic, oracle-hash-friendly), and
  * compute in double precision regardless of the storage element type.
  *
  * Scale notes: these are per-row scalar computations — they parallelize
  * embarrassingly and never shuffle. For 100 TB ANN workloads the shuffle
  * cost lives in the join strategy (see [[graft.operators.Similarity]]), not
  * here.
  */
object VectorOps {
  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Left-to-right double-precision dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean (L2) norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity = dot(a,b) / (||a|| * ||b||). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared Euclidean distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Sign of the dot product with a deterministic pseudo-random hyperplane —
    * the building block for random-hyperplane LSH (SimHash for vectors).
    * The "hyperplane" for (seed, dim i) is a deterministic hash-derived value
    * in [-0.5, 0.5); planes are fixed across executors with zero driver state.
    */
  def hyperplaneSignBit(vec: Column, seed: Int): Column = {
    val proj = aggregate(
      zip_with(d(vec), sequence(lit(0), size(vec) - 1),
        (x, i) => x * (pmod(xxhash64(lit(seed), i), lit(1000000)).cast("double") / 1e6 - 0.5)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0.0, lit(1)).otherwise(lit(0))
  }

  /** Pack `nBits` hyperplane sign bits into a long bucket id for LSH. */
  def hyperplaneBucket(vec: Column, nBits: Int, seedBase: Int): Column =
    (0 until nBits).map { b =>
      hyperplaneSignBit(vec, seedBase + b).cast("long") * (1L << b)
    }.reduce(_ + _)
}
