package graft.operators

import org.apache.spark.sql.DataFrame

/** Round-robin SMALL inputs across cores before a CPU-bound explode
  * (winnow sketches, k-gram hashing, DSIR bucket hashing, NB tokenize):
  * a compact corpus in one parquet split would otherwise run entirely on
  * one core. Shared by every operator carrying the `spread` parameter.
  *
  * The decision is size-gated from the LOGICAL plan's statistics — no
  * physical planning, no `.rdd` partition probe (VERDICT r8 #6): inputs
  * whose estimated bytes exceed [[MaxSpreadBytes]] are left untouched,
  * because a full-scale scan is already wide, and repartitioning it
  * would add a corpus-sized shuffle AND potentially COLLAPSE thousands
  * of input splits down to one JVM's core count. `spread = false`
  * disables the exchange unconditionally (callers that know their
  * partitioning); `spread = true` means "spread if it looks small".
  */
private[graft] object Spread {
  /** Above this estimated input size, spreading is a pessimization. */
  val MaxSpreadBytes: Long = 1L << 30

  def apply(docs: DataFrame, spread: Boolean): DataFrame =
    if (!spread) docs
    else {
      val est = docs.queryExecution.optimizedPlan.stats.sizeInBytes
      if (est > BigInt(MaxSpreadBytes)) docs
      else docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    }
}
