package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax epoch-capped budget allocation (Chung et al., "UniMax: Fairer and
  * More Effective Language Sampling for Large-Scale Multilingual
  * Pretraining", ICLR 2023, arXiv:2304.09151).
  *
  * Given one row per source with its token count, a total training-token
  * budget, and a per-source epoch cap E, UniMax hands out the budget by
  * water-filling: sources are visited smallest-first and each receives
  * `min(E * n_tokens, remaining_budget / remaining_sources)` — small sources
  * get their full E epochs, large sources split what is left evenly. The
  * standard companion to temperature sampling (q78): temperature reweights
  * ratios, UniMax bounds repetition explicitly.
  *
  * The sequential greedy collapses to a closed form: since caps are visited
  * in ascending order, once one source overflows its candidate level
  * `(budget - allocated_so_far) / remaining`, every later source overflows
  * the SAME level (the remainder and the divisor shrink in lockstep), so the
  * allocation is `min(cap_i, t)` with a single threshold t — computable as
  * one sort + prefix sum over the per-source frame plus a one-row broadcast
  * threshold join. No driver loop, no iteration, no action.
  *
  * Scale: the only unpartitioned window runs over the per-SOURCE frame —
  * one row per corpus source (tens to a few thousand rows at any corpus
  * size), the same bounded-frame discipline as the PSI bin spine. The
  * per-document token counting that FEEDS this frame is an ordinary
  * map-side-combined aggregation.
  *
  * All arithmetic up to the threshold is exact long math (the budget is a
  * per-mille of total tokens, computed with integral `DIV`); the threshold
  * itself and the epochs column are IEEE-double ops replayed operation-for-
  * operation by the DuckDB oracle, with results floored onto integer grids
  * (whole tokens; 1e-6 epochs) so the hash compare is exact.
  */
object Unimax {

  /** Water-fill `budgetPerMille`/1000 x total tokens across sources, capping
    * every source at `epochCap` epochs.
    *
    * Input: `counts` with one row per source: (`sourceCol`, `tokensCol`).
    * Output: one row per source, ordered by source —
    * (source, n_tokens, cap, alloc_tokens, epochs6) where `cap` =
    * epochCap x n_tokens, `alloc_tokens` = floor of the UniMax allocation
    * in whole tokens, and `epochs6` = floor(alloc/n_tokens x 1e6) — the
    * realized epoch count on the 1e-6 grid (<= epochCap x 1e6 by
    * construction).
    */
  def allocate(counts: DataFrame, sourceCol: String, tokensCol: String,
      budgetPerMille: Long, epochCap: Int): DataFrame = {
    require(budgetPerMille >= 0, s"budgetPerMille=$budgetPerMille < 0")
    require(epochCap >= 1, s"epochCap=$epochCap < 1")
    // bounded frame: one row per source (see scaladoc above)
    val wOrd = Window.orderBy(col("cap").asc, col(sourceCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRn = Window.orderBy(col("cap").asc, col(sourceCol).asc)
    val wAll = Window.partitionBy()
    val base = counts
      .select(col(sourceCol).as("source"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("cap", col("n_tokens") * epochCap)
      .withColumn("rn", row_number().over(wRn))
      .withColumn("pre", sum(col("cap")).over(wOrd))
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("n_tokens")).over(wAll))
      // integral DIV: exact at any corpus size (no double rounding)
      .withColumn("budget", expr(s"(total * $budgetPerMille) DIV 1000"))
      .withColumn("tcand",
        (col("budget") - (col("pre") - col("cap"))).cast("double")
          / (col("k") - col("rn") + 1).cast("double"))
      .withColumn("overflow", col("cap").cast("double") > col("tcand"))
    // the water level: the candidate at the FIRST overflowing source (by
    // rn); empty (null) when the caps sum to less than the budget, in which
    // case every source simply takes its cap
    val thr = base.filter(col("overflow"))
      .agg(min(struct(col("rn"), col("tcand"))).as("m"))
      .select(col("m.rn").as("trn"), col("m.tcand").as("tval"))
    base.join(broadcast(thr))
      .withColumn("alloc_tokens",
        when(col("trn").isNull || col("rn") < col("trn"), col("cap"))
          .otherwise(floor(col("tval")).cast("long")))
      .withColumn("epochs6",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(floor(col("alloc_tokens").cast("double")
            / col("n_tokens").cast("double") * 1e6).cast("long")))
      .select("source", "n_tokens", "cap", "alloc_tokens", "epochs6")
      .orderBy("source")
  }
}
