package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction: weighted PageRank over the corpus word
  * co-occurrence graph (Mihalcea & Tarau 2004 — the unsupervised
  * keyword-extraction standard).
  *
  * Graph: nodes are lowercased words, undirected edges connect ADJACENT
  * words with weight = corpus-wide co-occurrence count (the bigram
  * explode is one pass over the native [[graft.functions.expressions
  * .Shingles]] output). Rank: damping 0.85, fixed iteration count.
  *
  * Oracle discipline — QUANTIZED PageRank: ranks live as 1e12-scaled
  * longs; each edge contribution is `floor(0.85 * pr * w / wout)` (double
  * product of exactly-representable quantities, floored per edge BEFORE
  * the sum), so every per-node sum is an exact long aggregation —
  * order-independent under any partitioning AND bit-identical in DuckDB,
  * which unrolls the same iterations as CTEs. The truncation error is
  * ≤ degree ulps per node per round — irrelevant for ranking, essential
  * for replay.
  *
  * Scale: per iteration, one broadcast-free join of the edge table to the
  * rank table on `src` (both hash-partitioned on the word) + one
  * partial-aggregable groupBy(dst). Edge count is corpus bigrams
  * aggregated to DISTINCT pairs — Zipf-bounded like every vocabulary
  * table; nothing grows with document count. The iteration count is a
  * literal (3 by default): lineage stays linear, no checkpointing needed
  * at this depth.
  */
object TextRank {

  /** (word, rank12) after `iters` rounds of quantized weighted PageRank
    * over the adjacency of `textCol` words. `rank12` is the 1e12-scaled
    * long rank — callers order by it (exact), dividing only for display.
    */
  def keywordRank(docs: DataFrame, textCol: String, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val bigrams = docs
      .select(explode(graft.functions.TextOps
        .shingles(lower(col(textCol)), 2)).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("a"),
        split(col("bg"), " ").getItem(1).as("b"))
    // undirected: symmetrize, then weight = co-occurrence count
    val edges = bigrams
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val wout = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    // node count as an IN-PLAN broadcast scalar, not a driver count():
    // wout's exchange already appears in every iteration's join, so
    // ReuseExchange absorbs this 1-row aggregate — where a count() action
    // forced one extra full bigram-scan job before iteration 1. The
    // arithmetic keeps the exact double operation order of the previous
    // driver-side math (and of the oracle's scalar subqueries), so rank12
    // values are bit-identical.
    val nDf = wout.agg(count(lit(1)).as("__n"))
    val baseCol = floor(lit((1.0 - damping) * 1e12) / col("__n")).cast("long")
    var pr = wout.crossJoin(broadcast(nDf))
      .select(col("src").as("word"),
        floor(lit(1e12) / col("__n")).cast("long").as("rank12"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(wout, "src")
        .join(pr.withColumnRenamed("word", "src"), "src")
        .select(col("dst").as("word"),
          floor(lit(damping) * col("rank12") * col("w") / col("wout"))
            .cast("long").as("c"))
        .groupBy("word").agg(sum(col("c")).as("cs"))
      // undirected graph => every node has in-edges; inner join is total
      pr = contrib.crossJoin(broadcast(nDf))
        .select(col("word"), (col("cs") + baseCol).as("rank12"))
    }
    pr
  }
}
