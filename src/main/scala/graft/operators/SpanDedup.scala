package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring detection — the k-gram approximation of
  * suffix-array substring dedup (Lee et al. 2021, "Deduplicating Training
  * Data Makes Language Models Better"): any substring of length >= k that
  * occurs in two or more documents is covered by at least one shared
  * character k-gram, so flagging positions whose k-gram recurs across
  * documents and merging overlapping flags yields exactly the spans a
  * suffix-array pass would mark (up to the k-1 tail of each repeat).
  * Passage dedup (q76) removes whole repeated PASSAGES; this finds
  * repeated RANGES at character granularity — the form that catches
  * licenses, boilerplate headers, and templated text mid-document.
  *
  * Plan shape, reading 100 TB:
  *  - gram emission is a map-side explode: one row per character position,
  *    hashed to a full 128-bit md5 before anything shuffles (positions
  *    carry a 32-char hex, never the raw text);
  *  - the duplicated-gram set is ONE groupBy over gram hashes with
  *    partial aggregation (count-distinct-docs, capped semantics not
  *    needed: the group value is a 2-bound flag, not a pair explosion —
  *    unlike Jaccard's inverted index there is no quadratic emission);
  *  - flagged positions come back via a shuffle join on the gram hash
  *    (both sides corpus-sized; hot boilerplate grams are single GROUPS,
  *    handled by AQE skew splitting, never cross products);
  *  - interval merging is a per-document window ordered by position —
  *    partition size is bounded by document LENGTH, not corpus size.
  */
object SpanDedup {

  /** (id, pos, h): every character position 1..len-k+1 with the md5 hex of
    * its k-gram. Documents shorter than k emit nothing.
    */
  def grams(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"gram length must be >= 2, got $k")
    docs.filter(length(col(textCol)) >= k)
      .select(col(idCol).as("id"),
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("pos"),
        col(textCol))
      .select(col("id"), col("pos"),
        md5(col(textCol).substr(col("pos"), lit(k))).as("h"))
  }

  /** Merged duplicated spans: (id, span_start, span_end) half-open
    * character ranges (1-based start, exclusive end) covering every
    * position whose k-gram occurs in >= `minDf` distinct documents,
    * with overlapping/adjacent flagged grams coalesced.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDf: Int = 2): DataFrame = {
    val g = grams(docs, idCol, textCol, k)
    val dup = g.groupBy("h")
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
      .select("h")
    val flagged = g.join(dup, "h").select("id", "pos")
    val before = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged
      .withColumn("__new",
        (col("pos") > coalesce(max(col("pos") + k).over(before),
          lit(Long.MinValue))).cast("long"))
      .withColumn("__island", sum(col("__new")).over(upTo))
      .groupBy(col("id"), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + k).as("span_end"))
      .drop("__island")
  }

  /** Per-document roll-up: (idCol, n_dup_spans, dup_chars) for documents
    * that contain at least one duplicated span.
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDf: Int = 2): DataFrame =
    repeatedSpans(docs, idCol, textCol, k, minDf)
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("span_end") - col("span_start")).as("dup_chars"))
}
