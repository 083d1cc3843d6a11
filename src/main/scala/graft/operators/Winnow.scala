package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): slide a window of `w` consecutive k-gram hashes over each
  * document and keep the minimum hash per window (rightmost position on
  * ties). The selected set is a document SKETCH with two guarantees:
  *  - density: the expected fraction of grams kept is 2/(w+1), so the
  *    sketch is ~w/2 x smaller than the full gram set;
  *  - detection: any substring match of length >= w + k - 1 between two
  *    documents shares at least one selected fingerprint — no long
  *    copy can slip between windows.
  *
  * This is the BOUNDED-SKETCH scale path for substring-level similarity:
  * `SpanDedup` shuffles every gram (exact span recovery, linear in
  * characters); winnowing shuffles ~2/(w+1) of them and still catches
  * every repeat of length >= w + k - 1 — the configuration for "which
  * documents share copied text" at 100 TB, when per-character span
  * boundaries are not needed.
  *
  * Plan shape: gram emission + hash + the encode are map-side; selection
  * is ONE per-document window (partition bounded by document length);
  * the sketch dedup is a partial-aggregable distinct. Nothing anywhere
  * is corpus-keyed except the final fingerprint join a caller builds on
  * the sketch.
  *
  * Relation to `TextOps.winnowedFingerprints` (q47): that is the
  * WORD-shingle, per-row HOF form — an unordered fingerprint set, no
  * positions, whole doc in one lambda. This is the CHARACTER-gram
  * relational form: positions ride the sketch (so matches can be
  * extended/localized downstream), the selection is a distributed window
  * (no per-row array bound), and the tie rule is the paper's rightmost-
  * min — the form that pairs with `SpanDedup`'s character-gram machinery.
  *
  * Portability: gram hashes are 40-bit md5 prefixes and the (hash asc,
  * position desc) selection order is packed into ONE long — `h * 2^23 +
  * (2^23 - 1 - pos)` — so the window aggregate is a plain MIN that DuckDB
  * replays verbatim (hash-first lexicographic = minimal hash, and the
  * inverted position picks the RIGHTMOST minimal gram, the paper's tie
  * rule). The packing bounds positions at 2^23 - 1 (~8.3M chars per
  * document) — beyond that the encode would collide across positions;
  * documents longer than that should be segmented upstream.
  */
object Winnow {

  /** Positions per document are packed into this many low bits. */
  val PosBits = 23
  private val PosMask = (1L << PosBits) - 1 // 8388607

  /** The winnowed sketch: (id, pos, h) — the selected k-gram fingerprints
    * of every document with at least one full window (length >= k+w-1).
    * `h` is the portable 40-bit md5 prefix of the gram; `pos` its 1-based
    * character position.
    *
    * DEFAULT PLAN: the codegen'd [[graft.functions.expressions
    * .WinnowSketch]] expression — winnowing is per-document work, so the
    * whole selection runs MAP-SIDE and nothing shuffles before whatever
    * join the caller builds on the sketch (the relational window form
    * shuffled the full gram explosion first; q102d's exec record showed
    * ~40 MB of shuffle at sf0.1 that this plan simply deletes). Row-for-
    * row identical output (PropertySpec pins both against the sequential
    * reference); same DuckDB oracle replays both.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, spread: Boolean = true): DataFrame = {
    require(k >= 2, s"gram length must be >= 2, got $k")
    require(w >= 1, s"window must be >= 1, got $w")
    // the sketch kernel is CPU-bound (one md5 per character position), so
    // a compact doc scan (one parquet split) would run the whole corpus on
    // one core — `spread` round-robins the cheap PRE-sketch rows across
    // defaultParallelism first (~gram-explosion/k the bytes the relational
    // form's gram shuffle moves). The exchange is SIZE-GATED on logical
    // plan statistics ([[Spread]]): full-scale scans are left untouched
    // even at the default, so the flag never collapses a wide scan to one
    // JVM's core count; no `.rdd` partition probe, no physical planning.
    // Pass spread = false to disable the exchange unconditionally.
    val spreadDocs = Spread(docs, spread)
    spreadDocs.select(col(idCol).as("id"),
        explode(graft.functions.expressions.TextExpressions
          .winnowSketch(col(textCol), k, w)).as("f"))
      .select(col("id"), col("f.pos").as("pos"), col("f.h").as("h"))
  }

  /** The relational (distributed-window) selection plan — identical rows
    * to [[fingerprints]]. This is the configuration for PATHOLOGICAL
    * single documents too large for one task: it spreads one document's
    * gram set across the cluster and selects via a partitioned window,
    * paying a full gram shuffle for the privilege. For any normal corpus
    * prefer [[fingerprints]] (map-side, shuffle-free).
    */
  def fingerprintsRelational(docs: DataFrame, idCol: String,
      textCol: String, k: Int, w: Int, spread: Boolean = true): DataFrame = {
    require(k >= 2, s"gram length must be >= 2, got $k")
    require(w >= 1, s"window must be >= 1, got $w")
    // spread pre-explosion rows across cores (same rationale as
    // SpanDedup.grams: the explode is ~len(text)-fold and CPU-bound);
    // explicit parameter, not a partition probe — see fingerprints()
    val spreadDocs = Spread(docs, spread)
    val g = spreadDocs.filter(length(col(textCol)) >= k + w - 1)
      .select(col(idCol).as("id"), length(col(textCol)).as("__n"),
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("pos"),
        col(textCol))
      .select(col("id"), col("__n"), col("pos"),
        (conv(substring(md5(col(textCol).substr(col("pos"), lit(k))), 1, 10),
          16, 10).cast("long") * lit(PosMask + 1) +
          (lit(PosMask) - col("pos"))).as("__comb"))
    val frame = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    g.withColumn("__sel", min(col("__comb")).over(frame))
      // only FULL windows select (starts 1 .. nGrams - w + 1, where
      // nGrams = len - k + 1); overlapping windows re-selecting the same
      // gram collapse in the distinct
      .filter(col("pos") <= col("__n") - (k + w - 2))
      .select(col("id"),
        (lit(PosMask) - pmod(col("__sel"), lit(PosMask + 1))).as("pos"),
        shiftright(col("__sel"), PosBits).as("h"))
      .distinct()
  }
}
