package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom-filter membership sketches, grouped by a partition column.
  *
  * A filter is the SET of occupied bit positions (sorted `array<int>`,
  * at most `m` elements) rather than a packed bitmap: it broadcasts just as
  * well at sketch sizes (m ≤ a few thousand), unions by distinct-set
  * semantics (partition-order invariant, so builds are deterministic), and —
  * because positions derive from md5 — the whole build+probe pipeline is
  * replayable in DuckDB SQL (q59's oracle). Spark's built-in
  * `bloom_filter_agg` produces an opaque engine-specific blob with none of
  * those properties.
  *
  * Plan shape: build = explode k positions per key -> distinct (group, pos)
  * -> one groupBy(group) collect; the shuffle is bounded by groups x m, not
  * by the corpus. Probe = broadcast the filter table and evaluate
  * `mightContain` map-side — the standard "does this 100 TB fact row exist
  * in that dimension" pre-filter, at one array_contains per hash function.
  *
  * Bloom guarantee: no false negatives (`n_maybe >= n_present` always);
  * false-positive rate ~ (1 - e^(-k*n/m))^k.
  */
object Bloom {

  /** The k bit positions of `key` in an m-bit filter: md5_48(key + "#salt_i")
    * mod m, one independent hash per i (48-bit md5 prefixes, portable).
    */
  def positions(key: Column, m: Int, k: Int, salt: String = "bloom"): Column =
    array((0 until k).map { i =>
      (Dedup.md5Hash48(concat(key, lit(s"#$salt$i"))) % m).cast("int")
    }: _*)

  /** Build one filter per `groupCol` value over `keyCol`:
    * (groupCol, filter array<int> sorted ascending).
    */
  def build(df: DataFrame, keyCol: String, groupCol: String,
      m: Int, k: Int, salt: String = "bloom"): DataFrame =
    df.select(col(groupCol), explode(positions(col(keyCol), m, k, salt)).as("__pos"))
      .distinct()
      .groupBy(col(groupCol))
      .agg(sort_array(collect_set(col("__pos"))).as("filter"))

  /** Membership test: true iff every position of `posArray` is set in
    * `filterCol`. Probe-side lambda only touches attribute refs (no
    * captured computed expressions — see TextOps.letCol), so the HOF cost
    * is k array_contains probes per row.
    *
    * COST MODEL WARNING (measured, w14's first cut): `array_contains` is
    * a LINEAR scan of the positions set, so a probe costs O(|set|) — at
    * m of a few thousand that is noise, but a 1e5-position filter turned
    * a 2 s stream query into 700+ s at sf0.1. For large filters use the
    * packed form below: O(1) probes.
    */
  def mightContain(filterCol: Column, posArray: Column): Column =
    forall(posArray, p => array_contains(filterCol, p))

  /** PACKED-BITMAP filter for LARGE m: (groupCol, filter array<long> of
    * ceil(m/64) words, every word present). Same md5 position family as
    * [[build]] — the two forms are semantically identical (an oracle
    * replaying position membership covers both) — but the probe is an
    * element_at + getbit, O(1) regardless of m, and the broadcast is
    * m/8 bytes (128 KiB at m = 2^20) however full the filter gets.
    */
  def buildPacked(df: DataFrame, keyCol: String, groupCol: String,
      m: Int, k: Int, salt: String = "bloom"): DataFrame = {
    val nWords = (m + 63) / 64
    // typed bitmap-OR aggregator: O(1) per bit, fixed m/8-byte buffers,
    // map-side combine; OR idempotence makes a pre-distinct pointless
    val bitmap = udaf(graft.functions.Aggregators.BitmapOr(nWords),
      org.apache.spark.sql.Encoders.scalaLong)
    df.select(col(groupCol),
        explode(positions(col(keyCol), m, k, salt)).as("__pos"))
      .groupBy(col(groupCol))
      .agg(bitmap(col("__pos").cast("long")).as("filter"))
  }

  /** O(1)-per-probe membership against a [[buildPacked]] filter. */
  def mightContainPacked(filterCol: Column, posArray: Column): Column =
    forall(posArray, p =>
      call_function("getbit",
        element_at(filterCol, (p.cast("long") / 64).cast("int") + 1),
        p.cast("long") % 64) === 1)
}
