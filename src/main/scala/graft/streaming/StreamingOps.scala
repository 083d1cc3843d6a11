package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.8).
  *
  * The reference is batch-only, but its workload is streaming-shaped: files
  * arrive on a 90 s schedule, tables are append-only and time-ordered, and
  * the demos compute time-windowed aggregates. This module expresses those
  * capabilities incrementally: watermarked tumbling/sliding/session windows,
  * within-watermark dedup, and a custom stateful gap/session operator
  * (`flatMapGroupsWithState`) mirroring the batch gap detector (A9).
  *
  * Scale notes: all operators are keyed-state streaming aggregations — state
  * is partitioned by (key, window) and bounded by the watermark horizon;
  * nothing accumulates unboundedly. File-source ingest scales by listing
  * increments, the natural replacement for the reference's Dask
  * partition-per-N-files scheme.
  */
object StreamingOps {

  /** Streaming view of an events-shaped parquet directory. The stream
    * schema comes from a one-footer static read (streaming sources need an
    * explicit schema), so both fixture encodings of `ts` — raw nanosecond
    * longs and TIMESTAMP(MICROS)/NTZ — stream correctly; the column is
    * normalized to Spark-native TimestampType exactly like graft.Tables.
    */
  def eventsStream(spark: SparkSession, dir: String,
      globFilter: String = "events.parquet"): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val static = spark.read.option("pathGlobFilter", globFilter).parquet(dir)
    val stream = spark.readStream
      .schema(static.schema)
      .option("pathGlobFilter", globFilter)
      .parquet(dir)
    static.schema("ts").dataType match {
      case LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        stream.withColumn("ts", col("ts").cast(TimestampType))
      case _ => stream
    }
  }

  /** Watermarked tumbling-window counts per event type. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked sliding-window aggregate. The mean uses the scaled-floor
    * discipline (floor(value*1e6) summed as longs) so the result is exactly
    * reproducible across partitionings and engines — a raw double avg would
    * be accumulation-order-dependent and break the batch-oracle hash check.
    */
  def slidingMeans(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("__v6", floor(col("value") * 1e6).cast("long"))
      .groupBy(window(col("ts"), windowLen, slide))
      .agg(count(lit(1)).as("n"), sum(col("__v6")).as("__sum_v6"))
      .select(col("window.start").as("window_start"), col("n"),
        (col("__sum_v6").cast("double") / col("n") / 1e6).as("mean_value"))

  /** Built-in session windows (gap-based) per user. */
  def sessionWindows(events: DataFrame, gap: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"),
        col("n_events"))

  /** Exactly-once-style dedup on event_id within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream inner join: pair each left event with the
    * right events of the same user landing within (0, maxDelay] AFTER it.
    * Both sides carry watermarks and the join condition bounds the event
    * times against each other, so Spark can expire join state — the
    * canonical interval-join shape whose state never grows past
    * watermark + interval.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      maxDelay: String = "30 minutes", watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("left_id"),
        col("ts").as("lts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("__ru"), col("event_id").as("right_id"),
        col("ts").as("rts"))
    l.join(r,
      col("user_id") === col("__ru") &&
        col("rts") > col("lts") &&
        col("rts") <= col("lts") + expr(s"INTERVAL $maxDelay"))
      .select(col("user_id"), col("left_id"), col("right_id"),
        col("lts"), col("rts"))
  }

  /** Streaming view of a documents-shaped parquet directory. */
  def documentsStream(spark: SparkSession, dir: String,
      globFilter: String = "documents.parquet"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", globFilter)
      .parquet(dir)
  }

  /** Embedding stream over the fixture lake (same contract as
    * [[documentsStream]]: declared schema, incremental file listing).
    */
  def embeddingsStream(spark: SparkSession, dir: String,
      globFilter: String = "embeddings.parquet"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", globFilter)
      .parquet(dir)
  }

  /** Stateless streaming corpus-ingest pipeline: quality filter (length +
    * token floor) -> content-hash train/val/test split -> per-(split, lang)
    * counts. The filter and split are pure map-side column expressions
    * (graft.operators.Sampling: repartition- and replay-stable), so the
    * only state is the final aggregation — the shape of a 100 TB streaming
    * corpus intake.
    */
  def qualitySplitCounts(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) >= 50 &&
        graft.functions.TextOps.wordCount(col("text")) >= 10)
      .withColumn("split", graft.operators.Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextOps.wordCount(col("text"))).as("n_tokens"))

  /** Incremental corpus intake with dedup against an existing corpus: the
    * incoming document stream broadcast-joins a static table of normalized
    * content hashes (md5 over lowercased, whitespace-collapsed text — the
    * portable form of TextOps.fingerprint) and counts per-language
    * new-vs-already-present docs. Stream-static join carries no streaming
    * state; the only state is the final aggregation. At 100 TB the static
    * key set exceeds broadcast — swap the hint for a shuffle join on `k`
    * (the pipeline is otherwise unchanged); here it demonstrates the
    * no-state intake shape.
    */
  def intakeDedupCounts(docs: DataFrame, corpus: DataFrame): DataFrame = {
    def key(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      md5(regexp_replace(lower(trim(c)), "\\s+", " "))
    val corpusKeys = corpus.select(key(col("text")).as("k")).distinct()
      .withColumn("dup", lit(true))
    docs.withColumn("k", key(col("text")))
      .join(broadcast(corpusKeys), Seq("k"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_in"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("n_new", col("n_in") - col("n_dup"))
  }

  /** Stream-static enrichment: broadcast-join the event stream to a static
    * dimension table keyed (user_id = dimKey), then aggregate per
    * (dimension attribute, event_type). The static side re-broadcasts per
    * micro-batch — no streaming state beyond the aggregation itself, no
    * watermark constraint on the join (only the aggregate needs one in
    * append mode; the inventory query runs complete). This is THE 100 TB
    * enrichment shape: fact stream never shuffles for the join.
    * `value` is floor-scaled to exact longs before summing.
    */
  def enrichedTypeCounts(events: DataFrame, dim: DataFrame,
      dimKey: String, dimAttr: String): DataFrame =
    events
      .join(broadcast(dim.select(col(dimKey), col(dimAttr))),
        col("user_id") === col(dimKey))
      .groupBy(col(dimAttr), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1e6).cast("long")).as("sum_v6"))

  final case class GapEvent(user_id: Long, ts_us: Long)
  final case class GapReport(user_id: Long, prev_ts_us: Long, ts_us: Long,
      gap_sec: Double)
  final case class GapState(lastTsUs: Long)

  /** Custom stateful operator: emit a report for every inter-event gap above
    * `thresholdSec` per user — the streaming formulation of the batch gap
    * detector (A9, reference colormap_plots.ipynb cell 12). State is one
    * timestamp per key.
    */
  def streamingGaps(events: DataFrame, thresholdSec: Double)(
      implicit spark: SparkSession): Dataset[GapReport] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[GapEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)((user: Long, rows: Iterator[GapEvent],
          state: GroupState[GapState]) => {
        val sorted = rows.toSeq.sortBy(_.ts_us)
        var last = state.getOption.map(_.lastTsUs)
        val out = Seq.newBuilder[GapReport]
        sorted.foreach { e =>
          last.foreach { l =>
            val gap = (e.ts_us - l) / 1e6
            if (gap > thresholdSec) out += GapReport(user, l, e.ts_us, gap)
          }
          last = Some(e.ts_us)
        }
        last.foreach(l => state.update(GapState(l)))
        out.result().iterator
      })
  }

  final case class QuotaDoc(doc_id: Long, domain: String)
  final case class QuotaRow(doc_id: Long, domain: String,
      admitted: Boolean, admit_rank: Long)

  /** Streaming per-domain quota admission (w19) — the INCREMENTAL form of
    * q123's per-domain cap: each arriving document is admitted while its
    * domain's running count is under `cap`, after which the domain is
    * closed for the life of the stream. The crawl-frontier politeness /
    * anti-template-flood control a pipeline runs at the door, where the
    * batch cap (q123) runs after landing.
    *
    * State is ONE long counter per domain — bounded by the number of
    * distinct domains, not by arrivals (the w13 one-row-per-key cost
    * model), and the counter stops mattering once it passes `cap`.
    *
    * Determinism/oracle contract (the w13 ordering argument): within a
    * micro-batch a domain's arrivals are processed in `doc_id` order, so
    * any in-batch arrival order yields the same admissions; ACROSS
    * batches earlier batches are admitted first — end-of-stream equals
    * the batch rank rule (ROW_NUMBER per domain ordered by doc_id <= cap)
    * exactly when the source delivers in id order, which the fixture lake
    * does and which a production deployment gets from ingest-time file
    * naming. A late arrival past a closed quota is REJECTED either way —
    * the failure mode is over-rejection of stragglers, never quota
    * overrun (the invariant that matters: admitted <= cap per domain,
    * unconditionally).
    */
  def streamingDomainQuota(docs: DataFrame, domainCol: String, cap: Int)(
      implicit spark: SparkSession): Dataset[QuotaRow] = {
    import spark.implicits._
    require(cap >= 1, s"cap must be >= 1, got $cap")
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        col(domainCol).cast("string").as("domain"))
      .as[QuotaDoc]
      .groupByKey(_.domain)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)((domain: String,
          rows: Iterator[QuotaDoc], state: GroupState[Long]) => {
        val sorted = rows.toSeq.sortBy(_.doc_id)
        var n = state.getOption.getOrElse(0L)
        val out = sorted.map { d =>
          n += 1
          QuotaRow(d.doc_id, domain, n <= cap, if (n <= cap) n else -1L)
        }
        state.update(n)
        out.iterator
      })
  }

  // __ts stays a TIMESTAMP through the typed boundary: the watermark is
  // metadata ON that attribute, and projecting it into a derived long
  // before the stateful operator strips it (the analyzer then rejects
  // the event-time timeout as "no watermark")
  final case class WQuotaDoc(doc_id: Long, domain: String,
      __ts: java.sql.Timestamp)
  final case class WQuotaRow(doc_id: Long, domain: String,
      window_start_us: Long, admitted: Boolean, admit_rank: Long)

  /** Windowed per-domain quota admission (w20) — [[streamingDomainQuota]]
    * with RE-ADMISSION per event-time window: each domain gets `cap`
    * admissions per `windowSec` tumbling window (the daily-budget
    * politeness policy), and the per-(domain, window) counter EXPIRES
    * once the watermark passes the window end. This is the explicit
    * "cap per window" semantics SCALE.md distinguishes from w19's
    * cap-forever: here state is bounded by domains seen per OPEN window
    * (not domains ever), and expiry is a declared part of the contract
    * rather than a silent quota re-open.
    *
    * State lifecycle: one long per (domain, window); an
    * `EventTimeTimeout` fires when the watermark passes the window end
    * (no event-time older than the watermark can arrive, so the counter
    * is dead weight), and the handler removes it — the state store's
    * steady size is domains-per-window x windows-in-flight, independent
    * of stream lifetime. Ordering/oracle contract inherited from w19:
    * within a batch, doc_id order; end-of-stream equals ROW_NUMBER per
    * (domain, window) <= cap when the source delivers in id order.
    */
  def streamingDomainQuotaWindowed(docs: DataFrame, domainCol: String,
      tsCol: String, cap: Int, windowSec: Long,
      watermarkDelaySec: Long = 0L)(
      implicit spark: SparkSession): Dataset[WQuotaRow] = {
    import spark.implicits._
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(windowSec >= 1, s"windowSec must be >= 1, got $windowSec")
    val winUs = windowSec * 1000000L
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    docs
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", s"$watermarkDelaySec seconds")
      .select(col("doc_id").cast("long").as("doc_id"),
        col(domainCol).cast("string").as("domain"), col("__ts"))
      .as[WQuotaDoc]
      .groupByKey(d => (d.domain, us(d.__ts) / winUs * winUs))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)((key: (String, Long),
          rows: Iterator[WQuotaDoc], state: GroupState[Long]) => {
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val (domain, wstart) = key
          val sorted = rows.toSeq.sortBy(_.doc_id)
          var n = state.getOption.getOrElse(0L)
          val out = sorted.map { d =>
            n += 1
            WQuotaRow(d.doc_id, domain, wstart, n <= cap,
              if (n <= cap) n else -1L)
          }
          state.update(n)
          // expire at window end (must stay above the current watermark
          // — a straggler batch older than the watermark can otherwise
          // compute a timeout in the past, which the API rejects)
          state.setTimeoutTimestamp(math.max((wstart + winUs) / 1000L,
            state.getCurrentWatermarkMs() + 1L))
          out.iterator
        }
      })
  }

  /** Stateless streaming NEAR-COPY intake: each incoming document's
    * winnowed fingerprint sketch (computed MAP-SIDE by the codegen'd
    * WinnowSketch kernel) probes a Bloom filter of the existing corpus's
    * sketch — per-doc (n_fp, n_hits, suspect) with ZERO streaming state:
    * the sketch is a per-row expression, the filter is a static
    * broadcast, and the count is an in-row HOF over the sketch array.
    * The exact-hash intake (w09, [[intakeDedupCounts]]) catches verbatim
    * re-ingests; this catches documents that COPY >= w+k-1-char runs
    * from the corpus without being byte-identical.
    *
    * Cross-engine exactness: Bloom positions are md5-derived
    * ([[graft.operators.Bloom.positions]]), so even FALSE POSITIVES are
    * deterministic and identical in DuckDB — the oracle replays the
    * filter build and every probe bit-for-bit (no false negatives by the
    * Bloom guarantee, fp rate ~ (1-e^(-kn/m))^k documented at q59).
    * The filter is the PACKED bitmap form ([[graft.operators.Bloom
    * .buildPacked]]): a fixed m/8-byte broadcast with O(1) probes —
    * the positions-set form's array_contains probe is O(occupied) and
    * measured 350x slower at sf0.1 (SCALE.md). Size m to the corpus
    * sketch (fill = 1-e^(-kn/m) well under ~0.3); corpus growth re-runs
    * the bounded build, not the stream. Since r14 the budget is
    * MEASURED, not advisory: every built/merged artifact carries a
    * `fill_ratio` column and refuses loudly past [[MaxIndexFill]].
    */
  def intakeWinnowMatches(docs: DataFrame, corpus: DataFrame,
      k: Int = 20, w: Int = 8, m: Int = 1 << 20, kHash: Int = 3,
      minHits: Int = 2): DataFrame =
    intakeWinnowMatchesWith(docs, buildWinnowIndex(corpus, k, w, m, kHash),
      k, w, m, kHash, minHits)

  /** The corpus fingerprint index as a PERSISTABLE ARTIFACT: one row
    * (__g, filter array<long>) — the packed winnow-sketch Bloom filter.
    * A daily intake job writes this once per corpus version (it is a
    * plain one-row parquet table, m/8 bytes) and every subsequent run
    * probes the RELOADED index instead of re-sketching the whole corpus
    * (q124 grades the round trip: intake against the reloaded artifact
    * equals the in-memory build bit-for-bit, because the filter IS the
    * operator's only corpus-derived state). (k, w, m, kHash) are part of
    * the artifact's identity — probe with the parameters it was built
    * with.
    *
    * PACKED bitmap, not the positions-set form: the probe runs per
    * sketch element per streamed doc, and array_contains over a
    * corpus-sized position set is O(|set|) per probe — measured 700+ s
    * at sf0.1 before this switch (SCALE.md). element_at+getbit is O(1),
    * and the m/8-byte bitmap broadcasts at a fixed 128 KiB.
    */
  def buildWinnowIndex(corpus: DataFrame, k: Int = 20, w: Int = 8,
      m: Int = 1 << 20, kHash: Int = 3): DataFrame = {
    import graft.operators.{Bloom, Winnow}
    val corpusKeys = Winnow.fingerprints(corpus, "doc_id", "text", k, w)
      .select(col("h").cast("string").as("hk")).distinct()
      .withColumn("__g", lit(1))
    // the artifact is SELF-DESCRIBING (r11): (k, w, m, kHash) are its
    // identity and ride IN the row, so a probe or merge with mismatched
    // parameters fails loudly at runtime instead of silently returning
    // wrong hit counts the Bloom's no-false-negative guarantee could
    // mask. `version` starts at 1; merges bump it.
    withFillRatio(
      Bloom.buildPacked(corpusKeys, "hk", "__g", m, kHash)
        .withColumn("k", lit(k)).withColumn("w", lit(w))
        .withColumn("m", lit(m)).withColumn("kHash", lit(kHash))
        .withColumn("version", lit(1L)),
      lit(m), "winnow-index")
  }

  private val IndexParamCols = Seq("k", "w", "m", "kHash")

  /** Hard saturation bound for packed index artifacts: past ~0.5 fill the
    * false-positive rate is (fill)^kHash ~ 12%+ at kHash = 3 and rising
    * fast — the intake paths' precision silently degrades with nothing in
    * the row to show it (VERDICT r13 #5). Builders and merges therefore
    * carry a MEASURED `fill_ratio` column (popcount/m over the packed
    * words) and refuse loudly past this bound.
    */
  private val MaxIndexFill = 0.5

  private def fillBitsOf(filterCol: org.apache.spark.sql.Column) =
    aggregate(filterCol, lit(0L), (acc, w) => acc + bit_count(w).cast("long"))

  /** Stamp the artifact with its measured saturation and arm the in-row
    * require: reading the filter past [[MaxIndexFill]] throws with the
    * measured ratio and the rebuild instruction — the checkedFilterFor
    * discipline, one popcount on a one-row frame.
    */
  private def withFillRatio(index: DataFrame,
      mCol: org.apache.spark.sql.Column, what: String): DataFrame = {
    val fr = fillBitsOf(col("filter")).cast("double") / mCol.cast("double")
    val msg = concat(lit(s"$what Bloom saturated: fill_ratio "),
      fr.cast("string"), lit(s" > $MaxIndexFill at m="),
      mCol.cast("string"),
      lit(" — rebuild with a larger m (or fewer OR-merged deltas); " +
        "probing a saturated filter silently inflates false positives"))
    index
      .withColumn("filter",
        when(assert_true(fr <= lit(MaxIndexFill), msg).isNull,
          col("filter")))
      .withColumn("fill_ratio", fr)
  }

  /** Wrap `filter` so that reading it EVALUATES an assert_true over the
    * artifact's embedded parameters — the check lives in the row the
    * consumer already reads, so it cannot be pruned away and costs one
    * predicate on a one-row frame. Artifacts from before the params rode
    * along (no such columns) pass through unchecked.
    */
  private def checkedFilterFor(index: DataFrame,
      want: Seq[(String, Int)], what: String): DataFrame = {
    val paramCols = want.map(_._1)
    val checked =
      if (!paramCols.forall(index.columns.contains)) index
      else {
        val eq = want.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
        val msg = concat(lit(s"$what parameter mismatch: artifact ("),
          concat_ws(",", paramCols.map(c =>
            concat(lit(s"$c="), col(c).cast("string"))): _*),
          lit(") vs probe ("),
          lit(want.map { case (c, v) => s"$c=$v" }.mkString(",")), lit(")"))
        index.withColumn("filter",
          when(assert_true(eq, msg).isNull, col("filter")))
      }
    // saturation is re-checked AT PROBE TIME, not only at build/merge
    // (VERDICT r13 #5 closed fully): a reloaded parquet artifact carries
    // plain columns — the builder's in-plan assert does not travel with
    // it, and the probe is exactly where a saturated filter does its
    // damage. Recomputed from the packed words (one popcount on a
    // one-row frame), so even a doctored fill_ratio column cannot mask
    // it. Artifacts from before the m column rode along pass unchecked.
    if (checked.columns.contains("m"))
      withFillRatio(checked.drop("fill_ratio"), col("m"), what)
        .drop("fill_ratio")
    else checked
  }

  private def checkedFilter(index: DataFrame, k: Int, w: Int, m: Int,
      kHash: Int): DataFrame =
    checkedFilterFor(index,
      Seq("k" -> k, "w" -> w, "m" -> m, "kHash" -> kHash), "winnow-index")

  /** Incremental corpus growth WITHOUT re-sketching history (VERDICT r10
    * #5): OR-merge a prior [[buildWinnowIndex]] artifact with the index
    * of the day's NEW documents. Bloom bitmap union is exact for
    * membership — `Bloom(A) OR Bloom(B) == Bloom(A ∪ B)` bit for bit at
    * equal (m, kHash), because each key sets the same positions
    * whichever build it entered — so the merged artifact is
    * INDISTINGUISHABLE from a from-scratch build over the union (graded
    * bit-for-bit in StreamingSpec and end-to-end by q125 sharing
    * q124/w14's oracle verbatim). Cost: the daily delta's sketch + one
    * m/8-byte zip_with — corpus history is never touched. (k, w, m,
    * kHash) remain the artifact's identity and since r11 ride IN the
    * artifact row: merging indexes built with different parameters
    * throws at runtime (assert_true in the merged filter column), and
    * the merged row carries the params plus `version` = max(inputs) + 1
    * (the fill-ratio budget applies to the UNION's key count and is
    * RE-MEASURED on the merged bitmap — the `fill_ratio` column +
    * [[MaxIndexFill]] require, VERDICT r13 #5).
    */
  def mergeWinnowIndex(prior: DataFrame, delta: DataFrame): DataFrame =
    mergePackedIndex(prior, delta, IndexParamCols, "winnow-index")

  /** The shared OR-merge core behind [[mergeWinnowIndex]] and
    * [[mergeBandIndex]]: identical `paramCols` identities required (the
    * assert rides IN the merged filter column), bitmap zip_with OR,
    * version = max(inputs) + 1.
    *
    * The join is FULL OUTER on __g: [[buildWinnowIndex]]/
    * [[buildBandIndex]] emit ZERO ROWS over an input with no keys (e.g.
    * a delta day where no media decoded), and an inner join would then
    * silently produce an EMPTY merged index — every downstream probe
    * filter-NULLs and reports zero hits, total silent index loss
    * (ADVICE r12). With absent-side coalesce, OR with the empty set is
    * the identity it should be: merge(prior, empty) == prior's bitmap
    * (version still bumps — a merge DID happen in the lineage), and
    * merge(empty, delta) bootstraps from the delta.
    */
  private def mergePackedIndex(prior: DataFrame, delta: DataFrame,
      paramCols: Seq[String], what: String): DataFrame = {
    val hasP = (paramCols :+ "version").forall(c =>
      prior.columns.contains(c) && delta.columns.contains(c))
    val a = prior.select(col("__g") +: col("filter").as("__fa") +:
      (if (hasP) paramCols.map(col) :+ col("version").as("__va")
       else Seq.empty): _*)
    val b = delta.select(col("__g") +: col("filter").as("__fb") +:
      (if (hasP) paramCols.map(c => col(c).as(s"__d$c")) :+
        col("version").as("__vb")
       else Seq.empty): _*)
    val j = a.join(b, Seq("__g"), "full_outer")
    // absent side = identity for OR: coalesce before the zip so a
    // one-sided row keeps the present bitmap verbatim
    val or = when(col("__fa").isNull, col("__fb"))
      .when(col("__fb").isNull, col("__fa"))
      .otherwise(zip_with(col("__fa"), col("__fb"),
        (x, y) => x.bitwiseOR(y)))
    if (!hasP) j.select(col("__g"), or.as("filter"))
    else {
      // merging indexes built with different parameters is NOT a union
      // of the same key space — refuse at runtime, in the row itself
      // (an absent side has NULL params and nothing to conflict with)
      val eq = paramCols.map(c => col(c).isNull ||
        col(s"__d$c").isNull || col(c) === col(s"__d$c"))
        .reduce(_ && _)
      val msg = concat(lit(s"$what parameter mismatch: prior ("),
        concat_ws(",", paramCols.map(c =>
          concat(lit(s"$c="), col(c).cast("string"))): _*),
        lit(") vs delta ("),
        concat_ws(",", paramCols.map(c =>
          concat(lit(s"$c="), col(s"__d$c").cast("string"))): _*),
        lit(")"))
      val merged = j.select(col("__g") +:
        when(assert_true(eq, msg).isNull, or).as("filter") +:
        (paramCols.map(c => coalesce(col(c), col(s"__d$c")).as(c)) :+
          (greatest(coalesce(col("__va"), lit(0L)),
            coalesce(col("__vb"), lit(0L))) + 1L).as("version")): _*)
      // re-measure saturation on the UNION bitmap (VERDICT r13 #5): this
      // is exactly where repeated deltas silently saturate a filter
      if (paramCols.contains("m")) withFillRatio(merged, col("m"), what)
      else merged
    }
  }

  private val BandIndexParamCols = Seq("m", "kHash")

  private def bandKey(b: Int): org.apache.spark.sql.Column =
    concat(lit(s"$b:"), col(s"b$b").cast("string"))

  /** The corpus MEDIA band-Bloom as a PERSISTABLE, SELF-DESCRIBING
    * ARTIFACT (VERDICT r11 #6 — m07/w18/w21 rebuilt it per run): one row
    * (__g, filter, m, kHash, version) built from any banded-signature
    * frame carrying b0..b3 (image pHash bands, audio fingerprint bands —
    * the build cannot tell, which is the point). Written once per corpus
    * version; daily deltas OR-merge via [[mergeBandIndex]] (exact for
    * Bloom membership, the q125 argument) — the corpus's media are never
    * re-decoded.
    */
  def buildBandIndex(bands: DataFrame, m: Int = 1 << 20,
      kHash: Int = 3): DataFrame = {
    import graft.operators.Bloom
    val keys = bands
      .select(explode(array((0 to 3).map(bandKey): _*)).as("bk"))
      .withColumn("__g", lit(1))
    withFillRatio(
      Bloom.buildPacked(keys, "bk", "__g", m, kHash)
        .withColumn("m", lit(m)).withColumn("kHash", lit(kHash))
        .withColumn("version", lit(1L)),
      lit(m), "band-index")
  }

  /** Incremental media-index growth: OR-merge two [[buildBandIndex]]
    * artifacts at equal (m, kHash) — bit-for-bit the from-scratch build
    * over the union (pinned in StreamingSpec; graded end to end by m11
    * sharing w18's oracle verbatim).
    */
  def mergeBandIndex(prior: DataFrame, delta: DataFrame): DataFrame =
    mergePackedIndex(prior, delta, BandIndexParamCols, "band-index")

  private val LandmarkIndexParamCols =
    Seq("frameLen", "window", "phases", "m", "kHash", "strideMax")

  /** The corpus AUDIO LANDMARK index as a persistable, self-describing
    * artifact: the distinct [[graft.operators.Multimodal.audioLandmarkKeys]]
    * key set — built at `phases` = frameLen so a clip trimmed by ANY
    * integer sample count probes positively (its phase-0 keys are a
    * subset of the corpus phase union, the m12 argument) — packed into
    * one Bloom row with (frameLen, window, phases, m, kHash, version)
    * riding along. Daily deltas OR-merge via [[mergeLandmarkIndex]].
    */
  /** `strideMax` > 1 is the DOWNSAMPLE closer, the index-side twin of
    * w26's arrival-side decimation hypothesis: the index additionally
    * carries the corpus's stride-s keys for every s in 2..strideMax (at
    * the same phase offsets), so a nearest-neighbor s-x DOWNSAMPLED
    * re-upload — whose identity keys ARE the original's stride-s
    * offset-0 keys — probes at n_hits = n_keys through the UNCHANGED
    * identity intake, with certainty. Costs ~1/s extra keys and kernel
    * work per stride (the stride-s kernel has 1/s the frames).
    * Downsample composed with an original-domain trim t is covered
    * while s*t' lands inside the phase set — beyond that, the
    * documented residual (w27's spec measures the strideMax = 1 index
    * missing every planted downsample, the motivation).
    */
  def buildLandmarkIndex(
      corpus: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow],
      frameLen: Int = 4, window: Int = 2, phases: Int = 4,
      m: Int = 1 << 20, kHash: Int = 3, strideMax: Int = 1): DataFrame = {
    import graft.operators.{Bloom, Multimodal}
    implicit val sp: SparkSession = corpus.sparkSession
    require(strideMax >= 1, s"strideMax must be >= 1, got $strideMax")
    val keys = (1 to strideMax)
      .map(s => Multimodal.audioLandmarkKeys(corpus, frameLen, window,
        phases, stride = s).toDF())
      .reduce(_.unionAll(_))
      .select(col("k").cast("string").as("lk")).distinct()
      .withColumn("__g", lit(1))
    withFillRatio(
      Bloom.buildPacked(keys, "lk", "__g", m, kHash)
        .withColumn("frameLen", lit(frameLen))
        .withColumn("window", lit(window))
        .withColumn("phases", lit(phases))
        .withColumn("m", lit(m)).withColumn("kHash", lit(kHash))
        .withColumn("strideMax", lit(strideMax))
        .withColumn("version", lit(1L)),
      lit(m), "landmark-index")
  }

  /** Incremental landmark-index growth: the [[mergeBandIndex]] OR-merge
    * (exact for Bloom membership) under the landmark identity columns.
    */
  def mergeLandmarkIndex(prior: DataFrame, delta: DataFrame): DataFrame =
    mergePackedIndex(prior, delta, LandmarkIndexParamCols, "landmark-index")

  /** Stateless streaming TRIMMED-AUDIO intake (the m12 operator's
    * streaming twin, completing the w18/w21 family): each arriving clip
    * censuses its phase-0 landmark keys in the decode kernel
    * ([[graft.operators.Multimodal.audioLandmarkCensus]] — one row per
    * arrival, corrupt payloads degrade to decode_ok = false sentinels),
    * probes every key against the broadcast corpus index IN-ROW (array
    * `filter` over the packed Bloom — zero streaming state, no shuffle
    * below the sink), and flags `suspect` when >= minFrac9/1e9 of its
    * keys are known. A re-upload trimmed by ANY sample count flags with
    * CERTAINTY: its keys are a subset of the corpus phase union and
    * Bloom has no false negatives — false positives can only ADD
    * suspects, never lose one, and the md5-derived positions replay in
    * SQL so even those are graded.
    */
  def intakeLandmarkMatches(
      streamMedia: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow],
      index: DataFrame, frameLen: Int = 4, window: Int = 2,
      phases: Int = 4, m: Int = 1 << 20, kHash: Int = 3,
      minFrac9: Long = 600000000L, strideMax: Int = 1)(
      implicit spark: SparkSession): DataFrame = {
    import graft.operators.{Bloom, Multimodal}
    val filt = checkedFilterFor(index,
      LandmarkIndexParamCols.zip(
        Seq(frameLen, window, phases, m, kHash, strideMax)),
      "landmark-index")
    val census = Multimodal.audioLandmarkCensus(streamMedia, frameLen,
      window, phases = 1).toDF()
    census
      .withColumn("__g", lit(1))
      .join(broadcast(filt), Seq("__g"), "left")
      .select(col("media_id"), col("decode_ok"),
        coalesce(size(col("keys")), lit(0)).as("n_keys"),
        when(col("filter").isNull || !col("decode_ok"), lit(0))
          .otherwise(size(filter(col("keys"), kk =>
            Bloom.mightContainPacked(col("filter"),
              Bloom.positions(kk.cast("string"), m, kHash)))))
          .as("n_hits"))
      .withColumn("suspect",
        col("decode_ok") && col("n_keys") > 0 &&
          col("n_hits").cast("long") * lit(1000000000L) >=
            lit(minFrac9) * col("n_keys").cast("long"))
  }

  /** Stateless streaming RESAMPLED-audio intake (w26 — the m14 closure
    * on the intake path): each arriving clip censuses its phase-0
    * landmark keys under BOTH hypotheses — identity (stride 1) and
    * even-phase decimation (stride 2, the exact inverse of a 2x linear
    * upsample) — in one decode, and probes both key sets against the
    * broadcast corpus index IN-ROW (zero streaming state, no shuffle
    * below the sink). A naively-upsampled corpus re-upload flags
    * `suspect_resampled` with CERTAINTY: its decimated keys EQUAL the
    * original's identity keys (m14's spec-pinned set equality), which
    * are a subset of the corpus phase union, and Bloom has no false
    * negatives — n_hits_half = n_keys_half by construction. The
    * identity-side probe rides along unchanged (w25's trim/byte-copy
    * semantics), so one intake pass covers byte copies, gain
    * transcodes, arbitrary integer trims AND 2x upsamples.
    */
  def intakeResampledLandmarkMatches(
      streamMedia: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow],
      index: DataFrame, frameLen: Int = 4, window: Int = 2,
      phases: Int = 4, m: Int = 1 << 20, kHash: Int = 3,
      minFrac9: Long = 600000000L, strideMax: Int = 1)(
      implicit spark: SparkSession): DataFrame = {
    import graft.operators.{Bloom, Multimodal}
    val filt = checkedFilterFor(index,
      LandmarkIndexParamCols.zip(
        Seq(frameLen, window, phases, m, kHash, strideMax)),
      "landmark-index")
    val census = Multimodal.audioLandmarkCensus2(streamMedia, frameLen,
      window).toDF()
    def hits(keysCol: String) =
      when(col("filter").isNull || !col("decode_ok"), lit(0))
        .otherwise(size(filter(col(keysCol), kk =>
          Bloom.mightContainPacked(col("filter"),
            Bloom.positions(kk.cast("string"), m, kHash)))))
    def suspectOf(nk: org.apache.spark.sql.Column,
        nh: org.apache.spark.sql.Column) =
      col("decode_ok") && nk > 0 &&
        nh.cast("long") * lit(1000000000L) >= lit(minFrac9) * nk.cast("long")
    census
      .withColumn("__g", lit(1))
      .join(broadcast(filt), Seq("__g"), "left")
      .select(col("media_id"), col("decode_ok"),
        coalesce(size(col("keys")), lit(0)).as("n_keys"),
        hits("keys").as("n_hits"),
        coalesce(size(col("keys_half")), lit(0)).as("n_keys_half"),
        hits("keys_half").as("n_hits_half"))
      .withColumn("suspect",
        suspectOf(col("n_keys"), col("n_hits")))
      .withColumn("suspect_resampled",
        suspectOf(col("n_keys_half"), col("n_hits_half")))
  }

  /** The shared probe tail: census rows (media_id, decode_ok, b0..b3)
    * against a broadcast [[buildBandIndex]] artifact.
    */
  private def bandMatchesWith(census: DataFrame, index: DataFrame,
      m: Int, kHash: Int, minBandHits: Int): DataFrame = {
    import graft.operators.Bloom
    val filt = checkedFilterFor(index,
      BandIndexParamCols.zip(Seq(m, kHash)), "band-index")
    val hits = (0 to 3).map(b =>
      Bloom.mightContainPacked(col("filter"),
        Bloom.positions(bandKey(b), m, kHash)).cast("int")).reduce(_ + _)
    census
      .withColumn("__g", lit(1))
      .join(broadcast(filt), Seq("__g"), "left")
      .select(col("media_id"), col("decode_ok"),
        when(!col("decode_ok") || col("filter").isNull, lit(0))
          .otherwise(hits).as("n_band_hits"))
      .withColumn("suspect",
        col("decode_ok") && col("n_band_hits") >= minBandHits)
  }

  /** [[intakeImagePHashMatches]] against a prebuilt [[buildBandIndex]]
    * artifact (in-memory or reloaded from parquet).
    */
  def intakeImagePHashMatchesWith(
      streamMedia: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow],
      index: DataFrame, m: Int = 1 << 20, kHash: Int = 3,
      minBandHits: Int = 1)(
      implicit spark: SparkSession): DataFrame =
    bandMatchesWith(
      graft.operators.Multimodal.imagePHashCensus(streamMedia).toDF(),
      index, m, kHash, minBandHits)

  /** [[intakeAudioFpMatches]] against a prebuilt [[buildBandIndex]]
    * artifact (in-memory or reloaded from parquet).
    */
  def intakeAudioFpMatchesWith(
      streamMedia: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow],
      index: DataFrame, m: Int = 1 << 20, kHash: Int = 3,
      minBandHits: Int = 1)(
      implicit spark: SparkSession): DataFrame =
    bandMatchesWith(
      graft.operators.Multimodal.audioFingerprintCensus(streamMedia).toDF(),
      index, m, kHash, minBandHits)

  /** [[intakeWinnowMatches]] against a prebuilt [[buildWinnowIndex]]
    * artifact (in-memory or reloaded from its parquet form).
    */
  def intakeWinnowMatchesWith(docs: DataFrame, index: DataFrame,
      k: Int = 20, w: Int = 8, m: Int = 1 << 20, kHash: Int = 3,
      minHits: Int = 2): DataFrame = {
    // probing with parameters other than the artifact's own fails loudly
    // (assert_true evaluated in the filter column itself) — r11, closing
    // the "documented contract violation" into an enforced one
    val filt = checkedFilter(index, k, w, m, kHash)
    docs.select(col("doc_id"), col("lang"),
        graft.functions.expressions.TextExpressions
          .winnowSketch(col("text"), k, w).as("__sk"))
      .withColumn("__g", lit(1))
      .join(broadcast(filt), Seq("__g"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(size(col("__sk")), lit(0)).as("n_fp"),
        // codegen'd probe loop (BloomHitCount): the HOF form's per-element
        // interpreted md5 chain was ~72 s of an 85 s query at the x100
        // corpus; the native loop runs at md5 speed
        when(col("filter").isNull, lit(0)).otherwise(
          coalesce(graft.functions.expressions.TextExpressions
            .bloomHitCount(col("__sk"), col("filter"), m, kHash), lit(0)))
          .as("n_hits"))
      .withColumn("suspect", col("n_hits") >= minHits)
  }

  /** Stateless streaming image near-dup intake (w18): every arriving
    * image REALLY decodes ([[graft.operators.Multimodal.imagePHashCensus]]
    * — corrupt payloads degrade to decode_ok = false sentinels, never a
    * stream-killing exception), its four 16-bit perceptual-hash bands
    * probe a broadcast Bloom filter of the corpus's band keys, and
    * `suspect` fires at `minBandHits` band membership hits. Band equality
    * is m06's candidate rule, so a hit means "would be an m06 candidate
    * against some corpus image" — recall 1.0 for any corpus near-dup
    * within Hamming 3 (the pigeonhole guarantee), before a byte of that
    * corpus is consulted. ZERO streaming state (w14's discipline): the
    * filter is fixed model state broadcast per batch, positions are
    * md5-derived, so even false positives replay bit-for-bit in SQL.
    */
  def intakeImagePHashMatches(
      streamMedia: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow],
      corpusMedia: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow],
      m: Int = 1 << 20, kHash: Int = 3, minBandHits: Int = 1)(
      implicit spark: SparkSession): DataFrame =
    // BitmapOr dedups by idempotence — no distinct needed before the build
    intakeImagePHashMatchesWith(streamMedia,
      buildBandIndex(graft.operators.Multimodal.imagePHash(corpusMedia)
        .toDF(), m, kHash),
      m, kHash, minBandHits)

  /** Stateless streaming AUDIO near-dup intake (w21) — the w18 shape on
    * the time axis: every arriving clip REALLY decodes
    * ([[graft.operators.Multimodal.audioFingerprintCensus]] — corrupt
    * payloads degrade to decode_ok = false sentinels), its four 16-bit
    * energy-gradient fingerprint bands probe a broadcast Bloom filter of
    * the corpus's band keys, and `suspect` fires at `minBandHits` band
    * hits. Band equality is m08's candidate rule, so a hit means "would
    * be an m08 candidate against some corpus clip" — recall 1.0 for any
    * corpus near-dup within Hamming 3 (pigeonhole), before a byte of the
    * corpus is consulted. ZERO streaming state; md5-derived positions,
    * so even false positives replay bit-for-bit in SQL.
    */
  def intakeAudioFpMatches(
      streamMedia: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow],
      corpusMedia: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow],
      m: Int = 1 << 20, kHash: Int = 3, minBandHits: Int = 1)(
      implicit spark: SparkSession): DataFrame =
    intakeAudioFpMatchesWith(streamMedia,
      buildBandIndex(graft.operators.Multimodal.audioFingerprint(corpusMedia)
        .toDF(), m, kHash),
      m, kHash, minBandHits)

  final case class AsOfEvent(user_id: Long, event_id: Long, ts_us: Long,
      is_right: Boolean, value: Double)
  final case class AsOfState(rtsUs: Long, rvalue: Double)
  final case class AsOfRow(user_id: Long, event_id: Long, ts_us: Long,
      matched: Boolean, last_value: Double)

  /** Streaming backward as-of enrichment: each left-type event picks up
    * the key's latest right-type value at or before it, within
    * `toleranceUs` — the INCREMENTAL form of the batch as-of join
    * (operators/AsOfJoin.backward with tolerance; reference nearest-cal
    * join plots.py:76-77). State is ONE (ts, value) row per key — the
    * streaming-native cost model: nothing buffers, nothing replays.
    *
    * Semantics match the batch q18b configuration exactly: backward
    * inclusive (a right at the same timestamp matches), same-ts right
    * ties resolve to MAX value, misses emit matched=false / -1.
    *
    * Ordering contract: within a micro-batch events sort by event time
    * (rights before lefts at equal ts), so any arrival order inside a
    * batch is handled; ACROSS batches a right older than an
    * already-emitted left cannot retro-fill it — the one-row state is the
    * price of incrementality. Out-of-order feeds beyond the micro-batch
    * horizon belong to the batch/physical as-of operator; a click older
    * than the retained state row is still matched correctly or dropped to
    * NULL by the `rtsUs <= ts` guard, never mis-matched forward.
    */
  def streamingAsOf(events: DataFrame, leftType: String, rightType: String,
      toleranceUs: Long)(implicit spark: SparkSession): Dataset[AsOfRow] = {
    import spark.implicits._
    events.filter(col("event_type").isin(leftType, rightType))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        (col("event_type") === rightType).as("is_right"), col("value"))
      .as[AsOfEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)((user: Long, rows: Iterator[AsOfEvent],
          state: GroupState[AsOfState]) => {
        // rights sort before lefts at equal ts (backward is INCLUSIVE);
        // event_id makes the walk deterministic
        val sorted = rows.toSeq.sortBy(e => (e.ts_us, !e.is_right, e.event_id))
        var st = state.getOption
        val out = Seq.newBuilder[AsOfRow]
        sorted.foreach { e =>
          if (e.is_right) st = st match {
            case Some(s) if s.rtsUs > e.ts_us => Some(s)
            case Some(s) if s.rtsUs == e.ts_us =>
              Some(AsOfState(e.ts_us, math.max(s.rvalue, e.value)))
            case _ => Some(AsOfState(e.ts_us, e.value))
          } else {
            val m = st.filter(s =>
              s.rtsUs <= e.ts_us && e.ts_us - s.rtsUs <= toleranceUs)
            out += AsOfRow(user, e.event_id, e.ts_us, m.isDefined,
              m.map(_.rvalue).getOrElse(-1.0))
          }
        }
        st.foreach(state.update)
        out.result().iterator
      })
  }

  /** Streaming corpus-overlap monitor (w22): a KMV bottom-k sketch of the
    * ARRIVING corpus accumulates as streaming state and is compared each
    * batch against a static reference-corpus sketch — the live form of
    * [[graft.operators.CorpusOverlap.overlapMatrix]], answering "how much
    * of today's intake repeats the existing corpus" while the intake is
    * still flowing, without ever materializing a shingle join.
    *
    * State: ONE global group whose buffer is the <=`k`-long
    * [[graft.functions.Aggregators.BoundedMinKDistinctLong]] sketch —
    * hard-bounded at k longs for the life of the stream (the w16
    * complete-mode discipline), no watermark needed. The reference
    * corpus's sketch rides in as an inlined array literal (bounded model
    * state, the w15/w17 discipline). KMV insertion is order-independent
    * (set-min), so end-of-stream parity with the batch operator is
    * bit-for-bit regardless of micro-batch boundaries.
    *
    * Emits one complete-mode row: the stream sketch size, the merged
    * union-sample size `m`, the both-sketches count `n_common`, and the
    * Jaccard estimate n_common/m.
    */
  def streamingOverlapSketch(docs: DataFrame, corpusSketch: Seq[Long],
      k: Int = 256, shingleK: Int = 3): DataFrame = {
    // an EMPTY reference sketch (fresh corpus version) is a meaningful
    // degenerate: the merged sample is the stream sketch alone and
    // n_common = 0 — the monitor reports zero overlap rather than
    // refusing to start
    val minK = udaf(graft.functions.Aggregators.BoundedMinKDistinctLong(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    val skStatic =
      if (corpusSketch.isEmpty) lit(Array.empty[Long])
      else array(corpusSketch.map(lit): _*)
    docs
      .select(explode(graft.functions.TextOps.shingleSet(col("text"),
        shingleK)).as("s"))
      .select(graft.operators.CorpusOverlap.shingleHash(col("s")).as("h"))
      .groupBy()
      .agg(minK(col("h")).as("sketch"))
      .withColumn("__merged",
        slice(array_sort(array_union(col("sketch"), skStatic)), 1, k))
      .select(size(col("sketch")).cast("long").as("stream_k"),
        size(col("__merged")).cast("long").as("m"),
        size(array_intersect(array_intersect(col("__merged"), col("sketch")),
          skStatic)).cast("long").as("n_common"))
      // m == 0 (empty batch AND empty reference): NULL like the oracle's
      // NULLIF(m, 0) division, never a 0/0 NaN (ADVICE r11)
      .withColumn("jaccard_est",
        when(col("m") === 0, lit(null: java.lang.Double))
          .otherwise(round(col("n_common").cast("double") / col("m"), 6)))
  }

  /** Streaming fuzzy-dedup intake (w23): every arriving document is
    * checked for EDIT-DISTANCE near-copies of the existing corpus — the
    * incremental form of [[graft.operators.Dedup.editDistancePairsPositional]],
    * completing the intake family (w09 exact, w14 winnow, w18 image, w21
    * audio, w22 overlap) on the fuzzy axis.
    *
    * The corpus side is indexed ONCE per version: PassJoin window anchors
    * (every length-w substring within ±(chunks-1) of each chunk slot),
    * df-capped with the aggregation discipline, grouped into a
    * per-(slot, chunk) sorted id list — so recall 1.0 is guaranteed for
    * arrivals whose prefix is within chunks-1 edits of a corpus doc's
    * (any edit mix, the q126b argument). The STREAM side is stateless:
    * each arrival contributes its `chunks` exact prefix chunks, looks
    * them up via `chunks` stream-static left equi-joins, dedups the
    * union of hit id-lists with pure array expressions INSIDE the row
    * (no streaming distinct, hence no state store), explodes, and
    * verifies against the corpus text with the thresholded banded-DP
    * levenshtein. Docs with no candidate emit a sentinel row
    * (cand_id = -1) — the per-arrival census the intake needs.
    *
    * Output: one row per (arrival, candidate): doc_id, cand_id,
    * edit_distance (-1 when unverified or no candidate), matched.
    */
  def intakeEditDistanceMatches(docs: DataFrame, corpus: DataFrame,
      prefixLen: Int = 48, chunks: Int = 4, maxEdit: Int = 8,
      maxBucket: Int = 200): DataFrame = {
    require(chunks >= 2 && prefixLen % chunks == 0,
      s"prefixLen ($prefixLen) must be a positive multiple of chunks ($chunks)")
    val w = prefixLen / chunks
    val tol = chunks - 1
    val base = corpus.select(col("doc_id").as("cid"), col("text").as("__ct"))
    val wn = base.select(col("cid"),
      explode(array((for {
        i <- 0 until chunks
        d <- -tol to tol
        if i * w + d >= 0
      } yield struct(lit(i).as("ci"),
        substring(col("__ct"), i * w + d + 1, w).as("ch"))): _*)).as("a"))
      .select(col("cid"), col("a.ci").as("ci"), col("a.ch").as("ch"))
      .distinct()
    val over = wn.groupBy("ci", "ch").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket).select("ci", "ch")
    val buckets = wn.join(broadcast(over), Seq("ci", "ch"), "left_anti")
      .groupBy("ci", "ch").agg(sort_array(collect_list(col("cid"))).as("ids"))
    val emptyIds = lit(Array.empty[Long])
    var probed = docs.select(col("doc_id"), col("text"))
    for (i <- 0 until chunks) {
      val b = buckets.filter(col("ci") === i)
        .select(col("ch").as(s"__ch$i"), col("ids").as(s"__ids$i"))
      probed = probed.join(b,
        substring(col("text"), i * w + 1, w) === col(s"__ch$i"), "left")
        .drop(s"__ch$i")
    }
    val cands = array_distinct(concat((0 until chunks).map(i =>
      coalesce(col(s"__ids$i"), emptyIds)): _*))
    probed
      .select(col("doc_id"), col("text"), explode_outer(cands).as("cid"))
      .join(base, Seq("cid"), "left")
      .withColumn("edit_distance",
        when(col("cid").isNull, lit(-1L))
          .when(abs(length(col("text")) - length(col("__ct"))) > maxEdit,
            lit(-1L))
          .otherwise(coalesce(
            levenshtein(col("text"), col("__ct"), maxEdit).cast("long"),
            lit(-1L))))
      .select(col("doc_id"), coalesce(col("cid"), lit(-1L)).as("cand_id"),
        col("edit_distance"), (col("edit_distance") >= 0).as("matched"))
  }

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the materialized result (test/demo harness: a batch of files
    * drives the stream synchronously).
    *
    * State-store task count is pinned at query start from
    * `spark.sql.shuffle.partitions`; per-partition store open/commit/sync
    * dominates small micro-batches, so the harness plans its streams with 8
    * state partitions instead of the session's batch default (results are
    * partitioning-invariant; a production deployment sizes this to
    * state-volume/executor count, and it is fixed for the checkpoint's
    * lifetime).
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    // streaming scans never see V2ScanRelationPushDown — the graft rule
    // restores decode pruning for seamf streams (no-op for other sources);
    // same ad-hoc-session registration pattern as AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations
        .contains(graft.sources.SeamfStreamingPrune))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.sources.SeamfStreamingPrune
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set(key, prev)
    spark.table(name)
  }
}
