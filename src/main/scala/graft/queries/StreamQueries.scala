package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Structured Streaming inventory (SURVEY.md §2.8): each query drives the
  * events fixture through a real streaming query (file source -> watermarked
  * stateful operator -> memory sink, run to completion) and exposes the
  * materialized result. The tumbling/session/gap operators are
  * SQL-expressible over the finished input, so the DuckDB oracle checks
  * STREAMING results against a BATCH oracle — end-of-stream parity.
  */
object StreamQueries {
  private val EvCte =
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, " +
      "event_type, value, props FROM events)"

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- watermarked tumbling window aggregation -----------------------
    "w01_stream_tumbling" -> QueryDef(
      (s, dir) => {
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.tumblingCounts(StreamingOps.eventsStream(s, dir)),
          "w01_mem", outputMode = "complete")
        streamed.select(
            unix_micros(col("window_start")).as("window_start_us"),
            col("event_type"), col("n"))
          .orderBy("window_start_us", "event_type")
      },
      Some(s"""$EvCte SELECT
        CAST(FLOOR(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)
          AS window_start_us,
        event_type, COUNT(*) AS n
        FROM ev GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- session windows (gap-based) -----------------------------------
    "w02_stream_sessions" -> QueryDef(
      (s, dir) => {
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.sessionWindows(StreamingOps.eventsStream(s, dir),
            gap = "1 hour"),
          "w02_mem", outputMode = "complete")
        streamed.select(col("user_id"),
            unix_micros(col("session_start")).as("session_start_us"),
            col("n_events"))
          .orderBy("user_id", "session_start_us")
      },
      Some(s"""$EvCte, l AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
            THEN 1 ELSE 0 END AS ns
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        st AS (SELECT user_id, ts, SUM(ns) OVER (PARTITION BY user_id
          ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM l)
        SELECT user_id, MIN(epoch_us(ts)) AS session_start_us,
          COUNT(*) AS n_events
        FROM st GROUP BY user_id, sid
        ORDER BY user_id, session_start_us""")),

    // ---- watermarked SLIDING window aggregation ------------------------
    // 1 h windows sliding every 15 min: each event lands in exactly 4
    // windows; the batch oracle regenerates the window set per event with a
    // zipped-offset unnest over the 15-min epoch grid (Spark's window()
    // aligns slides to the epoch).
    "w04_stream_sliding" -> QueryDef(
      (s, dir) => {
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.slidingMeans(StreamingOps.eventsStream(s, dir)),
          "w04_mem", outputMode = "complete")
        streamed.select(
            unix_micros(col("window_start")).as("window_start_us"),
            col("n"), col("mean_value"))
          .orderBy("window_start_us")
      },
      Some(s"""$EvCte, g AS (SELECT epoch_us(ts) AS tus,
        CAST(FLOOR(value * 1e6) AS BIGINT) AS v6 FROM ev),
      x AS (SELECT CAST(FLOOR(tus / 900000000) AS BIGINT) * 900000000
          - CAST(unnest([0, 1, 2, 3]) AS BIGINT) * 900000000
          AS window_start_us, v6 FROM g)
      SELECT window_start_us, COUNT(*) AS n,
        CAST(SUM(v6) AS DOUBLE) / COUNT(*) / 1e6 AS mean_value
      FROM x GROUP BY 1 ORDER BY 1""")),

    // ---- within-watermark streaming dedup ------------------------------
    // Duplicates are INJECTED (every 10th event re-emitted via self-union)
    // so the operator provably drops something: without the dedup the row
    // count would exceed the batch oracle's distinct-event count.
    "w05_stream_dedup" -> QueryDef(
      (s, dir) => {
        val ev = StreamingOps.eventsStream(s, dir)
        val withDupes = ev.union(ev.filter(col("event_id") % 10 === 0))
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.dedupWithinWatermark(withDupes), "w05_mem")
        streamed.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
            col("user_id"), col("event_type"))
          .orderBy("event_id")
      },
      Some(s"""$EvCte SELECT event_id, epoch_us(ts) AS ts_us, user_id,
        event_type FROM ev ORDER BY event_id""")),

    // ---- watermarked stream-stream interval join -----------------------
    // click -> purchase attribution per user within 30 minutes; the batch
    // oracle is a plain interval self-join over the finished input.
    "w06_stream_join" -> QueryDef(
      (s, dir) => {
        val clicks = StreamingOps.eventsStream(s, dir)
          .filter(col("event_type") === "click")
        val purchases = StreamingOps.eventsStream(s, dir)
          .filter(col("event_type") === "purchase")
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.intervalJoin(clicks, purchases), "w06_mem")
        streamed.select(col("user_id"), col("left_id").as("click_id"),
            col("right_id").as("purchase_id"),
            (unix_micros(col("rts")) - unix_micros(col("lts")))
              .as("delay_us"))
          .orderBy("user_id", "click_id", "purchase_id")
      },
      Some(s"""$EvCte SELECT c.user_id AS user_id,
          c.event_id AS click_id, p.event_id AS purchase_id,
          epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
        FROM ev c JOIN ev p
          ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts > c.ts
          AND epoch_us(p.ts) - epoch_us(c.ts) <= 1800000000
        ORDER BY user_id, click_id, purchase_id""")),

    // ---- stream-static broadcast enrichment ----------------------------
    // The event stream joins the static customer dimension (broadcast per
    // micro-batch, no join state) and aggregates per (market segment,
    // event type); the batch oracle is the same join over the finished
    // input. Value sums are 1e-6-floor-scaled exact longs.
    "w07_stream_enrich" -> QueryDef(
      (s, dir) => {
        val dim = graft.Tables.load(s, dir, "customer")
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.enrichedTypeCounts(
            StreamingOps.eventsStream(s, dir), dim,
            dimKey = "c_custkey", dimAttr = "c_mktsegment"),
          "w07_mem", outputMode = "complete")
        streamed.select(col("c_mktsegment").as("segment"),
            col("event_type"), col("n"),
            (col("sum_v6").cast("double") / 1e6).as("sum_value"))
          .orderBy("segment", "event_type")
      },
      Some(s"""$EvCte SELECT c.c_mktsegment AS segment, ev.event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(FLOOR(ev.value * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
            AS sum_value
        FROM ev JOIN customer c ON ev.user_id = c.c_custkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- streaming corpus intake: filter + hash split ------------------
    // The documents table streamed through the stateless quality-filter ->
    // content-hash-split -> per-(split, lang) aggregation pipeline; the
    // oracle replays filter and md5 split decisions in SQL over the
    // finished input (split cuts: 0.8/0.9 of 1e6, q51 discipline).
    "w08_stream_split" -> QueryDef(
      (s, dir) => {
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.qualitySplitCounts(
            StreamingOps.documentsStream(s, dir)),
          "w08_mem", outputMode = "complete")
        streamed.select(col("split"), col("lang"), col("n_docs"),
            col("n_tokens"))
          .orderBy("split", "lang")
      },
      Some("""WITH d AS (SELECT doc_id, lang,
          len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0))
            AS n_tok,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 12))
            AS BIGINT) % 1000000 AS h
          FROM documents
          WHERE len(text) >= 50
            AND len(list_filter(string_split_regex(text, '\s+'),
              x -> len(x) > 0)) >= 10),
        sp AS (SELECT lang, n_tok,
          CASE WHEN h < 800000 THEN 'train'
            WHEN h < 900000 THEN 'val' ELSE 'test' END AS split FROM d)
        SELECT split, lang, COUNT(*) AS n_docs,
          CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM sp GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- incremental intake: stream-dedup against the existing corpus --
    // Odd doc_ids arrive as the stream; even doc_ids are the static
    // "already ingested" corpus. The stream joins the corpus's normalized
    // content-hash set (broadcast, stateless) and counts new-vs-duplicate
    // per language; the oracle replays hash + membership in SQL.
    "w09_stream_intake_dedup" -> QueryDef(
      (s, dir) => {
        val corpus = graft.Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 2 === 0)
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.intakeDedupCounts(
            StreamingOps.documentsStream(s, dir)
              .filter(col("doc_id") % 2 === 1), corpus),
          "w09_mem", outputMode = "complete")
        streamed.select(col("lang"), col("n_in"), col("n_dup"), col("n_new"))
          .orderBy("lang")
      },
      Some("""WITH ck AS (SELECT DISTINCT
          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS k
          FROM documents WHERE doc_id % 2 = 0),
        inc AS (SELECT lang,
          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS k
          FROM documents WHERE doc_id % 2 = 1),
        a AS (SELECT lang, COUNT(*) AS n_in,
          CAST(SUM(CASE WHEN k IN (SELECT k FROM ck) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup
          FROM inc GROUP BY lang)
        SELECT lang, n_in, n_dup, n_in - n_dup AS n_new
        FROM a ORDER BY lang""")),

    // ---- streaming Count-Min sketch (bounded-state heavy hitters) ------
    // The CMS counter table builds INCREMENTALLY over the document stream:
    // state is the (d, bucket) aggregation — hard-bounded at depth*width
    // keys no matter how long the stream runs (THE property that makes
    // frequency sketches the streaming answer where an exact per-word
    // count grows with the vocabulary). Counters are mergeable sums, so
    // end-of-stream equals the batch sketch and the q92-family oracle
    // replays it cell-exactly.
    "w10_stream_cms" -> QueryDef(
      (s, dir) => {
        val toks = StreamingOps.documentsStream(s, dir)
          .select(explode(graft.functions.TextOps.words(lower(col("text"))))
            .as("w"))
        val counters = graft.operators.CountMin.build(toks, "w",
          depth = 4, width = 256)
        StreamingOps.runToMemory(s, counters, "w10_mem",
            outputMode = "complete")
          .orderBy("d", "bucket")
      },
      Some(s"""WITH w AS (SELECT list_filter(string_split_regex(lower(text),
            '\\s+'), x -> len(x) > 0) AS ws FROM documents),
        tok AS (SELECT unnest(ws) AS w FROM w),
        cnt AS (SELECT w, COUNT(*) AS c0 FROM tok GROUP BY w),
        f AS (SELECT * FROM (VALUES ${LlmOracleSql.MinHashCoeffSql}) t(d, a, b)
          WHERE d < 4),
        x AS (SELECT w, c0,
            CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) % 2147483647 AS x
          FROM cnt)
        SELECT d, CAST(((a*x + b) % 2147483647) % 256 AS INT) AS bucket,
          CAST(SUM(c0) AS BIGINT) AS c
        FROM x CROSS JOIN f GROUP BY 1, 2 ORDER BY d, bucket""")),

    // ---- streaming drift monitor (bounded-state PSI) -------------------
    // The live half of q105 as a STREAM: documents arrive incrementally,
    // the per-bin histogram builds as a complete-mode groupBy whose state
    // is hard-bounded at B bins for the life of the stream (the same
    // bounded-state argument as w10's CMS), and end-of-stream PSI against
    // the static reference equals the batch computation — so q105's
    // oracle replays it verbatim.
    "w11_stream_drift" -> QueryDef(
      (s, dir) => {
        import graft.operators.Drift
        val docs = graft.Tables.load(s, dir, "documents")
        val ref = docs.filter(col("doc_id") % 2 === 0)
        val (lo, hi) = Drift.referenceRange(ref, "n_chars")
        val bins = 10
        val width = (hi - lo) / bins
        val liveBinned = StreamingOps.documentsStream(s, dir)
          .filter(col("doc_id") % 2 === 1)
          .groupBy(Drift.binCol(col("n_chars"), lo, width, bins).as("bin"))
          .agg(count(lit(1)).as("live_n"))
        val mat = StreamingOps.runToMemory(s, liveBinned, "w11_mem",
          outputMode = "complete")
        val refCounts = ref
          .groupBy(Drift.binCol(col("n_chars"), lo, width, bins).as("bin"))
          .agg(count(lit(1)).as("ref_n"))
        // both side totals derive from the B-row bin frames inside
        // psiFromBinned — no ref.count() full scan, no driver sum over mat
        Drift.psiFromBinned(s, refCounts, mat, bins)
      },
      Some("""WITH r AS (SELECT CAST(n_chars AS DOUBLE) AS x
          FROM documents WHERE doc_id % 2 = 0),
        lv AS (SELECT CAST(n_chars AS DOUBLE) AS x
          FROM documents WHERE doc_id % 2 = 1),
        rng AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM r),
        b AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin),
        rc AS (SELECT LEAST(GREATEST(CAST(FLOOR((x - lo)
              / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
            COUNT(*) AS ref_n
          FROM r CROSS JOIN rng GROUP BY 1),
        lc AS (SELECT LEAST(GREATEST(CAST(FLOOR((x - lo)
              / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
            COUNT(*) AS live_n
          FROM lv CROSS JOIN rng GROUP BY 1),
        n AS (SELECT (SELECT COUNT(*) FROM r) AS rn,
            (SELECT COUNT(*) FROM lv) AS lvn),
        j AS (SELECT b.bin, COALESCE(rc.ref_n, 0) AS ref_n,
            COALESCE(lc.live_n, 0) AS live_n
          FROM b LEFT JOIN rc USING (bin) LEFT JOIN lc USING (bin))
        SELECT bin, CAST(ref_n AS BIGINT) AS ref_n,
          CAST(live_n AS BIGINT) AS live_n,
          CAST(FLOOR(((ref_n + 1.0) / (rn + 10)
              - (live_n + 1.0) / (lvn + 10))
            * LN(((ref_n + 1.0) / (rn + 10))
              / ((live_n + 1.0) / (lvn + 10))) * 1e9) AS BIGINT) AS psi9
        FROM j CROSS JOIN n ORDER BY bin""")),

    // ---- streaming categorical drift (bounded-state PSI) ---------------
    // q107's live half as a STREAM: the top-B reference categories are
    // driver literals (bounded model state — the categorical analog of
    // w11's lo/hi range scalars), the live mix builds as a complete-mode
    // groupBy over the mapped category whose state is hard-bounded at
    // B+1 rows for the life of the stream (every unseen category folds
    // into __other IN the expression, so no key explosion is possible),
    // and end-of-stream PSI against the static reference equals the
    // batch computation — q107's oracle replays it verbatim.
    "w12_stream_drift_categorical" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.operators.Drift
        val docs = graft.Tables.load(s, dir, "documents")
        val ref = docs.filter(col("doc_id") % 2 === 0)
        val top = ref
          .select(coalesce(col("lang").cast("string"), lit("__other"))
            .as("c"))
          .groupBy("c").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("c")).limit(3)
          .select("c").collect().map(_.getString(0)).toSeq
        def mapCat(c: org.apache.spark.sql.Column) = {
          val base = coalesce(c.cast("string"), lit("__other"))
          if (top.isEmpty) lit("__other")
          else when(base.isInCollection(top), base).otherwise(lit("__other"))
        }
        val liveBinned = StreamingOps.documentsStream(s, dir)
          .filter(col("doc_id") % 2 === 1)
          .groupBy(mapCat(col("lang")).as("cat"))
          .agg(count(lit(1)).as("live_n"))
        val mat = StreamingOps.runToMemory(s, liveBinned, "w12_mem",
          outputMode = "complete")
        val refCounts = ref
          .groupBy(mapCat(col("lang")).as("cat"))
          .agg(count(lit(1)).as("ref_n"))
        val spine = (top :+ "__other").distinct.toDF("cat")
        Drift.psiFromCategoryCounts(spine, refCounts, mat)
      },
      Some("""WITH r AS (SELECT COALESCE(CAST(lang AS VARCHAR), '__other')
            AS c FROM documents WHERE doc_id % 2 = 0),
        lv AS (SELECT COALESCE(CAST(lang AS VARCHAR), '__other') AS c
          FROM documents WHERE doc_id % 2 = 1),
        rc0 AS (SELECT c, COUNT(*) AS n FROM r GROUP BY c),
        top AS (SELECT c FROM (SELECT c, ROW_NUMBER() OVER
            (ORDER BY n DESC, c) AS rk FROM rc0) WHERE rk <= 3),
        spine AS (SELECT DISTINCT cat FROM (SELECT c AS cat FROM top
          UNION ALL SELECT '__other')),
        rm AS (SELECT CASE WHEN c IN (SELECT c FROM top) THEN c
            ELSE '__other' END AS cat FROM r),
        lm AS (SELECT CASE WHEN c IN (SELECT c FROM top) THEN c
            ELSE '__other' END AS cat FROM lv),
        rcc AS (SELECT cat, COUNT(*) AS ref_n FROM rm GROUP BY cat),
        lcc AS (SELECT cat, COUNT(*) AS live_n FROM lm GROUP BY cat),
        j AS (SELECT s.cat, COALESCE(rcc.ref_n, 0) AS ref_n,
            COALESCE(lcc.live_n, 0) AS live_n
          FROM spine s LEFT JOIN rcc USING (cat) LEFT JOIN lcc USING (cat)),
        t AS (SELECT SUM(ref_n) AS rn, SUM(live_n) AS lvn,
            COUNT(*) AS b FROM j)
        SELECT cat, CAST(ref_n AS BIGINT) AS ref_n,
          CAST(live_n AS BIGINT) AS live_n,
          CAST(FLOOR(((ref_n + 1.0) / (rn + b)
              - (live_n + 1.0) / (lvn + b))
            * LN(((ref_n + 1.0) / (rn + b))
              / ((live_n + 1.0) / (lvn + b))) * 1e9) AS BIGINT) AS psi9
        FROM j CROSS JOIN t ORDER BY cat""")),

    // ---- streaming backward as-of enrichment (one-row-per-key state) ----
    // The INCREMENTAL form of the batch tolerance as-of (q18b): each
    // streamed click picks up its user's latest purchase value at or
    // before it, within 1 day, from a flatMapGroupsWithState operator
    // whose state is ONE (ts, value) row per user — nothing buffers,
    // nothing replays. Backward-inclusive + max-value-on-ts-ties match
    // the batch operator exactly, so q18b's oracle replays this stream's
    // end-of-state output verbatim (the strongest equivalence the
    // streaming surface offers: stream and batch share one oracle).
    "w13_stream_asof" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.streamingAsOf(StreamingOps.eventsStream(s, dir),
            leftType = "click", rightType = "purchase",
            toleranceUs = 86400000000L).toDF(),
          "w13_mem")
        streamed.select(col("event_id"), col("user_id"), col("ts_us"),
            col("last_value").as("last_purchase"))
          .orderBy("event_id")
      },
      Some(s"""$EvCte SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
        COALESCE(
          (SELECT arg_max(p.value, p.ts) FROM ev p
           WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
             AND p.ts <= c.ts
             AND epoch_us(c.ts) - epoch_us(p.ts) <= 86400000000), -1.0)
          AS last_purchase
        FROM ev c WHERE c.event_type = 'click' ORDER BY c.event_id""")),

    // ---- stateless streaming near-copy intake (winnow x Bloom) ---------
    // w09 catches VERBATIM re-ingests by content hash; this catches
    // incoming docs that COPY >= 27-char runs from the existing corpus:
    // each streamed doc's winnow sketch (map-side codegen'd kernel)
    // probes a broadcast Bloom filter of the corpus sketch — per-doc
    // (n_fp, n_hits, suspect) with ZERO streaming state. Bloom positions
    // are md5-derived, so even false positives replay bit-for-bit in the
    // oracle (the q59 portability argument); no false negatives, so a
    // clean n_hits = 0 is a PROOF of no shared fingerprint.
    "w14_stream_winnow_intake" -> QueryDef(
      (s, dir) => {
        val corpus = graft.Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 3 === 0)
        val stream = StreamingOps.documentsStream(s, dir)
          .filter(col("doc_id") % 3 =!= 0)
        StreamingOps.runToMemory(s,
            StreamingOps.intakeWinnowMatches(stream, corpus,
              minHits = 5), "w14_mem")
          .orderBy("doc_id")
      },
      Some(LlmOracleSql.winnowIntakeOracleSql)),

    // ---- streaming model-score drift (the production ML monitor) -------
    // The classifier trained offline on the reference slice scores a LIVE
    // embedding stream, and the score DISTRIBUTION is what's monitored:
    // score drift fires before label drift is observable (no labels in
    // production). Model state follows the w12 discipline — the trained
    // quantized weights ride as driver literals (9 longs, bounded by
    // construction) and the bin range as two doubles — so the stream
    // side is a stateless map + a complete-mode groupBy whose state is
    // hard-bounded at B bins for the life of the stream (w11's
    // argument). End-of-stream PSI equals the batch computation: the
    // oracle replays training, scoring, binning, and the smoothed PSI.
    "w15_stream_score_drift" -> QueryDef(
      (s, dir) => {
        import graft.operators.{Drift, LogReg}
        val emb = graft.Tables.load(s, dir, "embeddings")
        def feats(df: org.apache.spark.sql.DataFrame) = df.select(
          (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val refFeats = feats(emb.filter(col("vec_id") % 2 === 0))
        val wRow = LogReg.train(refFeats, xs, "y", lr = 0.5, iters = 3)
          .collect().head
        LogReg.unpersistAll()
        // identical left-associated arithmetic as LogReg.zCol, with the
        // trained weights inlined as literals (bounded model state)
        val z = xs.zipWithIndex.map { case (c, j) =>
          (lit(wRow.getLong(j)) / lit(1e6)) * col(c)
        }.reduce(_ + _)
        val refZ = refFeats.withColumn("z", z)
        val (lo, hi) = Drift.referenceRange(refZ, "z")
        val bins = 10
        val width = (hi - lo) / bins
        val liveBinned = feats(StreamingOps.embeddingsStream(s, dir)
            .filter(col("vec_id") % 2 === 1))
          .withColumn("z", z)
          .groupBy(Drift.binCol(col("z"), lo, width, bins).as("bin"))
          .agg(count(lit(1)).as("live_n"))
        val mat = StreamingOps.runToMemory(s, liveBinned, "w15_mem",
          outputMode = "complete")
        val refCounts = refZ
          .groupBy(Drift.binCol(col("z"), lo, width, bins).as("bin"))
          .agg(count(lit(1)).as("ref_n"))
        Drift.psiFromBinned(s, refCounts, mat, bins)
      },
      Some(LlmOracleSql.logRegScoreDriftOracleSql)),

    // ---- streaming realized precision/recall (labels arrive late) ------
    // w15 watches the SCORE distribution (no labels needed); this is the
    // companion monitor for when delayed labels flow back: the offline-
    // trained weights (driver literals, w15 discipline) score the live
    // stream at the fixed z >= 0 operating threshold and a complete-mode
    // GLOBAL aggregate maintains the confusion counts — state is ONE row
    // of four longs for the life of the stream, the hardest possible
    // state bound. Output: (tp, fp, fn, tn, precision9, recall9), the
    // floor-quantized integer ratios of q108d's discipline; the oracle
    // replays training, scoring, and the counts batch-side.
    "w16_stream_precision_recall" -> QueryDef(
      (s, dir) => {
        import graft.operators.LogReg
        val emb = graft.Tables.load(s, dir, "embeddings")
        def feats(df: org.apache.spark.sql.DataFrame) = df.select(
          (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val wRow = LogReg.train(feats(emb.filter(col("vec_id") % 2 === 0)),
          xs, "y", lr = 0.5, iters = 3).collect().head
        LogReg.unpersistAll()
        val z = xs.zipWithIndex.map { case (c, j) =>
          (lit(wRow.getLong(j)) / lit(1e6)) * col(c)
        }.reduce(_ + _)
        val counts = feats(StreamingOps.embeddingsStream(s, dir)
            .filter(col("vec_id") % 2 === 1))
          .withColumn("pred", (z >= 0.0).cast("int"))
          .agg(
            count(when(col("pred") === 1 && col("y") === 1, 1)).as("tp"),
            count(when(col("pred") === 1 && col("y") === 0, 1)).as("fp"),
            count(when(col("pred") === 0 && col("y") === 1, 1)).as("fn"),
            count(when(col("pred") === 0 && col("y") === 0, 1)).as("tn"))
        StreamingOps.runToMemory(s, counts, "w16_mem",
            outputMode = "complete")
          .select(col("tp"), col("fp"), col("fn"), col("tn"),
            when(col("tp") + col("fp") === 0, lit(-1L))
              .otherwise(expr(
                "CAST(tp AS DECIMAL(38,0)) * 1000000000 DIV (tp + fp)"))
              .as("precision9"),
            when(col("tp") + col("fn") === 0, lit(-1L))
              .otherwise(expr(
                "CAST(tp AS DECIMAL(38,0)) * 1000000000 DIV (tp + fn)"))
              .as("recall9"))
      },
      Some(LlmOracleSql.logRegStreamPrOracleSql)),

    // ---- streaming DSIR intake selection (stateless) --------------------
    // The production shape of q111: the importance model fits OFFLINE
    // (target vs raw-pool snapshot), its 256-long ratio table rides into
    // the stream as an inlined array literal (bounded model state, the
    // w15 discipline), and every arriving document scores with a pure
    // expression — Dsir.scoreCol9's long sum over its bigram buckets.
    // ZERO streaming state, no shuffle below the sink: the intake filter
    // a 100 TB/day pipeline runs at the door. Long addition is exactly
    // associative, so end-of-stream parity with the batch scorer is
    // bit-for-bit (the oracle replays fit + score batch-side).
    "w17_stream_dsir_intake" -> QueryDef(
      (s, dir) => {
        import graft.operators.Dsir
        val docs = graft.Tables.load(s, dir, "documents")
        val lam9 = Dsir.collectRatios9(docs, "doc_id", "text",
          LlmOracleSql.DsirTargetPred, buckets = 256)
        val scored = StreamingOps.documentsStream(s, dir)
          .filter(!LlmOracleSql.DsirTargetPred)
          .select(col("doc_id"), col("lang"),
            // NULL text scores as an empty doc (the oracle's no-rows path)
            when(col("text").isNull, lit(0L)).otherwise(
              size(graft.functions.TextOps.shingles(col("text"), 2))
                .cast("long")).as("n_bigrams"),
            coalesce(Dsir.scoreCol9(col("text"), lam9.toSeq, 256), lit(0L))
              .as("w9"))
          .withColumn("selected", col("w9") >= 0L)
        StreamingOps.runToMemory(s, scored, "w17_mem").orderBy("doc_id")
      },
      Some(LlmOracleSql.dsirIntakeOracleSql)),

    // ---- streaming media intake: real decode + pHash x corpus Bloom ----
    // w14's zero-state intake pattern on the MULTIMODAL axis (VERDICT r9
    // #4): images arrive on the stream, each one REALLY encodes+decodes
    // (in-JDK codecs ride the stateless stream map), deterministic
    // corruption (every doc_id % 5 == 3 payload truncated to 7 bytes)
    // exercises the sentinel path — decode failures degrade to
    // decode_ok = false rows, never a stream-killing exception — and
    // every clean image's four perceptual-hash bands probe the corpus's
    // broadcast band Bloom filter (m06's candidate rule: a band hit means
    // the arrival would be an m06 candidate, with guaranteed recall at
    // Hamming <= 3). State: ZERO; the filter is bounded model state.
    // The oracle replays pixels -> pooling -> bands -> md5 Bloom
    // positions -> probes batch-side, corrupt rows included.
    "w18_stream_media_intake" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        import s.implicits._
        import graft.operators.Multimodal
        val corpus = Multimodal.encodeMediaRows(
          graft.Tables.load(s, dir, "documents")
            .filter(col("doc_id") % 4 === 0 && col("doc_id") % 3 === 0))
        val stream0 = Multimodal.encodeMediaRows(
          StreamingOps.documentsStream(s, dir)
            .filter(col("doc_id") % 4 === 0 && col("doc_id") % 3 =!= 0))
        val stream = stream0.map(m =>
          if (m.media_id % 5 == 3) m.copy(content = m.content.take(7)) else m)
        StreamingOps.runToMemory(s,
            StreamingOps.intakeImagePHashMatches(stream, corpus), "w18_mem")
          .orderBy("media_id")
      },
      Some(ImageIntakeOracleSql)),

    // ---- streaming per-domain quota admission (bounded per-key state) --
    // q123's domain cap as ADMISSION CONTROL: arriving documents run the
    // same canonicalize -> registeredDomain pipeline (the shared messy-URL
    // fixture), and a flatMapGroupsWithState operator admits each domain's
    // first 20 arrivals, then closes the domain for the life of the
    // stream. State is ONE counter per domain (the w13 one-row-per-key
    // cost model); within a batch arrivals process in doc_id order, so
    // end-of-stream equals the batch rank rule and q123's kept-set
    // oracle logic replays every admission decision and rank verbatim.
    "w19_stream_domain_quota" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        import graft.operators.UrlOps
        val urls = StreamingOps.documentsStream(s, dir)
          .select(col("doc_id"), LlmOracleSql.messyUrlCol.as("url"))
          .select(col("doc_id"),
            UrlOps.registeredDomain(col("url")).as("domain"))
        StreamingOps.runToMemory(s,
            StreamingOps.streamingDomainQuota(urls, "domain", cap = 20)
              .toDF(),
            "w19_mem")
          .orderBy("doc_id")
      },
      Some("WITH " + LlmOracleSql.MessyUrlCte + ",\n        " +
        LlmOracleSql.UrlDomainCte + """,
        r AS (SELECT doc_id, domain,
            ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
          FROM dom)
        SELECT doc_id, domain, rn <= 20 AS admitted,
          CAST(CASE WHEN rn <= 20 THEN rn ELSE -1 END AS BIGINT)
            AS admit_rank
        FROM r ORDER BY doc_id""")),

    // ---- streaming audio intake: fingerprint x corpus band Bloom (w21) -
    // w18's stateless media intake on the time axis: arriving WAV clips
    // really decode (corrupt payloads — one in five, truncated bytes —
    // degrade to decode_ok=false sentinels), their four energy-gradient
    // fingerprint bands (m08's key) probe the corpus's broadcast band
    // Bloom, and suspect fires on any band hit (guaranteed recall at
    // Hamming <= 3 by m08's pigeonhole argument). Zero streaming state;
    // the oracle replays samples -> frame energies -> gradient bands ->
    // md5 Bloom positions -> probes batch-side, sentinels included.
    "w21_stream_audio_intake" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        import s.implicits._
        import graft.operators.Multimodal
        val corpus = Multimodal.encodeMediaRows(
          graft.Tables.load(s, dir, "documents")
            .filter(col("doc_id") % 4 === 1 && col("doc_id") % 3 === 0))
        val stream0 = Multimodal.encodeMediaRows(
          StreamingOps.documentsStream(s, dir)
            .filter(col("doc_id") % 4 === 1 && col("doc_id") % 3 =!= 0))
        val stream = stream0.map(m =>
          if (m.media_id % 5 == 3) m.copy(content = m.content.take(7)) else m)
        StreamingOps.runToMemory(s,
            StreamingOps.intakeAudioFpMatches(stream, corpus), "w21_mem")
          .orderBy("media_id")
      },
      Some("""WITH cw AS (SELECT doc_id AS mid FROM documents
          WHERE doc_id % 12 = 9),
        csq AS (SELECT mid, i // 3 AS f, SUM(s * s) AS e
          FROM (SELECT mid, ti.i AS i,
              ((mid + 1) * 2654435761 + ti.i * 40503) % 65536 - 32768 AS s
            FROM cw, range(192) ti(i))
          GROUP BY 1, 2),
        cbits AS (SELECT a.mid, CAST(a.f AS INT) AS idx
          FROM csq a JOIN csq b ON b.mid = a.mid AND b.f = (a.f + 1) % 64
          WHERE a.e > b.e),
        cfp AS (SELECT cw.mid,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 0
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b0,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 1
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b1,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 2
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b2,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 3
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b3
          FROM cw LEFT JOIN cbits USING (mid) GROUP BY cw.mid),
        ck AS (SELECT DISTINCT k FROM (
          SELECT '0:' || CAST(b0 AS VARCHAR) AS k FROM cfp
          UNION ALL SELECT '1:' || CAST(b1 AS VARCHAR) FROM cfp
          UNION ALL SELECT '2:' || CAST(b2 AS VARCHAR) FROM cfp
          UNION ALL SELECT '3:' || CAST(b3 AS VARCHAR) FROM cfp)),
        bpos AS (SELECT DISTINCT CAST(CAST(('0x' || substr(md5(k || '#bloom'
              || CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 1048576 AS INT)
            AS p
          FROM ck CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        sw AS (SELECT doc_id AS mid FROM documents
          WHERE doc_id % 4 = 1 AND doc_id % 3 <> 0 AND doc_id % 5 <> 3),
        ssq AS (SELECT mid, i // 3 AS f, SUM(s * s) AS e
          FROM (SELECT mid, ti.i AS i,
              ((mid + 1) * 2654435761 + ti.i * 40503) % 65536 - 32768 AS s
            FROM sw, range(192) ti(i))
          GROUP BY 1, 2),
        sbits AS (SELECT a.mid, CAST(a.f AS INT) AS idx
          FROM ssq a JOIN ssq b ON b.mid = a.mid AND b.f = (a.f + 1) % 64
          WHERE a.e > b.e),
        sfp AS (SELECT sw.mid,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 0
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b0,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 1
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b1,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 2
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b2,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 3
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b3
          FROM sw LEFT JOIN sbits USING (mid) GROUP BY sw.mid),
        sk AS (SELECT mid, k FROM (
          SELECT mid, '0:' || CAST(b0 AS VARCHAR) AS k FROM sfp
          UNION ALL SELECT mid, '1:' || CAST(b1 AS VARCHAR) FROM sfp
          UNION ALL SELECT mid, '2:' || CAST(b2 AS VARCHAR) FROM sfp
          UNION ALL SELECT mid, '3:' || CAST(b3 AS VARCHAR) FROM sfp)),
        skp AS (SELECT mid, k,
            MIN(CASE WHEN CAST(CAST(('0x' || substr(md5(k || '#bloom'
                || CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 1048576 AS INT)
              IN (SELECT p FROM bpos) THEN 1 ELSE 0 END) AS ok
          FROM sk CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          GROUP BY mid, k),
        agg AS (SELECT mid, CAST(SUM(ok) AS INT) AS n
          FROM skp GROUP BY mid)
        SELECT d.doc_id AS media_id,
          d.doc_id % 5 <> 3 AS decode_ok,
          CAST(CASE WHEN d.doc_id % 5 = 3 THEN 0
            ELSE COALESCE(a.n, 0) END AS INT) AS n_band_hits,
          (d.doc_id % 5 <> 3 AND COALESCE(a.n, 0) >= 1) AS suspect
        FROM documents d LEFT JOIN agg a ON a.mid = d.doc_id
        WHERE d.doc_id % 4 = 1 AND d.doc_id % 3 <> 0
        ORDER BY media_id""")),

    // ---- windowed domain quota: cap per event-time window (w20) --------
    // w19's quota with RE-ADMISSION per tumbling window — the daily-
    // budget politeness policy. Each document carries a derived event
    // time (2024-01-01 + doc_id seconds, replayable arithmetic), windows
    // are 240 s, and every (domain, window) admits its first 5 arrivals.
    // Unlike w19's one-counter-forever, the per-(domain, window) state
    // EXPIRES via EventTimeTimeout once the watermark passes the window
    // end — state is bounded by domains per open window, and the expiry
    // is graded as a state-store metric in StreamingSpec (the oracle
    // grades the admission semantics; expiry must be output-invisible).
    "w20_stream_domain_quota_windowed" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        import graft.operators.UrlOps
        val urls = StreamingOps.documentsStream(s, dir)
          .select(col("doc_id"), LlmOracleSql.messyUrlCol.as("url"))
          .select(col("doc_id"),
            UrlOps.registeredDomain(col("url")).as("domain"),
            timestamp_micros(lit(1704067200000000L) +
              col("doc_id") * 1000000L).as("ts"))
        StreamingOps.runToMemory(s,
            StreamingOps.streamingDomainQuotaWindowed(urls, "domain", "ts",
              cap = 5, windowSec = 240).toDF(),
            "w20_mem")
          .orderBy("doc_id")
      },
      Some("WITH " + LlmOracleSql.MessyUrlCte + ",\n        " +
        LlmOracleSql.UrlDomainCte + """,
        r AS (SELECT doc_id, domain,
            (1704067200000000 + doc_id * 1000000) // 240000000 * 240000000
              AS window_start_us,
            ROW_NUMBER() OVER (PARTITION BY domain, doc_id // 240
              ORDER BY doc_id) AS rn
          FROM dom)
        SELECT doc_id, domain, window_start_us, rn <= 5 AS admitted,
          CAST(CASE WHEN rn <= 5 THEN rn ELSE -1 END AS BIGINT)
            AS admit_rank
        FROM r ORDER BY doc_id""")),

    // ---- custom stateful gap operator (flatMapGroupsWithState) ---------
    "w03_stream_gaps" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        val streamed = StreamingOps.runToMemory(s,
          StreamingOps.streamingGaps(
            StreamingOps.eventsStream(s, dir), 1800.0).toDF(),
          "w03_mem")
        streamed.select(col("user_id"), col("prev_ts_us"), col("ts_us"),
            col("gap_sec"))
          .orderBy("user_id", "ts_us")
      },
      Some(s"""$EvCte, l AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
            AS prev_ts_us
        FROM ev)
        SELECT user_id, prev_ts_us, ts_us,
          CAST(ts_us - prev_ts_us AS DOUBLE)/1e6 AS gap_sec
        FROM l WHERE prev_ts_us IS NOT NULL
          AND CAST(ts_us - prev_ts_us AS DOUBLE)/1e6 > 1800.0
        ORDER BY user_id, ts_us""")),

    // ---- streaming corpus-overlap monitor: KMV sketch state (w22) -------
    // The live form of q127: the arriving corpus's bottom-256 KMV sketch
    // accumulates as streaming state (ONE global group, buffer hard-bounded
    // at 256 longs for the life of the stream — the w16 complete-mode
    // discipline) and is compared each batch against the existing corpus's
    // sketch, which rides in as an inlined array literal (bounded model
    // state, the w15/w17 discipline). KMV insertion is set-min — order-
    // independent — so end-of-stream parity with the batch operator is
    // bit-for-bit regardless of micro-batch boundaries (pinned across a
    // 2-batch MemoryStream in StreamingSpec). The oracle replays BOTH
    // sketches (ORDER BY hash LIMIT k), the merged union-sample, and both
    // counters batch-side.
    "w22_stream_corpus_overlap" -> QueryDef(
      (s, dir) => {
        import graft.operators.CorpusOverlap
        val docs = graft.Tables.load(s, dir, "documents")
        // take(1): an empty reference corpus yields no sketch row, and
        // the monitor then starts with the empty-sketch degenerate
        // instead of a driver-side head() crash
        val ref = CorpusOverlap.sketches(
            docs.filter(col("doc_id") % 2 === 0).withColumn("__c", lit("ref")),
            "__c", "text", k = 256)
          .take(1).headOption.map(_.getSeq[Long](1)).getOrElse(Seq.empty)
        val stream = StreamingOps.documentsStream(s, dir)
          .filter(col("doc_id") % 2 === 1)
        StreamingOps.runToMemory(s,
          StreamingOps.streamingOverlapSketch(stream, ref, k = 256),
          "w22_mem", outputMode = "complete")
      },
      Some(s"""${LlmOracleSql.WordsCte},
        g AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS i, ws FROM w),
        sh AS (SELECT DISTINCT
            CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'stream' END AS c,
            ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM g),
        h AS (SELECT DISTINCT c,
            CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh),
        sk AS (SELECT c, h FROM (SELECT c, h,
            ROW_NUMBER() OVER (PARTITION BY c ORDER BY h) AS rn FROM h)
          WHERE rn <= 256),
        mg AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
            FROM (SELECT DISTINCT h FROM sk)) WHERE rn <= 256),
        st AS (SELECT
            (SELECT COUNT(*) FROM sk WHERE c = 'stream') AS stream_k,
            (SELECT COUNT(*) FROM mg) AS m,
            (SELECT COUNT(*) FROM mg
              JOIN sk sa ON sa.c = 'ref' AND sa.h = mg.h
              JOIN sk sb ON sb.c = 'stream' AND sb.h = mg.h) AS n_common)
        SELECT CAST(stream_k AS BIGINT) AS stream_k, CAST(m AS BIGINT) AS m,
          CAST(n_common AS BIGINT) AS n_common,
          ROUND(CAST(n_common AS DOUBLE) / NULLIF(m, 0), 6) AS jaccard_est
        FROM st""")),

    // ---- streaming fuzzy-dedup intake: edit distance vs corpus (w23) ----
    // The intake family's fuzzy axis: arriving docs probe the corpus's
    // PassJoin window-anchor index (per-(slot, chunk) id lists, built
    // once per corpus version) via stream-static left joins, the hit
    // lists dedup with array expressions INSIDE the row (zero streaming
    // state — no streaming distinct, no store), and every candidate
    // verifies at true Levenshtein <= 8 against the corpus text. Docs
    // with no candidate emit cand_id = -1 sentinels — one census row per
    // (arrival, candidate). Recall 1.0 guaranteed for arrivals within 3
    // prefix edits of a corpus doc (q126b's argument); the oracle
    // replays anchors -> cap -> candidates -> verify batch-side.
    "w23_stream_fuzzy_intake" -> QueryDef(
      (s, dir) => {
        val corpus = graft.Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 3 === 0)
        val stream = StreamingOps.documentsStream(s, dir)
          .filter(col("doc_id") % 3 =!= 0)
        StreamingOps.runToMemory(s,
            StreamingOps.intakeEditDistanceMatches(stream, corpus),
            "w23_mem")
          .orderBy("doc_id", "cand_id")
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents),
        c AS (SELECT doc_id AS cid, text AS ct FROM d WHERE doc_id % 3 = 0),
        s AS (SELECT doc_id, text FROM d WHERE doc_id % 3 <> 0),
        wn AS (SELECT DISTINCT cid, CAST(t.ci AS INT) AS ci,
            substr(ct, CAST(t.ci AS INT) * 12 + CAST(u.dd AS INT) + 1, 12)
              AS ch
          FROM c, range(4) t(ci), range(-3, 4) u(dd)
          WHERE CAST(t.ci AS INT) * 12 + CAST(u.dd AS INT) >= 0),
        cnt AS (SELECT ci, ch, COUNT(*) AS n FROM wn GROUP BY 1, 2),
        kw AS (SELECT wn.cid, wn.ci, wn.ch FROM wn
          JOIN cnt ON cnt.ci = wn.ci AND cnt.ch = wn.ch
          WHERE cnt.n <= 200),
        pc AS (SELECT doc_id, CAST(t.ci AS INT) AS ci,
            substr(text, CAST(t.ci AS INT) * 12 + 1, 12) AS ch
          FROM s, range(4) t(ci)),
        cand AS (SELECT DISTINCT pc.doc_id, kw.cid FROM pc
          JOIN kw ON kw.ci = pc.ci AND kw.ch = pc.ch),
        r AS (SELECT s.doc_id, cand.cid, c.ct, s.text FROM s
          LEFT JOIN cand ON cand.doc_id = s.doc_id
          LEFT JOIN c ON c.cid = cand.cid),
        v AS (SELECT doc_id, COALESCE(cid, -1) AS cand_id,
            CASE WHEN cid IS NULL THEN -1
                 WHEN abs(length(text) - length(ct)) > 8 THEN -1
                 WHEN levenshtein(text, ct) > 8 THEN -1
                 ELSE levenshtein(text, ct) END AS edit_distance
          FROM r)
        SELECT doc_id, CAST(cand_id AS BIGINT) AS cand_id,
          CAST(edit_distance AS BIGINT) AS edit_distance,
          (edit_distance >= 0) AS matched
        FROM v ORDER BY doc_id, cand_id""")),

    // ---- streaming spectral drift: projections onto reloaded axes (w24) -
    // The w15 score-drift discipline on the SPECTRAL axes (VERDICT r11
    // #3): the reference corpus's k = 3 principal axes fit offline
    // (q131's machinery), persist as the self-describing artifact, and
    // the RELOADED axis cells ride into the stream as inlined literals
    // (bounded model state — 192 doubles). Every arriving embedding
    // projects onto each axis (pure left-associated expressions), and a
    // complete-mode groupBy over (component, bin) — state hard-bounded
    // at k x 10 rows for the stream's life — feeds one independent PSI
    // monitor per component: "the corpus is drifting ALONG ITS DOMINANT
    // DIRECTIONS" fires even when no single feature drifts. The oracle
    // replays the 3 deflated Gram chains, the projections, binning, and
    // the smoothed PSI batch-side, bit for bit.
    "w24_stream_spectral_drift" -> QueryDef(
      (s, dir) => {
        import graft.operators.{Drift, Pca}
        implicit val sp = s
        val emb = graft.Tables.load(s, dir, "embeddings")
        val ref = emb.filter(col("vec_id") % 2 === 0)
        val finals = Pca.kComponentFinals(ref, "embedding",
          dim = 64, iters = 3, k = 3)
        val axDir = new java.io.File(sys.props("java.io.tmpdir"),
          "graft_pca_axes_w24_" + LlmDedupQueries.artifactKey(dir)).toString
        Pca.axesArtifact(finals, dim = 64, iters = 3, k = 3, version = 1L)
          .write.mode("overwrite").parquet(axDir)
        // reload: k x dim rows of bounded model state; a component that
        // collapsed to NULL axes (empty/rank-deficient reference) drops
        // out of the monitored set rather than projecting onto garbage
        // LIMIT-guarded reload (VERDICT r12 minor): the artifact is k x dim
        // = 192 rows by contract; one row more proves a mis-written
        // artifact without collecting it onto the driver
        val axRows = s.read.parquet(axDir)
          .filter(col("v").isNotNull)
          .select("component", "j", "v").limit(3 * 64 + 1).collect()
        require(axRows.length <= 3 * 64,
          s"axes artifact exceeds ${3 * 64} rows — not the bounded q131 " +
            "model; refusing to collect it onto the driver")
        val axes: Map[Int, Array[Double]] = axRows
          .groupBy(_.getInt(0)).map { case (c, rs) =>
            val a = new Array[Double](64)
            rs.foreach(r => a(r.getInt(1)) = r.getDouble(2))
            c -> a
          }
        val comps = axes.keys.toSeq.sorted
        if (comps.isEmpty) {
          import s.implicits._
          Seq.empty[(Int, Int, Long, Long, Long)]
            .toDF("component", "bin", "ref_n", "live_n", "psi9")
        } else {
          def zc(c: Int) = (0 until 64).map(j =>
            element_at(col("embedding"), j + 1).cast("double") *
              lit(axes(c)(j))).reduce(_ + _)
          val bins = 10
          // ALL components' reference ranges in ONE aggregation pass
          // (guide §1.2: k separate Drift.referenceRange actions scanned
          // the reference k times for k independent min/max pairs; the
          // fused agg computes the same doubles — min/max are
          // order-independent — in a single job)
          val rangeAggs = comps.flatMap(c => Seq(
            min(zc(c)).as(s"__lo_$c"), max(zc(c)).as(s"__hi_$c")))
          val rrow = ref.agg(rangeAggs.head, rangeAggs.tail: _*).head()
          val ranges = comps.zipWithIndex.map { case (c, i) =>
            val (lo, hi) =
              if (rrow.isNullAt(2 * i)) (0.0, 0.0)
              else (rrow.getDouble(2 * i), rrow.getDouble(2 * i + 1))
            c -> ((lo, (hi - lo) / bins))
          }.toMap
          def binned(df: org.apache.spark.sql.DataFrame) = df.select(
            explode(array(comps.map { c =>
              val (lo, w) = ranges(c)
              struct(lit(c).as("component"),
                Drift.binCol(zc(c), lo, w, bins).as("bin"))
            }: _*)).as("cb"))
            .select(col("cb.component").as("component"),
              col("cb.bin").as("bin"))
          val live = binned(StreamingOps.embeddingsStream(s, dir)
              .filter(col("vec_id") % 2 === 1))
            .groupBy("component", "bin").agg(count(lit(1)).as("live_n"))
          val mat = StreamingOps.runToMemory(s, live, "w24_mem",
            outputMode = "complete")
          val refCounts = binned(ref).groupBy("component", "bin")
            .agg(count(lit(1)).as("ref_n"))
          Drift.psiFromBinnedGrouped(s, comps, refCounts, mat, bins,
            "component")
        }
      },
      Some(spectralDriftOracleSql)),

    // ---- streaming TRIMMED-audio intake (m12's streaming twin) ----------
    // w21 catches byte-copy/gain re-uploads (fingerprint bands); a clip
    // TRIMMED by a few samples walks right through it (m08's documented
    // non-claim). Here the corpus's landmark keys — indexed at phases=4,
    // so ANY integer-sample trim reduces to a whole-frame shift against
    // one phase — pack into a Bloom artifact, and each arriving clip
    // probes its own phase-0 keys in-row (zero streaming state). The
    // stream re-uploads every corpus clip trimmed by 2 samples (a REAL
    // decode -> drop -> re-encode, SUB-frame on purpose) under new ids:
    // all of them flag with certainty (subset + no false negatives).
    // Non-corpus arrivals and corrupt payloads flow as usual. The oracle
    // replays the closed-form PCM at all four phases, the landmark
    // triples, the md5 Bloom positions, and the hit fractions.
    "w25_stream_trimmed_audio_intake" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        import s.implicits._
        import graft.operators.Multimodal
        val corpus = Multimodal.encodeMediaRows(
          graft.Tables.load(s, dir, "documents")
            .filter(col("doc_id") % 4 === 1 && col("doc_id") % 3 === 0))
        val index = StreamingOps.buildLandmarkIndex(corpus)
        val stream = Multimodal.encodeMediaRows(
            StreamingOps.documentsStream(s, dir)
              .filter(col("doc_id") % 4 === 1))
          .flatMap { m =>
            if (m.media_id % 3 == 0)
              // corpus member arriving again, trimmed by 2 samples
              Multimodal.shiftWav(m.content, 2).map(b =>
                m.copy(media_id = m.media_id + 3000000000L,
                  content = b)).toSeq
            else if (m.media_id % 5 == 3)
              Seq(m.copy(content = m.content.take(7)))
            else Seq(m)
          }
        StreamingOps.runToMemory(s,
            StreamingOps.intakeLandmarkMatches(stream, index), "w25_mem")
          .orderBy("media_id")
      },
      Some(trimmedAudioIntakeOracleSql)),

    // w26: the m14 resample closure on the intake path. Arrivals carry
    // naively-2x-UPSAMPLED corpus re-uploads (real decode -> linear
    // interpolation -> re-encode); the intake censuses each clip's
    // phase-0 keys under BOTH hypotheses (identity + stride-2
    // decimation) in one decode and probes both against the broadcast
    // corpus index in-row — zero streaming state. An upsampled
    // re-upload flags suspect_resampled with CERTAINTY (its decimated
    // keys equal the original's identity keys — m14's set equality —
    // and Bloom has no false negatives): every planted upsample probes
    // at n_hits_half = n_keys_half. The oracle replays the corpus
    // phase union, both arrival kernels including the piecewise
    // interpolated PCM, the md5 Bloom positions, and both hit
    // fractions.
    "w26_stream_resampled_audio_intake" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        import s.implicits._
        import graft.operators.Multimodal
        val corpus = Multimodal.encodeMediaRows(
          graft.Tables.load(s, dir, "documents")
            .filter(col("doc_id") % 4 === 1 && col("doc_id") % 3 === 0))
        val index = StreamingOps.buildLandmarkIndex(corpus)
        val stream = Multimodal.encodeMediaRows(
            StreamingOps.documentsStream(s, dir)
              .filter(col("doc_id") % 4 === 1))
          .flatMap { m =>
            if (m.media_id % 3 == 0)
              // corpus member arriving again, naively upsampled 2x
              Multimodal.resampleWav2x(m.content).map(b =>
                m.copy(media_id = m.media_id + 5000000000L,
                  content = b)).toSeq
            else if (m.media_id % 5 == 3)
              Seq(m.copy(content = m.content.take(7)))
            else Seq(m)
          }
        StreamingOps.runToMemory(s,
            StreamingOps.intakeResampledLandmarkMatches(stream, index),
            "w26_mem")
          .orderBy("media_id")
      },
      Some(resampledAudioIntakeOracleSql)),

    // w27: the DOWNSAMPLE closure — w26's symmetric half, closed on the
    // INDEX side. The corpus index is built at strideMax = 2 (it
    // additionally carries every clip's stride-2 keys at all four
    // phases, ~1/2 extra keys), so a nearest-neighbor 2x-DOWNSAMPLED
    // re-upload — whose identity keys ARE the original's stride-2
    // offset-0 keys — flags suspect through the UNCHANGED identity
    // intake, with certainty (subset of the index key set + no Bloom
    // false negatives). The oracle replays the (phase x stride) corpus
    // key lattice, the decimated arrival PCM, the md5 Bloom positions,
    // and the hit fractions.
    "w27_stream_downsampled_audio_intake" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        import s.implicits._
        import graft.operators.Multimodal
        val corpus = Multimodal.encodeMediaRows(
          graft.Tables.load(s, dir, "documents")
            .filter(col("doc_id") % 4 === 1 && col("doc_id") % 3 === 0))
        val index = StreamingOps.buildLandmarkIndex(corpus, strideMax = 2)
        val stream = Multimodal.encodeMediaRows(
            StreamingOps.documentsStream(s, dir)
              .filter(col("doc_id") % 4 === 1))
          .flatMap { m =>
            if (m.media_id % 3 == 0)
              // corpus member arriving again as a 2x nearest-neighbor
              // downsample (the low-bitrate rip)
              Multimodal.decimateWav(m.content, 2).map(b =>
                m.copy(media_id = m.media_id + 6000000000L,
                  content = b)).toSeq
            else if (m.media_id % 5 == 3)
              Seq(m.copy(content = m.content.take(7)))
            else Seq(m)
          }
        StreamingOps.runToMemory(s,
            StreamingOps.intakeLandmarkMatches(stream, index,
              strideMax = 2),
            "w27_mem")
          .orderBy("media_id")
      },
      Some(downsampledAudioIntakeOracleSql))
  )

  /** w25 oracle: corpus landmark keys at ALL FOUR phases (the m12 CTE
    * machinery keyed by (cid, p)), their md5 Bloom positions, arrival
    * keys at phase 0 (novel clips + 2-sample-trimmed corpus re-uploads
    * + corrupt sentinels), and the per-arrival hit fraction.
    */
  private[queries] def trimmedAudioIntakeOracleSql: String =
    """WITH cw AS (SELECT doc_id AS cid FROM documents
          WHERE doc_id % 4 = 1 AND doc_id % 3 = 0),
        cfr AS (SELECT cid, CAST(tp.p AS INT) AS p,
            (200 + cid % 100 - CAST(tp.p AS INT)) // 4 AS nf
          FROM cw, range(4) tp(p)),
        csq AS (SELECT cid, p, i // 4 AS f, SUM(s * s) AS e
          FROM (SELECT cfr.cid, cfr.p, ti.i AS i,
              ((cid + 1) * 2654435761 + (ti.i + p) * 40503) % 65536
                - 32768 AS s
            FROM cfr, range(296) ti(i) WHERE ti.i < nf * 4)
          GROUP BY 1, 2, 3),
        clm AS (SELECT cid, p, f, e FROM (
            SELECT cid, p, f, e,
              MAX(e) OVER (PARTITION BY cid, p ORDER BY f
                ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS mp,
              MAX(e) OVER (PARTITION BY cid, p ORDER BY f
                ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS mf,
              COUNT(*) OVER (PARTITION BY cid, p) AS nf2
            FROM csq)
          WHERE f >= 2 AND f <= nf2 - 3 AND e > mp AND e > mf),
        ctri AS (SELECT cid, p,
            LAG(f, 2) OVER win AS f1, LAG(e, 2) OVER win AS e1,
            LAG(f, 1) OVER win AS f2, LAG(e, 1) OVER win AS e2,
            f AS f3, e AS e3
          FROM clm WINDOW win AS (PARTITION BY cid, p ORDER BY f)),
        ck AS (SELECT DISTINCT
            ((((f2 - f1) % 64) * 64 + ((f3 - f2) % 64)) * 2048
              + LEAST(2047, e2 * 1024 // e1)) * 2048
              + LEAST(2047, e3 * 1024 // e2) AS k
          FROM ctri WHERE f1 IS NOT NULL),
        bpos AS (SELECT DISTINCT CAST(CAST(('0x' || substr(
              md5(CAST(k AS VARCHAR) || '#bloom' || CAST(i AS VARCHAR)),
              1, 12)) AS BIGINT) % 1048576 AS INT) AS p
          FROM ck CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        aw AS (SELECT doc_id AS mid, doc_id AS acid, 0 AS off,
            (doc_id % 5 = 3) AS corrupt
          FROM documents WHERE doc_id % 4 = 1 AND doc_id % 3 <> 0
          UNION ALL SELECT doc_id + 3000000000, doc_id, 2, FALSE
          FROM documents WHERE doc_id % 4 = 1 AND doc_id % 3 = 0),
        afr AS (SELECT mid, acid, off, (200 + acid % 100 - off) // 4 AS nf
          FROM aw WHERE NOT corrupt),
        asq AS (SELECT mid, i // 4 AS f, SUM(s * s) AS e
          FROM (SELECT afr.mid, ti.i AS i,
              ((acid + 1) * 2654435761 + (ti.i + off) * 40503) % 65536
                - 32768 AS s
            FROM afr, range(296) ti(i) WHERE ti.i < nf * 4)
          GROUP BY 1, 2),
        alm AS (SELECT mid, f, e FROM (
            SELECT mid, f, e,
              MAX(e) OVER (PARTITION BY mid ORDER BY f
                ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS mp,
              MAX(e) OVER (PARTITION BY mid ORDER BY f
                ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS mf,
              COUNT(*) OVER (PARTITION BY mid) AS nf2
            FROM asq)
          WHERE f >= 2 AND f <= nf2 - 3 AND e > mp AND e > mf),
        atri AS (SELECT mid,
            LAG(f, 2) OVER win AS f1, LAG(e, 2) OVER win AS e1,
            LAG(f, 1) OVER win AS f2, LAG(e, 1) OVER win AS e2,
            f AS f3, e AS e3
          FROM alm WINDOW win AS (PARTITION BY mid ORDER BY f)),
        ak AS (SELECT DISTINCT mid,
            ((((f2 - f1) % 64) * 64 + ((f3 - f2) % 64)) * 2048
              + LEAST(2047, e2 * 1024 // e1)) * 2048
              + LEAST(2047, e3 * 1024 // e2) AS k
          FROM atri WHERE f1 IS NOT NULL),
        ank AS (SELECT mid, COUNT(*) AS n_keys FROM ak GROUP BY 1),
        ahit AS (SELECT mid, k,
            MIN(CASE WHEN CAST(CAST(('0x' || substr(
                md5(CAST(k AS VARCHAR) || '#bloom' || CAST(i AS VARCHAR)),
                1, 12)) AS BIGINT) % 1048576 AS INT)
              IN (SELECT p FROM bpos) THEN 1 ELSE 0 END) AS ok
          FROM ak CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          GROUP BY mid, k),
        agg AS (SELECT mid, SUM(ok) AS n_hits FROM ahit GROUP BY 1)
        SELECT aw.mid AS media_id, NOT corrupt AS decode_ok,
          CAST(CASE WHEN corrupt THEN 0
            ELSE COALESCE(ank.n_keys, 0) END AS INT) AS n_keys,
          CAST(CASE WHEN corrupt THEN 0
            ELSE COALESCE(agg.n_hits, 0) END AS INT) AS n_hits,
          (NOT corrupt AND COALESCE(ank.n_keys, 0) > 0
            AND COALESCE(agg.n_hits, 0) * 1000000000
              >= 600000000 * COALESCE(ank.n_keys, 0)) AS suspect
        FROM aw LEFT JOIN ank ON ank.mid = aw.mid
        LEFT JOIN agg ON agg.mid = aw.mid
        ORDER BY media_id"""

  /** w26 oracle: the w25 corpus machinery (phase-union keys -> md5 Bloom
    * positions) verbatim, then BOTH arrival kernels — identity keys over
    * the piecewise-interpolated upsample PCM, and stride-2 decimated
    * keys (which recover the original's samples exactly for upsampled
    * clips) — each probed against the same position set.
    */
  private[queries] def resampledAudioIntakeOracleSql: String =
    """WITH cw AS (SELECT doc_id AS cid FROM documents
          WHERE doc_id % 4 = 1 AND doc_id % 3 = 0),
        cfr AS (SELECT cid, CAST(tp.p AS INT) AS p,
            (200 + cid % 100 - CAST(tp.p AS INT)) // 4 AS nf
          FROM cw, range(4) tp(p)),
        csq AS (SELECT cid, p, i // 4 AS f, SUM(s * s) AS e
          FROM (SELECT cfr.cid, cfr.p, ti.i AS i,
              ((cid + 1) * 2654435761 + (ti.i + p) * 40503) % 65536
                - 32768 AS s
            FROM cfr, range(296) ti(i) WHERE ti.i < nf * 4)
          GROUP BY 1, 2, 3),
        clm AS (SELECT cid, p, f, e FROM (
            SELECT cid, p, f, e,
              MAX(e) OVER (PARTITION BY cid, p ORDER BY f
                ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS mp,
              MAX(e) OVER (PARTITION BY cid, p ORDER BY f
                ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS mf,
              COUNT(*) OVER (PARTITION BY cid, p) AS nf2
            FROM csq)
          WHERE f >= 2 AND f <= nf2 - 3 AND e > mp AND e > mf),
        ctri AS (SELECT cid, p,
            LAG(f, 2) OVER win AS f1, LAG(e, 2) OVER win AS e1,
            LAG(f, 1) OVER win AS f2, LAG(e, 1) OVER win AS e2,
            f AS f3, e AS e3
          FROM clm WINDOW win AS (PARTITION BY cid, p ORDER BY f)),
        ck AS MATERIALIZED (SELECT DISTINCT
            ((((f2 - f1) % 64) * 64 + ((f3 - f2) % 64)) * 2048
              + LEAST(2047, e2 * 1024 // e1)) * 2048
              + LEAST(2047, e3 * 1024 // e2) AS k
          FROM ctri WHERE f1 IS NOT NULL),
        bpos AS MATERIALIZED (SELECT DISTINCT CAST(CAST(('0x' || substr(
              md5(CAST(k AS VARCHAR) || '#bloom' || CAST(i AS VARCHAR)),
              1, 12)) AS BIGINT) % 1048576 AS INT) AS p
          FROM ck CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        aw AS (SELECT doc_id AS mid, doc_id AS acid, 0 AS up,
            (doc_id % 5 = 3) AS corrupt
          FROM documents WHERE doc_id % 4 = 1 AND doc_id % 3 <> 0
          UNION ALL SELECT doc_id + 5000000000, doc_id, 1, FALSE
          FROM documents WHERE doc_id % 4 = 1 AND doc_id % 3 = 0),
        afr AS (SELECT mid, acid, up,
            CASE WHEN up = 1 THEN 2 * (200 + acid % 100) - 1
                 ELSE 200 + acid % 100 END AS len
          FROM aw WHERE NOT corrupt),
        asq1 AS MATERIALIZED (SELECT mid, i // 4 AS f, SUM(s * s) AS e
          FROM (SELECT afr.mid, ti.i AS i,
              CASE WHEN up = 0 THEN
                  ((acid + 1) * 2654435761 + ti.i * 40503) % 65536
                WHEN ti.i % 2 = 0 THEN
                  ((acid + 1) * 2654435761 + (ti.i // 2) * 40503) % 65536
                ELSE (((acid + 1) * 2654435761
                    + ((ti.i - 1) // 2) * 40503) % 65536
                  + ((acid + 1) * 2654435761
                    + ((ti.i + 1) // 2) * 40503) % 65536) // 2
              END - 32768 AS s
            FROM afr, range(600) ti(i) WHERE ti.i < (len // 4) * 4)
          GROUP BY 1, 2),
        asq2 AS MATERIALIZED (SELECT mid, i // 4 AS f, SUM(s * s) AS e
          FROM (SELECT afr.mid, ti.i AS i,
              CASE WHEN up = 0 THEN
                  ((acid + 1) * 2654435761 + (2 * ti.i) * 40503) % 65536
                ELSE ((acid + 1) * 2654435761 + ti.i * 40503) % 65536
              END - 32768 AS s
            FROM afr, range(300) ti(i)
            WHERE ti.i < (((len + 1) // 2) // 4) * 4)
          GROUP BY 1, 2),
        alm1 AS (SELECT mid, f, e FROM (
            SELECT mid, f, e,
              MAX(e) OVER (PARTITION BY mid ORDER BY f
                ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS mp,
              MAX(e) OVER (PARTITION BY mid ORDER BY f
                ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS mf,
              COUNT(*) OVER (PARTITION BY mid) AS nf2
            FROM asq1)
          WHERE f >= 2 AND f <= nf2 - 3 AND e > mp AND e > mf),
        alm2 AS (SELECT mid, f, e FROM (
            SELECT mid, f, e,
              MAX(e) OVER (PARTITION BY mid ORDER BY f
                ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS mp,
              MAX(e) OVER (PARTITION BY mid ORDER BY f
                ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS mf,
              COUNT(*) OVER (PARTITION BY mid) AS nf2
            FROM asq2)
          WHERE f >= 2 AND f <= nf2 - 3 AND e > mp AND e > mf),
        atri1 AS (SELECT mid,
            LAG(f, 2) OVER win AS f1, LAG(e, 2) OVER win AS e1,
            LAG(f, 1) OVER win AS f2, LAG(e, 1) OVER win AS e2,
            f AS f3, e AS e3
          FROM alm1 WINDOW win AS (PARTITION BY mid ORDER BY f)),
        atri2 AS (SELECT mid,
            LAG(f, 2) OVER win AS f1, LAG(e, 2) OVER win AS e1,
            LAG(f, 1) OVER win AS f2, LAG(e, 1) OVER win AS e2,
            f AS f3, e AS e3
          FROM alm2 WINDOW win AS (PARTITION BY mid ORDER BY f)),
        ak1 AS MATERIALIZED (SELECT DISTINCT mid,
            ((((f2 - f1) % 64) * 64 + ((f3 - f2) % 64)) * 2048
              + LEAST(2047, e2 * 1024 // e1)) * 2048
              + LEAST(2047, e3 * 1024 // e2) AS k
          FROM atri1 WHERE f1 IS NOT NULL),
        ak2 AS MATERIALIZED (SELECT DISTINCT mid,
            ((((f2 - f1) % 64) * 64 + ((f3 - f2) % 64)) * 2048
              + LEAST(2047, e2 * 1024 // e1)) * 2048
              + LEAST(2047, e3 * 1024 // e2) AS k
          FROM atri2 WHERE f1 IS NOT NULL),
        ank1 AS (SELECT mid, COUNT(*) AS n_keys FROM ak1 GROUP BY 1),
        ank2 AS (SELECT mid, COUNT(*) AS n_keys FROM ak2 GROUP BY 1),
        ahit1 AS (SELECT mid, k,
            MIN(CASE WHEN CAST(CAST(('0x' || substr(
                md5(CAST(k AS VARCHAR) || '#bloom' || CAST(i AS VARCHAR)),
                1, 12)) AS BIGINT) % 1048576 AS INT)
              IN (SELECT p FROM bpos) THEN 1 ELSE 0 END) AS ok
          FROM ak1 CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          GROUP BY mid, k),
        ahit2 AS (SELECT mid, k,
            MIN(CASE WHEN CAST(CAST(('0x' || substr(
                md5(CAST(k AS VARCHAR) || '#bloom' || CAST(i AS VARCHAR)),
                1, 12)) AS BIGINT) % 1048576 AS INT)
              IN (SELECT p FROM bpos) THEN 1 ELSE 0 END) AS ok
          FROM ak2 CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          GROUP BY mid, k),
        agg1 AS (SELECT mid, SUM(ok) AS n_hits FROM ahit1 GROUP BY 1),
        agg2 AS (SELECT mid, SUM(ok) AS n_hits FROM ahit2 GROUP BY 1)
        SELECT aw.mid AS media_id, NOT corrupt AS decode_ok,
          CAST(CASE WHEN corrupt THEN 0
            ELSE COALESCE(ank1.n_keys, 0) END AS INT) AS n_keys,
          CAST(CASE WHEN corrupt THEN 0
            ELSE COALESCE(agg1.n_hits, 0) END AS INT) AS n_hits,
          CAST(CASE WHEN corrupt THEN 0
            ELSE COALESCE(ank2.n_keys, 0) END AS INT) AS n_keys_half,
          CAST(CASE WHEN corrupt THEN 0
            ELSE COALESCE(agg2.n_hits, 0) END AS INT) AS n_hits_half,
          (NOT corrupt AND COALESCE(ank1.n_keys, 0) > 0
            AND COALESCE(agg1.n_hits, 0) * 1000000000
              >= 600000000 * COALESCE(ank1.n_keys, 0)) AS suspect,
          (NOT corrupt AND COALESCE(ank2.n_keys, 0) > 0
            AND COALESCE(agg2.n_hits, 0) * 1000000000
              >= 600000000 * COALESCE(ank2.n_keys, 0)) AS suspect_resampled
        FROM aw LEFT JOIN ank1 ON ank1.mid = aw.mid
        LEFT JOIN agg1 ON agg1.mid = aw.mid
        LEFT JOIN ank2 ON ank2.mid = aw.mid
        LEFT JOIN agg2 ON agg2.mid = aw.mid
        ORDER BY media_id"""

  /** w27 oracle: the corpus key set over the FULL (phase x stride)
    * lattice (p in 0..3, st in 1..2 — the strideMax = 2 index), then
    * the w25 arrival machinery with the decimated-PCM class (sample
    * index 2i) for the planted downsampled re-uploads.
    */
  private[queries] def downsampledAudioIntakeOracleSql: String =
    """WITH cw AS (SELECT doc_id AS cid FROM documents
          WHERE doc_id % 4 = 1 AND doc_id % 3 = 0),
        cfr AS (SELECT cid, CAST(tp.p AS INT) AS p, CAST(ts.s AS INT) AS st,
            ((200 + cid % 100 - CAST(tp.p AS INT) + CAST(ts.s AS INT) - 1)
              // CAST(ts.s AS INT)) // 4 AS nf
          FROM cw, range(4) tp(p), range(1, 3) ts(s)),
        csq AS (SELECT cid, p, st, i // 4 AS f, SUM(s * s) AS e
          FROM (SELECT cfr.cid, cfr.p, cfr.st, ti.i AS i,
              ((cid + 1) * 2654435761 + (p + st * ti.i) * 40503) % 65536
                - 32768 AS s
            FROM cfr, range(296) ti(i) WHERE ti.i < nf * 4)
          GROUP BY 1, 2, 3, 4),
        clm AS (SELECT cid, p, st, f, e FROM (
            SELECT cid, p, st, f, e,
              MAX(e) OVER (PARTITION BY cid, p, st ORDER BY f
                ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS mp,
              MAX(e) OVER (PARTITION BY cid, p, st ORDER BY f
                ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS mf,
              COUNT(*) OVER (PARTITION BY cid, p, st) AS nf2
            FROM csq)
          WHERE f >= 2 AND f <= nf2 - 3 AND e > mp AND e > mf),
        ctri AS (SELECT cid, p, st,
            LAG(f, 2) OVER win AS f1, LAG(e, 2) OVER win AS e1,
            LAG(f, 1) OVER win AS f2, LAG(e, 1) OVER win AS e2,
            f AS f3, e AS e3
          FROM clm WINDOW win AS (PARTITION BY cid, p, st ORDER BY f)),
        ck AS MATERIALIZED (SELECT DISTINCT
            ((((f2 - f1) % 64) * 64 + ((f3 - f2) % 64)) * 2048
              + LEAST(2047, e2 * 1024 // e1)) * 2048
              + LEAST(2047, e3 * 1024 // e2) AS k
          FROM ctri WHERE f1 IS NOT NULL),
        bpos AS MATERIALIZED (SELECT DISTINCT CAST(CAST(('0x' || substr(
              md5(CAST(k AS VARCHAR) || '#bloom' || CAST(i AS VARCHAR)),
              1, 12)) AS BIGINT) % 1048576 AS INT) AS p
          FROM ck CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        aw AS (SELECT doc_id AS mid, doc_id AS acid, 0 AS dwn,
            (doc_id % 5 = 3) AS corrupt
          FROM documents WHERE doc_id % 4 = 1 AND doc_id % 3 <> 0
          UNION ALL SELECT doc_id + 6000000000, doc_id, 1, FALSE
          FROM documents WHERE doc_id % 4 = 1 AND doc_id % 3 = 0),
        afr AS (SELECT mid, acid, dwn,
            CASE WHEN dwn = 1 THEN (200 + acid % 100 + 1) // 2
                 ELSE 200 + acid % 100 END AS len
          FROM aw WHERE NOT corrupt),
        asq AS (SELECT mid, i // 4 AS f, SUM(s * s) AS e
          FROM (SELECT afr.mid, ti.i AS i,
              ((acid + 1) * 2654435761
                + (CASE WHEN dwn = 1 THEN 2 * ti.i ELSE ti.i END) * 40503)
                % 65536 - 32768 AS s
            FROM afr, range(300) ti(i) WHERE ti.i < (len // 4) * 4)
          GROUP BY 1, 2),
        alm AS (SELECT mid, f, e FROM (
            SELECT mid, f, e,
              MAX(e) OVER (PARTITION BY mid ORDER BY f
                ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS mp,
              MAX(e) OVER (PARTITION BY mid ORDER BY f
                ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS mf,
              COUNT(*) OVER (PARTITION BY mid) AS nf2
            FROM asq)
          WHERE f >= 2 AND f <= nf2 - 3 AND e > mp AND e > mf),
        atri AS (SELECT mid,
            LAG(f, 2) OVER win AS f1, LAG(e, 2) OVER win AS e1,
            LAG(f, 1) OVER win AS f2, LAG(e, 1) OVER win AS e2,
            f AS f3, e AS e3
          FROM alm WINDOW win AS (PARTITION BY mid ORDER BY f)),
        ak AS MATERIALIZED (SELECT DISTINCT mid,
            ((((f2 - f1) % 64) * 64 + ((f3 - f2) % 64)) * 2048
              + LEAST(2047, e2 * 1024 // e1)) * 2048
              + LEAST(2047, e3 * 1024 // e2) AS k
          FROM atri WHERE f1 IS NOT NULL),
        ank AS (SELECT mid, COUNT(*) AS n_keys FROM ak GROUP BY 1),
        ahit AS (SELECT mid, k,
            MIN(CASE WHEN CAST(CAST(('0x' || substr(
                md5(CAST(k AS VARCHAR) || '#bloom' || CAST(i AS VARCHAR)),
                1, 12)) AS BIGINT) % 1048576 AS INT)
              IN (SELECT p FROM bpos) THEN 1 ELSE 0 END) AS ok
          FROM ak CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          GROUP BY mid, k),
        agg AS (SELECT mid, SUM(ok) AS n_hits FROM ahit GROUP BY 1)
        SELECT aw.mid AS media_id, NOT corrupt AS decode_ok,
          CAST(CASE WHEN corrupt THEN 0
            ELSE COALESCE(ank.n_keys, 0) END AS INT) AS n_keys,
          CAST(CASE WHEN corrupt THEN 0
            ELSE COALESCE(agg.n_hits, 0) END AS INT) AS n_hits,
          (NOT corrupt AND COALESCE(ank.n_keys, 0) > 0
            AND COALESCE(agg.n_hits, 0) * 1000000000
              >= 600000000 * COALESCE(ank.n_keys, 0)) AS suspect
        FROM aw LEFT JOIN ank ON ank.mid = aw.mid
        LEFT JOIN agg ON agg.mid = aw.mid
        ORDER BY media_id"""

  /** w18/m11 SHARED oracle (the q124/q125 discipline: m11's
    * split-build-merge-roundtrip must be INVISIBLE against the
    * from-scratch replay): pixels -> luma pooling -> dHash bands ->
    * md5 Bloom positions -> probes, corrupt rows included.
    */
  // a def, not a val: defs above initializes eagerly and w18 references
  // this — a later-declared val would still be null at that point
  private[queries] def ImageIntakeOracleSql: String =
    """WITH cpx AS (SELECT doc_id, x, y,
          (77*(b % 256) + 150*((b+101) % 256) + 29*((b+202) % 256)) // 256
            AS lum
          FROM (SELECT doc_id, tx.x AS x, ty.y AS y,
              doc_id*31 + tx.x*7 + ty.y*13 + tx.x*ty.y*(1 + doc_id % 16)
                AS b
            FROM documents, range(16) tx(x), range(16) ty(y)
            WHERE doc_id % 12 = 0)),
        cpool AS (SELECT doc_id, y // 2 AS r, x // 2 AS c, SUM(lum) AS s
          FROM cpx GROUP BY 1, 2, 3),
        cbits AS (SELECT a.doc_id, CAST(a.r*8 + a.c AS INT) AS idx
          FROM cpool a JOIN cpool b ON b.doc_id = a.doc_id AND b.r = a.r
            AND b.c = (a.c + 1) % 8
          WHERE a.s > b.s),
        cph AS (SELECT d.doc_id,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 0
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b0,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 1
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b1,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 2
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b2,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 3
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b3
          FROM (SELECT DISTINCT doc_id FROM cpx) d
          LEFT JOIN cbits USING (doc_id) GROUP BY d.doc_id),
        ck AS (SELECT DISTINCT k FROM (
          SELECT '0:' || CAST(b0 AS VARCHAR) AS k FROM cph
          UNION ALL SELECT '1:' || CAST(b1 AS VARCHAR) FROM cph
          UNION ALL SELECT '2:' || CAST(b2 AS VARCHAR) FROM cph
          UNION ALL SELECT '3:' || CAST(b3 AS VARCHAR) FROM cph)),
        bpos AS (SELECT DISTINCT CAST(CAST(('0x' || substr(md5(k || '#bloom'
              || CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 1048576 AS INT)
            AS p
          FROM ck CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        spx AS (SELECT doc_id, x, y,
          (77*(b % 256) + 150*((b+101) % 256) + 29*((b+202) % 256)) // 256
            AS lum
          FROM (SELECT doc_id, tx.x AS x, ty.y AS y,
              doc_id*31 + tx.x*7 + ty.y*13 + tx.x*ty.y*(1 + doc_id % 16)
                AS b
            FROM documents, range(16) tx(x), range(16) ty(y)
            WHERE doc_id % 4 = 0 AND doc_id % 3 <> 0 AND doc_id % 5 <> 3)),
        spool AS (SELECT doc_id, y // 2 AS r, x // 2 AS c, SUM(lum) AS s
          FROM spx GROUP BY 1, 2, 3),
        sbits AS (SELECT a.doc_id, CAST(a.r*8 + a.c AS INT) AS idx
          FROM spool a JOIN spool b ON b.doc_id = a.doc_id AND b.r = a.r
            AND b.c = (a.c + 1) % 8
          WHERE a.s > b.s),
        sph AS (SELECT d.doc_id,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 0
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b0,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 1
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b1,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 2
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b2,
            CAST(COALESCE(SUM(CASE WHEN idx // 16 = 3
              THEN (1 << (idx % 16)) END), 0) AS INT) AS b3
          FROM (SELECT DISTINCT doc_id FROM spx) d
          LEFT JOIN sbits USING (doc_id) GROUP BY d.doc_id),
        sk AS (SELECT doc_id, k FROM (
          SELECT doc_id, '0:' || CAST(b0 AS VARCHAR) AS k FROM sph
          UNION ALL SELECT doc_id, '1:' || CAST(b1 AS VARCHAR) FROM sph
          UNION ALL SELECT doc_id, '2:' || CAST(b2 AS VARCHAR) FROM sph
          UNION ALL SELECT doc_id, '3:' || CAST(b3 AS VARCHAR) FROM sph)),
        skp AS (SELECT doc_id, k,
            MIN(CASE WHEN CAST(CAST(('0x' || substr(md5(k || '#bloom'
                || CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 1048576 AS INT)
              IN (SELECT p FROM bpos) THEN 1 ELSE 0 END) AS ok
          FROM sk CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          GROUP BY doc_id, k),
        agg AS (SELECT doc_id, CAST(SUM(ok) AS INT) AS n
          FROM skp GROUP BY doc_id)
        SELECT d.doc_id AS media_id,
          d.doc_id % 5 <> 3 AS decode_ok,
          CAST(CASE WHEN d.doc_id % 5 = 3 THEN 0
            ELSE COALESCE(a.n, 0) END AS INT) AS n_band_hits,
          (d.doc_id % 5 <> 3 AND COALESCE(a.n, 0) >= 1) AS suspect
        FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        WHERE d.doc_id % 4 = 0 AND d.doc_id % 3 <> 0
        ORDER BY media_id"""

  /** w24 oracle: the k = 3 deflated Gram chains GENERATED from the same
    * (dim, iters, k) as the engine (graft.operators.Pca — the chain text
    * cannot drift), projections of BOTH halves onto each final axis,
    * per-component reference-range binning, and the smoothed PSI — the
    * w15 tail shape with a component key. Every CTE in the chain (and
    * `sall`, referenced four times by rng/rc/lc/n) is MATERIALIZED:
    * DuckDB re-evaluates a plain CTE per reference, and the deflated
    * chains multiply references one nesting level past the q128 fix —
    * the un-hinted oracle replayed for 497 s at sf0.01 (judge-measured,
    * VERDICT r12 #1) and emptied the round's driver record. Components
    * whose axes collapsed to NULL (rank-deficient reference) are dropped
    * by rng's HAVING, matching the engine's reload-time NULL filter.
    */
  private def spectralDriftOracleSql: String = {
    val dim = 64; val iters = 3; val k = 3
    val xsAll = (0 until dim).map(j =>
      s"CAST(embedding[${j + 1}] AS DOUBLE) AS x$j").mkString(", ")
    val xsOnly = (0 until dim).map(j => s"x$j").mkString(", ")
    val branches = graft.operators.Pca.axesFinalRefs(iters, k).map {
      case (c, cte, p) =>
        val z = (0 until dim).map(j => s"x$j*$p$j").mkString(" + ")
        s"SELECT par, $c AS component, ($z) AS z FROM f CROSS JOIN $cte"
    }
    s"""WITH f AS MATERIALIZED (SELECT vec_id % 2 AS par, $xsAll FROM embeddings),
 e AS MATERIALIZED (SELECT $xsOnly FROM f WHERE par = 0)""" +
      graft.operators.Pca.kAxesChainCtes(dim, iters, k) + s""",
 sall AS MATERIALIZED (${branches.mkString("\n UNION ALL ")}),
 rng AS (SELECT component, MIN(z) AS lo, MAX(z) AS hi FROM sall
   WHERE par = 0 GROUP BY 1
   HAVING MIN(z) IS NOT NULL AND MAX(z) IS NOT NULL),
 bsp AS (SELECT r.component, CAST(unnest(range(0, 10)) AS INT) AS bin
   FROM (SELECT DISTINCT component FROM rng) r),
 rc AS (SELECT s.component,
     LEAST(GREATEST(CAST(FLOOR((z - lo) / ((hi - lo) / 10)) AS INT),
       0), 9) AS bin, COUNT(*) AS ref_n
   FROM sall s JOIN rng ON rng.component = s.component
   WHERE par = 0 GROUP BY 1, 2),
 lc AS (SELECT s.component,
     LEAST(GREATEST(CAST(FLOOR((z - lo) / ((hi - lo) / 10)) AS INT),
       0), 9) AS bin, COUNT(*) AS live_n
   FROM sall s JOIN rng ON rng.component = s.component
   WHERE par = 1 GROUP BY 1, 2),
 n AS (SELECT component,
     SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS rn,
     SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS lvn
   FROM sall GROUP BY 1),
 jj AS (SELECT bsp.component, bsp.bin,
     COALESCE(rc.ref_n, 0) AS ref_n, COALESCE(lc.live_n, 0) AS live_n
   FROM bsp LEFT JOIN rc ON rc.component = bsp.component
     AND rc.bin = bsp.bin
   LEFT JOIN lc ON lc.component = bsp.component AND lc.bin = bsp.bin)
SELECT jj.component, jj.bin, CAST(ref_n AS BIGINT) AS ref_n,
  CAST(live_n AS BIGINT) AS live_n,
  CAST(FLOOR(((ref_n + 1.0) / (rn + 10) - (live_n + 1.0) / (lvn + 10))
    * LN(((ref_n + 1.0) / (rn + 10)) / ((live_n + 1.0) / (lvn + 10)))
    * 1e9) AS BIGINT) AS psi9
FROM jj JOIN n ON n.component = jj.component
ORDER BY jj.component, jj.bin"""
  }
}
