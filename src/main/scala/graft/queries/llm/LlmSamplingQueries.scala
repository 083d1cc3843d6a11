package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.{TextOps, VectorOps}
import graft.operators.{Dedup, Similarity}
import graft.queries.LlmOracleSql._

/** Sampling, splits, and training layout: hash/stratified/weighted/leakage-safe sampling, mixture weights, packing, epoch shuffle, length bucketing, the curation funnel.
  *
  * Split out of the monolithic LlmQueries (r9 verdict #7) along its
  * family banners; the aggregate inventory, its portable-hash contract
  * scaladoc, and the shared oracle CTE builders live in [[LlmQueries]]
  * and [[LlmOracleSql]].
  */
object LlmSamplingQueries {
  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- quality-weighted sampling (data mixing) -----------------------
    // Keep probability proportional to the composite quality score:
    // keep iff md5-hash-unit(doc_id) < quality * 1e6 — deterministic
    // importance sampling (higher-quality docs oversampled), map-side
    // only. The oracle replays the FULL quality formula (length, punct
    // ratio, stopword ratio) and the hash decision in SQL.
    "q72_weighted_sample" -> QueryDef(
      (s, dir) => {
        import graft.operators.Sampling
        val q = TextOps.qualityScore(col("text"),
          graft.functions.SqlFunctions.DefaultStopwords)
        t(s, dir, "documents")
          .withColumn("q", q)
          .withColumn("keep",
            Sampling.hashUnit(col("doc_id"), "wq") < col("q") * 1e6)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            (sum(floor(col("q") * 1e9).cast("long")).cast("double")
              / count(lit(1)) / 1e9).as("avg_q_all"),
            (sum(when(col("keep"), floor(col("q") * 1e9).cast("long"))
              .otherwise(0L)).cast("double")
              / greatest(sum(when(col("keep"), 1L).otherwise(0L)), lit(1L))
              / 1e9).as("avg_q_kept"))
          .orderBy("source")
      },
      Some(raw"""WITH d AS (SELECT doc_id, source, text,
          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS ws
          FROM documents),
        q AS (SELECT doc_id, source,
            $QualityScoreSql AS q
          FROM d),
        k AS (SELECT source, q,
            (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#wq'), 1, 12))
              AS BIGINT) % 1000000 < q * 1e6) AS keep
          FROM q)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          CAST(SUM(CAST(FLOOR(q * 1e9) AS BIGINT)) AS DOUBLE)
            / COUNT(*) / 1e9 AS avg_q_all,
          CAST(SUM(CASE WHEN keep THEN CAST(FLOOR(q * 1e9) AS BIGINT)
              ELSE 0 END) AS DOUBLE)
            / GREATEST(SUM(CASE WHEN keep THEN 1 ELSE 0 END), 1) / 1e9
            AS avg_q_kept
        FROM k GROUP BY source ORDER BY source""")),

    // ---- language-balanced resampling (data mixing) --------------------
    // Downsample over-represented languages to a uniform target: rate_l =
    // min(1, (N/5)/n_l), decisions by content hash (stable, map-side);
    // the per-language rate table is tiny and broadcast back onto the
    // corpus. The oracle recomputes rates and replays every decision.
    "q73_lang_rebalance" -> QueryDef(
      (s, dir) => {
        import graft.operators.Sampling
        val docs = t(s, dir, "documents")
        val total = docs.count()
        val rates = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
          .withColumn("rate",
            round(least(lit(1.0), lit(total) / 5.0 / col("n_before")), 9))
        docs.join(broadcast(rates), "lang")
          .withColumn("keep",
            Sampling.hashUnit(col("doc_id"), "bal") < col("rate") * 1e6)
          .groupBy("lang")
          .agg(first(col("n_before")).as("n_before"),
            first(col("rate")).as("rate"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_after"))
          .orderBy("lang")
      },
      Some("""WITH n AS (SELECT COUNT(*) AS total FROM documents),
        r AS (SELECT lang, COUNT(*) AS n_before,
            ROUND(LEAST(1.0, (SELECT total FROM n) / 5.0 / COUNT(*)), 9)
              AS rate
          FROM documents GROUP BY lang),
        k AS (SELECT d.lang, r.n_before, r.rate,
            (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#bal'),
              1, 12)) AS BIGINT) % 1000000 < r.rate * 1e6) AS keep
          FROM documents d JOIN r USING (lang))
        SELECT lang, MIN(n_before) AS n_before, MIN(rate) AS rate,
          CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_after
        FROM k GROUP BY lang ORDER BY lang""")),

    // ---- stratified deterministic sampling -----------------------------
    // "5 random docs per language", reproducibly: rank docs inside each
    // stratum by md5(doc_id + salt) and keep the first 5 (see
    // Sampling.stratifiedTake). The inspection-sample / eval-subset shape:
    // stable across runs and appends, replayed exactly by the oracle.
    "q56_stratified_sample" -> QueryDef(
      (s, dir) => {
        graft.operators.Sampling.stratifiedTake(
            t(s, dir, "documents"), col("lang"), col("doc_id"), 5)
          .select(col("lang"), col("sample_rank"), col("doc_id"),
            col("n_chars"))
          .orderBy("lang", "sample_rank")
      },
      Some("""WITH r AS (SELECT lang, doc_id, n_chars,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR) || '#strat'), doc_id)
            AS INT) AS sample_rank
          FROM documents)
        SELECT lang, sample_rank, doc_id, n_chars
        FROM r WHERE sample_rank <= 5 ORDER BY lang, sample_rank""")),

    // The 100 TB configuration of the SAME sample: the bounded k-buffer
    // aggregation (Sampling.stratifiedTakeHeap) replaces q56's per-stratum
    // window — at most k (md5, id) pairs leave each partition, no
    // stratum-keyed sort of the corpus. Rows and ranks are identical to
    // the window form (equivalence spec in OperatorsSpec), so q56's
    // oracle SQL replays verbatim; a green row here grades the scale path
    // itself on the oracle surface (VERDICT r5 next-round #3).
    "q56b_stratified_sample_heap" -> QueryDef(
      (s, dir) => {
        graft.operators.Sampling.stratifiedTakeHeap(
            t(s, dir, "documents"), "lang", "doc_id", 5)
          .select(col("lang"), col("sample_rank"), col("doc_id"),
            col("n_chars"))
          .orderBy("lang", "sample_rank")
      },
      Some("""WITH r AS (SELECT lang, doc_id, n_chars,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR) || '#strat'), doc_id)
            AS INT) AS sample_rank
          FROM documents)
        SELECT lang, sample_rank, doc_id, n_chars
        FROM r WHERE sample_rank <= 5 ORDER BY lang, sample_rank""")),

    // ---- deterministic hash sampling + train/val/test split ------------
    // Content-addressed decisions (md5 of the doc id + salt): stable under
    // re-runs, repartitioning, and incremental appends — no train/test
    // leakage — and replayed exactly by the oracle. English is downsampled
    // to 40% (the data-mixing shape); splits are 80/10/10.
    "q51_hash_split" -> QueryDef(
      (s, dir) => {
        import graft.operators.Sampling
        t(s, dir, "documents")
          .filter(col("lang") =!= "en"
            || Sampling.hashSample(col("doc_id"), 0.4, salt = "mix"))
          .withColumn("split", Sampling.splitColumn(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("n_chars"))
          .orderBy("lang", "split")
      },
      Some("""WITH h AS (SELECT lang, text,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 12))
            AS BIGINT) % 1000000 AS hmix,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 12))
            AS BIGINT) % 1000000 AS hsplit
          FROM documents),
        f AS (SELECT lang, text,
            CASE WHEN hsplit < 800000 THEN 'train'
                 WHEN hsplit < 900000 THEN 'val'
                 ELSE 'test' END AS split
          FROM h WHERE lang <> 'en' OR hmix < 400000)
        SELECT lang, split, COUNT(*) AS n_docs,
          CAST(SUM(len(text)) AS BIGINT) AS n_chars
        FROM f GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- leakage-safe train/val/test split ------------------------------
    // The q51 hash split decides per DOCUMENT — two near-duplicates can
    // land one in train, one in test, and the eval set silently contains
    // the training data (the classic contamination bug; Lee et al. 2021
    // "Deduplicating Training Data Makes Language Models Better" measures
    // exactly this leak). The leakage-safe discipline splits per
    // DUPLICATE-CLUSTER: hash the cluster ROOT (q52's connected
    // components; singletons are their own root), so a near-dup group
    // moves as a unit and can never straddle splits — structurally, not
    // by filtering after the fact. `n_rescued_docs` counts the docs whose
    // naive per-doc assignment differs from their cluster assignment:
    // each one is a train/test leak this operator closed. 100 TB: the
    // pair generation swaps to the q89 LSH path; the root join is
    // id-keyed; the split stays one hash — no new shuffle shape.
    "q110_leakage_safe_split" -> QueryDef(
      (s, dir) => {
        import graft.operators.Sampling
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairsExhaustive(docs, "doc_id", "text",
            k = 3, minJaccard = 0.2, maxDf = 1000000)
          .select("id_a", "id_b")
        val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        Sampling.leakageSafeSplit(docs, "doc_id", pairs, fracs)
          .withColumn("naive_split",
            Sampling.splitColumn(col("doc_id"), fracs))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("root")).as("n_groups"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"),
            sum(when(col("naive_split") =!= col("split"), 1L).otherwise(0L))
              .as("n_rescued_docs"))
          .orderBy("split")
      },
      Some(s"""${WordsCte.replaceFirst("WITH", "WITH RECURSIVE")},
        $ComponentsCte,
        rooted AS (SELECT d.doc_id,
            COALESCE(c.label, d.doc_id) AS root,
            (c.node IS NOT NULL) AS is_dup
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
        hs AS (SELECT doc_id, root, is_dup,
            CAST(('0x' || substr(md5(CAST(root AS VARCHAR) || '#split'),
              1, 12)) AS BIGINT) % 1000000 AS hroot,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'),
              1, 12)) AS BIGINT) % 1000000 AS hdoc
          FROM rooted),
        a AS (SELECT doc_id, root, is_dup,
            CASE WHEN hroot < 800000 THEN 'train'
                 WHEN hroot < 900000 THEN 'val' ELSE 'test' END AS split,
            CASE WHEN hdoc < 800000 THEN 'train'
                 WHEN hdoc < 900000 THEN 'val' ELSE 'test' END AS naive_split
          FROM hs)
        SELECT split, COUNT(*) AS n_docs,
          COUNT(DISTINCT root) AS n_groups,
          CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
            AS n_dup_docs,
          CAST(SUM(CASE WHEN naive_split <> split THEN 1 ELSE 0 END)
            AS BIGINT) AS n_rescued_docs
        FROM a GROUP BY 1 ORDER BY 1""")),

    // ---- length-bucketed batch packing ----------------------------------
    // The padding-efficiency op for fixed-batch training/inference: cut
    // 32-doc batches in arrival order vs sorted-by-length order and
    // compare padded-token waste (each batch pads to its max length).
    // Batch ordinals come from Windowed.distributedCumsum of ones — the
    // q77/q83 two-phase prefix-sum shape, no single-task global window.
    // The bucketed strategy's sort key is n_tok*1e9 + doc_id, a single
    // integral column that replays as ROW_NUMBER in the oracle.
    "q106_length_bucketing" -> QueryDef(
      (s, dir) => {
        import graft.operators.Windowed
        val toks = t(s, dir, "documents").select(col("doc_id"),
          coalesce(size(TextOps.words(col("text"))), lit(0)).as("n_tok"))
        def strat(skey: org.apache.spark.sql.Column, name: String) = {
          val ord = Windowed.distributedCumsum(
            toks.withColumn("__skey", skey).withColumn("__one", lit(1)),
            "__skey", "__one")
          ord.withColumn("batch", floor((col("cumsum") - 1) / 32).cast("long"))
            .groupBy("batch")
            .agg(max(col("n_tok")).as("mx"), sum(col("n_tok")).as("s"),
              count(lit(1)).as("c"))
            .agg(count(lit(1)).as("n_batches"),
              sum(col("s")).as("real_tokens"),
              sum(col("mx") * col("c")).as("padded_tokens"))
            .withColumn("strategy", lit(name))
        }
        strat(col("doc_id"), "arrival")
          .unionByName(strat(
            col("n_tok").cast("long") * 1000000000L + col("doc_id"),
            "bucketed"))
          .withColumn("waste_frac",
            (col("padded_tokens") - col("real_tokens")).cast("double")
              / col("padded_tokens"))
          .select("strategy", "n_batches", "real_tokens", "padded_tokens",
            "waste_frac")
          .orderBy("strategy")
      },
      Some(s"""$WordsCte,
        tk AS (SELECT doc_id, COALESCE(len(ws), 0) AS n_tok FROM w),
        a AS (SELECT n_tok, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
          FROM tk),
        ab AS (SELECT CAST(FLOOR((rn - 1) / 32.0) AS BIGINT) AS batch,
            MAX(n_tok) AS mx, SUM(n_tok) AS s, COUNT(*) AS c
          FROM a GROUP BY 1),
        astat AS (SELECT 'arrival' AS strategy, COUNT(*) AS n_batches,
            CAST(SUM(s) AS BIGINT) AS real_tokens,
            CAST(SUM(mx * c) AS BIGINT) AS padded_tokens FROM ab),
        b AS (SELECT n_tok, ROW_NUMBER() OVER
            (ORDER BY CAST(n_tok AS BIGINT) * 1000000000 + doc_id) AS rn
          FROM tk),
        bb AS (SELECT CAST(FLOOR((rn - 1) / 32.0) AS BIGINT) AS batch,
            MAX(n_tok) AS mx, SUM(n_tok) AS s, COUNT(*) AS c
          FROM b GROUP BY 1),
        bstat AS (SELECT 'bucketed' AS strategy, COUNT(*) AS n_batches,
            CAST(SUM(s) AS BIGINT) AS real_tokens,
            CAST(SUM(mx * c) AS BIGINT) AS padded_tokens FROM bb)
        SELECT strategy, n_batches, real_tokens, padded_tokens,
          CAST(padded_tokens - real_tokens AS DOUBLE) / padded_tokens
            AS waste_frac
        FROM (SELECT * FROM astat UNION ALL SELECT * FROM bstat)
        ORDER BY strategy""")),

    // ---- end-to-end curation funnel -------------------------------------
    // The showcase composition: quality gate -> portable exact dedup ->
    // near-dup clustering with canonical survivors -> train split, each
    // stage the ALREADY-GRADED operator (q28 quality, w09 fingerprint,
    // q25/q52 jaccard+components, q51 split), reported as a funnel of
    // surviving-document counts. The oracle replays every stage, so the
    // COMPOSITION is hash-checked, not just the pieces. The five counts
    // are five driver scalars (aggregate actions, no data collected);
    // intermediates persist across the stage counts and release before
    // the scalar result frame returns.
    "q97_curation_funnel" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.storage.StorageLevel
        val docs = t(s, dir, "documents")
        val n1 = docs.count()
        val q = docs.filter(TextOps.qualityScore(col("text"),
          graft.functions.SqlFunctions.DefaultStopwords) >= 0.5)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val n2 = q.count()
          // portable content fingerprint (the w09 intake form), keep the
          // min doc_id per fingerprint — scale-safe groupBy+semi-join,
          // not a per-group window
          val keyed = q.withColumn("k",
            md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
          val exact = keyed.join(
            keyed.groupBy("k").agg(min(col("doc_id")).as("doc_id")),
            Seq("k", "doc_id"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            val n3 = exact.count()
            // exhaustive Jaccard is the ORACLE-REPLAYABLE configuration of
            // this stage; the 100 TB pipeline swaps in Dedup.jaccardPairs
            // (MinHash-LSH candidates + exact verify) — q89 grades that
            // swap's cluster recall as identical at this threshold
            val pairs = Dedup.jaccardPairsExhaustive(exact, "doc_id", "text",
              k = 3, minJaccard = 0.2, maxDf = 1000000)
              .select("id_a", "id_b")
            val nonCanonical = Dedup.connectedComponents(pairs)
              .filter(col("id") =!= col("label"))
              .select(col("id").as("doc_id"))
            val kept = exact.join(nonCanonical, Seq("doc_id"), "left_anti")
            val n4 = kept.count()
            val n5 = kept.filter(graft.operators.Sampling.splitColumn(
              col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
              === "train").count()
            Seq(("1_raw", n1), ("2_quality", n2), ("3_exact_dedup", n3),
              ("4_near_dedup", n4), ("5_train_split", n5))
              .toDF("stage", "n_docs").orderBy("stage")
          } finally exact.unpersist(blocking = false)
        } finally q.unpersist(blocking = false)
      },
      Some(s"""WITH RECURSIVE raw AS (SELECT doc_id, text,
          list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)
            AS ws
          FROM documents),
        q AS (SELECT * FROM raw WHERE ($QualityScoreSql) >= 0.5),
        kx AS (SELECT doc_id, text, ws,
            md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS k
          FROM q),
        keep AS (SELECT k, MIN(doc_id) AS doc_id FROM kx GROUP BY k),
        ex AS (SELECT kx.* FROM kx
          JOIN keep ON keep.k = kx.k AND keep.doc_id = kx.doc_id),
        w AS (SELECT doc_id, ws FROM ex),
        $ComponentsCte,
        nk AS (SELECT ex.doc_id FROM ex
          LEFT JOIN comp ON comp.node = ex.doc_id AND comp.node <> comp.label
          WHERE comp.node IS NULL),
        tr AS (SELECT doc_id FROM nk
          WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'),
            1, 12)) AS BIGINT) % 1000000 < 800000)
        SELECT stage, n_docs FROM (
          SELECT '1_raw' AS stage, COUNT(*) AS n_docs FROM raw
          UNION ALL SELECT '2_quality', COUNT(*) FROM q
          UNION ALL SELECT '3_exact_dedup', COUNT(*) FROM ex
          UNION ALL SELECT '4_near_dedup', COUNT(*) FROM nk
          UNION ALL SELECT '5_train_split', COUNT(*) FROM tr)
        ORDER BY stage""")),

    // Production ONE-PASS variant of the same funnel (VERDICT r5 #2):
    // CurationFunnel.metrics turns every stage predicate into a boolean
    // column on one flags frame and emits all five counts from a single
    // conditional aggregation — one metrics action instead of q97's five
    // staged counts (only the components iteration still runs its own
    // jobs, as it must in both forms). Stage semantics are identical, so
    // q97's oracle SQL grades this plan row-for-row.
    "q97b_funnel_onepass" -> QueryDef(
      (s, dir) => graft.operators.CurationFunnel.metrics(t(s, dir, "documents")),
      Some(s"""WITH RECURSIVE raw AS (SELECT doc_id, text,
          list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)
            AS ws
          FROM documents),
        q AS (SELECT * FROM raw WHERE ($QualityScoreSql) >= 0.5),
        kx AS (SELECT doc_id, text, ws,
            md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS k
          FROM q),
        keep AS (SELECT k, MIN(doc_id) AS doc_id FROM kx GROUP BY k),
        ex AS (SELECT kx.* FROM kx
          JOIN keep ON keep.k = kx.k AND keep.doc_id = kx.doc_id),
        w AS (SELECT doc_id, ws FROM ex),
        $ComponentsCte,
        nk AS (SELECT ex.doc_id FROM ex
          LEFT JOIN comp ON comp.node = ex.doc_id AND comp.node <> comp.label
          WHERE comp.node IS NULL),
        tr AS (SELECT doc_id FROM nk
          WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'),
            1, 12)) AS BIGINT) % 1000000 < 800000)
        SELECT stage, n_docs FROM (
          SELECT '1_raw' AS stage, COUNT(*) AS n_docs FROM raw
          UNION ALL SELECT '2_quality', COUNT(*) FROM q
          UNION ALL SELECT '3_exact_dedup', COUNT(*) FROM ex
          UNION ALL SELECT '4_near_dedup', COUNT(*) FROM nk
          UNION ALL SELECT '5_train_split', COUNT(*) FROM tr)
        ORDER BY stage""")),

    // ---- sequence packing (concatenate-and-chunk) ----------------------
    // The GPT-style training layout: concatenate every document in doc_id
    // order into one token stream and cut fixed 512-token training
    // sequences. Each doc occupies stream interval
    // [cumsum - n_tokens, cumsum); a doc "crosses" when its interval spans
    // a chunk boundary. The global running sum is
    // Windowed.distributedCumsum — a two-phase prefix sum (range partition
    // + broadcast partition offsets), NOT a single-partition window.
    "q77_pack_chunks" -> QueryDef(
      (s, dir) => {
        import graft.operators.Windowed
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(TextOps.regexTokens(col("text"))).as("n_tokens"))
        Windowed.distributedCumsum(toks, "doc_id", "n_tokens")
          .withColumn("first_chunk",
            floor((col("cumsum") - col("n_tokens")) / lit(512.0)).cast("long"))
          .withColumn("last_chunk",
            floor((col("cumsum") - 1) / lit(512.0)).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            sum(when(col("last_chunk") > col("first_chunk"), 1L).otherwise(0L))
              .as("n_crossing"),
            max(col("last_chunk") - col("first_chunk")).as("max_span"))
          .orderBy("source")
      },
      Some("""WITH tk AS (SELECT doc_id, source,
          len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))
            AS n_tokens FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
            SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              AS cs FROM tk),
        m AS (SELECT source, n_tokens,
            CAST(FLOOR((cs - n_tokens) / 512.0) AS BIGINT) AS fc,
            CAST(FLOOR((cs - 1) / 512.0) AS BIGINT) AS lc FROM c)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
          CAST(SUM(CASE WHEN lc > fc THEN 1 ELSE 0 END) AS BIGINT)
            AS n_crossing,
          CAST(MAX(lc - fc) AS BIGINT) AS max_span
        FROM m GROUP BY source ORDER BY source""")),

    // ---- domain-mixture weights (temperature sampling) -----------------
    // Data mixing: per-source token counts n_s give sampling weights
    // w_s ∝ n_s^tau (tau = 0.7 flattens the natural distribution toward
    // uniform). n^tau = exp(tau·ln n) is quantized with floor(·*1e6)
    // BEFORE normalizing so the cross-engine hash never depends on libm's
    // last ulp (q74 discipline); normalization afterwards is exact
    // integer/double arithmetic, identical in both engines.
    "q78_mixture_weights" -> QueryDef(
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .select(col("source"),
            size(TextOps.regexTokens(col("text"))).as("nt"))
          .groupBy("source").agg(sum(col("nt")).as("n_tokens"))
          .withColumn("wq",
            floor(exp(lit(0.7) * log(col("n_tokens").cast("double"))) * 1e6)
              .cast("long"))
        val total = counts.agg(sum(col("wq")).as("__tot"))
        counts.join(broadcast(total))
          .withColumn("weight", col("wq").cast("double") / col("__tot"))
          .withColumn("expected_tokens",
            floor(col("weight") * 1e6).cast("long"))
          .select("source", "n_tokens", "weight", "expected_tokens")
          .orderBy("source")
      },
      Some("""WITH tk AS (SELECT source,
          SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')))
            AS n_tokens FROM documents GROUP BY source),
        q AS (SELECT source, n_tokens,
            CAST(FLOOR(EXP(0.7 * LN(CAST(n_tokens AS DOUBLE))) * 1e6)
              AS BIGINT) AS wq FROM tk),
        tt AS (SELECT SUM(wq) AS tot FROM q)
        SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
          CAST(wq AS DOUBLE) / (SELECT tot FROM tt) AS weight,
          CAST(FLOOR(CAST(wq AS DOUBLE) / (SELECT tot FROM tt) * 1e6)
            AS BIGINT) AS expected_tokens
        FROM q ORDER BY source""")),

    // ---- per-epoch deterministic global shuffle + batch assignment -----
    // The training-loader reshuffle: each epoch re-orders the corpus by
    // md5(doc_id, epoch) and cuts 256-doc batches. The global rank is the
    // distributed prefix sum over ones (range-partitioned on the hash key
    // — md5 output is uniform, so ranges balance perfectly); no
    // single-partition window at any size. Per epoch: batch count, full
    // batches, and the per-batch source spread (mixing check).
    "q83_epoch_shuffle" -> QueryDef(
      (s, dir) => {
        import graft.operators.Windowed
        val docs = t(s, dir, "documents")
        val perEpoch = Seq(0, 1).map { e =>
          val hashed = docs.select(col("doc_id"), col("source"))
            .withColumn("hkey",
              md5(concat(col("doc_id").cast("string"), lit(s"#ep$e"))))
            .withColumn("one", lit(1))
          val batches = Windowed
            .distributedCumsum(hashed, "hkey", "one")
            .withColumn("batch", floor((col("cumsum") - 1) / lit(256.0))
              .cast("long"))
            .groupBy("batch")
            .agg(count(lit(1)).as("c"),
              countDistinct(col("source")).as("nsrc"))
          // groupBy on the epoch literal (not a global agg): an empty
          // corpus then yields ZERO rows, matching the oracle's GROUP BY
          batches.groupBy(lit(e).as("epoch")).agg(
            sum(col("c")).as("n_docs"),
            count(lit(1)).as("n_batches"),
            sum(when(col("c") === 256, 1L).otherwise(0L)).as("n_full"),
            min(col("nsrc")).as("min_sources_per_batch"))
        }
        perEpoch.reduce(_.union(_)).orderBy("epoch")
      },
      Some("""WITH eps AS (SELECT * FROM (VALUES (0), (1)) AS t(epoch)),
        h AS (SELECT e.epoch, d.doc_id, d.source,
            md5(CAST(d.doc_id AS VARCHAR) || '#ep' || CAST(e.epoch AS VARCHAR))
              AS hkey
          FROM documents d CROSS JOIN eps e),
        r AS (SELECT epoch, source,
            CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY hkey)
              - 1) / 256.0) AS BIGINT) AS batch
          FROM h),
        b AS (SELECT epoch, batch, COUNT(*) AS c,
            COUNT(DISTINCT source) AS nsrc
          FROM r GROUP BY 1, 2)
        SELECT CAST(epoch AS INT) AS epoch,
          CAST(SUM(c) AS BIGINT) AS n_docs,
          COUNT(*) AS n_batches,
          CAST(SUM(CASE WHEN c = 256 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_full,
          CAST(MIN(nsrc) AS BIGINT) AS min_sources_per_batch
        FROM b GROUP BY epoch ORDER BY epoch""")),

    // ---- URL canonicalization + per-domain caps (VERDICT r9 #3) ---------
    // The crawl-curation front door: a deterministic MESSY url per
    // document (case-mixed scheme/host, www., default and non-default
    // ports, tracking params in shuffled order, fragments, empty paths —
    // each a real crawl-dedup failure mode), canonicalized with
    // UrlOps.canonicalizeUrl, domain-extracted, and capped at 20 docs per
    // registered domain. The host-size distribution is deliberately
    // SKEWED (one bighost with half the corpus, three mid hosts, a tail
    // of small ones) because skew is what the cap exists for — and why
    // the kept-id selection rides the q56b bounded heap, not a rank
    // window. One audit row: canonical-url census (canon_sum48 pins every
    // canonicalized STRING via the portable 48-bit md5), domain funnel
    // (n_capped_domains / n_dropped_docs), and kept_id_sum pinning the
    // exact per-domain selection identity against the oracle's window.
    "q123_url_domain_cap" -> QueryDef(
      (s, dir) => {
        import graft.operators.UrlOps
        val url = messyUrlCol // the shared q123/w19 fixture (LlmOracleSql)
        val cap = 20
        val canon = t(s, dir, "documents").select(col("doc_id"),
          UrlOps.canonicalizeUrl(url).as("curl"),
          UrlOps.registeredDomain(url).as("domain"))
        // checksums widen to DECIMAL(38,0) (the auc9 discipline): 2^48-scale
        // terms overflow a long sum past ~30k rows — caught by the x100
        // decade run, one code path must serve every corpus size
        val base = canon.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("curl")).as("n_canonical"),
          coalesce(sum(Dedup.md5Hash48(col("curl"))
              .cast(DecimalType(38, 0))),
            lit(0).cast(DecimalType(38, 0))).as("canon_sum48"))
        val dom = canon.groupBy("domain").agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_domains"),
            coalesce(sum((col("n") > cap).cast("long")), lit(0L))
              .as("n_capped_domains"),
            coalesce(sum(least(col("n"), lit(cap.toLong))), lit(0L))
              .as("n_kept_docs"),
            coalesce(sum(col("n") - least(col("n"), lit(cap.toLong))),
              lit(0L)).as("n_dropped_docs"))
        val kept = UrlOps.domainCapKept(canon, "doc_id", "domain", cap)
          .agg(coalesce(sum(col("doc_id").cast(DecimalType(38, 0))),
            lit(0).cast(DecimalType(38, 0))).as("kept_id_sum"))
        // the decimal sums are exact at any corpus size; the COMPARE
        // surface folds them to bounded longs with an exact integer mod
        // (a raw DECIMAL(38,0) round-trips as float on the oracle side)
        base.crossJoin(dom).crossJoin(kept)
          .withColumn("canon_sum48",
            expr("CAST(canon_sum48 % 1000000000000000000 AS BIGINT)"))
          .withColumn("kept_id_sum",
            expr("CAST(kept_id_sum % 1000000000000000000 AS BIGINT)"))
      },
      Some("WITH " + MessyUrlCte + """,
        p AS (SELECT doc_id,
            lower(regexp_extract(pre, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
              AS scheme,
            regexp_replace(lower(regexp_extract(pre,
              '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
              '^[^@]*@', '') AS hostport,
            regexp_extract(pre,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
            regexp_extract(pre, '\?(.*)$', 1) AS q
          FROM (SELECT doc_id, regexp_extract(url, '^[^#]*', 0) AS pre
                FROM u)),
        p2 AS (SELECT doc_id, scheme,
            regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
              '^www\.', '') AS host,
            regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
            CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
            array_to_string(list_sort(list_filter(string_split(q, '&'),
              x -> x <> '' AND NOT regexp_matches(x,
                '^(utm_[^=]*|ref|fbclid|gclid)(=|$)'))), '&') AS kq,
            """ + graft.operators.UrlOps.registeredDomainSql(
              "regexp_replace(hostport, ':[0-9]+$', '')") + """ AS domain
          FROM p),
        canon AS (SELECT doc_id, domain,
            scheme || '://' || host
            || CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                      OR (scheme = 'http' AND port = '80') THEN ''
                    ELSE ':' || port END
            || path
            || CASE WHEN kq = '' THEN '' ELSE '?' || kq END AS curl
          FROM p2),
        b AS (SELECT COUNT(*) AS n_docs, COUNT(DISTINCT curl) AS n_canonical,
            COALESCE(SUM(CAST(CAST(('0x' || substr(md5(curl), 1, 12))
              AS BIGINT) AS DECIMAL(38,0))), 0) AS canon_sum48
          FROM canon),
        dc AS (SELECT domain, COUNT(*) AS n FROM canon GROUP BY domain),
        dm AS (SELECT COUNT(*) AS n_domains,
            COALESCE(SUM(CASE WHEN n > 20 THEN 1 ELSE 0 END), 0)
              AS n_capped_domains,
            COALESCE(SUM(LEAST(n, 20)), 0) AS n_kept_docs,
            COALESCE(SUM(n - LEAST(n, 20)), 0) AS n_dropped_docs
          FROM dc),
        kp AS (SELECT COALESCE(SUM(CAST(doc_id AS DECIMAL(38,0))), 0)
            AS kept_id_sum
          FROM (SELECT doc_id, ROW_NUMBER() OVER
              (PARTITION BY domain ORDER BY doc_id) AS rn FROM canon)
          WHERE rn <= 20)
        SELECT CAST(b.n_docs AS BIGINT) AS n_docs,
          CAST(b.n_canonical AS BIGINT) AS n_canonical,
          CAST(b.canon_sum48 % 1000000000000000000 AS BIGINT)
            AS canon_sum48,
          CAST(dm.n_domains AS BIGINT) AS n_domains,
          CAST(dm.n_capped_domains AS BIGINT) AS n_capped_domains,
          CAST(dm.n_kept_docs AS BIGINT) AS n_kept_docs,
          CAST(dm.n_dropped_docs AS BIGINT) AS n_dropped_docs,
          CAST(kp.kept_id_sum % 1000000000000000000 AS BIGINT)
            AS kept_id_sum
        FROM b, dm, kp"""))
  )
}
