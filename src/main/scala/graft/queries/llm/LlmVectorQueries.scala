package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.{TextOps, VectorOps}
import graft.operators.{Dedup, Similarity}
import graft.queries.LlmOracleSql._

/** Embedding-space operators and sketches: brute/LSH/IVF similarity search, k-means, embedding statistics/quantization/projection, Bloom filters, Count-Min.
  *
  * Split out of the monolithic LlmQueries (r9 verdict #7) along its
  * family banners; the aggregate inventory, its portable-hash contract
  * scaladoc, and the shared oracle CTE builders live in [[LlmQueries]]
  * and [[LlmOracleSql]].
  */
object LlmVectorQueries {
  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- brute-force cosine top-k (exact ANN baseline) -----------------
    // Deliberately exact: this is the oracle-checkable baseline the
    // approximate paths (q32 LSH, q37 IVF) are graded against, with a
    // BOUNDED 10-vector query side broadcast against the corpus. For an
    // unbounded query side use Similarity.lshTopK/ivfTopK — never
    // bruteForceTopK with corpus-scale queries.
    "q31_knn_cosine" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5)
          .withColumn("cosine", round(col("cosine"), 4))
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_dot_product(q.v, c.v) /
              (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
              AS cos
          FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        r AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank, cos
          FROM s)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, ROUND(cos, 4) AS cosine
        FROM r WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- LSH-bucketed ANN ----------------------------------------------
    // Hyperplane values are md5-derived literals (VectorOps.hyperplaneVals),
    // so the oracle regenerates the exact same planes and buckets in SQL;
    // query-side multi-probe (Hamming<=1) becomes a bit_count(xor()) join
    // condition.
    "q32_ann_lsh" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, nBits = 8, nTables = 4)
          .withColumn("cosine", round(col("cosine"), 4))
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        planes AS (SELECT t, b, list_transform(
            range(0, (SELECT MAX(len(v)) FROM e)),
            i -> (CAST(('0x' || substr(md5(CAST(t*1000+b AS VARCHAR) || ':' ||
              CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 1000000) / 1e6 - 0.5)
            AS pv
          FROM (SELECT CAST(unnest(range(0, 4)) AS INT) AS t) tt
          CROSS JOIN (SELECT CAST(unnest(range(0, 8)) AS INT) AS b) bb),
        buck AS (SELECT e.vec_id, p.t AS tbl,
            SUM(CASE WHEN list_dot_product(e.v, p.pv) >= 0
              THEN (CAST(1 AS BIGINT) << p.b) ELSE 0 END) AS bucket
          FROM e CROSS JOIN planes p GROUP BY 1, 2),
        cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM buck q JOIN buck c ON q.tbl = c.tbl
            AND bit_count(xor(q.bucket, c.bucket)) <= 1
          WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        scored AS (SELECT cand.query_id, cand.neighbor_id,
            list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))) AS cos
          FROM cand JOIN e a ON a.vec_id = cand.query_id
            JOIN e b ON b.vec_id = cand.neighbor_id),
        r AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank, cos
          FROM scored)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
          ROUND(cos, 4) AS cosine
        FROM r WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- IVF-bucketed ANN ----------------------------------------------
    // Pseudo-centroids = the 16 corpus vectors with smallest md5(id) —
    // reproducible in SQL, so assignment + probing + re-rank are all
    // oracle-checked.
    "q37_ann_ivf" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4)
          .withColumn("cosine", round(col("cosine"), 4))
          .orderBy("query_id", "rank")
      },
      Some(ivfOracleSql)),

    // ---- IVF with DERIVED cell count (VERDICT r12 #5) --------------------
    // nCells = ceil(n / 125) instead of a manual knob: 4 cells at the
    // 500-row gate SF, 16 at sf0.1, per-cell population ~125 at EVERY
    // scale. The oracle re-derives the cell count with the same ceil
    // integer division, so the config itself is hash-graded — a
    // derivation drift (not just a result drift) fails the compare.
    // Decade-measured in ScaleBench (recall + per-cell population).
    "q37b_ann_ivf_derived" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopKAuto(emb, emb.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, targetCellSize = 125, nProbe = 2)
          .withColumn("cosine", round(col("cosine"), 4))
          .orderBy("query_id", "rank")
      },
      Some(ivfOracleSqlFor("SELECT (COUNT(*) + 124) // 125 FROM e", 2))),

    // ---- LSH with DERIVED bit depth (VERDICT r12 #5) ---------------------
    // 2^bits ~ n / targetBucketSize via SemDedup.gateBits (ONE derivation
    // across the gate and ANN axes): 8 bits at the 500-row gate SF
    // (clamp floor), 9 at sf0.1 (500 buckets/table for 2000 rows) — the
    // oracle re-derives bits with an exact integer power-of-two probe
    // (MIN b WITH 2^b >= n // target == 64 - clz(x - 1), no float log2
    // rounding), so crossing a depth threshold regenerates BOTH sides in
    // lockstep instead of failing a pin.
    "q32b_ann_lsh_derived" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopKAuto(emb, emb.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, targetBucketSize = 4,
            nTables = 4)
          .withColumn("cosine", round(col("cosine"), 4))
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        nb AS (SELECT CAST(LEAST(20, GREATEST(8, (SELECT MIN(CAST(b AS INT))
            FROM range(0, 63) r(b)
            WHERE (CAST(1 AS BIGINT) << CAST(b AS INT)) >=
              GREATEST(1, (SELECT COUNT(*) // 4 FROM e))))) AS INT) AS bits),
        planes AS (SELECT t, b, list_transform(
            range(0, (SELECT MAX(len(v)) FROM e)),
            i -> (CAST(('0x' || substr(md5(CAST(t*1000+b AS VARCHAR) || ':' ||
              CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 1000000) / 1e6 - 0.5)
            AS pv
          FROM (SELECT CAST(unnest(range(0, 4)) AS INT) AS t) tt
          CROSS JOIN (SELECT CAST(unnest(range(0,
            (SELECT bits FROM nb))) AS INT) AS b) bb),
        buck AS (SELECT e.vec_id, p.t AS tbl,
            SUM(CASE WHEN list_dot_product(e.v, p.pv) >= 0
              THEN (CAST(1 AS BIGINT) << p.b) ELSE 0 END) AS bucket
          FROM e CROSS JOIN planes p GROUP BY 1, 2),
        cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM buck q JOIN buck c ON q.tbl = c.tbl
            AND bit_count(xor(q.bucket, c.bucket)) <= 1
          WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        scored AS (SELECT cand.query_id, cand.neighbor_id,
            list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))) AS cos
          FROM cand JOIN e a ON a.vec_id = cand.query_id
            JOIN e b ON b.vec_id = cand.neighbor_id),
        r AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank, cos
          FROM scored)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
          ROUND(cos, 4) AS cosine
        FROM r WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- int8 embedding quantization quality ---------------------------
    // Symmetric per-vector int8 quantization (4x storage vs float32) with
    // reconstruction metrics per label: mean cosine(original, dequantized)
    // and mean max-abs error, scaled-floor exact means (q33 discipline).
    "q53_embedding_quantize" -> QueryDef(
      (s, dir) => {
        val d = (c: org.apache.spark.sql.Column) =>
          transform(c, x => x.cast("double"))
        t(s, dir, "embeddings")
          // zero vectors have no cosine; keep the metric (and the oracle's
          // FLOOR(NaN) cast, which hard-errors in DuckDB) NaN-free
          .filter(aggregate(transform(col("embedding"),
            x => abs(x.cast("double"))), lit(0.0), (a, x) => a + x) > 0.0)
          .withColumn("deq", VectorOps.dequantizeInt8(
            VectorOps.quantizeInt8(col("embedding"))))
          .select(col("label"),
            floor(VectorOps.cosine(col("embedding"), col("deq")) * 1e6)
              .cast("long").as("cos6"),
            floor(aggregate(
              zip_with(d(col("embedding")), col("deq"), (x, y) => abs(x - y)),
              lit(0.0), (a, x) => greatest(a, x)) * 1e6)
              .cast("long").as("err6"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            (sum(col("cos6")).cast("double") / count(lit(1)) / 1e6)
              .as("avg_cosine"),
            (sum(col("err6")).cast("double") / count(lit(1)) / 1e6)
              .as("avg_max_err"))
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
          WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]),
            x -> abs(x))) > 0),
        q AS (SELECT label, v,
            list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
          FROM e),
        dq AS (SELECT label, v,
            list_transform(v, x -> round(x / scale) * scale) AS deq
          FROM q),
        m AS (SELECT label,
            CAST(FLOOR(list_dot_product(v, deq) /
              (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(deq, deq)))
              * 1e6) AS BIGINT) AS cos6,
            CAST(FLOOR(list_max(list_transform(range(1, len(v) + 1),
              i -> abs(v[i] - deq[i]))) * 1e6) AS BIGINT) AS err6
          FROM dq)
        SELECT label, COUNT(*) AS n,
          CAST(SUM(cos6) AS DOUBLE)/COUNT(*)/1e6 AS avg_cosine,
          CAST(SUM(err6) AS DOUBLE)/COUNT(*)/1e6 AS avg_max_err
        FROM m GROUP BY label ORDER BY label""")),

    // ---- Johnson-Lindenstrauss random projection (64 -> 16 dims) -------
    // Project embeddings onto 16 md5-derived hyperplanes (operators/
    // RandomProjection.scala) and measure distance distortion on the
    // deterministic even/odd vector pairs: ratio = sqrt(projected L2^2 /
    // original L2^2) per pair, exact floor-scaled means per label. The
    // oracle derives the SAME planes from md5 in SQL and replays both
    // distance pipelines with decimal-exact sums.
    "q71_random_projection" -> QueryDef(
      (s, dir) => {
        import graft.operators.RandomProjection
        val Dec = DecimalType(24, 15)
        val emb = t(s, dir, "embeddings")
        val dim = VectorOps.dimOf(emb, "embedding")
        val planes = RandomProjection.planesDF(s, 16, dim, 1000)
        val pts = emb.select(col("vec_id").as("id"),
            posexplode(col("embedding")).as(Seq("pos", "xf")))
          .select(col("id"), col("pos").as("i"),
            col("xf").cast("double").as("x"))
        val proj = RandomProjection.project(emb, "vec_id", "embedding", planes)
        def pairDist(df: DataFrame, dimCol: String, vCol: String,
            out: String) = {
          val a = df.filter(col("id") % 2 === 0)
          val b = df.select((col("id") - 1).as("id"),
            col(dimCol).as("__bd"), col(vCol).as("__bv"))
          a.join(b, a("id") === b("id") && col(dimCol) === col("__bd"))
            .groupBy(a("id").as("pid"))
            .agg(sum(((col(vCol) - col("__bv")) * (col(vCol) - col("__bv")))
              .cast(Dec)).cast("double").as(out))
        }
        val od = pairDist(pts, "i", "x", "od2")
        val pd = pairDist(proj, "j", "proj", "pd2")
        od.join(pd, "pid")
          .join(emb.select(col("vec_id").as("pid"), col("label")), "pid")
          .filter(col("od2") > 0.0)
          .groupBy("label")
          .agg(count(lit(1)).as("n_pairs"),
            (sum(floor(sqrt(col("pd2") / col("od2")) * 1e9).cast("long"))
              .cast("double") / count(lit(1)) / 1e9).as("avg_ratio"),
            (sum(floor(sqrt(col("od2")) * 1e9).cast("long"))
              .cast("double") / count(lit(1)) / 1e9).as("avg_orig_dist"),
            (sum(floor(sqrt(col("pd2")) * 1e9).cast("long"))
              .cast("double") / count(lit(1)) / 1e9).as("avg_proj_dist"))
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT vec_id AS id, label,
          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        idxs AS (SELECT CAST(unnest(range(1, len(embedding) + 1)) AS INT)
          AS dim FROM (SELECT embedding FROM embeddings LIMIT 1)),
        px AS (SELECT id, dim - 1 AS i, v[dim] AS x FROM e, idxs),
        pl AS (SELECT j, di - 1 AS i,
            CAST(CAST(('0x' || substr(md5(CAST(1000 + j AS VARCHAR) || ':'
              || CAST(di - 1 AS VARCHAR)), 1, 12)) AS BIGINT) % 1000000
              AS DOUBLE) / 1e6 - 0.5 AS p
          FROM (SELECT CAST(unnest(range(0, 16)) AS INT) AS j)
          CROSS JOIN (SELECT dim AS di FROM idxs)),
        pr AS (SELECT id, j,
            CAST(SUM(CAST(x * p AS DECIMAL(24,15))) AS DOUBLE) AS proj
          FROM px JOIN pl USING (i) GROUP BY id, j),
        od AS (SELECT a.id AS pid,
            CAST(SUM(CAST((a.x - b.x) * (a.x - b.x) AS DECIMAL(24,15)))
              AS DOUBLE) AS od2
          FROM px a JOIN px b ON b.id = a.id + 1 AND b.i = a.i
          WHERE a.id % 2 = 0 GROUP BY 1),
        pd AS (SELECT a.id AS pid,
            CAST(SUM(CAST((a.proj - b.proj) * (a.proj - b.proj)
              AS DECIMAL(24,15))) AS DOUBLE) AS pd2
          FROM pr a JOIN pr b ON b.id = a.id + 1 AND b.j = a.j
          WHERE a.id % 2 = 0 GROUP BY 1),
        m AS (SELECT e.label, od.od2, pd.pd2
          FROM od JOIN pd USING (pid) JOIN e ON e.id = od.pid
          WHERE od.od2 > 0)
        SELECT label, COUNT(*) AS n_pairs,
          CAST(SUM(CAST(FLOOR(sqrt(pd2 / od2) * 1e9) AS BIGINT)) AS DOUBLE)
            / COUNT(*) / 1e9 AS avg_ratio,
          CAST(SUM(CAST(FLOOR(sqrt(od2) * 1e9) AS BIGINT)) AS DOUBLE)
            / COUNT(*) / 1e9 AS avg_orig_dist,
          CAST(SUM(CAST(FLOOR(sqrt(pd2) * 1e9) AS BIGINT)) AS DOUBLE)
            / COUNT(*) / 1e9 AS avg_proj_dist
        FROM m GROUP BY label ORDER BY label""")),

    // ---- distributed k-means (IVF coarse quantizer fit) ----------------
    // Two Lloyd iterations over the embeddings, k=8, md5-deterministic
    // seeds (see operators/KMeans.scala for the plan shape). Per-term
    // decimal sums make centroids and inertia order-independent, so the
    // oracle replays the ENTIRE fit as a DuckDB CTE chain and the cluster
    // sizes + inertia hash-match cell-for-cell. This is the batch job that
    // would refresh Similarity.ivfTopK's centroids at 100 TB.
    "q57_kmeans" -> QueryDef(
      (s, dir) => {
        import graft.operators.KMeans
        val a2 = KMeans.fit(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, iters = 2)
        a2.groupBy(col("cid").as("cluster"))
          .agg(count(lit(1)).as("n"),
            sum(KMeans.inertia6(col("dist9"))).as("inertia6"))
          .orderBy("cluster")
      },
      Some(s"""WITH $KMeansA2Cte
        SELECT cid AS cluster, COUNT(*) AS n,
          CAST(SUM(dist9 // 1000) AS BIGINT) AS inertia6
        FROM a2 GROUP BY cid ORDER BY cluster""")),

    // ---- embedding column statistics -----------------------------------
    // Means of irrational per-row doubles (norms): scale-and-floor each value
    // to an exact long (1e-9 truncation), sum exactly, divide once — immune
    // to Spark's string-based vs DuckDB's binary-based double->decimal casts.
    "q33_embedding_stats" -> QueryDef(
      (s, dir) => {
        t(s, dir, "embeddings")
          .select(col("label"),
            floor(VectorOps.l2Norm(col("embedding")) * 1e9).cast("long").as("nrm9"),
            floor(col("embedding").getItem(0).cast("double") * 1e9).cast("long")
              .as("fd9"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            (sum(col("nrm9")).cast("double") / count(lit(1)) / 1e9).as("avg_norm"),
            (sum(col("fd9")).cast("double") / count(lit(1)) / 1e9).as("avg_first_dim"))
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT label,
          CAST(FLOOR(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
            CAST(embedding AS DOUBLE[]))) * 1e9) AS BIGINT) AS nrm9,
          CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e9) AS BIGINT) AS fd9
          FROM embeddings)
        SELECT label, COUNT(*) AS n,
          CAST(SUM(nrm9) AS DOUBLE)/COUNT(*)/1e9 AS avg_norm,
          CAST(SUM(fd9) AS DOUBLE)/COUNT(*)/1e9 AS avg_first_dim
        FROM e GROUP BY label ORDER BY label""")),

    // ---- Bloom-filter membership sketch --------------------------------
    // Per-source Bloom filters (m=4096 bits, k=3 md5-derived hashes) over
    // distinct text fingerprints; every source's probe set is tested
    // against every filter. Output: probes / maybe / actually-present /
    // false-positive counts per (probe, filter) pair. The filter is the
    // broadcastable distinct-position set (operators/Bloom.scala): builds
    // shuffle at most groups x m rows, probes are map-side. The oracle
    // replays build AND probe relationally; n_maybe >= n_present (no
    // false negatives) is the sketch invariant BloomSpec pins.
    "q59_bloom_filter" -> QueryDef(
      (s, dir) => {
        import graft.operators.Bloom
        val m = 4096; val kh = 3
        // persisted (r15, guide §1.2): the distinct key set feeds THREE
        // consumers (filter build, probe side, present marker) — each
        // re-ran the doc scan + md5 + distinct shuffle. Drained per run.
        val keys = Dedup.cached(t(s, dir, "documents")
          .select(col("source"), md5(col("text")).as("h")).distinct())
        // packed-bitmap build + O(1) getbit probes (r15): the sorted
        // position-ARRAY form paid a linear array_contains scan per hash
        // per probe pair (~2.5k ints x 3 x |probes x filters|). Same md5
        // position family, so every output count is bit-identical — the
        // filter representation never leaves the aggregation.
        val filters = Bloom.buildPacked(keys, "h", "source", m, kh)
          .withColumnRenamed("source", "filter_source")
        val probes = keys
          .withColumnRenamed("source", "probe_source")
          .withColumn("pos", Bloom.positions(col("h"), m, kh))
        val present = keys
          .select(col("source").as("filter_source"), col("h"), lit(1L).as("present"))
        probes.crossJoin(broadcast(filters))
          .withColumn("might",
            Bloom.mightContainPacked(col("filter"), col("pos")))
          .join(present, Seq("filter_source", "h"), "left")
          .groupBy("probe_source", "filter_source")
          .agg(count(lit(1)).as("n_probes"),
            sum(when(col("might"), lit(1L)).otherwise(lit(0L))).as("n_maybe"),
            sum(coalesce(col("present"), lit(0L))).as("n_present"))
          .withColumn("n_false_positive", col("n_maybe") - col("n_present"))
          .orderBy("probe_source", "filter_source")
      },
      Some("""WITH k AS (SELECT DISTINCT source, md5(text) AS h FROM documents),
        pos AS (SELECT source, h, i,
            CAST(('0x' || substr(md5(h || '#bloom' || CAST(i AS VARCHAR)), 1, 12))
              AS BIGINT) % 4096 AS p
          FROM k CROSS JOIN (SELECT CAST(unnest(range(0, 3)) AS INT) AS i)),
        fpos AS (SELECT DISTINCT source AS filter_source, p FROM pos),
        might AS (SELECT pos.source AS probe_source, pos.h, f.filter_source,
            (COUNT(fp.p) = 3) AS might
          FROM pos
          CROSS JOIN (SELECT DISTINCT source AS filter_source FROM k) f
          LEFT JOIN fpos fp ON fp.filter_source = f.filter_source
            AND fp.p = pos.p
          GROUP BY 1, 2, 3),
        pres AS (SELECT m.probe_source, m.filter_source, m.h, m.might,
            CASE WHEN k2.h IS NOT NULL THEN 1 ELSE 0 END AS present
          FROM might m LEFT JOIN k k2
            ON k2.source = m.filter_source AND k2.h = m.h)
        SELECT probe_source, filter_source, COUNT(*) AS n_probes,
          CAST(SUM(CASE WHEN might THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
          CAST(SUM(present) AS BIGINT) AS n_present,
          CAST(SUM(CASE WHEN might THEN 1 ELSE 0 END) - SUM(present) AS BIGINT)
            AS n_false_positive
        FROM pres GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- Count-Min frequency sketch (heavy hitters) ---------------------
    // Build a 4x256 CMS over every word occurrence (the shuffle is bounded
    // by depth*width, not the vocabulary), then point-estimate the top-15
    // exact heavy hitters against it. The Carter-Wegman family is the
    // MinHash one, so the oracle replays build AND estimate cell-exactly —
    // including the genuine collisions the 256-wide rows force — and the
    // no-underestimate invariant is graded per row rather than trusted.
    // At 100 TB the exact per-key groupBy here is exactly what the sketch
    // exists to avoid; it is computed only as the grading baseline.
    "q92_count_min" -> QueryDef(
      (s, dir) => {
        import graft.operators.CountMin
        val depth = 4; val width = 256
        val toks = t(s, dir, "documents")
          .select(explode(TextOps.words(lower(col("text")))).as("w"))
        val counters = CountMin.build(toks, "w", depth, width)
        val exact = toks.groupBy("w").agg(count(lit(1)).as("n_exact"))
        val top = exact.orderBy(col("n_exact").desc, col("w").asc).limit(15)
        CountMin.estimate(top, "w", counters, depth, width)
          .select(col("w").as("word"), col("n_exact"), col("cms_estimate"),
            (col("cms_estimate") >= col("n_exact")).as("no_underestimate"))
          .orderBy(col("n_exact").desc, col("word").asc)
      },
      Some(s"""WITH w AS (SELECT list_filter(string_split_regex(lower(text),
            '\\s+'), x -> len(x) > 0) AS ws FROM documents),
        tok AS (SELECT unnest(ws) AS w FROM w),
        cnt AS (SELECT w, COUNT(*) AS n_exact FROM tok GROUP BY w),
        f AS (SELECT * FROM (VALUES $MinHashCoeffSql) t(d, a, b)
          WHERE d < 4),
        x AS (SELECT w, n_exact,
            CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) % 2147483647 AS x
          FROM cnt),
        cm AS (SELECT d, ((a*x + b) % 2147483647) % 256 AS bucket,
            SUM(n_exact) AS c
          FROM x CROSS JOIN f GROUP BY 1, 2),
        top AS (SELECT w, n_exact, x FROM x
          ORDER BY n_exact DESC, w LIMIT 15),
        est AS (SELECT t.w, t.n_exact, MIN(COALESCE(cm.c, 0)) AS cms_estimate
          FROM top t CROSS JOIN f
          LEFT JOIN cm ON cm.d = f.d
            AND cm.bucket = ((f.a*t.x + f.b) % 2147483647) % 256
          GROUP BY 1, 2)
        SELECT w AS word, CAST(n_exact AS BIGINT) AS n_exact,
          CAST(cms_estimate AS BIGINT) AS cms_estimate,
          cms_estimate >= n_exact AS no_underestimate
        FROM est ORDER BY n_exact DESC, word""")),

    // ---- top principal component: quantized power iteration -------------
    // The spectral/dimensionality-reduction family (PCA whitening before
    // ANN, embedding drift axes), bit-replayable: per-row projections in
    // generated left-associated double arithmetic, per-dimension
    // DECIMAL(38,18) sums (exact, order-independent — the shuffle cannot
    // perturb the fixpoint), double norm, 1e-6 floor snap per iteration —
    // the q108 quantized-GD discipline on the Gram matrix. The iterate is
    // bounded model state (one 64-decimal row per iteration, re-inlined
    // as literals); iters x one-pass, linear in rows. BOTH the Spark plan
    // and the oracle SQL generate from the same (dim, iters) in
    // graft.operators.Pca, so the arithmetic text cannot drift. dim = 64
    // is the fixture embedding width (TESTDATA contract); a mismatch
    // NULLs the sums and fails the hash loudly.
    "q128_pca_power_iteration" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        graft.operators.Pca.powerIterationDF(
            t(s, dir, "embeddings"), "embedding", dim = 64, iters = 3)
          .orderBy("iter", "j")
      },
      Some(graft.operators.Pca.oracleSql(dim = 64, iters = 3,
        fromSql = "embeddings"))),

    // ---- spectral outlier scores off the top principal axis -------------
    // The actionable form of q128: residual energy ||x||^2 - (x.v)^2
    // flags rows that don't live on the corpus's dominant structure
    // (mis-embedded / off-distribution vectors a curation pipeline drops
    // before clustering or dedup). The component is bounded model state
    // (inlined literals from the q128 iterate); the score is one
    // generated left-associated double expression per row — map-side,
    // deterministic, so the UNROUNDED doubles hash-match (the q128
    // argument); top-20 by (score DESC, vec_id). Engine and oracle
    // generate from the same (dim, iters, topK) in Pca.
    "q128b_spectral_outliers" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        graft.operators.Pca.spectralOutliers(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, iters = 3, topK = 20)
      },
      Some(graft.operators.Pca.outlierOracleSql(dim = 64, iters = 3,
        fromSql = "embeddings", idCol = "vec_id", topK = 20))),

    // ---- second principal component: deflated power iteration -----------
    // q128 generalized: after each decimal Gram product the component
    // along the quantized TOP axis is subtracted (w' = w - (w.v1)v1,
    // generated left-associated double arithmetic) before the norm and
    // the 1e-6 snap — classic deflation, bit-replayable because v1 is
    // held at its quantized value. Output is the full two-component
    // trajectory (component, iter, j, v); orthogonality of the two snaps
    // is spec-graded in OperatorsSpec (O(1e-6), the quantization floor),
    // not assumed.
    "q129_pca_second_component" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        graft.operators.Pca.twoComponentDF(
            t(s, dir, "embeddings"), "embedding", dim = 64, iters = 3)
          .orderBy("component", "iter", "j")
      },
      Some(graft.operators.Pca.twoComponentOracleSql(dim = 64, iters = 3,
        fromSql = "embeddings"))),

    // ---- k-component axes as a persisted self-describing artifact -------
    // VERDICT r11 #3: the q129 deflation machinery generalized to k
    // components (sequential modified Gram-Schmidt against every prior
    // quantized axis), persisted as the (component, j, v) artifact with
    // (dim, iters, k, version) riding in each row — the q124 parameter
    // discipline on the spectral axis. The query grades the FULL round
    // trip: k Gram chains -> artifact write -> reload -> emit, against
    // an oracle generated from the same (dim, iters, k, version) in
    // graft.operators.Pca (the persistence layer must be invisible in
    // every bit). w24 consumes the same artifact shape for its
    // streaming projection monitor.
    "q131_pca_axes_artifact" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        import graft.operators.Pca
        val finals = Pca.kComponentFinals(t(s, dir, "embeddings"),
          "embedding", dim = 64, iters = 3, k = 3)
        val axDir = new java.io.File(sys.props("java.io.tmpdir"),
          "graft_pca_axes_" + LlmDedupQueries.artifactKey(dir)).toString
        Pca.axesArtifact(finals, dim = 64, iters = 3, k = 3, version = 1L)
          .write.mode("overwrite").parquet(axDir)
        s.read.parquet(axDir).orderBy("component", "j")
      },
      Some(graft.operators.Pca.kAxesOracleSql(dim = 64, iters = 3, k = 3,
        fromSql = "embeddings", version = 1L))),

    // ---- axes artifact VERSION BUMP (the q132b discipline on the
    // spectral axis, completing the lifecycle symmetry: cluster q130
    // merge, IVF q132 merge + q132b rebuild, landmark m13 merge, axes
    // q131 roundtrip + THIS rebuild): v1 axes fit over the day-one half
    // and persist; the corpus grows; the axes REFIT over the full corpus
    // and OVERWRITE the artifact as v2 (a drift monitor must re-anchor
    // on the new dominant directions — merging spectral axes is not a
    // defined operation, which is exactly why this is a rebuild grade);
    // the RELOADED artifact is graded against the from-scratch
    // full-corpus oracle with version = 2 pinned in every row.
    "q131b_axes_rebuild" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        import graft.operators.Pca
        val emb = t(s, dir, "embeddings")
        val axDir = new java.io.File(sys.props("java.io.tmpdir"),
          "graft_pca_axes_v2_" + LlmDedupQueries.artifactKey(dir)).toString
        // ONE persisted projection shared by the v1 half-corpus fit and
        // the v2 full refit (guide §1.2/§5, VERDICT r14 #5): the half
        // rows were projected twice under per-fit persists. Decimal Gram
        // sums are order-independent, so filtering the cached frame by
        // the version predicate is bit-identical to standalone fits.
        val Seq(v1Finals, v2Finals) = Pca.kComponentFinalsVariants(emb,
          "embedding", dim = 64, iters = 3, k = 3,
          Seq(col("vec_id") % 2 === 0, lit(true)))
        Pca.axesArtifact(v1Finals, dim = 64, iters = 3, k = 3,
            version = 1L)
          .write.mode("overwrite").parquet(axDir)
        Pca.axesArtifact(v2Finals, dim = 64, iters = 3, k = 3,
            version = 2L)
          .write.mode("overwrite").parquet(axDir)
        s.read.parquet(axDir).orderBy("component", "j")
      },
      Some(graft.operators.Pca.kAxesOracleSql(dim = 64, iters = 3, k = 3,
        fromSql = "embeddings", version = 2L))),

    // ---- persisted IVF index artifact + incremental inverted file -------
    // The q124/q130/q131 corpus-versioning discipline on the ANN axis:
    // q37 recomputes centroids and the inverted file per run; here the
    // centroid model persists as a self-describing artifact, the two
    // corpus halves assign SEPARATELY against the RELOADED model (pure
    // map-side — the incremental intake shape: arrivals never touch
    // history), the inverted file is their UNION (exact by construction:
    // assignment is per-row against fixed centroids), both round-trip
    // through parquet, and the probe runs against the RELOADED inverted
    // file. Graded against q37's from-scratch oracle VERBATIM (shared
    // constant, cannot drift) — any bit the artifacts or the merge lose
    // fails the hash.
    "q132_ann_index_artifact" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        val emb = t(s, dir, "embeddings")
        val cents = Similarity.centroidsOf(emb, "vec_id", "embedding", 16)
        val centDir = new java.io.File(sys.props("java.io.tmpdir"),
          "graft_ivf_cents_" + LlmDedupQueries.artifactKey(dir)).toString
        Similarity.centroidArtifact(cents)
          .write.mode("overwrite").parquet(centDir)
        val model = Similarity.centroidsFromArtifact(s.read.parquet(centDir))
        if (model.isEmpty) {
          // empty corpus: no centroid model, empty q37-shaped result
          emb.select(col("vec_id").as("query_id"),
              col("vec_id").as("neighbor_id"))
            .withColumn("rank", lit(1))
            .withColumn("cosine", lit(0.0)).limit(0)
        } else {
          def assign(half: org.apache.spark.sql.DataFrame) =
            Similarity.assignCells(half, "vec_id", "embedding", model, 1,
              "neighbor_id", "cv").select("cell", "neighbor_id")
          val invDir = new java.io.File(sys.props("java.io.tmpdir"),
            "graft_ivf_inv_" + LlmDedupQueries.artifactKey(dir)).toString
          assign(emb.filter(col("vec_id") % 2 === 0))
            .unionByName(assign(emb.filter(col("vec_id") % 2 =!= 0)))
            .write.mode("overwrite").parquet(invDir)
          Similarity.ivfTopKWith(s.read.parquet(invDir), emb,
              emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
              cents = model, nProbe = 4)
            .withColumn("cosine", round(col("cosine"), 4))
            .orderBy("query_id", "rank")
        }
      },
      Some(ivfOracleSql)),

    // ---- IVF model VERSION BUMP (VERDICT r12 #6) -------------------------
    // The one artifact-lifecycle edge q132 leaves ungraded: the index is
    // REBUILT, not merged. v1 centroids fit over the day-one half and
    // persist; the corpus grows; the model re-fits over the full corpus
    // and OVERWRITES the artifact as v2; history re-assigns wholesale
    // against the RELOADED v2 model (a rebuild invalidates the old
    // inverted file — the q130 merge discipline explicitly does NOT
    // apply); the probe runs against the reloaded v2 inverted file and
    // is graded against the from-scratch q37 oracle VERBATIM, with the
    // reloaded artifact's version pinned in the output row — if the
    // reload had served the stale v1 model, both the version column and
    // the neighbor sets would fail the hash.
    "q132b_ann_index_rebuild" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        val emb = t(s, dir, "embeddings")
        val centDir = new java.io.File(sys.props("java.io.tmpdir"),
          "graft_ivf_cents_v2_" + LlmDedupQueries.artifactKey(dir)).toString
        // v1: day-one half-corpus fit (the artifact a production index
        // would already have on disk when the rebuild job runs)
        Similarity.centroidArtifact(
            Similarity.centroidsOf(emb.filter(col("vec_id") % 2 === 0),
              "vec_id", "embedding", 16), version = 1L)
          .write.mode("overwrite").parquet(centDir)
        // rebuild: re-fit over the FULL corpus, overwrite as v2
        Similarity.centroidArtifact(
            Similarity.centroidsOf(emb, "vec_id", "embedding", 16),
            version = 2L)
          .write.mode("overwrite").parquet(centDir)
        val art = s.read.parquet(centDir)
        val model = Similarity.centroidsFromArtifact(art)
        if (model.isEmpty) {
          emb.select(col("vec_id").as("query_id"),
              col("vec_id").as("neighbor_id"))
            .withColumn("rank", lit(1))
            .withColumn("cosine", lit(0.0))
            .withColumn("model_version", lit(0L)).limit(0)
        } else {
          val ver = art.agg(max(col("version"))).head().getLong(0)
          val invDir = new java.io.File(sys.props("java.io.tmpdir"),
            "graft_ivf_inv_v2_" + LlmDedupQueries.artifactKey(dir)).toString
          Similarity.assignCells(emb, "vec_id", "embedding", model, 1,
              "neighbor_id", "cv")
            .select("cell", "neighbor_id")
            .write.mode("overwrite").parquet(invDir)
          Similarity.ivfTopKWith(s.read.parquet(invDir), emb,
              emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
              cents = model, nProbe = 4)
            .withColumn("cosine", round(col("cosine"), 4))
            .withColumn("model_version", lit(ver))
            .orderBy("query_id", "rank")
        }
      },
      Some(ivfOracleSqlFor("16", 4,
        extraCols = ",\n          CAST(2 AS BIGINT) AS model_version")))
  )

  // q37, q37b, q132, and q132b share ONE oracle text (the from-scratch
  // IVF replay, GENERATED from the same parameters): q132's
  // centroid-artifact + split-assign-union-roundtrip and q132b's
  // v1->v2 rebuild must be invisible against it, which is exactly the
  // grade. `nCellsSql` is either a literal or the SQL derivation of
  // Similarity.derivedCells (ceil integer division, so the two engines
  // cannot round apart); `extraCols` lets a lifecycle grade append
  // pinned artifact metadata (q132b's model_version).
  private def ivfOracleSqlFor(nCellsSql: String, nProbe: Int,
      extraCols: String = ""): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        cents AS (SELECT cell, v FROM (
          SELECT CAST(ROW_NUMBER() OVER
              (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS INT) AS cell, v
          FROM e) WHERE cell < ($nCellsSql)),
        sc AS (SELECT e.vec_id, c.cell,
            -(list_dot_product(e.v, c.v) /
              (sqrt(list_dot_product(e.v, e.v)) *
               sqrt(list_dot_product(c.v, c.v)))) AS neg
          FROM e CROSS JOIN cents c),
        ranked AS (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY neg, cell) AS rk
          FROM sc),
        corpus_cells AS (SELECT vec_id AS neighbor_id, cell
          FROM ranked WHERE rk = 1),
        query_cells AS (SELECT vec_id AS query_id, cell
          FROM ranked WHERE rk <= $nProbe AND vec_id < 10),
        cand AS (SELECT DISTINCT q.query_id, c.neighbor_id
          FROM corpus_cells c JOIN query_cells q ON c.cell = q.cell
          WHERE q.query_id <> c.neighbor_id),
        scored AS (SELECT cand.query_id, cand.neighbor_id,
            list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))) AS cos
          FROM cand JOIN e a ON a.vec_id = cand.query_id
            JOIN e b ON b.vec_id = cand.neighbor_id),
        r AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank, cos
          FROM scored)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
          ROUND(cos, 4) AS cosine$extraCols
        FROM r WHERE rank <= 5 ORDER BY query_id, rank"""

  private def ivfOracleSql: String = ivfOracleSqlFor("16", 4)
}
