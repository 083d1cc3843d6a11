package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.{TextOps, VectorOps}
import graft.operators.{Dedup, Similarity}
import graft.queries.LlmOracleSql._

/** Data selection and mixture design: EL2N/RHO/TracIn/forgetting/cartography influence grades, DSIR, UniMax, DoReMi, coresets, prototype pruning and the composed D4 pipelines, hard-negative mining, Gopher rules.
  *
  * Split out of the monolithic LlmQueries (r9 verdict #7) along its
  * family banners; the aggregate inventory, its portable-hash contract
  * scaladoc, and the shared oracle CTE builders live in [[LlmQueries]]
  * and [[LlmOracleSql]].
  */
object LlmSelectionQueries {
  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- EL2N data-pruning scores from the trained classifier -----------
    // Paul 2021 (arXiv:2107.07075, "Deep Learning on a Data Diet"): rank
    // examples by error norm |sigmoid(z) - y| — for a binary classifier
    // the EL2N score exactly. High scorers are the hard/noisy candidates a
    // pruning pass drops or audits first. Train + score + rank is one lazy
    // plan (zero extra passes beyond q108's fit); the top-k is a
    // per-partition heap (TakeOrdered), ordered on the 1e-9-quantized
    // score so the trajectory replays cross-engine.
    "q108g_el2n_prune" -> QueryDef(
      (s, dir) => {
        import graft.operators.LogReg
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          col("vec_id") +:
            (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val w = LogReg.train(feats, xs, "y", lr = 0.5, iters = 3)
        LogReg.score(feats, w, xs)
          .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("z"))))
          .withColumn("el2n9",
            floor(abs(col("p") - col("y").cast("double")) * 1e9)
              .cast("long"))
          .select("vec_id", "y", "el2n9")
          .orderBy(col("el2n9").desc, col("vec_id").asc)
          .limit(20)
      },
      Some(logRegEl2nOracleSql)),

    // ---- RHO-loss-style learnability selection (two models) ------------
    // Mindermann 2022 (arXiv:2206.07137, "Prioritized training on points
    // that are learnable, worth learning, and not yet learnt"): rank pool
    // examples by EXCESS error — current-model error minus the error of an
    // irreducible-loss model trained on a held-out slice. High excess =
    // learnable but not yet learnt (the keepers); deeply negative = likely
    // label noise. EL2N-form errors |sigmoid(z) - y| stand in for log-loss
    // (same selection family, no ln() in the cross-engine replay). Two
    // independent GD fits + both scorings are still ONE lazy plan: each
    // model is a one-row broadcast frame, so the double scoring is
    // map-side — zero extra shuffles over q108g.
    "q116_rho_learnability" -> QueryDef(
      (s, dir) => {
        import graft.operators.LogReg
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          col("vec_id") +:
            (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val pool = feats.filter(col("vec_id") % 4 =!= 0)
        val hold = feats.filter(col("vec_id") % 4 === 0)
        val wCur = LogReg.train(pool, xs, "y", lr = 0.5, iters = 3)
        val wIl = LogReg.train(hold, xs, "y", lr = 0.5, iters = 3)
        val s1 = LogReg.score(pool, wCur, xs)
          .drop("pred").withColumnRenamed("z", "z_cur")
        val s2 = LogReg.score(s1, wIl, xs)
          .drop("pred").withColumnRenamed("z", "z_il")
        val yd = col("y").cast("double")
        s2.withColumn("e",
            abs(lit(1.0) / (lit(1.0) + exp(-col("z_cur"))) - yd) -
              abs(lit(1.0) / (lit(1.0) + exp(-col("z_il"))) - yd))
          .select(col("vec_id"), col("y"),
            floor(col("e") * lit(1e9)).cast("long").as("rho9"))
          .orderBy(col("rho9").desc, col("vec_id").asc)
          .limit(20)
      },
      Some(logRegRhoOracleSql)),

    // ---- TracIn-style gradient-dot influence scores --------------------
    // Pruthi 2020 (arXiv:2002.08484, "Estimating training data influence
    // by tracing gradient descent"), first-checkpoint form: influence of
    // pool example i on held-out loss ~ grad_i . mean(grad_val), which for
    // logistic regression is (p_i - y_i) * (x_i . g_val) — closed-form
    // per-example gradients, no backprop machinery. g_val is ONE decimal
    // aggregation over the held-out slice with the final weights
    // (broadcast one-row frame); scoring is map-side. Top of the DESC
    // ranking = opponents (training on them pushes held-out loss up — the
    // prune/audit list); the bottom = strongest proponents.
    "q117_tracin_influence" -> QueryDef(
      (s, dir) => {
        import graft.operators.LogReg
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          col("vec_id") +:
            (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val pool = feats.filter(col("vec_id") % 4 =!= 0)
        val valSlice = feats.filter(col("vec_id") % 4 === 0)
        val w = LogReg.train(pool, xs, "y", lr = 0.5, iters = 3)
        def resid: Column =
          lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y").cast("double")
        val gvAggs = xs.zipWithIndex.map { case (c, j) =>
          sum((resid * col(c)).cast(DecimalType(38, 18))).as(s"v_$j")
        }
        val gv = LogReg.score(valSlice, w, xs)
          .agg(count(lit(1)).as("nv"), gvAggs: _*)
        val dot = xs.zipWithIndex.map { case (c, j) =>
          col(c) * (col(s"v_$j").cast("double") / col("nv"))
        }.reduce(_ + _)
        LogReg.score(pool, w, xs).crossJoin(broadcast(gv))
          .withColumn("infl", resid * dot)
          .select(col("vec_id"), col("y"),
            floor(col("infl") * lit(1e9)).cast("long").as("infl9"))
          .orderBy(col("infl9").desc, col("vec_id").asc)
          .limit(20)
      },
      Some(logRegTracinOracleSql)),

    // ---- Forgetting-event histogram over the GD trajectory -------------
    // Toneva 2019 (arXiv:1812.05159, "An empirical study of example
    // forgetting"): an example is FORGOTTEN when it flips correct ->
    // incorrect between consecutive training steps; never-learnt and
    // frequently-forgotten examples are the classic prune/audit
    // candidates. Scoring every example against EVERY iteration's weights
    // costs nothing extra here: the whole trajectory rides ONE one-row
    // broadcast frame (weightTrajectoryWide — gradient passes linear in
    // T, not the T(T+1)/2 of joining per-step frames), so all T
    // correctness flags fold in one map-side pass, then a B-cell histogram
    // aggregation (grid is at most
    // (T+1) x T x 2 rows). The corpus-shape summary, not a per-row dump —
    // the per-example form is q108g/q116's top-k shape. Trained with the
    // q108e config (standardized, lr 4.0, 6 iters): the hot rate makes the
    // boundary oscillate, so forgetting events exist to count.
    "q118_forgetting_events" -> QueryDef(
      (s, dir) => {
        import graft.operators.LogReg
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val iters = 6
        val std = LogReg.standardize(feats, (1 to 8).map(j => s"x$j"))
        val ws =
          LogReg.weightTrajectoryWide(std, xs, "y", lr = 4.0, iters = iters)
        val joined = std.crossJoin(broadcast(ws))
        def zt(t: Int): Column = xs.zipWithIndex.map { case (c, j) =>
          (col(s"w${t}q_$j") / lit(LogReg.Scale.toDouble)) * col(c)
        }.reduce(_ + _)
        def ct(t: Int): Column = (zt(t) >= 0.0) === (col("y") === 1)
        def ci(t: Int): Column = when(ct(t), 1).otherwise(0)
        val forgets = (1 until iters)
          .map(t => when(ct(t) && !ct(t + 1), 1).otherwise(0)).reduce(_ + _)
        joined.select(
            (1 to iters).map(ci).reduce(_ + _).cast("long")
              .as("n_correct_iters"),
            forgets.cast("long").as("n_forget"),
            ci(iters).cast("long").as("final_correct"))
          .groupBy("n_correct_iters", "n_forget", "final_correct")
          .agg(count(lit(1)).as("n_examples"))
          .orderBy("n_correct_iters", "n_forget", "final_correct")
      },
      Some(logRegForgetOracleSql)),

    // ---- Dataset-cartography coordinates over the GD trajectory --------
    // Swayamdipta 2020 (arXiv:2009.10795, "Dataset cartography"):
    // CONFIDENCE = mean true-class probability across training steps,
    // VARIABILITY = its population std. High-variability ("ambiguous")
    // examples are the most valuable to keep; low-confidence
    // low-variability ones are the mislabel/audit candidates. Rides the
    // same one-row wide-trajectory broadcast as q118 (q108e config so the
    // boundary oscillates and variability is non-degenerate): all T
    // probabilities fold map-side, the top-k is a per-partition heap.
    "q119_dataset_cartography" -> QueryDef(
      (s, dir) => {
        import graft.operators.LogReg
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          col("vec_id") +:
            (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val iters = 6
        val std = LogReg.standardize(feats, (1 to 8).map(j => s"x$j"))
        val ws =
          LogReg.weightTrajectoryWide(std, xs, "y", lr = 4.0, iters = iters)
        val joined = std.crossJoin(broadcast(ws))
        def zt(tt: Int): Column = xs.zipWithIndex.map { case (c, j) =>
          (col(s"w${tt}q_$j") / lit(LogReg.Scale.toDouble)) * col(c)
        }.reduce(_ + _)
        def pt(tt: Int): Column = {
          val p = lit(1.0) / (lit(1.0) + exp(-zt(tt)))
          when(col("y") === 1, p).otherwise(lit(1.0) - p)
        }
        val sc = joined.select(col("vec_id"), col("y"),
          (1 to iters).map(pt).reduce(_ + _).as("s1"),
          (1 to iters).map(tt => pt(tt) * pt(tt)).reduce(_ + _).as("s2"))
        val conf = col("s1") / lit(iters.toDouble)
        val v = col("s2") / lit(iters.toDouble) - conf * conf
        sc.select(col("vec_id"), col("y"),
            floor(conf * lit(1e9)).cast("long").as("conf9"),
            floor(sqrt(when(v < 0.0, lit(0.0)).otherwise(v)) * lit(1e9))
              .cast("long").as("var9"))
          .orderBy(col("var9").desc, col("vec_id").asc)
          .limit(20)
      },
      Some(logRegCartographyOracleSql)),

    // ---- DoReMi-style domain reweighting on excess loss -----------------
    // Xie 2023 (arXiv:2305.10429, "DoReMi"): upweight domains where the
    // proxy model's loss exceeds a reference model's — here the q116 pair
    // (pool fit vs held-out irreducible-loss fit) scores the pool once,
    // per-domain mean losses aggregate as DECIMAL sums (partitioning-
    // invariant), and the exponentiated-excess softmax normalizes over a
    // decimal total so the 10-row reduction order can't leak into the
    // quantized weights. The total rides an UNPARTITIONED window over the
    // bounded per-domain frame (one of the documented <=B-row spines) —
    // an agg + re-join would reference the frame's lineage twice and
    // re-run BOTH fits and the corpus scoring (measured 2x wall time).
    // Output is the mixture table a sampler consumes.
    "q120_doremi_weights" -> QueryDef(
      (s, dir) => {
        import graft.operators.LogReg
        val emb = t(s, dir, "embeddings")
        val feats = emb.select(
          col("vec_id") +: col("label").as("domain") +:
            (col("label") < 5).cast("int").as("y") +:
            lit(1.0).as("x0") +:
            (1 to 8).map(j =>
              element_at(col("embedding"), j).cast("double").as(s"x$j")): _*)
        val xs = (0 to 8).map(j => s"x$j")
        val pool = feats.filter(col("vec_id") % 4 =!= 0)
        val hold = feats.filter(col("vec_id") % 4 === 0)
        val wP = LogReg.train(pool, xs, "y", lr = 0.5, iters = 3)
        val wH = LogReg.train(hold, xs, "y", lr = 0.5, iters = 3)
        val s1f = LogReg.score(pool, wP, xs)
          .drop("pred").withColumnRenamed("z", "z_p")
        val s2f = LogReg.score(s1f, wH, xs)
          .drop("pred").withColumnRenamed("z", "z_h")
        val yd = col("y").cast("double")
        val sc = s2f.select(col("domain"),
          abs(lit(1.0) / (lit(1.0) + exp(-col("z_p"))) - yd).as("lp"),
          abs(lit(1.0) / (lit(1.0) + exp(-col("z_h"))) - yd).as("lh"))
        val d = sc.groupBy("domain").agg(
          count(lit(1)).as("n"),
          sum(col("lp").cast(DecimalType(38, 18))).as("sp"),
          sum(col("lh").cast(DecimalType(38, 18))).as("sh"))
        val e2 = d.select(col("domain"),
          (col("sp").cast("double") / col("n") -
            col("sh").cast("double") / col("n")).as("excess"))
        val ew = e2.withColumn("expw", exp(lit(10.0) * col("excess")))
        val w = org.apache.spark.sql.expressions.Window.partitionBy()
        ew.withColumn("tot",
            sum(col("expw").cast(DecimalType(38, 18))).over(w))
          .select(col("domain"),
            floor(col("excess") * lit(1e9)).cast("long").as("excess9"),
            floor(col("expw") / col("tot").cast("double") * lit(1e9))
              .cast("long").as("weight9"))
          .orderBy("domain")
      },
      Some(logRegDoremiOracleSql)),

    // ---- Prototypicality pruning over the k-means fit -------------------
    // Sorscher 2022 (arXiv:2206.14486, "Beyond neural scaling laws"):
    // with abundant data, prune the EASY examples — rank each cluster by
    // distance to its prototype (centroid) and keep the hardest fraction.
    // The fit IS q57's graded fit (shared KMeansA2Cte oracle chain); the
    // rank + count ride one per-cluster window shuffle (cluster sizes are
    // ~n/k and k grows with the corpus per the SemDedup contract), the
    // 50% cut is integral division, and the output is the per-cluster
    // audit table: size, kept count, and the hardness threshold at the
    // cut (ties broken by id in both engines).
    "q121_prototype_pruning" -> QueryDef(
      (s, dir) => {
        import graft.operators.KMeans
        import org.apache.spark.sql.expressions.Window
        val a2 = KMeans.fit(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, iters = 2)
        val byCluster = Window.partitionBy("cid")
        val hardestFirst =
          byCluster.orderBy(col("dist9").desc, col("id").asc)
        a2.withColumn("n", count(lit(1)).over(byCluster))
          .withColumn("rk", row_number().over(hardestFirst))
          .filter(col("rk") <= expr("n * 50 div 100"))
          .groupBy(col("cid").as("cluster"))
          .agg(max(col("n")).as("n"),
            count(lit(1)).as("n_kept"),
            min(col("dist9")).as("cut_dist9"))
          .orderBy("cluster")
      },
      Some(kmeansPrototypePruneOracleSql)),

    // ---- D4: SemDeDup then prototypicality pruning, one clustering ------
    // Tirumala 2023 (arXiv:2308.12284, "D4"): q103's within-cluster
    // near-dup removal, then q121's hardest-fraction keep-cut on the
    // SURVIVORS. The paper re-clusters the deduplicated corpus before
    // pruning; this inventory form deliberately reuses the ONE k-means
    // fit for both stages as a cost-saving approximation (one persisted
    // assignment serves the dedup self-join, the survivor ranking, and
    // the size spine) — the paper-faithful two-fit production form is
    // q122b. The audit row per cluster carries the funnel:
    // n -> n_dedup -> n_kept, plus the hardness threshold at the cut;
    // clusters dedup emptied or whose keep-cut rounds to zero still
    // report (n_kept 0, cut_dist9 NULL) so the funnel audit is total.
    "q122_d4_pipeline" -> QueryDef(
      (s, dir) => {
        import graft.operators.SemDedup
        SemDedup.d4Stats(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, iters = 2, minCosine = 0.45, keepPct = 50)
      },
      Some(s"""WITH $KMeansA2Cte,
        m AS (SELECT a2.id, a2.cid, e.v FROM a2 JOIN e USING (id)),
        rem AS (SELECT DISTINCT b.id
          FROM m a JOIN m b ON a.cid = b.cid AND a.id < b.id
          WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= 0.45),
        surv AS (SELECT * FROM a2
          WHERE id NOT IN (SELECT id FROM rem)),
        sc AS (SELECT cid, COUNT(*) AS n_dedup FROM surv GROUP BY cid),
        rk AS (SELECT cid, id, dist9,
            ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dist9 DESC, id)
              AS rk,
            COUNT(*) OVER (PARTITION BY cid) AS nd
          FROM surv),
        kp AS (SELECT cid, COUNT(*) AS n_kept,
            MIN(dist9) AS cut_dist9
          FROM rk WHERE rk <= (nd * 50) // 100 GROUP BY cid),
        nc AS (SELECT cid, COUNT(*) AS n FROM a2 GROUP BY cid)
        SELECT nc.cid AS cluster, nc.n,
          CAST(COALESCE(sc.n_dedup, 0) AS BIGINT) AS n_dedup,
          CAST(COALESCE(kp.n_kept, 0) AS BIGINT) AS n_kept,
          kp.cut_dist9
        FROM nc LEFT JOIN sc ON sc.cid = nc.cid
        LEFT JOIN kp ON kp.cid = nc.cid ORDER BY cluster""")),

    // ---- D4 production form: two fits, derived k, gated (VERDICT r9 #1) -
    // The paper-faithful composition at production parameters: derived-k
    // SemDeDup (q103b's configuration — k = ceil(n/50) grows with the
    // corpus), then prototypicality pruning over a SECOND k-means fit of
    // the SURVIVORS (Tirumala 2023 re-clusters the deduplicated corpus
    // before pruning; q122's shared fit is the one-fit approximation).
    // Grades the final KEPT id set itself. At this SF the derived k stays
    // under the exact gate, so the oracle replays two full Lloyd chains —
    // the second seeded and fitted over fit #1's survivors via the
    // prefixed CTE builder. Past the gate (forced in q122c, automatic at
    // the x100 decade) both stages swap k-means cells for hyperplane
    // cells and the pipeline stays linear.
    "q122b_d4_production" -> QueryDef(
      (s, dir) => {
        import graft.operators.SemDedup
        SemDedup.d4ProductionKept(t(s, dir, "embeddings"), "vec_id",
            "embedding", targetClusterSize = 50, iters = 2,
            minCosine = 0.45, keepPct = 50)
          .orderBy("vec_id")
      },
      Some(s"""WITH ${kmeansA2Cte(
          "SELECT CAST(CEIL(COUNT(*) / 50.0) AS INT) FROM embeddings")},
        m AS (SELECT a2.id, a2.cid, e.v FROM a2 JOIN e USING (id)),
        rem AS (SELECT DISTINCT b.id
          FROM m a JOIN m b ON a.cid = b.cid AND a.id < b.id
          WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= 0.45),
        surv AS (SELECT id, v FROM e
          WHERE id NOT IN (SELECT id FROM rem)),
        ${kmeansChainCte("p", "surv",
          "SELECT CAST(CEIL(COUNT(*) / 50.0) AS INT) FROM embeddings")},
        prk AS (SELECT id,
            ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dist9 DESC, id)
              AS rk,
            COUNT(*) OVER (PARTITION BY cid) AS nd
          FROM pa2)
        SELECT id AS vec_id FROM prk WHERE rk <= (nd * 50) // 100
        ORDER BY vec_id""")),

    // ---- D4 production gate-path recall grade (q103d discipline) --------
    // What the past-the-gate configuration trades away, measured END TO
    // END on the COMPOSED pipeline: kept-set agreement between the exact
    // two-fit path (q122b config) and the fully gated path (maxExactK=1:
    // representative-anchored LSH dedup, then hyperplane-cell mean
    // prototypes for the keep-cut). recall9 = floor(n_agree * 1e9 /
    // n_exact_kept) — integer arithmetic, so the agreement metric itself
    // replays exactly. Both paths hash-replay in the oracle (two Lloyd
    // chains + the md5-derived plane chain + the decimal cell means).
    // READING the number: the DEDUP halves agree almost entirely (q103d
    // grades that stage alone) and the two paths keep near-identical
    // COUNTS (the per-cell keep fraction is the same integral rule), but
    // kept-set IDENTITY agreement is dominated by the prune stage's
    // cell-relative hardness — "farthest from its prototype" depends on
    // the cell partition, so Lloyd cells and hyperplane cells rank
    // different members hardest (measured 0.45e9 at sf0.1 on the
    // near-uniform synthetic embeddings, where the hardest-half cut is
    // noise-sensitive by construction). That sensitivity is a property
    // of prototype pruning itself (Sorscher 2022 report the analogous
    // self-supervised-vs-supervised prototype disagreement), and this
    // grade is what makes it measurable instead of asserted.
    "q122c_d4_gate_recall" -> QueryDef(
      (s, dir) => {
        import graft.operators.SemDedup
        // Sharing the (id, vec) base frame across the two pipelines
        // (VERDICT r14 #1) was MEASURED and REJECTED in r15, both
        // vehicles, same window, q122c: registry persist 10.7 -> 13.8 s
        // (1.3x slower — every one of the ~50 downstream actions paid
        // CacheManager plan-matching + InMemoryTableScan overhead) and
        // eager localCheckpoint 10.7 -> 23.7 s (2.2x — LogicalRDD
        // re-planning/row-scan costs dominate). At this input size the
        // columnar parquet re-scan is cheaper than any materialization
        // (the q102d/q59 recompute-beats-persist precedent); at 100 TB
        // the shared scans are already covered by the operator-internal
        // persists (fit assignments, bucket tables, survEmb).
        val emb = t(s, dir, "embeddings")
        // one shared corpus count; fixture dim pinned on the gate path
        // (q131 TESTDATA-contract style) — drops two derivation scans
        val n = emb.count()
        val exact = SemDedup.d4ProductionKept(emb, "vec_id", "embedding",
          targetClusterSize = 50, iters = 2, minCosine = 0.45, keepPct = 50,
          knownN = Some(n))
        val gate = SemDedup.d4ProductionKept(emb, "vec_id", "embedding",
          targetClusterSize = 50, iters = 2, minCosine = 0.45, keepPct = 50,
          maxExactK = 1, pinnedBits = Some(8), knownN = Some(n),
          knownDim = Some(64))
        val ex = exact.select(col("vec_id"), lit(1L).as("__ex"))
        val ga = gate.select(col("vec_id"), lit(1L).as("__ga"))
        ex.join(ga, Seq("vec_id"), "full")
          .na.fill(0L, Seq("__ex", "__ga"))
          .agg(coalesce(sum("__ex"), lit(0L)).as("n_exact_kept"),
            coalesce(sum("__ga"), lit(0L)).as("n_gate_kept"),
            coalesce(sum(col("__ex") * col("__ga")), lit(0L)).as("n_agree"))
          .select(col("n_exact_kept"), col("n_gate_kept"), col("n_agree"),
            when(col("n_exact_kept") === 0, lit(-1L))
              .otherwise(expr("n_agree * 1000000000 DIV n_exact_kept"))
              .as("recall9"))
      },
      Some(s"""WITH ${kmeansA2Cte(
          "SELECT CAST(CEIL(COUNT(*) / 50.0) AS INT) FROM embeddings")},
        m AS (SELECT a2.id, a2.cid, e.v FROM a2 JOIN e USING (id)),
        rem AS (SELECT DISTINCT b.id
          FROM m a JOIN m b ON a.cid = b.cid AND a.id < b.id
          WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= 0.45),
        surv AS (SELECT id, v FROM e
          WHERE id NOT IN (SELECT id FROM rem)),
        ${kmeansChainCte("p", "surv",
          "SELECT CAST(CEIL(COUNT(*) / 50.0) AS INT) FROM embeddings")},
        prk AS (SELECT id,
            ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dist9 DESC, id)
              AS rk,
            COUNT(*) OVER (PARTITION BY cid) AS nd
          FROM pa2),
        keptx AS (SELECT id FROM prk WHERE rk <= (nd * 50) // 100),
        planes AS (SELECT t, b, list_transform(
            range(0, (SELECT MAX(len(v)) FROM e)),
            i -> (CAST(('0x' || substr(md5(CAST(t*1000+b AS VARCHAR) || ':' ||
              CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 1000000) / 1e6 - 0.5)
            AS pv
          FROM (SELECT CAST(unnest(range(0, 8)) AS INT) AS t) tt
          CROSS JOIN (SELECT CAST(unnest(range(0, 8)) AS INT) AS b) bb),
        buck AS (SELECT e.id, p.t AS tbl,
            SUM(CASE WHEN list_dot_product(e.v, p.pv) >= 0
              THEN (CAST(1 AS BIGINT) << p.b) ELSE 0 END) AS bucket
          FROM e CROSS JOIN planes p GROUP BY 1, 2),
        reps AS (SELECT tbl, bucket, MIN(id) AS id_a
          FROM buck GROUP BY 1, 2),
        cand AS (SELECT DISTINCT r.id_a, k.id AS id_b
          FROM buck k JOIN reps r ON r.tbl = k.tbl AND r.bucket = k.bucket
          WHERE k.id > r.id_a),
        reml AS (SELECT DISTINCT id_b AS id FROM cand
          JOIN e a ON a.id = cand.id_a
          JOIN e b ON b.id = cand.id_b
          WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= 0.45),
        survl AS (SELECT id, v FROM e
          WHERE id NOT IN (SELECT id FROM reml)),
        gcell AS (SELECT s.id, b.bucket AS cell, s.v
          FROM survl s JOIN buck b ON b.id = s.id AND b.tbl = 0),
        gpx AS (SELECT id, cell, dim, v[dim] AS x FROM gcell, idxs),
        gmean AS (SELECT cell, dim,
            CAST(SUM(CAST(x AS DECIMAL(24,15))) AS DOUBLE) / COUNT(*) AS c
          FROM gpx GROUP BY cell, dim),
        gd AS (SELECT id, cell,
            CAST(SUM(CAST(FLOOR((x - c) * (x - c) * 1e9) AS BIGINT))
              AS BIGINT) AS dist9
          FROM gpx JOIN gmean USING (cell, dim) GROUP BY id, cell),
        grk AS (SELECT id,
            ROW_NUMBER() OVER (PARTITION BY cell ORDER BY dist9 DESC, id)
              AS rk,
            COUNT(*) OVER (PARTITION BY cell) AS nd
          FROM gd),
        keptl AS (SELECT id FROM grk WHERE rk <= (nd * 50) // 100),
        st AS (SELECT (SELECT COUNT(*) FROM keptx) AS nx,
            (SELECT COUNT(*) FROM keptl) AS nl,
            (SELECT COUNT(*) FROM keptx JOIN keptl USING (id)) AS na)
        SELECT CAST(nx AS BIGINT) AS n_exact_kept,
          CAST(nl AS BIGINT) AS n_gate_kept,
          CAST(na AS BIGINT) AS n_agree,
          CAST(CASE WHEN nx = 0 THEN -1
            ELSE na * 1000000000 // nx END AS BIGINT) AS recall9
        FROM st""")),

    // ---- DSIR importance weights (Xie 2023, arXiv:2302.03169) ----------
    // Hashed-bigram importance scoring of the raw pool against a target
    // corpus: per-bucket floor-1e-9 log ratios of Laplace-smoothed
    // distributions, per-doc weights as exact long sums. The oracle
    // replays the whole fit cell-for-cell (portable md5 buckets, the
    // q96/q101 floor-ln discipline).
    "q111_dsir_weights" -> QueryDef(
      (s, dir) => {
        import graft.operators.Dsir
        Dsir.importanceWeights9(t(s, dir, "documents"), "doc_id", "text",
            DsirTargetPred, buckets = 256)
          .orderBy(col("w9").desc, col("doc_id")).limit(20)
      },
      Some(s"""$DsirCtes
        SELECT p.doc_id AS doc_id,
          CAST(COALESCE(w.n_bigrams, 0) AS BIGINT) AS n_bigrams,
          CAST(COALESCE(w.w9, 0) AS BIGINT) AS w9
        FROM pool p LEFT JOIN wts w ON p.doc_id = w.doc_id
        ORDER BY w9 DESC, doc_id LIMIT 20""")),

    // ---- DSIR Gumbel-top-k resample -------------------------------------
    // Sampling k docs without replacement with probability ~ exp(w9/1e9)
    // via the Gumbel-max trick, DERANDOMIZED: the noise term comes from the
    // same portable hash (u = (md5_48(doc_id:seed)+1)/(2^48+1),
    // g = -ln(-ln(u)), floor-quantized), so the "random" resample is
    // reproducible across engines, seeds, and cluster re-runs — and the
    // selection is a per-partition top-k heap, never a global sort.
    "q111b_dsir_resample" -> QueryDef(
      (s, dir) => {
        import graft.operators.Dsir
        val w = Dsir.importanceWeights9(t(s, dir, "documents"), "doc_id",
          "text", DsirTargetPred, buckets = 256)
        Dsir.gumbelTopK(w.select("doc_id", "w9"), k = 25, seed = "ep0")
      },
      Some(s"""$DsirCtes,
        ww AS (SELECT p.doc_id, CAST(COALESCE(w.w9, 0) AS BIGINT) AS w9
          FROM pool p LEFT JOIN wts w ON p.doc_id = w.doc_id),
        gg AS (SELECT doc_id, w9,
            CAST(FLOOR(-LN(-LN(
              (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ep0'),
                1, 12)) AS BIGINT) + 1.0) / 281474976710657.0)) * 1e9)
              AS BIGINT) AS g9
          FROM ww)
        SELECT doc_id, w9, g9, w9 + g9 AS key9 FROM gg
        ORDER BY key9 DESC, doc_id LIMIT 25""")),

    // ---- UniMax epoch-capped budget allocation --------------------------
    // (Chung 2023, arXiv:2304.09151) — the companion to q78's temperature
    // mixture: water-fill a token budget (3900 per-mille of total tokens
    // here) across sources with a hard 4-epoch repetition cap. The greedy
    // collapses to one threshold (operators/Unimax.scala), so the whole
    // allocation is a sort + prefix sum over the bounded per-source frame;
    // at this fixture ~2/3 of the sources are cap-limited and the rest
    // split the remainder at the water level, exercising both branches.
    "q112_unimax_alloc" -> QueryDef(
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .select(col("source"),
            size(TextOps.regexTokens(col("text"))).as("nt"))
          .groupBy("source").agg(sum(col("nt")).as("n_tokens"))
        graft.operators.Unimax.allocate(counts, "source", "n_tokens",
          budgetPerMille = 3900L, epochCap = 4)
      },
      Some("""WITH tk AS (SELECT source,
          SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')))
            AS n_tokens FROM documents GROUP BY source),
        c AS (SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
            CAST(n_tokens * 4 AS BIGINT) AS cap FROM tk),
        o AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cap, source) AS rn,
            SUM(cap) OVER (ORDER BY cap, source ROWS UNBOUNDED PRECEDING)
              AS pre,
            COUNT(*) OVER () AS k, SUM(n_tokens) OVER () AS total FROM c),
        b AS (SELECT *, (total * 3900) // 1000 AS budget FROM o),
        tt AS (SELECT *, CAST(budget - (pre - cap) AS DOUBLE)
            / CAST(k - rn + 1 AS DOUBLE) AS tcand FROM b),
        f AS (SELECT MIN(rn) AS trn FROM tt
          WHERE CAST(cap AS DOUBLE) > tcand),
        tv AS (SELECT tt.rn AS trn, tt.tcand AS tval
          FROM tt JOIN f ON tt.rn = f.trn),
        a AS (SELECT source, n_tokens, cap,
            CASE WHEN (SELECT trn FROM tv) IS NULL
                OR rn < (SELECT trn FROM tv) THEN cap
              ELSE CAST(FLOOR((SELECT tval FROM tv)) AS BIGINT) END
              AS alloc_tokens
          FROM tt)
        SELECT source, n_tokens, cap, alloc_tokens,
          CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE FLOOR(CAST(alloc_tokens AS DOUBLE)
              / CAST(n_tokens AS DOUBLE) * 1e6) END AS BIGINT) AS epochs6
        FROM a ORDER BY source""")),

    // ---- hard-negative mining (contrastive pairs) -----------------------
    // The DPR recipe (Karpukhin 2020, arXiv:2004.04906): per query, top-k
    // neighbors in the cosine band [0.15, 0.35) — informative negatives
    // below the positive/near-dup band. Band filter runs BEFORE the rank
    // shuffle (Similarity.hardNegativeTopK); the LSH candidate generator
    // composes in front of the same filter at corpus scale.
    "q113_hard_negatives" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.hardNegativeTopK(emb, emb.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, loCos = 0.15, hiCos = 0.35)
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
          FROM s WHERE cos >= 0.15 AND cos < 0.35)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
          ROUND(cos, 4) AS cosine
        FROM r WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- hard-negative gate recall (q45/q103d discipline) ---------------
    // How much of the exact band top-k survives the LSH candidate gate —
    // the gate's quality trade measured, not asserted. Both sides are
    // hash-family-deterministic (q32's md5-seeded hyperplanes), so DuckDB
    // replays the ENTIRE grade: exact denominators AND gated numerators.
    "q113b_hard_negative_recall" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
        // both sides consumed twice (count + semi-join): persist, release
        val exact = Similarity.hardNegativeTopK(emb, qs, "vec_id",
          "embedding", k = 5, loCos = 0.15, hiCos = 0.35)
          .select("query_id", "neighbor_id").persist()
        val gated = Similarity.hardNegativeTopKLsh(emb, qs, "vec_id",
          "embedding", k = 5, loCos = 0.15, hiCos = 0.35,
          nBits = 8, nTables = 4)
          .select("query_id", "neighbor_id").persist()
        try {
          val nExact = exact.count()
          val nFound = exact
            .join(gated, Seq("query_id", "neighbor_id"), "left_semi")
            .count()
          val pct: java.lang.Double =
            if (nExact == 0) null
            else math.round(nFound.toDouble / nExact * 10000.0) / 100.0
          Seq(("lsh_band_topk", nExact, nFound, pct))
            .toDF("method", "n_exact", "n_found", "recall_pct")
        } finally {
          exact.unpersist(blocking = false)
          gated.unpersist(blocking = false)
        }
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_dot_product(q.v, c.v) /
              (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
              AS cos
          FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        xr AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank
          FROM s WHERE cos >= 0.15 AND cos < 0.35),
        ex AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= 5),
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
        gsc AS (SELECT cand.query_id, cand.neighbor_id,
            list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))) AS cos
          FROM cand JOIN e a ON a.vec_id = cand.query_id
            JOIN e b ON b.vec_id = cand.neighbor_id),
        gr AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank
          FROM gsc WHERE cos >= 0.15 AND cos < 0.35),
        ap AS (SELECT query_id, neighbor_id FROM gr WHERE rank <= 5),
        fnd AS (SELECT ex.query_id FROM ex JOIN ap
          ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id)
        SELECT 'lsh_band_topk' AS method,
          (SELECT COUNT(*) FROM ex) AS n_exact,
          (SELECT COUNT(*) FROM fnd) AS n_found,
          CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN NULL
            ELSE ROUND(CAST((SELECT COUNT(*) FROM fnd) AS DOUBLE)
              / (SELECT COUNT(*) FROM ex) * 10000.0) / 100.0 END
            AS recall_pct""")),

    // ---- Gopher quality-rule bundle -------------------------------------
    // The named rule set from Rae 2021 (arXiv:2112.11446, Gopher) in the
    // subset meaningful on newline-free fixtures: word-count bounds, mean
    // word length in [3, 10], >= 2 stopword hits, >= 80% alphabetic
    // words, symbol(#/ellipsis)-to-word ratio <= 0.1. Output is per-rule
    // INDEPENDENT failure counts plus the all-rules pass count — the
    // attribution a curation audit needs (which rule kills what) — folded
    // into ONE conditional aggregation (the q97b discipline: no per-rule
    // passes, no actions). Ratio rules guard nw > 0 so empty docs fail
    // only the word-count rule (FALSE AND NULL = FALSE in both engines).
    "q115_gopher_rules" -> QueryDef(
      (s, dir) => {
        val stop = Seq("the", "a", "and", "of", "to", "in", "is", "data")
        val ws = TextOps.words(col("text"))
        val flags = t(s, dir, "documents")
          .select(
            size(ws).as("nw"),
            aggregate(ws, lit(0), (acc, w) => acc + length(w)).as("wchars"),
            size(filter(ws, w => lower(w).isInCollection(stop)))
              .as("stop_hits"),
            size(filter(ws, w => w.rlike("[A-Za-z]"))).as("alpha_words"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[#…]", "")))
              .as("sym_chars"))
          .select(
            (col("nw") < 30 || col("nw") > 100000).as("f_wc"),
            (col("nw") > 0 &&
              (col("wchars").cast("double") / col("nw") < 3.0 ||
                col("wchars").cast("double") / col("nw") > 10.0)).as("f_mwl"),
            (col("stop_hits") < 2).as("f_stop"),
            (col("nw") > 0 &&
              col("alpha_words").cast("double") / col("nw") < 0.8)
              .as("f_alpha"),
            (col("nw") > 0 &&
              col("sym_chars").cast("double") / col("nw") > 0.1).as("f_sym"))
        flags.agg(
          count(lit(1)).as("n_docs"),
          count(when(col("f_wc"), 1)).as("fail_word_count"),
          count(when(col("f_mwl"), 1)).as("fail_mean_word_len"),
          count(when(col("f_stop"), 1)).as("fail_stopwords"),
          count(when(col("f_alpha"), 1)).as("fail_alpha_ratio"),
          count(when(col("f_sym"), 1)).as("fail_symbol_ratio"),
          count(when(!col("f_wc") && !col("f_mwl") && !col("f_stop") &&
            !col("f_alpha") && !col("f_sym"), 1)).as("n_pass_all"))
      },
      Some(s"""$WordsCte,
        m AS (SELECT len(ws) AS nw,
            list_sum(list_transform(ws, x -> len(x))) AS wchars,
            len(list_filter(ws, x -> lower(x) IN
              ('the','a','and','of','to','in','is','data'))) AS stop_hits,
            len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
              AS alpha_words,
            len(text) - len(regexp_replace(text, '[#…]', '', 'g'))
              AS sym_chars
          FROM w),
        f AS (SELECT
            (nw < 30 OR nw > 100000) AS f_wc,
            (nw > 0 AND (CAST(wchars AS DOUBLE)/nw < 3.0
              OR CAST(wchars AS DOUBLE)/nw > 10.0)) AS f_mwl,
            (stop_hits < 2) AS f_stop,
            (nw > 0 AND CAST(alpha_words AS DOUBLE)/nw < 0.8) AS f_alpha,
            (nw > 0 AND CAST(sym_chars AS DOUBLE)/nw > 0.1) AS f_sym
          FROM m)
        SELECT COUNT(*) AS n_docs,
          COUNT(CASE WHEN f_wc THEN 1 END) AS fail_word_count,
          COUNT(CASE WHEN f_mwl THEN 1 END) AS fail_mean_word_len,
          COUNT(CASE WHEN f_stop THEN 1 END) AS fail_stopwords,
          COUNT(CASE WHEN f_alpha THEN 1 END) AS fail_alpha_ratio,
          COUNT(CASE WHEN f_sym THEN 1 END) AS fail_symbol_ratio,
          COUNT(CASE WHEN NOT f_wc AND NOT f_mwl AND NOT f_stop
            AND NOT f_alpha AND NOT f_sym THEN 1 END) AS n_pass_all
        FROM f""")),

    // ---- k-center greedy coreset (farthest-point sampling) --------------
    // Gonzalez 1985 / Sener 2018 (arXiv:1708.00489): diversity selection
    // for data pruning. k map-side passes (centers ride as array
    // literals, zero shuffle) + k one-row TakeOrdereds; the oracle replays
    // the whole greedy trajectory as a generated k-step CTE chain with the
    // identical three-dot distance and tie-break (kCenterSql).
    "q114_kcenter_coreset" -> QueryDef(
      (s, dir) => {
        import graft.operators.Coreset
        Coreset.kCenterGreedy(t(s, dir, "embeddings"), "vec_id",
            "embedding", k = 8)
          .orderBy("step")
      },
      Some(kCenterSql(8)))
  )
}
