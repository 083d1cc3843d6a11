package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Physical-plan assertions: the scale properties the engine promises
  * (pushdown, pruning, broadcast, partial aggregation) must be visible in
  * the executed plan, not just hoped for.
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("q01: aggregation is partial+final (map-side combine)") {
    assert(plan("q01_pricing_summary").contains("partial_sum"))
  }

  test("q02: the time-range predicate reaches the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts"),
      s"range predicate not pushed to the scan:\n$p")
    // the scan-level filter must carry the slice boundary itself — as the
    // raw ns long (TIMESTAMP(NANOS) fixtures) or the timestamp literal
    // (TIMESTAMP(MICROS)/NTZ fixtures); either way pruning happens at the
    // row-group level, not above the scan
    assert(p.contains("1704153600000000000") || p.contains("2024-01-02"),
      s"slice boundary missing from the pushed filter:\n$p")
  }

  test("q03: dimension joins broadcast") {
    assert(plan("q03_join_agg").contains("BroadcastHashJoin"))
  }

  test("q04/q05: semi and anti joins plan as such") {
    assert(plan("q04_semi_join").contains("LeftSemi"))
    assert(plan("q05_anti_join").contains("LeftAnti"))
  }

  test("q31: query side of the knn join broadcasts") {
    assert(plan("q31_knn_cosine").contains("BroadcastNestedLoopJoin") ||
      plan("q31_knn_cosine").contains("BroadcastHashJoin"))
  }

  test("IVF cell assignment is a pure map-side projection (no exchange)") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val cents = graft.operators.Similarity
      .centroidsOf(emb, "vec_id", "embedding", 4)
    val assigned = graft.operators.Similarity
      .assignCells(emb, "vec_id", "embedding", cents, 2, "query_id", "qv")
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"assignment plan shuffles:\n$p")
    assert(!p.contains("Window"), s"assignment plan windows:\n$p")
    // every row lands in nProbe cells
    assert(assigned.count() === emb.count() * 2)
  }

  test("native (large-nCells) cell assignment is also a pure map-side " +
      "projection: no exchange, no join, one graft_nearest_cells kernel " +
      "(VERDICT r13 #3)") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val cents = graft.operators.Similarity
      .centroidsOf(emb, "vec_id", "embedding",
        graft.operators.Similarity.LiteralCellMax + 22)
    val assigned = graft.operators.Similarity
      .assignCells(emb, "vec_id", "embedding", cents, 2, "query_id", "qv")
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"assignment plan shuffles:\n$p")
    assert(!p.contains("Window"), s"assignment plan windows:\n$p")
    assert(!p.contains("Join"), s"assignment plan joins:\n$p")
    assert(assigned.count() === emb.count() * 2)
  }

  test("m14 cross-hypothesis pair rule: hot keys prune via broadcast " +
      "anti-joins, the candidate join is a key equi-join (no cartesian), " +
      "and the census is persisted once (InMemoryRelation feeds every " +
      "read)") {
    implicit val sp = spark
    import graft.operators.Multimodal
    val media = Multimodal.syntheticMediaTable(spark, sf("sf0.001"),
      Some("wav"))
    val census = Multimodal.cachedCensus2(media)
    val pairs = Multimodal.audioLandmarkCrossPairs(
      census.select(col("media_id"), explode(col("keys_half")).as("k")),
      census.select(col("media_id"), explode(col("keys")).as("k")))
    val p = pairs.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") &&
      p.contains("LeftAnti"), s"hot-key prune must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidate join degenerated to a cross product:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"census not persisted:\n$p")
    pairs.write.format("noop").mode("overwrite").save()
    Multimodal.unpersistAll()
  }

  test("k-means distances compute in-row against broadcast centroids: " +
      "no shuffle keyed on point ids, and wide == long formulation") {
    import graft.operators.KMeans
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val pts = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val cents = KMeans.centroidsWide(
      KMeans.seedCentroids(emb, "vec_id", "embedding", 4))
    val dists = KMeans.distancesWide(pts, cents)
    val p = dists.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroids must broadcast:\n$p")
    // the only exchanges allowed are the k-row centroid assembly ones —
    // nothing in the distance computation may shuffle the points
    assert(!p.contains("Exchange hashpartitioning(id"),
      s"points side of the distance join shuffles:\n$p")
    // in-row scaled-floor fold == the long-format groupBy sum, bit-for-bit
    val long = KMeans.distances(
      KMeans.explodeVec(emb, "vec_id", "embedding"),
      KMeans.seedCentroids(emb, "vec_id", "embedding", 4))
    assert(dists.exceptAll(long).count() === 0)
    assert(long.exceptAll(dists).count() === 0)
  }

  test("ANN candidate dedup carries bare id pairs, not vector payloads") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val p = graft.operators.Similarity
      .lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3)
      .queryExecution.optimizedPlan.toString
    // the Deduplicate/Aggregate keys must be exactly the two id columns —
    // a distinct over qv/cv would list the vector attrs here
    val dedupLine = p.linesIterator
      .find(l => l.contains("Aggregate") || l.contains("Deduplicate"))
      .getOrElse("")
    assert(!dedupLine.contains("qv") && !dedupLine.contains("cv"),
      s"distinct carries vectors: $dedupLine")
  }

  test("m12 landmark pair plan: the hot-key cap broadcasts, no cartesian " +
      "product, and the key join carries bare (media_id, k) rows") {
    implicit val sp = spark
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val media = graft.operators.Multimodal.encodeMediaRows(
      docs.filter(col("doc_id") % 4 === 1))
    val keys = graft.operators.Multimodal.audioLandmarkKeys(media).toDF()
    val plan = graft.operators.Multimodal.audioLandmarkPairs(keys)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"pair rule went cartesian:\n${plan.take(2000)}")
    // the over-cap key set joins back broadcast (bounded by the key
    // space); the equality join on k is what scales
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"no broadcast anti-join for the df-cap:\n${plan.take(2000)}")
  }

  test("LSH bucketing is map-side only: no exchange below the candidate join") {
    // With literal hyperplanes, bucket assignment must be a pure projection;
    // the first exchange in the plan should be the join/distinct shuffle,
    // never an exchange feeding the bucket computation itself.
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val dim = graft.functions.VectorOps.dimOf(emb, "embedding")
    val bucketed = emb.select(col("vec_id"),
      graft.functions.VectorOps
        .hyperplaneBucket(col("embedding"), 8, 0, dim).as("bucket"))
    val p = bucketed.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"bucket assignment shuffles:\n$p")
    // plane values are literals: no hash expressions per row
    assert(!p.contains("xxhash64"), s"per-row plane hashing survived:\n$p")
  }

  test("q49: vocabulary build is one partial+final aggregation") {
    val p = plan("q49_vocab_stats")
    assert(p.contains("partial_count") || p.contains("partial_sum") ||
      p.contains("HashAggregate"), p)
  }

  test("q50: the corpus df side of the tf-idf join broadcasts") {
    assert(plan("q50_tfidf_terms").contains("BroadcastHashJoin"))
  }

  test("q57: k-means centroid side broadcasts; assignment is partial-agg") {
    val p = plan("q57_kmeans")
    assert(p.contains("BroadcastHashJoin"), s"centroids not broadcast:\n$p")
    // argmin is min(struct(...)) via partial+final agg; the only window in
    // the plan is the seed ranking, bounded to k rows by the preceding
    // TakeOrderedAndProject
    assert(p.contains("partial_min"), s"argmin not partial-aggregated:\n$p")
  }

  test("q59: bloom probe side broadcasts the filter table") {
    assert(plan("q59_bloom_filter").contains("BroadcastNestedLoopJoin") ||
      plan("q59_bloom_filter").contains("BroadcastHashJoin"))
  }

  test("q54: BM25 df/idf table broadcasts into the postings join") {
    assert(plan("q54_bm25_search").contains("BroadcastHashJoin"))
  }

  test("q76: the hot-passage set joins back broadcast") {
    assert(plan("q76_passage_dedup").contains("BroadcastHashJoin"))
  }

  test("q77: no single-partition window over the full corpus") {
    // distributedCumsum windows must be partitioned by __pid; the only
    // unpartitioned window is over the per-partition totals (rows =
    // nPartitions), which then re-enters the plan via a broadcast join
    val p = plan("q77_pack_chunks")
    assert(p.contains("windowspecdefinition(__pid"),
      s"full-data window is not __pid-partitioned:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"partition offsets do not broadcast:\n$p")
  }

  test("q80: the benchmark side of the decontamination join broadcasts") {
    assert(plan("q80_semantic_decontaminate")
      .contains("BroadcastNestedLoopJoin"))
  }

  test("q81: the post-merge word lengths broadcast into the encode join") {
    assert(plan("q81_bpe_encode").contains("BroadcastHashJoin"))
  }

  test("salted join equals plain join and spreads hot keys") {
    val hot = (1 to 1000).map(i => (1L, s"row$i")) ++ Seq((2L, "cold"))
    val large = hot.toDF("k", "payload")
    val small = Seq((1L, "dim1"), (2L, "dim2")).toDF("k", "dim")
    val plainCount = large.join(small, Seq("k")).count()
    val salted = SkewJoin.saltedEquiJoin(large, small, Seq("k"), nSalts = 8)
    assert(salted.count() === plainCount)
    assert(salted.columns.toSeq.sorted === Seq("dim", "k", "payload"))
  }

  test("connectedComponents sizes its shuffles explicitly, not via session " +
      "conf, and leaves the session conf untouched") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val labels = graft.operators.Dedup
      .connectedComponents(pairs, numPartitions = 3)
    // result frame carries the explicit partition count requested
    assert(labels.rdd.getNumPartitions === 3)
    assert(spark.conf.get(key) === before,
      "operator mutated spark.sql.shuffle.partitions")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a diameter-25 chain and refuses " +
      "silent truncation when maxIter is below the diameter") {
    // min-label propagation moves one hop per round, so a path graph of
    // diameter D needs ~D rounds — exercises the iteration loop far past
    // the fixture dup clusters' trivial 2-4 round regime (VERDICT r4 #4)
    val chain = (0L until 25L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = graft.operators.Dedup
      .connectedComponents(chain, maxIter = 30, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length === 26)
    assert(labels.forall(_._2 == 0L),
      "every chain node must collapse to the min id")

    // maxIter below the diameter: the operator must REFUSE (truncating
    // would silently split the component) with an actionable message
    val refused = intercept[IllegalArgumentException] {
      graft.operators.Dedup
        .connectedComponents(chain, maxIter = 5, numPartitions = 4)
        .collect()
    }
    assert(refused.getMessage.contains("did not converge"))
    assert(refused.getMessage.contains("raise maxIter"))
  }

  test("NgramLm scoring joins the model by broadcast, never sort-merge") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val model = graft.operators.NgramLm.train(
      docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
    val p = graft.operators.NgramLm
      .crossEntropy(model, docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"model join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"scoring sort-merge joins:\n$p")
  }

  test("NaiveBayes inference is one broadcast-only plan: class cross + " +
      "count-table hash join, no sort-merge") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val model = graft.operators.NaiveBayes.train(
      docs.filter(col("doc_id") % 3 =!= 0), "source", "text")
    val p = graft.operators.NaiveBayes
      .predict(model, docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"class constants must broadcast-cross:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"word-count join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"inference sort-merge joins:\n$p")
  }

  test("Drift.psiBins shuffles only on the bin key (histogram-bounded), " +
      "never on the value column") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val psi = graft.operators.Drift.psiBins(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "n_chars", 10)
    val exec = psi.queryExecution.executedPlan
    val p = exec.toString
    // Catalyst renders a groupBy on an aliased expression key as
    // `_groupingexpression#N`, so accept either spelling; the structural
    // guarantee is the same: the only hash exchanges are bin-keyed.
    assert(p.contains("Exchange hashpartitioning(bin") ||
      p.contains("Exchange hashpartitioning(_groupingexpression"),
      s"bin-keyed count aggregation missing:\n$p")
    assert(!p.contains("Exchange hashpartitioning(n_chars"),
      s"plan shuffles raw values:\n$p")
    assert(!p.contains("SortMergeJoin"), s"spine join sort-merges:\n$p")
    // refN/liveN must derive from the B-row bin frames, not extra count()
    // scans: the whole PSI plan reads each side exactly once
    val scans = "(?:FileScan|Scan) parquet".r.findAllIn(p).length
    assert(scans === 2, s"expected exactly 2 parquet scans, got $scans:\n$p")
  }

  test("Drift.psiCategories joins the bounded spine broadcast, never " +
      "sort-merge, and shuffles only distinct categories") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = graft.operators.Drift.psiCategories(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "lang", topB = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"top-set/spine joins not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"plan sort-merge joins:\n$p")
    // the top-B rank must plan as TakeOrderedAndProject (partial top-B per
    // partition), NOT a row_number() over a single-partition window — the
    // final psiFromCategoryCounts total window over the <= B+1-row spine is
    // the only window allowed in the plan (VERDICT r7 #4)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-B rank not TakeOrderedAndProject:\n$p")
    assert(!p.contains("row_number"), s"plan still ranks via row_number:\n$p")
  }

  test("SpanDedup's default flag plan is join-free (single gram pass); " +
      "the skewRobust plan is the one with the join") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val pw = graft.operators.SpanDedup
      .repeatedSpans(docs, "doc_id", "text", 30)
      .queryExecution.executedPlan.toString
    assert(!pw.contains("Join"), s"window-form plan joins:\n$pw")
    assert(pw.contains("Window"), s"window-form plan has no window:\n$pw")
    val pr = graft.operators.SpanDedup
      .repeatedSpans(docs, "doc_id", "text", 30, skewRobust = true)
      .queryExecution.executedPlan.toString
    assert(pr.contains("Join"), s"skewRobust plan must join flags back:\n$pr")
  }

  test("default Winnow plan is MAP-SIDE (no shuffle, no window before " +
      "the sketch); the relational form keeps its partitioned window") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    // default: codegen'd WinnowSketch expression — scan -> (round-robin
    // doc spread) -> project -> explode. No window, and the only exchange
    // allowed is the cheap PRE-sketch round-robin of document rows; a
    // gram-keyed hashpartitioning would mean the selection got distributed
    val p = graft.operators.Winnow
      .fingerprints(docs, "doc_id", "text", k = 20, w = 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      s"map-side winnow plan shuffles on a key:\n$p")
    assert(!p.contains("Window"), s"map-side winnow plan windows:\n$p")
    assert(p.contains("Generate"), s"no explode in the winnow plan:\n$p")
    // relational fallback (giant single documents): exactly the one
    // selection window, partitioned by the doc id — an unpartitioned
    // window would funnel the whole gram explosion through one task
    val pr = graft.operators.Winnow
      .fingerprintsRelational(docs, "doc_id", "text", k = 20, w = 8)
      .queryExecution.executedPlan.toString
    assert(pr.contains("Window"), s"no window in the relational plan:\n$pr")
    assert(!pr.contains("Window [")
      || pr.contains("windowspecdefinition(id"),
      s"relational winnow window not partitioned by id:\n$pr")
    assert(pr.contains("HashAggregate(keys=[id"),
      s"relational sketch distinct not keyed on (id, pos, h):\n$pr")
  }

  test("Winnow spread is an explicit parameter: the pre-sketch round-robin " +
      "exchange appears only when asked, never from an .rdd probe " +
      "(VERDICT r8 #6)") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val pOn = graft.operators.Winnow
      .fingerprints(docs, "doc_id", "text", k = 20, w = 8)
      .queryExecution.executedPlan.toString
    assert(pOn.toLowerCase.contains("roundrobin"),
      s"spread=true (default) must round-robin the doc rows:\n$pOn")
    val pOff = graft.operators.Winnow
      .fingerprints(docs, "doc_id", "text", k = 20, w = 8, spread = false)
      .queryExecution.executedPlan.toString
    assert(!pOff.contains("Exchange"),
      s"spread=false must leave the input partitioning untouched:\n$pOff")
    // both plans produce identical sketches
    val a = graft.operators.Winnow
      .fingerprints(docs, "doc_id", "text", k = 20, w = 8)
    val b = graft.operators.Winnow
      .fingerprints(docs, "doc_id", "text", k = 20, w = 8, spread = false)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("spread is size-gated on plan statistics: a large input stays " +
      "untouched even at the default (no repartition-DOWN of wide scans)") {
    import graft.operators.Spread
    // spark.range stats = 8 bytes/row -> ~1.6 GB estimated, over the cap;
    // nothing materializes — the decision reads LOGICAL stats only
    val big = spark.range(200000000L).toDF("doc_id")
    assert(Spread(big, spread = true).queryExecution.executedPlan
      .toString.indexOf("Exchange") < 0)
    val small = spark.range(10L).toDF("doc_id")
    assert(Spread(small, spread = true).queryExecution.executedPlan
      .toString.toLowerCase.contains("roundrobin"))
    assert(Spread(big, spread = false) eq big)
  }

  test("q113: the hard-negative band filter sits BELOW the rank window " +
      "(out-of-band pairs never reach the exchange) and queries broadcast") {
    val p = plan("q113_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"queries side must broadcast:\n$p")
    // plans print top-down: the Window is above (earlier than) the band
    // predicate, so the filter runs on the scan side of the rank shuffle
    val iWin = p.indexOf("Window")
    val iBand = p.indexOf("0.35")
    assert(iWin >= 0 && iBand > iWin,
      s"band filter must be below the rank window:\n$p")
  }

  test("q112: the UniMax token count partially aggregates; the window " +
      "runs over the per-source frame only") {
    val p = plan("q112_unimax_alloc")
    assert(p.contains("partial_sum"),
      s"token counting must map-side combine:\n$p")
    // the unpartitioned windows sit ABOVE the per-source aggregate (the
    // bounded frame), never over raw documents: top-down print order puts
    // Window before the HashAggregate pair that builds the source counts
    val iWin = p.indexOf("Window")
    val iAgg = p.indexOf("HashAggregate")
    assert(iWin >= 0 && iAgg >= 0 && iWin < iAgg,
      s"window must consume the aggregated per-source frame:\n$p")
  }

  test("q116/q117: influence scoring is map-side — every model frame " +
      "joins broadcast, the top-k never globally sorts") {
    Seq("q116_rho_learnability", "q117_tracin_influence").foreach { n =>
      val p = plan(n)
      assert(!p.contains("SortMergeJoin"),
        s"$n shuffles a scoring join:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"$n must broadcast the one-row model/gradient frames:\n$p")
      assert(p.contains("TakeOrderedAndProject"),
        s"$n top-20 must be a per-partition heap, not a global sort:\n$p")
    }
  }

  test("q118: all per-iteration weight frames broadcast and the " +
      "forgetting histogram partially aggregates") {
    val p = plan("q118_forgetting_events")
    assert(!p.contains("SortMergeJoin"),
      s"weight-frame joins must not shuffle:\n$p")
    assert(p.contains("partial_count"),
      s"histogram must map-side combine:\n$p")
  }

  test("q119: the whole trajectory rides one broadcast frame and the " +
      "ambiguity top-k is a per-partition heap") {
    val p = plan("q119_dataset_cartography")
    assert(!p.contains("SortMergeJoin"),
      s"trajectory scoring must not shuffle:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the wide weight frame must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a per-partition heap, not a global sort:\n$p")
  }

  test("q120: per-domain losses partially aggregate; the softmax total " +
      "is one windowed pass, not a re-join that replays both fits") {
    val p = plan("q120_doremi_weights")
    assert(!p.contains("SortMergeJoin"),
      s"model joins must not shuffle:\n$p")
    assert(p.contains("partial_count"),
      s"domain losses must map-side combine:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the one-row model frames must broadcast:\n$p")
    assert(p.contains("Window"),
      s"the softmax total must ride the bounded-frame window:\n$p")
    // the domain groupBy shuffles exactly once: an agg + re-join for the
    // softmax total would duplicate the whole two-fit lineage
    val spine = "hashpartitioning\\(domain".r.findAllIn(p).size
    assert(spine <= 1, s"domain spine evaluated $spine times:\n$p")
  }

  test("q121: hardness rank + keep-cut ride per-cluster windows and the " +
      "audit table partially aggregates; no joins shuffle") {
    val p = plan("q121_prototype_pruning")
    assert(!p.contains("SortMergeJoin"),
      s"centroid joins must broadcast, not shuffle:\n$p")
    assert(p.contains("Window"),
      s"the rank/count must be per-cluster windows:\n$p")
    assert(p.contains("partial_count"),
      s"the audit table must map-side combine:\n$p")
  }

  test("q122: one persisted k-means fit serves the dedup self-join, the " +
      "survivor ranking, and the size spine") {
    val p = plan("q122_d4_pipeline")
    assert(p.contains("InMemoryTableScan"),
      s"the assignment must be persisted and reused, not refit per stage:\n$p")
    assert(p.contains("Window"),
      s"the survivor rank/count must be per-cluster windows:\n$p")
    assert(p.contains("partial_count"),
      s"the audit table must map-side combine:\n$p")
  }

  test("q123: canonicalization is map-side and the domain cap rides the " +
      "bounded heap — no rank window, no sort-merge join anywhere") {
    val p = plan("q123_url_domain_cap")
    assert(!p.contains("Window"),
      s"the domain cap must not sort a per-domain window (giant-host " +
        s"skew):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the one-row audit joins must broadcast:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"the bounded min-k heap must aggregate, not window:\n$p")
  }

  test("m06: one persisted hash table serves banding, both verify joins, " +
      "and the output spine; verify is the codegen'd bit_count") {
    val p = plan("m06_image_phash_dedup")
    assert(p.contains("InMemoryTableScan"),
      s"the pHash frame must be persisted, not re-decoded per consumer:\n$p")
    assert(p.contains("bit_count"),
      s"Hamming verify must be the native bit_count, not a UDF:\n$p")
    // VERDICT r10 #2: bucket capping is groupBy-count + broadcast
    // anti-join — the giant bucket must never serialize through one
    // window task before being dropped
    assert(!p.contains("Window"),
      s"candidate generation must not window over the bucket key:\n$p")
  }

  test("m06b: the mass-dup collapse is aggregation-shaped end to end — " +
      "no window anywhere, clique roots partially aggregate") {
    val p = plan("m06b_image_phash_massdup")
    assert(!p.contains("Window"),
      s"over-cap buckets (the mass duplicates) must be counted by " +
        s"groupBy, not a window over the hottest key:\n$p")
    assert(p.contains("partial_min"),
      s"clique roots must map-side combine (one key per clique, " +
        s"no pair enumeration):\n$p")
  }

  test("m08: one persisted fingerprint table serves banding and both " +
      "verify joins; verify is codegen'd bit_count; no window in " +
      "candidate generation") {
    val p = plan("m08_audio_fp_dedup")
    assert(p.contains("InMemoryTableScan"),
      s"the fingerprint frame must be persisted, not re-decoded per " +
        s"consumer:\n$p")
    assert(p.contains("bit_count"),
      s"Hamming verify must be the native bit_count, not a UDF:\n$p")
    assert(!p.contains("Window"),
      s"bucket capping must aggregate, not window over the bucket key:\n$p")
  }

  test("q126: anchor capping and both text joins broadcast; the verify " +
      "is the codegen'd thresholded levenshtein; no window, no " +
      "sort-merge join") {
    val p = plan("q126_edit_distance_dedup")
    assert(!p.contains("Window"),
      s"anchor capping must aggregate, not window over the bucket key:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the cap anti-join and text joins must broadcast:\n$p")
    assert(p.contains("levenshtein") && p.contains("Some(8)"),
      s"the verify must be the native THRESHOLDED levenshtein (banded " +
        s"O(len*k) DP, not the full O(len^2)):\n$p")
    assert(p.contains("LeftAnti"),
      s"over-cap anchors must drop via broadcast anti-join:\n$p")
  }

  test("q126b: the positional (PassJoin) variant keeps q126's shape — " +
      "window anchors explode map-side, cap anti-joins broadcast, " +
      "thresholded levenshtein verify, no window, no sort-merge join") {
    val p = plan("q126b_edit_distance_indel")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"the indel-proof anchors must not change the join discipline:\n$p")
    assert(p.contains("levenshtein") && p.contains("Some(8)"),
      s"the verify must stay the thresholded banded DP:\n$p")
    assert(p.contains("LeftAnti"),
      s"over-cap anchors must drop via broadcast anti-join:\n$p")
  }

  test("q126c: the full-radius recall grade keeps the anchor discipline " +
      "(aggregation df-cap via broadcast anti-join, thresholded " +
      "levenshtein, no window) and its exhaustive truth side is the " +
      "length-filtered broadcast loop, not a shuffled cross join") {
    val p = plan("q126c_edit_distance_recall")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"no window / sort-merge join anywhere in the grade:\n$p")
    assert(p.contains("levenshtein") && p.contains("Some(8)"),
      s"both sides must verify with the thresholded banded DP:\n$p")
    assert(p.contains("LeftAnti"),
      s"over-cap anchors must drop via broadcast anti-join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the exhaustive truth must be a broadcast loop at grading scale:\n$p")
  }

  test("q130: the merged clustering consumes the RELOADED cluster " +
      "artifact; the touched-root set and delta probes ride broadcast " +
      "joins (delta-sized), never a window or corpus-wide sort-merge") {
    val p = plan("q130_cluster_artifact_merge")
    assert(p.contains("graft_cluster_art_"),
      s"the merge must read the persisted artifact, not recompute:\n$p")
    assert(p.contains("LeftAnti"),
      s"untouched rows must carry over via broadcast anti-join:\n$p")
    assert(!p.contains("Window"),
      s"nothing here needs a window:\n$p")
  }

  test("q131: the emitted frame is the RELOADED axes artifact alone — " +
      "no embedding scan below the consumer (the k Gram chains ran at " +
      "build time, the artifact IS the model)") {
    val p = plan("q131_pca_axes_artifact")
    assert(p.contains("graft_pca_axes_"),
      s"the output must read the persisted artifact:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"the consume side must not re-run the Gram chains:\n$p")
  }

  test("m11: the intake probes the RELOADED media band-Bloom via a " +
      "broadcast one-row join — no corpus re-decode, no shuffle beyond " +
      "the probe") {
    val p = plan("m11_media_index_merge")
    assert(p.contains("graft_media_idx_"),
      s"the probe must read the persisted artifact:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"the one-row filter frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"no corpus-wide shuffle may appear on the probe side:\n$p")
  }

  test("w24: the per-component PSI tail joins the 30-row spine with " +
      "broadcast joins; the only window is the per-component totals " +
      "window over 30 post-aggregation rows (the reloaded axis cells " +
      "are literals, so no artifact or embedding rescans ride the tail)") {
    val p = plan("w24_stream_spectral_drift")
    assert(!p.contains("SortMergeJoin"),
      s"spine joins over 30 rows must broadcast:\n$p")
    assert(p.contains("Window"),
      s"the per-component totals window must partition by component:\n$p")
  }

  test("q132: the probe consumes the RELOADED inverted file (never " +
      "re-assigns the corpus), query-cell assignment is a map-side " +
      "projection of the broadcast model literal, and the only window " +
      "is the final per-query top-k rank") {
    val p = plan("q132_ann_index_artifact")
    assert(p.contains("graft_ivf_inv_"),
      s"the probe must read the persisted inverted file:\n$p")
    assert(p.sliding("Window [".length).count(_ == "Window [") == 1,
      s"exactly one window exec node (the top-k rank) may appear:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"nothing here may cross-join:\n$p")
  }

  test("q127: each corpus collapses to its KMV sketch via a partial-" +
      "aggregable ObjectHashAggregate; the pair matrix is a broadcast " +
      "loop over one-row-per-corpus sketches — no shingle-level join, " +
      "no window") {
    val p = plan("q127_corpus_overlap_sketch")
    assert(p.contains("boundedminkdistinctlong"),
      s"the sketch must be the bounded KMV aggregator:\n$p")
    assert(p.contains("partial_boundedminkdistinctlong"),
      s"the sketch must partially aggregate (map-side <=k longs per " +
        s"corpus per partition):\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the pairwise matrix must be a broadcast loop over the tiny " +
        s"sketch frame:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"no shingle-level join or window may appear:\n$p")
  }

  test("m10: the persisted hash table feeds candidates and verify; the " +
      "tiny pair set broadcasts through every caption join — no window, " +
      "no sort-merge join, native bit_count verify") {
    val p = plan("m10_crossmodal_caption_audit")
    assert(p.contains("InMemoryTableScan"),
      s"the pHash frame must be persisted, not re-decoded per consumer:\n$p")
    assert(p.contains("bit_count"),
      s"Hamming verify must be the native bit_count:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"the near-dup pair set is bounded small and must broadcast " +
        s"through the shingle/set-size joins (sz is corpus-sized at " +
        s"scale):\n$p")
  }

  test("q127b: the reloaded artifact drives the matrix — a parquet scan " +
      "of the sketch table feeds the broadcast pair loop; no shingle " +
      "re-pass on the consume side, no window") {
    val p = plan("q127b_overlap_sketch_artifact")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the pairwise matrix must be a broadcast loop over the reloaded " +
        s"sketch frame:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"consuming the artifact must not re-aggregate or window:\n$p")
    // the consume-side plan reads the artifact, not the corpus: exactly
    // one parquet location and it is the sketch table
    assert(p.contains("graft_overlap_sketch_"),
      s"the matrix must compute from the RELOADED artifact:\n$p")
    assert(!p.contains("documents.parquet"),
      s"the consume side must not re-shingle the corpus:\n$p")
  }

  test("q128: each power iteration is one partial+final decimal " +
      "aggregation over the embedding scan — no join, no window, no " +
      "shuffle beyond the 64-sum combine") {
    // the per-iteration aggregation plan AS SHIPPED: Pca.gramAggregate is
    // the frame powerIterates/powerIteratesDeflated actually execute
    // (ADVICE r11 — an inline rebuild here would not fail if a refactor
    // reverted the operator to the fused dim x dim-term form)
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val e0 = Array.tabulate(64)(j => if (j == 0) 1.0 else 0.0)
    val p = graft.operators.Pca.gramAggregate(emb, "embedding", 64, e0)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"),
      s"the 64 decimal sums must map-side combine:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"one aggregation, nothing else:\n$p")
  }

  test("q131: the k-component fit aggregates over ONE persisted " +
      "projection — each Gram pass reads the in-memory columnar frame, " +
      "not a fresh parquet decode (r14 optimization)") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val proj = graft.operators.Pca.projection(emb, "embedding", 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val e0 = Array.tabulate(64)(j => if (j == 0) 1.0 else 0.0)
      val p = graft.operators.Pca
        .gramAggregateProjected(proj, 64, e0)
        .queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"),
        s"a Gram pass over the persisted projection must read the " +
          s"cache, not re-scan parquet:\n$p")
      assert(p.contains("partial_sum") && !p.contains("Join"),
        s"still one partial+final aggregation:\n$p")
      // the iterate rides the plan as ONE array literal (a codegen
      // reference object), so the generated SOURCE — and the compiled
      // class, via the codegen cache — is identical across iterations;
      // 64 scalar literals would recompile whole-stage codegen per pass
      val v1 = Array.tabulate(64)(j => j / 64.0)
      def gen(cur: Array[Double]): String =
        org.apache.spark.sql.execution.debug.codegenString(
          graft.operators.Pca.gramAggregateProjected(proj, 64, cur)
            .queryExecution.executedPlan)
      assert(gen(e0) == gen(v1),
        "two iterations must generate byte-identical codegen source " +
          "(the iterate must ride as a reference object, not inline " +
          "literals)")
    } finally proj.unpersist(blocking = false)
  }

  test("q125: the merged index rides broadcast one-row joins — no " +
      "sort-merge join, no window, and the bitmap OR is a zip_with " +
      "expression, not an aggregation over re-exploded positions") {
    val p = plan("q125_dedup_index_merge")
    assert(!p.contains("SortMergeJoin"),
      s"one-row index frames must broadcast:\n$p")
    assert(!p.contains("Window"), s"nothing here needs a window:\n$p")
    assert(p.contains("zip_with"),
      s"the merge must be the O(m) word-wise OR expression:\n$p")
  }

  test("survivorsAuto gate path with knownN/knownDim schedules ZERO jobs " +
      "before the terminal action (VERDICT r9 #1)") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    emb.schema // force relation resolution outside the counted region
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    org.apache.spark.graft.ListenerBusHatch.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = graft.operators.SemDedup.survivorsAuto(emb, "vec_id",
        "embedding", targetClusterSize = 50, iters = 2, minCosine = 0.45,
        maxExactK = 1, knownN = Some(500L), knownDim = Some(64))
      df.queryExecution.executedPlan // plan fully, still no action
      org.apache.spark.graft.ListenerBusHatch.drain(spark.sparkContext)
      assert(jobs.get === 0,
        s"gate path ran ${jobs.get} eager jobs before the action")
      assert(df.count() > 0) // and the lazy plan is actually runnable
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("kCenterGreedy rounds are shuffle-free: every job is one stage") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        stages.addAndGet(js.stageInfos.size)
      }
    }
    org.apache.spark.graft.ListenerBusHatch.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      graft.operators.Coreset.kCenterGreedy(emb, "vec_id", "embedding", 6)
        .collect()
      spark.range(1).collect() // barrier: flush listener events
      val deadline = System.currentTimeMillis + 10000
      while (jobs.get < 1 && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      // 6 selection jobs (1 seed + 5 picks) + the barrier; a shuffle
      // anywhere in a round would make stages > jobs
      assert(jobs.get >= 6, s"expected >= 6 jobs, saw ${jobs.get}")
      assert(stages.get === jobs.get,
        s"every round must be a single stage (no shuffle): " +
          s"${stages.get} stages over ${jobs.get} jobs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
