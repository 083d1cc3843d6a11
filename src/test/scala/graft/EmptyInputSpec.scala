package graft

import org.apache.spark.sql.functions._

/** Empty-input robustness: a real pipeline constantly sees empty inputs
  * (an empty date partition, a filter that matches nothing, a fresh
  * corpus), and this is exactly the class of failure the DuckDB oracle
  * can't catch — both engines only ever ran the populated fixtures.
  * Every query here must return an EMPTY (or total-row-only) result
  * without throwing, never NaN/divide-by-zero surprises or a driver-side
  * head() on a missing row.
  */
class EmptyInputSpec extends SparkSpec {

  // an empty mirror of the fixture lake: same schemas, zero rows
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    // events is TIMESTAMP(NANOS); read it as raw longs like Tables.load does
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      // keep events' raw nanos column: limit(0) BEFORE Tables.load's
      // timestamp conversion so the empty lake has the on-disk schema
      spark.read.parquet(Tables.path(sf("sf0.001"), t)).limit(0)
        .write.mode("overwrite").parquet(Tables.path(dir, t))
    }
    dir
  }

  // one representative per operator family; streaming queries excluded
  // (file streams over an empty dir are a different wait-semantics test)
  private val names = Seq(
    "q01_pricing_summary",   // agg
    "q07_topk_per_group",    // window
    "q18_asof_join",         // as-of
    "q23_dedup_exact",       // exact dedup
    "q25_jaccard_pairs",     // candidates + verify
    "q26_minhash_lsh",       // LSH banding
    "q31_knn_cosine",        // similarity join
    "q36_equalize_groups",   // min-broadcast equalization
    "q42_embedding_dedup",   // size-gated exact/LSH routing (count() == 0)
    "q51_hash_split",        // sampling
    "q61_char_entropy",      // per-doc explode + entropy
    "q70_bpe_merges",        // iterative fit (argmax over empty table)
    "q76_passage_dedup",     // passage explode + hot-set join
    "q77_pack_chunks",       // distributed prefix sum
    "q78_mixture_weights",   // temperature weights (log over no groups)
    "q79_canonical_docs",    // connected components + ranking
    "q82_boilerplate_strip", // rewrite + reassembly
    "q83_epoch_shuffle")     // per-epoch shuffle + batch cut

  names.foreach { name =>
    test(s"$name completes on empty inputs") {
      val rows = SparkEntry.queries(name)(spark, emptyDir).collect()
      name match {
        // BPE fit reports its round-0 base state even for an empty corpus
        // (pair "<base>", zero totals) — a sensible "fitted on nothing"
        // summary rather than a crash or a silent empty
        case "q70_bpe_merges" =>
          assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(3)))
            .toSeq === Seq((0, "<base>", 0L)))
        case _ => assert(rows.isEmpty, s"$name: ${rows.take(3).toSeq}")
      }
      graft.operators.Dedup.unpersistAll()
      graft.operators.Windowed.unpersistAll()
    }
  }
}
