package graft.queries

import scala.collection.immutable.ListMap


/** LLM-training-data-pipeline operator inventory: deduplication (exact,
  * n-gram Jaccard, MinHash+LSH, SimHash), similarity search (brute-force and
  * LSH ANN), and text analysis (quality scores, token counts, language ID,
  * fingerprints) over the `documents` / `embeddings` fixtures.
  *
  * Every hash-defined operator (MinHash, SimHash, hyperplane LSH, IVF)
  * uses a PORTABLE hash family — md5-derived 48-bit integers, Carter–Wegman
  * universal hashing mod 2^31-1, md5-seeded hyperplane literals — so the
  * full pipelines are replicated in DuckDB oracle SQL and hash-checked
  * cell-for-cell, INCLUDING the q45 recall grade (both its exact
  * denominators and its LSH numerators are hash-family-deterministic).
  * The one sketch whose internals no portable SQL can recompute (HLL,
  * q43) is compared on its exact column plus bounded-error flags.
  */
object LlmQueries {
  val defs: ListMap[String, QueryDef] =
    LlmDedupQueries.defs ++ LlmVectorQueries.defs ++ LlmTextQueries.defs ++
      LlmSamplingQueries.defs ++ LlmEvalQueries.defs ++
      LlmSelectionQueries.defs
}
