package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Document deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Designed for the 100 TB training-data pipeline case:
  *  - exact dedup is a single hash-groupBy (map-side combine, one shuffle);
  *  - MinHash/LSH and SimHash banding turn the O(n^2) pair problem into a
  *    shuffle on (band, bucket) keys so only candidate pairs are compared;
  *  - n-gram Jaccard verification joins only candidate pairs (or, in the
  *    exhaustive variant used for oracle checks, the shingle-inverted index).
  *
  * Everything is hash-deterministic (xxhash64 with fixed seeds via literal
  * prefixes) so results are reproducible across runs and cluster sizes.
  */
object Dedup {
  /** Exact duplicate groups by normalized-text fingerprint.
    * Output: fingerprint, n_dups, doc_ids (sorted) for groups with >1 doc.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_dups"),
        sort_array(collect_list(col(idCol))).as("doc_ids"))
      .filter(col("n_dups") > 1)

  /** Inverted-index n-gram Jaccard: exhaustively computes Jaccard similarity
    * for every pair of documents sharing at least one k-shingle.
    *
    * Plan shape: explode distinct shingles -> self-join on shingle (shuffle
    * on shingle hash) -> count shared shingles per pair -> join per-doc set
    * sizes -> jaccard = shared / (|A| + |B| - shared).
    *
    * Exact but O(sum of per-shingle doc-frequency^2): at 100 TB use
    * [[minHashCandidates]] first and verify only candidates. Hot shingles
    * are the skew risk — callers can cap doc-frequency via `maxDf`.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, k: Int,
      minJaccard: Double, maxDf: Int = 1000): DataFrame = {
    // Distinct shingle sets via explode + DISTINCT (codegen'd hash
    // aggregate) — array_distinct on the array cell is an interpreted
    // O(n^2) higher-order function. Join key is the 64-bit shingle hash:
    // 8-byte shuffle keys, long compares (collision probability
    // ~ |shingles|^2 / 2^64 — negligible).
    val inv0 = docs.select(col(idCol).as("doc_id"),
        explode(TextOps.shingles(col(textCol), k)).as("s"))
      .distinct()
    val sizes = inv0.groupBy("doc_id").agg(count(lit(1)).as("set_size"))
    val inv = inv0.select(col("doc_id"), xxhash64(col("s")).as("shingle"))
    // df cap: drop degenerate ubiquitous shingles (stopword-only n-grams)
    // persist: both self-join sides read this (exchange reuse does not fire
    // across them); ~(doc, shingle-hash) pairs only
    val capped = inv
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("df") <= maxDf)
      .drop("df")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = capped.as("a")
      .join(capped.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("set_size", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("set_size", "size_b"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("size_a") + col("size_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "shared", "size_a", "size_b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine >=
    * `minCosine`. Exact all-pairs formulation (the oracle-checkable
    * baseline); at 100 TB, bucket first with
    * [[graft.operators.Similarity.lshTopK]] hyperplane-LSH and verify only
    * same-bucket candidates — the per-row vector math is identical.
    */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    // Block-nested-loop with a broadcast corpus: each task streams its rows
    // against the broadcast matrix in primitive-array loops (n^2*d/2 fused
    // multiply-adds, no per-pair row materialization). This is what a
    // broadcast nested-loop join does, minus 2M tiny row objects — ~100x
    // faster than a join + per-pair vector expression at this shape.
    // The exact variant requires the corpus to fit in a broadcast
    // (~1e6 x 64 floats = 256 MB); beyond that, exact all-pairs is not a
    // thing at any engine — use Similarity.lshTopK / ivfTopK candidates and
    // verify those.
    // Dot/norm accumulate left-to-right in double: bit-identical to
    // VectorOps.cosine and the DuckDB oracle.
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val corpus: Array[(Long, Array[Double], Double)] = rows.collect()
      .map { case (id, v) =>
        val d = new Array[Double](v.length)
        var i = 0; var acc = 0.0
        while (i < v.length) { d(i) = v(i).toDouble; acc += d(i) * d(i); i += 1 }
        (id, d, math.sqrt(acc))
      }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    rows.mapPartitions { it =>
      val c = bc.value
      it.flatMap { case (idA, va) =>
        val a = new Array[Double](va.length)
        var i = 0; var accA = 0.0
        while (i < va.length) { a(i) = va(i).toDouble; accA += a(i) * a(i); i += 1 }
        val na = math.sqrt(accA)
        c.iterator.filter(_._1 > idA).flatMap { case (idB, b, nb) =>
          var acc = 0.0; var j = 0
          while (j < a.length) { acc += a(j) * b(j); j += 1 }
          val cos = acc / (na * nb)
          if (cos >= minCosine) Some((idA, idB, cos)) else None
        }
      }
    }.toDF("id_a", "id_b", "cosine")
  }

  /** splitmix64 finalizer — deterministic per-index 64-bit constants for the
    * XOR min-hash family.
    */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature from a pre-hashed `array<long>` shingle column: hash
    * function i is `h XOR c_i` (XOR with a fixed constant is a bijection of
    * the 64-bit key space, so each is a valid min-wise permutation). The
    * base xxhash64 of each shingle is computed ONCE; the per-function work
    * is a single long XOR — 64 signature functions cost 64 array passes of
    * long ops, not 64 string hashings.
    */
  def minHashSignatureFromHashes(shingleHashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleHashes, h => h.bitwiseXOR(lit(splitmix64(i.toLong)))))
    }: _*)

  /** MinHash signature from a shingle-string set (convenience). */
  def minHashSignature(shingleSet: Column, numHashes: Int): Column =
    minHashSignatureFromHashes(transform(shingleSet, s => xxhash64(s)), numHashes)

  /** MinHash + LSH banding candidate pairs.
    *
    * Signature of `bands * rowsPerBand` min-hashes; documents agreeing on all
    * rows of any band become a candidate pair. One shuffle on
    * (band, band-hash); within-bucket pairing is quadratic per bucket, which
    * LSH keeps tiny for non-duplicate data.
    *
    * Output: id_a < id_b, n_bands (how many bands collided), est_jaccard
    * (signature agreement fraction — the unbiased MinHash Jaccard estimate).
    */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Signature via explode + 64 codegen'd MIN aggregates (map-side combine,
    // one shuffle on doc_id). Spark's higher-order array functions are
    // interpreted (no codegen), so an array-transform formulation is ~10x
    // slower; hash-aggregate columns keep the whole pipeline in
    // WholeStageCodegen. The groupBy exchange is also reused by both sides
    // of the band self-join (ReuseExchange).
    // raw shingles (duplicates included): MIN is idempotent, so the
    // interpreted array_distinct pass is unnecessary
    val shingleHashes = docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.shingles(col(textCol), k)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val sigs = shingleHashes
      .groupBy("doc_id")
      .agg(min(col("h").bitwiseXOR(lit(splitmix64(0L)))).as("m0"),
        (1 until numHashes).map(i =>
          min(col("h").bitwiseXOR(lit(splitmix64(i.toLong)))).as(s"m$i")): _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    // persist: exchange reuse does not fire across the self-join sides, so
    // without it the scan+shingle+64-min-agg pipeline runs TWICE. The banded
    // signature table is tiny (docs x bands rows of one long signature) and
    // is exactly what a production LSH pipeline would materialize.
    val banded = capBuckets(sigs.select(
      col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket")),
      "bucket", maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_bands"),
        first(col("a.sig")).as("sig_a"), first(col("b.sig")).as("sig_b"))
    cand.withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") / numHashes, 6))
      .select("id_a", "id_b", "n_bands", "est_jaccard")
  }

  /** 64-bit SimHash from a pre-computed `array<long>` of token hashes:
    * per-bit majority vote (ties -> 0). Shifts are Scala-literal so the whole
    * thing is a pure codegen'd expression tree (no UDF, no shuffle).
    */
  def simHashFromHashes(hashes: Column): Column =
    (0 until 64).map { b =>
      val mask = lit(1L << b)
      val votes = aggregate(hashes, lit(0), (acc, h) =>
        acc + when(h.bitwiseAND(mask) =!= 0L, 1).otherwise(-1))
      when(votes > 0, mask).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** 64-bit SimHash over whitespace tokens of a text column. */
  def simHash(textCol: Column): Column =
    simHashFromHashes(transform(TextOps.words(textCol), w => xxhash64(w)))

  /** SimHash near-dup candidates: band the 64-bit simhash into 4 x 16-bit
    * chunks (any chunk equality -> candidate, guaranteeing recall for
    * Hamming distance <= 3), then verify with exact Hamming distance.
    */
  /** Skew guard shared by the LSH variants: drop buckets larger than
    * `maxBucket` members per band. Oversized buckets are non-discriminative
    * (they pair near-everything with near-everything) and are the quadratic
    * blowup risk at scale; dropping them trades recall for a hard bound on
    * join fan-out. One window shuffle on the bucket key.
    */
  private def capBuckets(banded: DataFrame, bucketCol: String,
      maxBucket: Int): DataFrame =
    banded
      .withColumn("__bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", bucketCol)))
      .filter(col("__bsize") <= maxBucket)
      .drop("__bsize")

  def simHashCandidates(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 200): DataFrame = {
    // Bit votes via explode + 64 codegen'd SUM aggregates (same rationale as
    // minHashCandidates: HOF array aggregation is interpreted and ~10x
    // slower; conditional sums stay in WholeStageCodegen with map-side
    // combine).
    val tokenHashes = docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.words(col(textCol))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val votes = tokenHashes
      .groupBy("doc_id")
      .agg(sum(when(col("h").bitwiseAND(lit(1L << 0)) =!= 0L, 1).otherwise(-1)).as("v0"),
        (1 until 64).map(b =>
          sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1))
            .as(s"v$b")): _*)
    val hashed = votes.select(col("doc_id"),
      (0 until 64).map { b =>
        when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_)).as("simhash"))
    val banded = capBuckets(hashed.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("chunk"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.chunk")),
      "chunk", maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // popcount of the XOR — bit_count is a codegen'd Catalyst builtin
    val hamming = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming.as("hamming"))
      .filter(col("hamming") <= maxHamming) // filter BEFORE the distinct shuffle
      .distinct()
  }
}
