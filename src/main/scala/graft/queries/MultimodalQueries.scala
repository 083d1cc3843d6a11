package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}

/** Multimodal-column inventory: binary payload plumbing + batched
  * decode/feature-extraction (stub kernels — see
  * [[graft.operators.Multimodal]]). m01's byte accounting is SQL-expressible
  * (UTF-8 octet length), so the binary plumbing gets a real oracle; the
  * feature pipeline itself is rows-only.
  */
object MultimodalQueries {

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- binary columns + typed metadata, oracle on byte accounting ----
    "m01_media_inventory" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        val media = Multimodal.syntheticMediaTable(s, dir)
        Multimodal.extractFeatures(media).toDF()
          .groupBy("format")
          .agg(count(lit(1)).as("n_media"),
            sum(col("n_bytes")).as("total_bytes"),
            max(col("n_bytes")).as("max_bytes"))
          .orderBy("format")
      },
      Some("""SELECT
        CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
             WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format,
        COUNT(*) AS n_media,
        CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        CAST(MAX(octet_length(encode(text))) AS INT) AS max_bytes
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // ---- batched feature extraction + ANN over media features ----------
    "m02_media_knn" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        val media = Multimodal.syntheticMediaTable(s, dir)
        val feats = Multimodal.extractFeatures(media).toDF()
          .select(col("media_id").as("vec_id"), col("features").as("embedding"))
        Similarity.bruteForceTopK(feats,
            feats.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
          .withColumn("cosine", round(col("cosine"), 4))
          .orderBy("query_id", "rank")
      },
      // The stub features are deterministic byte math (16-bin high-nibble
      // histogram of the UTF-8 payload, L1-normalized in float32) — fully
      // SQL-expressible: the high nibble of byte i is hex char 2i+1 of
      // hex(encode(text)).
      Some("""WITH h AS (SELECT doc_id,
          octet_length(encode(text)) AS n, hex(encode(text)) AS hx
          FROM documents),
        e AS (SELECT doc_id, n,
          CAST(unnest(range(n)) AS INT) AS i, hx FROM h),
        cnt AS (SELECT doc_id, n,
          strpos('0123456789ABCDEF', substring(hx, 2*i + 1, 1)) - 1 AS bin,
          COUNT(*) AS c
          FROM e GROUP BY 1, 2, 3),
        dense AS (SELECT d.doc_id,
          list(COALESCE(CAST(cnt.c AS FLOAT) / CAST(GREATEST(d.n, 1) AS FLOAT),
            CAST(0 AS FLOAT)) ORDER BY g.bin) AS v
          FROM h d CROSS JOIN (SELECT CAST(unnest(range(16)) AS INT) AS bin) g
          LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.bin = g.bin
          GROUP BY d.doc_id),
        dd AS (SELECT doc_id, CAST(v AS DOUBLE[]) AS v FROM dense),
        scored AS (SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
          list_dot_product(q.v, c.v) /
            (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
            AS cos
          FROM dd q JOIN dd c ON q.doc_id < 5 AND q.doc_id != c.doc_id),
        ranked AS (SELECT query_id, neighbor_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
          ROUND(cos, 4) AS cosine
          FROM scored)
        SELECT query_id, neighbor_id, rank, cosine FROM ranked
        WHERE rank <= 3 ORDER BY query_id, rank""")),

    // ---- frame sampling (video-shaped payloads; integer-arithmetic
    // oracle: frame boundaries are deterministic byte math) --------------
    "m03_frame_sample" -> QueryDef(
      (s, dir) => {
        implicit val sp = s
        val media = Multimodal.syntheticMediaTable(s, dir)
        Multimodal.sampleFrames(media, stride = 4).toDF()
          .groupBy("media_id")
          .agg(count(lit(1)).as("n_frames_sampled"),
            sum(length(col("frame_bytes")).cast("long")).as("sampled_bytes"))
          .orderBy("media_id")
          .limit(100)
      },
      Some("""WITH d AS (SELECT doc_id,
          octet_length(encode(text)) AS b,
          greatest(n_chars // 100, 1) AS n
          FROM documents),
        p AS (SELECT doc_id, b, n, greatest(b // n, 1) AS fl FROM d),
        f AS (SELECT doc_id, b, fl, unnest(range(0, n, 4)) AS fi FROM p),
        c AS (SELECT doc_id, COUNT(*) AS nf,
          SUM(least(least(fi*fl, b) + fl, b) - least(fi*fl, b)) AS sb
          FROM f GROUP BY doc_id)
        SELECT doc_id AS media_id, CAST(nf AS BIGINT) AS n_frames_sampled,
          CAST(sb AS BIGINT) AS sampled_bytes
        FROM c ORDER BY media_id LIMIT 100"""))
  )
}
