package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  implicit private def s = spark

  private lazy val media = Multimodal.syntheticMediaTable(spark, sf())

  test("media table carries binary content + typed metadata") {
    val row = media.filter(_.media_id == 0L).head()
    assert(row.content.nonEmpty)
    assert(Set("jpeg", "wav", "mp4").contains(row.meta.format))
    val df = media.toDF()
    assert(df.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
  }

  test("batched feature extraction yields normalized fixed-width vectors") {
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() === media.count())
    val f = feats.filter(_.media_id == 1L).head()
    assert(f.features.length === 16)
    assert(math.abs(f.features.sum - 1.0f) < 1e-4) // L1-normalized histogram
    assert(f.n_bytes > 0)
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media).filter(_.media_id == 1L).head()
    assert(again.features.toSeq === f.features.toSeq)
  }

  test("frame sampling emits every stride-th chunk with correct indices") {
    val frames = Multimodal.sampleFrames(media, stride = 2).toDF()
    assert(frames.count() > 0)
    val idxs = frames.filter(col("media_id") === 2L)
      .select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(idxs === idxs.sorted)
    assert(idxs.forall(_ % 2 == 0))
  }

  test("resize preserves ids and rewrites metadata") {
    val resized = Multimodal.resize(media, 32, 32)
    val r = resized.filter(_.media_id == 3L).head()
    assert(r.meta.width === 32 && r.meta.height === 32)
    assert(resized.count() === media.count())
  }

  test("media features feed the similarity operators end-to-end") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val knn = graft.operators.Similarity.bruteForceTopK(
      feats, feats.filter(col("vec_id") < 3), "vec_id", "embedding", k = 3)
    assert(knn.count() === 9)
  }
}
