package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  implicit private def s = spark

  private lazy val media = Multimodal.syntheticMediaTable(spark, sf())

  test("media table carries binary content + typed metadata") {
    val row = media.filter(_.media_id == 0L).head()
    assert(row.content.nonEmpty)
    assert(Set("png", "wav", "gif", "jpeg").contains(row.meta.format))
    val df = media.toDF()
    assert(df.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
  }

  test("payloads are REAL media: magic bytes per format") {
    val byFmt = media.collect().groupBy(_.meta.format)
    val png = byFmt("png").head.content
    assert(png.take(8).toSeq ===
      Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val wav = byFmt("wav").head.content
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val gif = byFmt("gif").head.content
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"))
    val jpg = byFmt("jpeg").head.content
    assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8) // SOI marker
  }

  test("decoded pixels match the generator formula (PNG round trip)") {
    // media_id 4 is png (4%4==0) with a non-trivial id%16 class; the
    // decoded red channel must reproduce
    // (id*31 + x*7 + y*13 + x*y*(1 + id%16)) % 256 pixel-for-pixel
    val row = media.filter(_.media_id == 4L).head()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(row.content))
    assert(img.getWidth === 16 && img.getHeight === 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val red = (img.getRGB(x, y) >> 16) & 0xff
      assert(red === ((4L * 31 + x * 7 + y * 13 + x * y * 5) % 256).toInt,
        s"pixel ($x,$y)")
    }
  }

  test("jpeg decodes land within JpegMeanTol of the closed-form mean " +
      "(per row, the m01 bounded-error grade)") {
    val jpegs = Multimodal.extractFeatures(
      Multimodal.syntheticMediaTable(spark, sf(), Some("jpeg"))).collect()
    assert(jpegs.nonEmpty)
    jpegs.foreach { f =>
      assert(f.format === "jpeg" && f.width === 16 && f.n_units === 256)
      val expected = (f.media_id % 128) + 30.0
      assert(math.abs(f.unit_mean - expected) <= Multimodal.JpegMeanTol,
        s"media ${f.media_id}: decoded mean ${f.unit_mean} vs $expected")
    }
  }

  test("undecodable payloads degrade to sentinels, not stage failures") {
    import spark.implicits._
    val corrupt = Seq(
      Multimodal.MediaRow(900L, Array[Byte](1, 2, 3),
        Multimodal.MediaMeta("png", 16, 16, 1)),
      Multimodal.MediaRow(901L, Array[Byte](9, 9),
        Multimodal.MediaMeta("wav", 200, 1, 1)),
      Multimodal.MediaRow(902L, Array[Byte](0),
        Multimodal.MediaMeta("gif", 8, 8, 2))).toDS()
    val feats = Multimodal.extractFeatures(corrupt).collect()
    assert(feats.length === 3)
    feats.foreach(f => assert(f.n_units === -1 && f.features.isEmpty,
      s"media ${f.media_id} should be a sentinel"))
    // frame sampler emits nothing for them; resize passes them through
    assert(Multimodal.sampleFrames(corrupt, 1).count() === 0)
    val passed = Multimodal.resize(corrupt, 4, 4).collect()
    assert(passed.map(_.media_id).toSet === Set(900L, 901L, 902L))
    assert(passed.find(_.media_id == 900L).get.content.toSeq ===
      Seq[Byte](1, 2, 3))
  }

  test("batched feature extraction yields normalized fixed-width vectors " +
      "from real decodes") {
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() === media.count())
    val f = feats.filter(_.media_id == 1L).head() // wav row
    assert(f.features.length === 16)
    assert(math.abs(f.features.sum - 1.0f) < 1e-4) // L1-normalized histogram
    assert(f.n_units === 201) // 200 + id%100 decoded samples
    assert(f.n_bytes > 0)
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media).filter(_.media_id == 1L).head()
    assert(again.features.toSeq === f.features.toSeq)
    // png row reports DECODED dimensions
    val p = feats.filter(_.media_id == 0L).head()
    assert(p.width === 16 && p.height === 16 && p.n_units === 256)
  }

  test("frame sampling decodes every stride-th GIF frame with pixel sums " +
      "matching the generator formula") {
    val gifs = media.filter(_.meta.format == "gif")
    val frames = Multimodal.sampleFrames(gifs, stride = 2).toDF()
    assert(frames.count() > 0)
    val rows = frames.filter(col("media_id") === 2L)
      .select("frame_idx", "pixel_sum").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(rows.map(_._1).forall(_ % 2 == 0))
    rows.foreach { case (f, got) =>
      val want = (for (x <- 0 until 8; y <- 0 until 8)
        yield ((2L * 17 + f * 29 + x * 5 + y * 11) % 256)).sum
      assert(got === want, s"frame $f pixel sum")
    }
    // sampled frames are standalone PNGs
    val fb = frames.filter(col("media_id") === 2L && col("frame_idx") === 0)
      .select("frame_bytes").head().getAs[Array[Byte]](0)
    assert(fb.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte))
  }

  test("resize really rescales image pixels and preserves ids") {
    val resized = Multimodal.resize(media, 32, 32)
    val r = resized.filter(_.media_id == 4L).head() // png row
    assert(r.meta.width === 32 && r.meta.height === 32)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.content))
    assert(img.getWidth === 32 && img.getHeight === 32)
    assert(resized.count() === media.count())
  }

  test("audio frame features match the sample formula frame-for-frame") {
    val wavs = media.filter(_.meta.format == "wav")
    val rows = Multimodal.audioFrameFeatures(wavs, 80)
      .filter(_.media_id == 1L).collect().sortBy(_.frame_idx)
    // media 1: 201 samples -> 2 complete frames, tail dropped
    assert(rows.map(_.frame_idx).toSeq === Seq(0, 1))
    rows.foreach { r =>
      def s(i: Int): Int =
        ((2L * 2654435761L + i.toLong * 40503L) % 65536L).toInt - 32768
      val idx = (r.frame_idx * 80) until (r.frame_idx * 80 + 80)
      val sq = idx.map(i => s(i).toLong * s(i)).sum
      assert(r.rms9 ===
        math.floor(math.sqrt(sq.toDouble / 80) * 1e9).toLong)
      val zc = idx.drop(1).count(i => s(i - 1) * s(i) < 0)
      assert(r.zero_crossings === zc)
    }
    // corrupt payloads emit no frames
    import spark.implicits._
    val corrupt = Seq(Multimodal.MediaRow(900L, Array[Byte](9),
      Multimodal.MediaMeta("wav", 200, 1, 1))).toDS()
    assert(Multimodal.audioFrameFeatures(corrupt, 80).count() === 0)
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
