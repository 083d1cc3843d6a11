package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The watermark offset's serialized form: JSON round-trip (including
  * hostile path characters — checkpoints must survive any URI), and the
  * Initial sentinel ordering below every real file key.
  */
class SeamfOffsetSpec extends AnyFunSuite {

  test("json round-trips, including quotes/backslashes/unicode in paths") {
    val cases = Seq(
      SeamfOffset(0L, Long.MinValue, ""),
      SeamfOffset(3L, 1700000000000L, "file:/data/a.sigmf"),
      SeamfOffset(7L, 1L, """s3a://b/weird "name"\with\slashes.zip"""),
      SeamfOffset(9L, 42L, "hdfs://nn/λ/ünïcode.sigmf"))
    cases.foreach { o =>
      assert(SeamfOffset.fromJson(o.json()) === o, o.json())
    }
  }

  test("Initial sorts strictly below any real (mtime >= 0) file key") {
    val i = SeamfOffset.Initial
    assert(i.files === 0L)
    assert(i.mtime < 0L)
  }
}
