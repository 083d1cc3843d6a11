package graft.sources

import java.nio.file.{Files, Path => JPath}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** [[HadoopZip]]: the FileSystem-API central-directory reader the DSv2
  * connector uses instead of `java.util.zip.ZipFile`'s local-path-only
  * access. Parity is checked against archives WRITTEN by the JDK (an
  * independent implementation of the same public PKWARE format):
  * listing, sizes, offsets, and decoded member bytes — deflated and
  * stored, with and without an archive comment.
  */
class HadoopZipSpec extends AnyFunSuite {

  private def fs(p: JPath) =
    new Path(p.toUri).getFileSystem(new Configuration())

  private def writeZip(members: Seq[(String, Array[Byte])],
      stored: Boolean = false, comment: String = null): JPath = {
    val f = Files.createTempFile("graft_hadoopzip", ".zip")
    val out = new ZipOutputStream(Files.newOutputStream(f))
    try {
      if (comment != null) out.setComment(comment)
      members.foreach { case (name, bytes) =>
        val e = new ZipEntry(name)
        if (stored) {
          e.setMethod(ZipEntry.STORED)
          e.setSize(bytes.length.toLong)
          e.setCompressedSize(bytes.length.toLong)
          val crc = new java.util.zip.CRC32(); crc.update(bytes)
          e.setCrc(crc.getValue)
        }
        out.putNextEntry(e); out.write(bytes); out.closeEntry()
      }
    } finally out.close()
    f
  }

  private val members = Seq(
    "a.sigmf" -> Array.fill(5000)(7.toByte),
    "sub/b.sigmf" -> (0 until 3000).map(_.toByte).toArray,
    "notes.txt" -> "hello zip".getBytes("UTF-8"))

  test("central-directory listing matches the JDK's view (deflate)") {
    val f = writeZip(members)
    val p = new Path(f.toUri)
    val got = HadoopZip.listEntries(fs(f), p)
    val zf = new java.util.zip.ZipFile(f.toFile)
    try {
      import scala.jdk.CollectionConverters._
      val jdk = zf.entries().asScala.toSeq
      assert(got.map(_.name) === jdk.map(_.getName))
      assert(got.map(_.compressedSize) === jdk.map(_.getCompressedSize))
      assert(got.map(_.uncompressedSize) === jdk.map(_.getSize))
      assert(got.forall(_.method === ZipEntry.DEFLATED))
    } finally zf.close()
    Files.delete(f)
  }

  test("member bytes round-trip exactly: deflate, stored, and with an " +
      "archive comment pushing the EOCD off the tail") {
    for (stored <- Seq(false, true); comment <- Seq(null, "c" * 4096)) {
      val f = writeZip(members, stored = stored, comment = comment)
      val p = new Path(f.toUri)
      val in = fs(f).open(p)
      try {
        val entries = HadoopZip.listEntries(fs(f), p)
        assert(entries.size === members.size)
        entries.zip(members).foreach { case (e, (name, bytes)) =>
          assert(e.name === name)
          assert(HadoopZip.readEntry(in, e).toSeq === bytes.toSeq)
        }
      } finally in.close()
      Files.delete(f)
    }
  }

  test("one shared stream serves all members via positioned reads, in " +
      "any order") {
    val f = writeZip(members)
    val in = fs(f).open(new Path(f.toUri))
    try {
      val entries = HadoopZip.listEntries(fs(f), new Path(f.toUri))
      // reverse order: positioned reads must not depend on cursor state
      entries.reverse.zip(members.reverse).foreach { case (e, (_, bytes)) =>
        assert(HadoopZip.readEntry(in, e).length === bytes.length)
      }
    } finally in.close()
    Files.delete(f)
  }

  test("ZIP64 archives (> 65535 members) list and read through the " +
      "64-bit EOCD path") {
    // java.util.zip.ZipOutputStream switches to ZIP64 EOCD records when
    // the entry count saturates the 16-bit field — the exact layout a
    // 100 TB archive hits. 70k tiny stored members keep this fast.
    val f = Files.createTempFile("graft_zip64", ".zip")
    val out = new ZipOutputStream(Files.newOutputStream(f))
    val n = 70000
    try {
      var i = 0
      while (i < n) {
        val e = new ZipEntry(f"m$i%06d")
        out.putNextEntry(e)
        out.write(i & 0xff); out.closeEntry()
        i += 1
      }
    } finally out.close()
    val p = new Path(f.toUri)
    val entries = HadoopZip.listEntries(fs(f), p)
    assert(entries.size === n)
    assert(entries.head.name === "m000000")
    assert(entries.last.name === f"m${n - 1}%06d")
    val in = fs(f).open(p)
    try {
      // spot-read across the range, including past the 16-bit boundary
      Seq(0, 1, 65534, 65535, 65536, n - 1).foreach { i =>
        val bytes = HadoopZip.readEntry(in, entries(i))
        assert(bytes.toSeq === Seq((i & 0xff).toByte), s"member $i")
      }
    } finally in.close()
    Files.delete(f)
  }

  test("an archive with EXACTLY 65535 members and no ZIP64 locator lists " +
      "via the 16-bit values (saturation only MAY mean ZIP64)") {
    // Info-ZIP / Python zipfile write ZIP64 records only when a value
    // EXCEEDS its field, so nEntries == 0xFFFF with no locator is a valid
    // archive. The JDK's writer emits ZIP64 at >= 0xFFFF, so this layout
    // must be written by hand: 65535 empty stored members.
    import java.nio.{ByteBuffer, ByteOrder}
    val n = 0xffff
    val f = Files.createTempFile("graft_zip65535", ".zip")
    val out = new java.io.BufferedOutputStream(Files.newOutputStream(f))
    def le(bytes: Int): ByteBuffer =
      ByteBuffer.allocate(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val names = (0 until n).map(i => f"m$i%05d".getBytes("UTF-8"))
    try {
      var off = 0L
      val lhos = new Array[Long](n)
      var i = 0
      while (i < n) {
        lhos(i) = off
        val b = le(30 + names(i).length)
          .putInt(0x04034b50).putShort(20).putShort(0).putShort(0)
          .putShort(0).putShort(0).putInt(0).putInt(0).putInt(0)
          .putShort(names(i).length.toShort).putShort(0).put(names(i))
        out.write(b.array()); off += 30 + names(i).length
        i += 1
      }
      val cdOffset = off
      i = 0
      while (i < n) {
        val b = le(46 + names(i).length)
          .putInt(0x02014b50).putShort(20).putShort(20).putShort(0)
          .putShort(0).putShort(0).putShort(0).putInt(0).putInt(0)
          .putInt(0).putShort(names(i).length.toShort).putShort(0)
          .putShort(0).putShort(0).putShort(0).putInt(0)
          .putInt(lhos(i).toInt).put(names(i))
        out.write(b.array()); off += 46 + names(i).length
        i += 1
      }
      val eocd = le(22)
        .putInt(0x06054b50).putShort(0).putShort(0)
        .putShort(0xffff.toShort).putShort(0xffff.toShort)
        .putInt((off - cdOffset).toInt).putInt(cdOffset.toInt).putShort(0)
      out.write(eocd.array())
    } finally out.close()
    val p = new Path(f.toUri)
    val entries = HadoopZip.listEntries(fs(f), p)
    assert(entries.size === n)
    assert(entries.head.name === "m00000")
    assert(entries.last.name === f"m${n - 1}%05d")
    val in = fs(f).open(p)
    try assert(HadoopZip.readEntry(in, entries(n - 1)).isEmpty)
    finally in.close()
    Files.delete(f)
  }

  test("a non-zip file is rejected loudly") {
    val f = Files.createTempFile("graft_notazip", ".zip")
    Files.write(f, Array.fill(100)(0x41.toByte))
    val ex = intercept[IllegalArgumentException] {
      HadoopZip.listEntries(fs(f), new Path(f.toUri))
    }
    assert(ex.getMessage.contains("end-of-central-directory"))
    Files.delete(f)
  }

  test("filterAttributes under a pushed aggregation names only scan-output " +
      "columns (ADVICE r8: DPP resolveRefs crash)") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("path", "/tmp/does-not-matter"))
    val b = new SeamfScanBuilder(opts)
    val pushed = b.pushAggregation(new Aggregation(
      Array(new CountStar), Array(Expressions.column("table"))))
    assert(pushed)
    val scan = b.build().asInstanceOf[SeamfScan]
    val names = scan.filterAttributes().map(_.fieldNames.head).toSet
    val out = scan.readSchema().fieldNames.toSet
    assert(names === Set("table"),
      s"filterAttributes must be the prunable group-by columns, got $names")
    assert(names.subsetOf(out),
      s"filterAttributes $names must resolve against readSchema $out")
  }
}
