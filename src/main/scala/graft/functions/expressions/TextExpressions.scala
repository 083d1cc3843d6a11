package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd k-word shingling — the n-gram dedup hot path.
  *
  * The HOF formulation (`filter(transform(sequence(...), i ->
  * array_join(slice(words, i+1, k), ' ')), s -> size(split(s, ' ')) == k)`)
  * is interpreted per element AND re-runs a regex split on EVERY emitted
  * shingle just to enforce the window length; on top of that the word
  * array itself comes from a regex `split(text, "\\s+")`. This expression
  * does the whole thing in one pass over the string — manual whitespace
  * scan, zero regex, one builder per shingle — and inlines into
  * whole-stage codegen as a single static call.
  *
  * Semantics EXACTLY match `TextOps.shingles` (the DuckDB oracles rely on
  * it): words are maximal runs of non-whitespace where whitespace is the
  * Java-regex `\s` class ([ \t\n\x0B\f\r] — NOT unicode spaces), shingles
  * are the size(words)-k+1 sliding windows joined with single spaces,
  * fewer than k words yields an empty array, and null text yields null.
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs k >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    TextExpressions.shinglesImpl(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextExpressions" +
        s".shinglesImpl($c, $k);")

  override protected def withNewChildInternal(c: Expression): Shingles =
    copy(child = c)
}

/** Native codegen'd Unicode NFC normalization — canonicalize text BEFORE
  * hashing/fingerprinting so visually-identical strings (precomposed é vs
  * e + combining acute) dedup together. Spark has no builtin normalizer;
  * a Scala UDF would leave whole-stage codegen and serialize every row.
  * DuckDB's `nfc_normalize` replays it, so q95 hash-checks the semantics.
  * NFC (not NFKC): canonical composition only — compatibility folding
  * (ﬁ -> fi) changes content and belongs to a tokenizer policy, not a
  * default canonicalizer.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc needs a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    TextExpressions.nfcImpl(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextExpressions.nfcImpl($c);")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** Native codegen'd winnowing sketch (Schleimer et al. 2003) — the
  * map-side form of [[graft.operators.Winnow]]'s selection.
  *
  * Winnowing is per-document work: every window decision depends only on
  * the document's own grams, so shuffling the gram explosion to a
  * partitioned window (the relational form) moves data that never needed
  * to move — at bench scale the window form shuffles the full gram set
  * (~40 MB at sf0.1 per q102d's exec record) where this expression
  * shuffles NOTHING before the fingerprint join. The relational form
  * remains the configuration for pathological single documents too large
  * for one task (it spreads ONE doc's grams across the cluster); for
  * every normal corpus this is the plan.
  *
  * Returns array<struct<pos:long, h:long>> — identical rows to the
  * relational selection (same 40-bit md5 prefix hashes, same 1-based
  * code-point positions, same rightmost-min tie rule; equivalence
  * property-tested and both replayed by the same DuckDB oracle). Null
  * text yields null; shorter than k+w-1 code points yields an empty
  * array (= the relational form's length gate).
  */
case class WinnowSketch(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 2 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow needs k >= 2 and w >= 1, got k=$k w=$w")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow needs a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    TextExpressions.winnowImpl(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextExpressions" +
        s".winnowImpl($c, $k, $w);")

  override protected def withNewChildInternal(c: Expression): WinnowSketch =
    copy(child = c)
}

/** Native codegen'd Bloom-probe count over a winnow sketch — the w14
  * intake hot loop.
  *
  * The HOF formulation (`size(filter(sketch, f -> forall(positions(f.h),
  * p -> getbit(...))))`) evaluates INTERPRETED per sketch element, and
  * each probe builds a concat + md5 + hex-parse expression tree — at the
  * derived x100 corpus that interpreted chain was ~72 s of an 85 s query
  * (probe count ~55M). This expression runs the identical probe loop in
  * JVM code: per element, k md5 positions over the DECIMAL string of the
  * 40-bit fingerprint (byte-compatible with [[graft.operators.Bloom
  * .positions]]' `concat(cast(h as string), '#salt', i)` inputs), each
  * bit-tested against the packed array<long> filter; counts elements
  * whose k bits are all set. NULL sketch or filter gives NULL.
  */
case class BloomHitCount(left: Expression, right: Expression,
    m: Int, k: Int, salt: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(s: org.apache.spark.sql.types.StructType, _),
          ArrayType(org.apache.spark.sql.types.LongType, _))
          if s.length == 2 && m >= 64 && k >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_hits needs (array<struct<pos,h>>, array<long>) " +
          s"and m >= 64, k >= 1; got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(sk: Any, ft: Any): Any =
    TextExpressions.bloomHitsImpl(sk.asInstanceOf[ArrayData],
      ft.asInstanceOf[ArrayData], m, k, salt)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, ft) =>
      s"${ev.value} = graft.functions.expressions.TextExpressions" +
        s""".bloomHitsImpl($sk, $ft, $m, $k, "$salt");""")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BloomHitCount = copy(left = l, right = r)
}

object TextExpressions {
  private val eu = org.apache.spark.sql.GraftColumnBridge

  def shingles(text: Column, k: Int): Column =
    eu.column(Shingles(eu.expression(text), k))

  def nfcNormalize(text: Column): Column =
    eu.column(NfcNormalize(eu.expression(text)))

  /** NFC-normalize; static so generated code calls it directly. Fast path:
    * `Normalizer.isNormalized` is a cheap scan that avoids allocating for
    * the (overwhelmingly common) already-NFC input.
    */
  def nfcImpl(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  // Java-regex \s (the class split(text, "\\s+") uses): space, tab, LF,
  // vertical tab, form feed, CR — deliberately NOT Character.isWhitespace,
  // which also matches unicode separators the regex form would keep inside
  // words.
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** One-pass shingling over the decoded string; static so generated code
    * can call it directly.
    */
  def shinglesImpl(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    // word boundaries (start, end) — two int arrays, no substring yet
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var m = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val st = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > st) {
        if (m == starts.length) {
          starts = java.util.Arrays.copyOf(starts, m * 2)
          ends = java.util.Arrays.copyOf(ends, m * 2)
        }
        starts(m) = st; ends(m) = i; m += 1
      }
    }
    if (m < k) return Empty
    val out = new Array[Any](m - k + 1)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= m - k) {
      sb.setLength(0)
      var t = 0
      while (t < k) {
        if (t > 0) sb.append(' ')
        sb.append(s, starts(j + t), ends(j + t))
        t += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  def winnowSketch(text: Column, k: Int, w: Int): Column =
    eu.column(WinnowSketch(eu.expression(text), k, w))

  def bloomHitCount(sketch: Column, filterCol: Column, m: Int, k: Int,
      salt: String = "bloom"): Column =
    eu.column(BloomHitCount(eu.expression(sketch), eu.expression(filterCol),
      m, k, salt))

  /** Count sketch entries whose k Bloom positions are all set in the
    * packed filter; static so generated code calls it directly. The
    * position family is EXACTLY [[graft.operators.Bloom.positions]]:
    * md5 over the UTF-8 bytes of `<decimal h>#<salt><i>`, first 12 hex
    * chars parsed base-16 (= the top 6 digest bytes big-endian), mod m.
    */
  def bloomHitsImpl(sketch: ArrayData, filterWords: ArrayData,
      m: Int, k: Int, salt: String): Int = {
    val md = Md5.get()
    val saltBytes = ("#" + salt).getBytes(
      java.nio.charset.StandardCharsets.UTF_8)
    val digest = new Array[Byte](16)
    var hits = 0
    val n = sketch.numElements()
    var i = 0
    while (i < n) {
      val h = sketch.getStruct(i, 2).getLong(1)
      val hBytes = java.lang.Long.toString(h).getBytes(
        java.nio.charset.StandardCharsets.UTF_8)
      var all = true
      var j = 0
      while (all && j < k) {
        md.reset()
        md.update(hBytes)
        md.update(saltBytes)
        md.update(java.lang.Integer.toString(j).getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        md.digest(digest, 0, 16)
        val h48 = ((digest(0) & 0xffL) << 40) | ((digest(1) & 0xffL) << 32) |
          ((digest(2) & 0xffL) << 24) | ((digest(3) & 0xffL) << 16) |
          ((digest(4) & 0xffL) << 8) | (digest(5) & 0xffL)
        val pos = h48 % m
        all = (filterWords.getLong((pos >>> 6).toInt) &
          (1L << (pos & 63))) != 0
        j += 1
      }
      if (all) hits += 1
      i += 1
    }
    hits
  }

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One-pass winnowing over the decoded string; static so generated code
    * calls it directly. Positions are 1-based CODE POINTS (Spark `substr`
    * and DuckDB `substring` both index code points — UTF-16 indexing would
    * silently diverge on supplementary characters), hashes are the 40-bit
    * md5 prefix of each gram's UTF-8 bytes, and ties select the RIGHTMOST
    * minimal gram — all exactly the semantics the relational form packs
    * into its `h * 2^23 + (2^23-1 - pos)` window MIN, so the two plans
    * produce identical rows (PropertySpec pins it) and the same DuckDB
    * oracle replays both.
    */
  def winnowImpl(text: UTF8String, k: Int, w: Int): ArrayData = {
    // work directly on the UTF-8 bytes: a code point starts exactly at
    // every non-continuation byte ((b & 0xC0) != 0x80), so code-point
    // gram slices are byte ranges — no String decode, no per-gram
    // re-encode, and md5 over the slice equals md5 over the substring's
    // UTF-8 bytes byte-for-byte (what the relational form and the oracle
    // hash)
    val bytes = text.getBytes
    val nb = bytes.length
    val off = new Array[Int](nb + 1)
    var i = 0
    var m = 0
    while (i < nb) {
      if ((bytes(i) & 0xC0) != 0x80) { off(m) = i; m += 1 }
      i += 1
    }
    off(m) = nb
    val nGrams = m - k + 1
    if (nGrams < w) return Empty
    val md = Md5.get()
    val digest = new Array[Byte](16)
    val hs = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      md.reset()
      md.update(bytes, off(g), off(g + k) - off(g))
      md.digest(digest, 0, 16)
      hs(g) = ((digest(0) & 0xffL) << 32) | ((digest(1) & 0xffL) << 24) |
        ((digest(2) & 0xffL) << 16) | ((digest(3) & 0xffL) << 8) |
        (digest(4) & 0xffL)
      g += 1
    }
    // window scan: min hash, rightmost on ties (<= keeps the later index);
    // w is small (single digits), so the O(nGrams * w) scan is noise next
    // to the md5 work above. Selections are MONOTONE non-decreasing as the
    // window slides (the old rightmost-min either stays in the window and
    // stays selected, or a gram at least as small enters on the right), so
    // dedup is one last-position check — no set, exact at any doc length.
    val poss = new scala.collection.mutable.ArrayBuffer[Int]()
    val sels = new scala.collection.mutable.ArrayBuffer[Long]()
    var last = -1
    var st = 0
    while (st <= nGrams - w) {
      var best = st
      var j = st + 1
      while (j < st + w) {
        if (hs(j) <= hs(best)) best = j
        j += 1
      }
      if (best != last) { poss += best + 1; sels += hs(best); last = best }
      st += 1
    }
    // windows advance left to right, so selections are position-sorted
    val out = new Array[Any](poss.length)
    var r = 0
    while (r < poss.length) {
      out(r) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](poss(r).toLong, sels(r)))
      r += 1
    }
    new GenericArrayData(out)
  }
}
