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
}
