package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Pure-SQL surface for the library's composite column operators.
  *
  * The codegen'd custom expressions register in
  * `expressions.DecodeExpressions`; this object exposes the COMPOSITE
  * operators (quality scoring, language id, portable hashing, Z-order,
  * vector math) as SQL functions too, so `spark.sql` users get the same
  * engine surface as the Column DSL — each builder just converts the
  * incoming argument Expressions to Columns, reuses the DSL
  * implementation, and hands the resulting expression tree back to the
  * analyzer (zero new evaluation code, identical semantics and codegen).
  */
object SqlFunctions {
  private val eu = org.apache.spark.sql.GraftColumnBridge

  /** Default stopword list for `graft_quality_score` (the q28 set). */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "data")

  private def c(e: Expression): Column = eu.column(e)

  private def register(spark: SparkSession, name: String,
      builder: Seq[Expression] => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => eu.expression(builder(exprs)), "built-in")

  /** Register the whole composite surface on a session. */
  def registerAll(spark: SparkSession): Unit = {
    register(spark, "graft_quality_score",
      e => TextOps.qualityScore(c(e.head), DefaultStopwords))
    // graft_shingles(text, k): k must be an integer literal — it is a
    // structural parameter of the codegen'd expression (the generated
    // one-pass scan is specialized per k), not a runtime column
    register(spark, "graft_shingles", e => {
      val k = e(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"graft_shingles(text, k): k must be an integer literal, got $other")
      }
      c(expressions.Shingles(e(0), k))
    })
    register(spark, "graft_lang_id", e => TextOps.langIdHeuristic(c(e.head)))
    register(spark, "graft_token_count", e => TextOps.wordCount(c(e.head)))
    register(spark, "graft_fingerprint", e => TextOps.fingerprint(c(e.head)))
    register(spark, "graft_hash48",
      e => graft.operators.Dedup.md5Hash48(c(e.head)))
    register(spark, "graft_redact_pii", e => TextOps.redactPii(c(e.head)))
    register(spark, "graft_nfc",
      e => c(expressions.NfcNormalize(e.head)))
    register(spark, "graft_zvalue2",
      e => graft.operators.ZOrder.zValue2(c(e(0)), c(e(1)), 16))
    // SQL literals parse as decimal arrays; the native DotProduct is
    // strict float/double, so the SQL surface normalizes to array<double>
    // (identity cast for already-double columns; the Column-DSL hot path
    // never sees this cast)
    register(spark, "graft_cosine", e => VectorOps.cosine(
      c(e(0)).cast("array<double>"), c(e(1)).cast("array<double>")))
    register(spark, "graft_dot", e => VectorOps.dot(
      c(e(0)).cast("array<double>"), c(e(1)).cast("array<double>")))
    // graft_winnow(text, k, w): winnowing fingerprint sketch as
    // array<struct<pos,h>> — k and w are structural (same contract as
    // graft_shingles)
    register(spark, "graft_winnow", e => {
      def intLit(x: Expression, name: String): Int = x match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"graft_winnow(text, k, w): $name must be an integer literal, " +
            s"got $other")
      }
      c(expressions.WinnowSketch(e(0), intLit(e(1), "k"), intLit(e(2), "w")))
    })
  }
}
