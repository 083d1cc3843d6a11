package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.seamf.{HalfFloat, SeamfCodec}

/** Native Catalyst expressions (with `doGenCode`) for the seamf decode hot
  * path — the preference-order "(b) custom Expression beats UDF" tier:
  * unlike a Scala UDF there is no row-level serialization boundary, the
  * calls inline into whole-stage codegen, and null handling is free via
  * `nullSafeEval`/`nullSafeCodeGen`.
  *
  * Together they make the payload pipeline SQL-expressible:
  * `half_decode(xz_decompress(content))` over a binaryFile scan.
  */

/** XZ-decompress a binary column (seamf payloads are XZ/LZMA streams,
  * reference seamf.py:1038-1040).
  */
case class XzDecompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"xz_decompress needs BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    SeamfCodec.xzDecompress(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.seamf.SeamfCodec.xzDecompress($c);")

  override protected def withNewChildInternal(c: Expression): XzDecompress =
    copy(child = c)
}

/** Decode a little-endian float16 binary payload into array<float>
  * (reference np.frombuffer(dtype="half"), seamf.py:1044).
  */
case class HalfDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"half_decode needs BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      HalfFloat.decodeVector(v.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.seamf.HalfFloat.decodeVector($c));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): HalfDecode =
    copy(child = c)
}

object DecodeExpressions {
  // Spark 4 Column <-> Expression bridge (classic mode)
  private val eu = org.apache.spark.sql.GraftColumnBridge

  /** Column-DSL forms. */
  def xz_decompress(c: Column): Column = eu.column(XzDecompress(eu.expression(c)))
  def half_decode(c: Column): Column = eu.column(HalfDecode(eu.expression(c)))

  /** Register for spark.sql use: `SELECT half_decode(xz_decompress(content))`. */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "xz_decompress", exprs => XzDecompress(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "half_decode", exprs => HalfDecode(exprs.head), "built-in")
  }
}
