package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over `array<float>` / `array<double>`
  * columns — the embedding hot path.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates a casted copy of each array plus a zipped products array per
  * ROW-PAIR; inside a (queries x corpus) join that is the dominant cost.
  * This expression inlines into whole-stage codegen as a bare fused
  * multiply-add loop over the unsafe array data — no allocation, no
  * per-element lambda dispatch.
  *
  * Semantics EXACTLY match the HOF form (the DuckDB oracles rely on it):
  * left-to-right double accumulation `acc + (double)a(i) * (double)b(i)`,
  * empty arrays give 0.0, and a length mismatch or null element gives NULL
  * (zip_with pads with null; null poisons the aggregate).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (la, ra) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = la.numElements()
    if (n != ra.numElements()) return null
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      s += get(la, i, lt) * get(ra, i, rt)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    def getter(t: DataType) = t match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }
    val (lg, rg) = (getter(elemType(left).get), getter(elemType(right).get))
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += (double) $l.$lg($i) * (double) $r.$rg($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DotProduct = copy(left = l, right = r)
}

/** Scaled-floor squared L2 distance: sum over i of
  * floor((a_i - b_i)^2 * 1e9) as a LONG — the k-means distance kernel.
  *
  * Per-term floor-scaling is the engine's established float discipline
  * (BM25, PSI, streaming means): every term is an exact long, so the sum
  * is order-independent and replays verbatim in DuckDB as
  * `SUM(CAST(FLOOR((x-c)*(x-c)*1e9) AS BIGINT))` — the double arithmetic
  * `((a-b)*(a-b))*1e9` is identical IEEE 754 in both engines. Codegen is
  * a fused subtract-square-floor loop over the unsafe array data: no
  * zip_with allocation, no per-element Decimal boxing (the previous
  * Decimal(24,15) fold was ~10x slower and made the k-means fit cost
  * visibly proportional to k at bench scale).
  *
  * Null semantics match the zip_with formulation: length mismatch or a
  * null element gives NULL.
  *
  * Input-magnitude bound: each term floor((a-b)^2 * 1e9) must fit a long,
  * which holds for |a - b| < ~9.6e4 per element (and the SUM for any
  * realistic dimension count). Beyond that the JVM cast saturates at
  * Long.MaxValue while DuckDB's CAST(FLOOR(...) AS BIGINT) raises — the
  * cross-engine identity above assumes unit-ish embedding magnitudes
  * (every caller here: normalized or near-normalized vectors), not
  * arbitrary doubles.
  */
case class SqDist9(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_sqdist9 needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (la, ra) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = la.numElements()
    if (n != ra.numElements()) return null
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    var s = 0L
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val d = get(la, i, lt) - get(ra, i, rt)
      s += math.floor(d * d * 1e9).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    def getter(t: DataType) = t match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }
    val (lg, rg) = (getter(elemType(left).get), getter(elemType(right).get))
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    final double $d = (double) $l.$lg($i) - (double) $r.$rg($i);
         |    $s += (long) Math.floor($d * $d * 1e9);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SqDist9 = copy(left = l, right = r)
}

object VectorExpressions {
  private val eu = org.apache.spark.sql.GraftColumnBridge

  def dotProduct(a: Column, b: Column): Column =
    eu.column(DotProduct(eu.expression(a), eu.expression(b)))

  def sqDist9(a: Column, b: Column): Column =
    eu.column(SqDist9(eu.expression(a), eu.expression(b)))
}
