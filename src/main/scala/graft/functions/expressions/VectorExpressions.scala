package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Native IVF cell assignment: per row vector, the `nProbe` nearest
  * centroids by cosine, as an `array<int>` of cell ids in rank order —
  * the fused form of [[graft.operators.Similarity.assignCells]]'s
  * `transform(centroids, c -> struct(-cosine, cell))` + `array_sort` +
  * `slice` literal pipeline.
  *
  * Exists for LARGE centroid sets (VERDICT r13 #3): at the derived config
  * the x100 decade legitimately produces 1600 cells, and the literal
  * formulation pays (a) a ~100k-node foldable plan and (b) per row x cell
  * an interpreted higher-order-function dispatch, a struct allocation,
  * THREE dot products (the row self-dot is re-evaluated per element), and
  * an O(c log c) struct sort. This expression holds the centroid matrix as
  * primitive `float[][]` state (driver-computed, shipped once per task via
  * the serialized expression — nCells x dim floats, KB-scale), hoists the
  * row norm, pre-computes centroid norms, and keeps a bounded top-nProbe
  * insertion array — one JIT'd multiply-add loop per row, zero allocation
  * beyond the output array, zero shuffle.
  *
  * BIT-FOR-BIT parity with the literal form (asserted by OperatorsSpec on
  * both paths): accumulation is the exact [[DotProduct]] recipe
  * (left-to-right `acc + (double)row_i * (double)cent_i`), the divisor is
  * `rowNorm * centNorm` in that order, negation last, and ranking compares
  * `(neg_cosine, cell)` ascending with Spark's NaN-safe double semantics
  * (NaN ties NaN, NaN above every number, -0.0 == 0.0 — the `array_sort`
  * ordering). Degenerate rows (vector length != centroid dim, or a null
  * element) make every cosine NULL in the literal form, whose struct
  * ordering puts NULL first and tie-breaks on cell — i.e. the nProbe
  * smallest cell ids; replicated verbatim. All centroids must share one
  * dim (mixed-dim corpora are out of contract engine-wide — see
  * [[graft.functions.VectorOps.dimOf]]).
  */
case class NearestCells(child: Expression, cents: Seq[(Int, Seq[Float])],
    nProbe: Int) extends UnaryExpression {

  require(cents.nonEmpty, "graft_nearest_cells needs >= 1 centroid")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType(child) match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cells needs an array<float|double> input, got " +
        s"${child.dataType.simpleString}")
  }

  @transient private lazy val dim: Int = {
    val d = cents.head._2.length
    require(cents.forall(_._2.length == d),
      "graft_nearest_cells: centroids must share one dimension")
    d
  }
  @transient private lazy val cellIds: Array[Int] = cents.map(_._1).toArray
  @transient private lazy val matrix: Array[Array[Float]] =
    cents.map(_._2.toArray).toArray
  // sqrt of the left-to-right double self-dot — the exact l2Norm(c.v)
  // the literal form evaluates per element
  @transient private lazy val centNorms: Array[Double] = matrix.map { v =>
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }
  @transient private lazy val cellIdsSorted: Array[Int] = cellIds.sorted
  @transient private lazy val isFloat: Boolean =
    elemType(child).contains(FloatType)

  // Spark's NaN-safe double ordering (Utils.nanSafeCompareDoubles): the
  // comparator array_sort applies to the struct's first field
  private def cmpDouble(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x); val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1
    else -1
  }

  /** The per-row kernel; called from both interpreted eval and the
    * generated code (one virtual call per ROW — the loop itself is JIT'd
    * Scala over primitive arrays).
    */
  def assign(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val k = math.min(nProbe, cents.size)
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
    if (n != dim || hasNull)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(cellIdsSorted, k))
    val row = new Array[Double](n)
    var ss = 0.0
    i = 0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      row(i) = x
      ss += x * x
      i += 1
    }
    val rowNorm = math.sqrt(ss)
    // bounded insertion arrays, kept ascending by (neg, cell)
    val bestNeg = new Array[Double](k)
    val bestCell = new Array[Int](k)
    var filled = 0
    var j = 0
    while (j < matrix.length) {
      val cv = matrix(j)
      var num = 0.0
      var t = 0
      while (t < dim) { num += row(t) * cv(t).toDouble; t += 1 }
      val den = rowNorm * centNorms(j)
      // zero-norm vector: the literal cosine pipeline raises Spark's ANSI
      // divide-by-zero here (ANSI is the engine default; zero vectors are
      // out of contract for cosine ANN) — fail identically, not with NaN
      // ordering, unless the session opted out of ANSI
      if (den == 0.0 &&
          org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
        throw org.apache.spark.sql.GraftColumnBridge.divideByZeroError()
      val neg = -(num / den)
      val cell = cellIds(j)
      if (filled < k || {
        val c = cmpDouble(neg, bestNeg(filled - 1))
        c < 0 || (c == 0 && cell < bestCell(filled - 1))
      }) {
        var pos = if (filled < k) filled else k - 1
        while (pos > 0 && {
          val c = cmpDouble(neg, bestNeg(pos - 1))
          c < 0 || (c == 0 && cell < bestCell(pos - 1))
        }) {
          bestNeg(pos) = bestNeg(pos - 1); bestCell(pos) = bestCell(pos - 1)
          pos -= 1
        }
        bestNeg(pos) = neg; bestCell(pos) = cell
        if (filled < k) filled += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestCell, filled))
  }

  override def nullSafeEval(v: Any): Any = assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.assign($v);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

object VectorExpressions {
  private val eu = org.apache.spark.sql.GraftColumnBridge

  def dotProduct(a: Column, b: Column): Column =
    eu.column(DotProduct(eu.expression(a), eu.expression(b)))

  def sqDist9(a: Column, b: Column): Column =
    eu.column(SqDist9(eu.expression(a), eu.expression(b)))

  def nearestCells(vec: Column, cents: Seq[(Int, Seq[Float])],
      nProbe: Int): Column =
    eu.column(NearestCells(eu.expression(vec), cents, nProbe))
}
