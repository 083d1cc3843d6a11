package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join: the (c)-tier Catalyst extension
  * (LogicalPlan + Strategy + physical BinaryExecNode), alternative to the
  * union+window formulation in [[graft.operators.AsOfJoin]].
  *
  * Physical semantics: both sides are hash-clustered on the equi-keys and
  * sorted by (keys, ts) — declared via requiredChildDistribution/Ordering so
  * EnsureRequirements inserts exactly one exchange+sort per side — then each
  * partition pair is merged in ONE streaming pass: for every left row, the
  * latest right row with rightTs <= leftTs. No window buffering, no union:
  * the merge keeps one candidate right row in memory.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    tolerance: Option[Long] = None,
    allowExactMatches: Boolean = true) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** @param tolerance max leftTs - matchedRightTs in the axis's long units
  *   (epoch micros for TimestampType); a staler match emits NULLs — pandas
  *   `merge_asof(tolerance=...)`. Enforced per-row at emit time against the
  *   held candidate, so the merge stays one streaming pass.
  * @param allowExactMatches when false the candidate must be STRICTLY
  *   earlier (rightTs < leftTs) — the advance loop simply stops one row
  *   sooner.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    tolerance: Option[Long],
    allowExactMatches: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  // single-field ts row -> long in the axis's natural units (timestamps
  // are epoch micros internally); only consulted when tolerance is set
  private def tsAsLong(dt: org.apache.spark.sql.types.DataType)
      : InternalRow => Long = dt match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.LongType => r => r.getLong(0)
    case org.apache.spark.sql.types.IntegerType => r => r.getInt(0).toLong
    case other => throw new IllegalArgumentException(
      s"as-of tolerance unsupported over ts type ${other.simpleString}")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val tol = tolerance
    val strict = !allowExactMatches
    val lTsLong = if (tol.isDefined) tsAsLong(leftTs.dataType) else null
    val rTsLong = if (tol.isDefined) tsAsLong(rightTs.dataType) else null
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rightOut)
      val valProj = UnsafeProjection.create(rightValues, rightOut)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(
        leftKeys.map(_.dataType))
      val tsOrdering = RowOrdering.createNaturalAscendingOrdering(
        Seq(leftTs.dataType))
      val outProj = UnsafeProjection.create(output, output)
      val nullValues = new GenericInternalRow(rightValues.size)
      val joiner = new JoinedRow

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private var heldKey: UnsafeRow = _ // key of the held candidate
        private var heldVal: UnsafeRow = _ // right values at latest ts <= leftTs
        private var heldTs: Long = 0L // matched right ts (tolerance only)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTsRow = lTsProj(lRow)
          // drop candidate from an earlier key group
          if (heldKey != null && keyOrdering.compare(heldKey, lKey) != 0) {
            heldKey = null; heldVal = null
          }
          // advance right while its key is behind, or equal with
          // ts <= leftTs (ts < leftTs when exact matches are disallowed)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val cmp = keyOrdering.compare(rKeyProj(rRow), lKey)
            if (cmp < 0) { rBuf.next(); () } // right key group already passed
            else if (cmp == 0 && {
                val c = tsOrdering.compare(rTsProj(rRow), lTsRow)
                if (strict) c < 0 else c <= 0
              }) {
              heldKey = lKey.copy()
              if (tol.isDefined) heldTs = rTsLong(rTsProj(rRow))
              heldVal = valProj(rBuf.next()).copy()
            } else advancing = false
          }
          // the held candidate never un-matches for later left rows of the
          // same key (their ts only grows), so a tolerance miss nulls THIS
          // row but keeps the candidate held
          val inTol = tol.isEmpty ||
            (lTsLong(lTsRow) - heldTs) <= tol.get
          val rightPart: InternalRow =
            if (heldKey != null && keyOrdering.compare(heldKey, lKey) == 0 &&
              heldVal != null && inTol) heldVal
            else nullValues
          outProj(joiner(lRow, rightPart))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the physical operator. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, rv, tol, exact) =>
      AsOfJoinExec(lk, rk, lts, rts, rv, tol, exact,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** User-facing API for the physical as-of join. Requires a session created
  * with [[GraftExtensions]] (the strategy must be registered). Right-side
  * value column names must not collide with left columns.
  */
object AsOfJoinPhysical {
  def backward(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      valueCols: Seq[String], tolerance: Option[Long] = None,
      allowExactMatches: Boolean = true): org.apache.spark.sql.DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side to fresh exprIds: when both inputs share
    // lineage (self-join shape) the attributes would otherwise collide and
    // the right child's required sort would reference the left's columns.
    val rBase = right.queryExecution.analyzed
    val rAliases = rBase.output.map(a => Alias(a, a.name)())
    val rPlan: LogicalPlan =
      org.apache.spark.sql.catalyst.plans.logical.Project(rAliases, rBase)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    org.apache.spark.sql.GraftColumnBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
        attr(lPlan, leftTs), attr(rPlan, rightTs),
        valueCols.map(attr(rPlan, _)), tolerance, allowExactMatches))
  }
}
