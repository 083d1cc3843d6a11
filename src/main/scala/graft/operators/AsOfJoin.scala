package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-timestamp) join.
  *
  * Reference behavior: align calibration metadata timestamps to data-product
  * timestamps via `index.get_indexer(method='nearest')`
  * (`/root/reference/src/sea_ingest/plots.py:76-77`,
  * `demos/forensic_plots.ipynb` cell 3). Spark has no built-in as-of join, so
  * we implement the classic union + window trick:
  *
  *   1. Tag right rows (side=0) and left rows (side=1), union them.
  *   2. Partition by the equi-key, order by (ts, side).
  *   3. `last(value, ignoreNulls)` over the unbounded-preceding frame gives
  *      every left row the most recent right value with rightTs <= leftTs
  *      (backward as-of; inclusive because right sorts before left on ties).
  *   4. forward = same with reversed ordering; nearest = both + pick the
  *      smaller |delta|.
  *
  * Scale notes: this costs exactly ONE shuffle of (left ∪ right) by the key —
  * same cost as any sort-merge join, no range explosion, no broadcast of a
  * potentially-large right side, skew behaves like a normal window. This is
  * the 100 TB-safe formulation; a broadcast variant is unnecessary because
  * the window never materializes more than a partition.
  *
  * Right side must be unique per (keys, rightTs) for deterministic output —
  * pre-aggregate it if necessary.
  */
object AsOfJoin {
  private final val SideCol = "__asof_side"
  private final val TsCol = "__asof_ts"

  /** Backward as-of join: for each left row, the latest right row with
    * rightTs <= leftTs (per key). Right's value columns are appended,
    * null when no earlier right row exists.
    *
    * @param valueCols right-side columns to carry (must not clash with left).
    * @param tolerance optional maximum allowed leftTs - matchedRightTs, in
    *   the axis's long units (epoch MICROS for TimestampType, the raw
    *   numeric value otherwise — same convention as [[nearest]]). A match
    *   farther back than the bound yields NULL values, exactly pandas
    *   `merge_asof(tolerance=...)`: an unbounded as-of against calibration
    *   metadata would silently join stale values across sensor gaps (the
    *   s05/s12 gap detector exists because gaps happen). Zero extra plan
    *   cost — the bound is a per-row predicate on the already-filled match.
    * @param allowExactMatches pandas `allow_exact_matches`: when false the
    *   match must be STRICTLY earlier (rightTs < leftTs). Implemented
    *   purely in the tie ORDER of the union sort — left rows sort before
    *   same-timestamp right rows, so the running fill cannot see them.
    */
  def backward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      valueCols: Seq[String], tolerance: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    val leftCols = left.columns
    // inclusive: right (0) sorts before left (1) on equal ts, so the fill
    // sees same-ts right rows; exclusive flips the tags
    val (lSide, rSide) = if (allowExactMatches) (1, 0) else (0, 1)
    // the matched right timestamp rides along as one more fill column iff a
    // tolerance needs to compare against it
    val rtsType = right.schema(rightTs).dataType
    val MatchTs = "__asof_match_ts"
    // Harmonized union schema: keys ++ ts ++ side ++ left payload ++ right values
    val lTagged = left
      .withColumn(TsCol, col(leftTs))
      .withColumn(SideCol, lit(lSide))
      .select((keys.map(col) :+ col(TsCol) :+ col(SideCol)) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        tolerance.map(_ => lit(null).cast(rtsType).as(MatchTs)): _*)
    val rTagged = right
      .withColumn(TsCol, col(rightTs))
      .withColumn(SideCol, lit(rSide))
      .select((keys.map(col) :+ col(TsCol) :+ col(SideCol)) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col) ++
        tolerance.map(_ => col(rightTs).as(MatchTs)): _*)

    val fillCols = valueCols ++ tolerance.map(_ => MatchTs)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TsCol).asc, col(SideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .select(col("*") +: fillCols.map(c =>
        last(col(c), ignoreNulls = true).over(w).as(s"__asof_$c")): _*)

    val isTs = left.schema(leftTs).dataType ==
      org.apache.spark.sql.types.TimestampType
    def asNum(c: Column): Column = if (isTs) unix_micros(c) else c.cast("long")
    def bounded(c: Column): Column = tolerance match {
      case None => c
      case Some(tol) => when(col(s"__asof_$MatchTs").isNotNull &&
        asNum(col(TsCol)) - asNum(col(s"__asof_$MatchTs")) <= tol, c)
    }
    filled.filter(col(SideCol) === lSide)
      .select(leftCols.toIndexedSeq.map(col) ++
        valueCols.map(c => bounded(col(s"__asof_$c")).as(c)): _*)
  }

  /** Nearest as-of join on a single key/ts pair: right value whose timestamp
    * minimizes |leftTs - rightTs| (backward wins ties, matching pandas
    * `method='nearest'` lower-index preference for equal distance).
    * Appends `valueCol` and `<valueCol>_ts` (the matched right timestamp).
    *
    * @param tolerance optional maximum |leftTs - rightTs| in the axis's
    *   long units (epoch micros for timestamps); candidates beyond the
    *   bound are disqualified BEFORE the nearest pick, so a row whose only
    *   neighbors are out of range gets NULL — pandas
    *   `merge_asof(direction='nearest', tolerance=...)`.
    * @param allowExactMatches when false an equal-timestamp right row is
    *   not a candidate in either direction (pandas `allow_exact_matches`).
    */
  def nearest(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      valueCol: String, tolerance: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    val rightPacked = right.select(
      (keys.map(col) :+ col(rightTs).as("__r_ts")) :+
        struct(col(rightTs).as("ts"), col(valueCol).as("v")).as("__r_pack"): _*)

    // the forward pass is ALWAYS tie-exclusive (an exact hit belongs to the
    // backward direction); allowExactMatches=false makes backward strict too
    val back = backwardPacked(left, rightPacked, keys, leftTs,
      reverse = false, includeTies = allowExactMatches)
    val both = backwardPacked(back, rightPacked, keys, leftTs,
      reverse = true, includeTies = false)

    // |delta| arithmetic: epoch micros for TimestampType keys, raw numeric
    // value otherwise (the operator is generic over orderable time axes).
    val isTs = left.schema(leftTs).dataType ==
      org.apache.spark.sql.types.TimestampType
    def asNum(c: Column): Column = if (isTs) unix_micros(c) else c.cast("long")
    val lUs = asNum(col(leftTs))
    val bUs = asNum(col("__pack_b").getField("ts"))
    val fUs = asNum(col("__pack_f").getField("ts"))
    val bQ = tolerance.foldLeft(col("__pack_b").isNotNull)(
      (ok, tol) => ok && (lUs - bUs) <= tol)
    val fQ = tolerance.foldLeft(col("__pack_f").isNotNull)(
      (ok, tol) => ok && (fUs - lUs) <= tol)
    val pickB = bQ && (!fQ || (lUs - bUs) <= (fUs - lUs))
    // no otherwise(): both-disqualified falls through to NULL
    val chosen = when(pickB, col("__pack_b")).when(fQ, col("__pack_f"))
    both
      .withColumn(valueCol, chosen.getField("v"))
      .withColumn(s"${valueCol}_ts", chosen.getField("ts"))
      .drop("__pack_b", "__pack_f")
  }

  /** Time-weighted linear interpolation of `valueCol` at each left row's
    * timestamp: v = vb + (vf - vb) * (t - tb)/(tf - tb) between the
    * backward (tb, vb) and forward (tf, vf) right neighbors per key.
    * Clamps to the single available neighbor at series edges (pandas
    * `interpolate(limit_direction='both')` behavior); an exact timestamp
    * hit returns the observed value. Appends `<valueCol>_interp` and
    * `<valueCol>_support` ('between' | 'exact' | 'edge').
    *
    * Same cost model as [[nearest]]: two union+window passes, one shuffle
    * each, no range explosion. The delta arithmetic divides longs (epoch
    * micros or the raw numeric axis), so the double result is identical
    * across engines and partitionings.
    */
  def interpolate(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      valueCol: String): DataFrame = {
    val rightPacked = right.select(
      (keys.map(col) :+ col(rightTs).as("__r_ts")) :+
        struct(col(rightTs).as("ts"), col(valueCol).as("v")).as("__r_pack"): _*)
    val back = backwardPacked(left, rightPacked, keys, leftTs,
      reverse = false, includeTies = true)
    val both = backwardPacked(back, rightPacked, keys, leftTs,
      reverse = true, includeTies = false)

    val isTs = left.schema(leftTs).dataType ==
      org.apache.spark.sql.types.TimestampType
    def asNum(c: Column): Column = if (isTs) unix_micros(c) else c.cast("long")
    val t = asNum(col(leftTs))
    val tb = asNum(col("__pack_b").getField("ts"))
    val tf = asNum(col("__pack_f").getField("ts"))
    val vb = col("__pack_b").getField("v")
    val vf = col("__pack_f").getField("v")
    // The backward fill is INCLUSIVE of ts == t and the forward fill is
    // strictly exclusive (left sorts before right in the reversed order),
    // so tb <= t < tf always: an exact hit appears as tb == t (where the
    // formula degenerates to vb), and tf - tb is never zero.
    val interp = when(col("__pack_b").isNull, vf)
      .when(col("__pack_f").isNull, vb)
      .otherwise(vb + (vf - vb) * ((t - tb) / (tf - tb)))
    val support = when(col("__pack_b").isNull && col("__pack_f").isNull,
        lit("none"))
      .when(col("__pack_b").isNull || col("__pack_f").isNull, lit("edge"))
      .when(tb === t, lit("exact"))
      .otherwise(lit("between"))
    both.withColumn(s"${valueCol}_interp", interp)
      .withColumn(s"${valueCol}_support", support)
      .drop("__pack_b", "__pack_f")
  }

  // Backward (reverse=false) or forward (reverse=true) fill of the packed
  // right struct onto left rows; output column __pack_b / __pack_f.
  // includeTies: whether a right row at EXACTLY the left timestamp is
  // visible to the fill (it sorts before the left row on ties) or not.
  private def backwardPacked(
      left: DataFrame, rightPacked: DataFrame,
      keys: Seq[String], leftTs: String, reverse: Boolean,
      includeTies: Boolean): DataFrame = {
    val out = if (reverse) "__pack_f" else "__pack_b"
    val (lSide, rSide) = if (includeTies) (1, 0) else (0, 1)
    val leftCols = left.columns
    val lTagged = left
      .withColumn(TsCol, col(leftTs))
      .withColumn(SideCol, lit(lSide))
      .withColumn("__r_pack",
        lit(null).cast(rightPacked.schema("__r_pack").dataType))
    val rTagged = rightPacked
      .withColumn(TsCol, col("__r_ts"))
      .withColumn(SideCol, lit(rSide))
      .drop("__r_ts")
    val harmonized = rTagged.select(
      keys.map(col) ++ Seq(col(TsCol), col(SideCol)) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__r_pack"): _*)

    val ord = if (reverse) col(TsCol).desc else col(TsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col(SideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.select(
        keys.map(col) ++ Seq(col(TsCol), col(SideCol)) ++
          leftCols.filterNot(keys.contains).map(col) :+ col("__r_pack"): _*)
      .unionByName(harmonized)
      .withColumn(out, last(col("__r_pack"), ignoreNulls = true).over(w))
      .filter(col(SideCol) === lit(lSide))
      .select(leftCols.toIndexedSeq.map(col) :+ col(out): _*)
  }
}
