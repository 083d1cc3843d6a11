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
    */
  def backward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // Harmonized union schema: keys ++ ts ++ side ++ left payload ++ right values
    val lTagged = left
      .withColumn(TsCol, col(leftTs))
      .withColumn(SideCol, lit(1))
      .select((keys.map(col) :+ col(TsCol) :+ col(SideCol)) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn(TsCol, col(rightTs))
      .withColumn(SideCol, lit(0))
      .select((keys.map(col) :+ col(TsCol) :+ col(SideCol)) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TsCol).asc, col(SideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .select(col("*") +: valueCols.map(c =>
        last(col(c), ignoreNulls = true).over(w).as(s"__asof_$c")): _*)

    filled.filter(col(SideCol) === 1)
      .select(leftCols.toIndexedSeq.map(col) ++
        valueCols.map(c => col(s"__asof_$c").as(c)): _*)
  }

  /** Nearest as-of join on a single key/ts pair: right value whose timestamp
    * minimizes |leftTs - rightTs| (backward wins ties, matching pandas
    * `method='nearest'` lower-index preference for equal distance).
    * Appends `valueCol` and `<valueCol>_ts` (the matched right timestamp).
    */
  def nearest(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      valueCol: String): DataFrame = {
    val rightPacked = right.select(
      (keys.map(col) :+ col(rightTs).as("__r_ts")) :+
        struct(col(rightTs).as("ts"), col(valueCol).as("v")).as("__r_pack"): _*)

    val back = backwardPacked(left, rightPacked, keys, leftTs, reverse = false)
    val both = backwardPacked(back, rightPacked, keys, leftTs, reverse = true)

    // |delta| arithmetic: epoch micros for TimestampType keys, raw numeric
    // value otherwise (the operator is generic over orderable time axes).
    val isTs = left.schema(leftTs).dataType ==
      org.apache.spark.sql.types.TimestampType
    def asNum(c: Column): Column = if (isTs) unix_micros(c) else c.cast("long")
    val lUs = asNum(col(leftTs))
    val bUs = asNum(col("__pack_b").getField("ts"))
    val fUs = asNum(col("__pack_f").getField("ts"))
    val pickB = col("__pack_f").isNull ||
      (col("__pack_b").isNotNull && (lUs - bUs) <= (fUs - lUs))
    val chosen = when(pickB, col("__pack_b")).otherwise(col("__pack_f"))
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
    val back = backwardPacked(left, rightPacked, keys, leftTs, reverse = false)
    val both = backwardPacked(back, rightPacked, keys, leftTs, reverse = true)

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
  private def backwardPacked(
      left: DataFrame, rightPacked: DataFrame,
      keys: Seq[String], leftTs: String, reverse: Boolean): DataFrame = {
    val out = if (reverse) "__pack_f" else "__pack_b"
    val leftCols = left.columns
    val lTagged = left
      .withColumn(TsCol, col(leftTs))
      .withColumn(SideCol, lit(if (reverse) 0 else 1))
      .withColumn("__r_pack",
        lit(null).cast(rightPacked.schema("__r_pack").dataType))
    val rTagged = rightPacked
      .withColumn(TsCol, col("__r_ts"))
      .withColumn(SideCol, lit(if (reverse) 1 else 0))
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
      .filter(col(SideCol) === lit(if (reverse) 0 else 1))
      .select(leftCols.toIndexedSeq.map(col) :+ col(out): _*)
  }
}
