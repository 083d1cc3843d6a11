package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data clustering.
  *
  * Sorting/partitioning a table by the interleaved-bit z-value co-locates
  * rows that are close in EVERY key dimension, so per-file min/max ranges
  * stay tight on all of them simultaneously — the layout trick behind
  * multi-column data skipping in modern lakehouses (a linear sort gives
  * tight ranges on the leading column only). `SeamfLake`-style exports
  * would apply this between `repartitionByRange` and the writer.
  *
  * The z-value is a pure per-row bit-arithmetic column expression
  * (shift/mask/add, whole-stage codegen, no shuffle of its own); the only
  * data movement is the range partition/sort the caller already intended.
  * Identical integer semantics in any engine — q60's oracle replays it in
  * DuckDB with `>>`/`&`.
  */
object ZOrder {

  private def bit(c: Column, i: Int): Column =
    shiftright(c, i).bitwiseAND(lit(1L))

  /** Interleave the low `bits` bits of two non-negative integral columns:
    * x's bit i lands at position 2i, y's at 2i+1. `bits` <= 31 keeps the
    * result in a positive long.
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      bit(x.cast("long"), i) * lit(1L << (2 * i)) +
        bit(y.cast("long"), i) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The matching DuckDB SQL expression for [[zValue2]] (oracle replay). */
  def zValue2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
}
