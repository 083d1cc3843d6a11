package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One inventory query: the Spark implementation plus (optionally) the
  * equivalent DuckDB SQL for the driver's oracle hash-compare. Queries
  * without SQL equivalents get a weaker rows-only check.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Oracle-hash-safe sum of a money-like double column: accumulate in
    * decimal (exact, order-independent) and cast back to double. A plain
    * double SUM is order-dependent in its low bits, so Spark and DuckDB
    * would disagree on the hash at 60k+ rows.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  /** Oracle-hash-safe mean: decimal sum cast to double / count. No rounding:
    * both engines divide bit-identical doubles by identical counts, so the
    * IEEE result is identical — while round() implementations DIVERGE on
    * decimal-exact .5 boundaries (Spark BigDecimal HALF_UP vs DuckDB's
    * multiply+std::round), which these exact rational quotients do hit.
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))
}
