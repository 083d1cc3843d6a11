package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key plans with no shuffle exchange") {
    // disable auto-broadcast: at test scale everything broadcasts, which
    // hides the bucketing effect this asserts (at 100 TB neither side fits)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
  }

  private def bucketedJoinBody(): Unit = {
    val li = Tables.load(spark, sf(), "lineitem")
    val ord = Tables.load(spark, sf(), "orders")
    // drop both the catalog entry and any orphaned warehouse dir from a
    // previous test JVM (the in-memory catalog forgets, the disk doesn't)
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Bucketing.writeBucketed(li, "li_bucketed", Seq("l_orderkey"), 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", Seq("o_orderkey"), 8)

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    // the join itself must not shuffle either side (buckets line up);
    // only the final tiny aggregation exchanges
    val planStr = joined.queryExecution.executedPlan.toString
    val joinPart = planStr.split("SortMergeJoin")(1)
    assert(!joinPart.contains("Exchange hashpartitioning"),
      s"join shuffled:\n$planStr")
    assert(joined.count() === 5)

    // unbucketed baseline DOES shuffle both sides
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)))
    assert(Bucketing.hasShuffle(plain))
  }
}
