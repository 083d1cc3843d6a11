package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.DecodeExpressions
import graft.seamf.{HalfFloat, SeamfCodec}

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vals = Array(1.0f, -2.5f, 0.25f, -77.0f)
  private def payload = SeamfCodec.xzCompress(HalfFloat.encodeVector(vals))

  test("xz_decompress + half_decode round-trip via the Column DSL") {
    val df = Seq(Tuple1(payload)).toDF("content")
    val got = df.select(DecodeExpressions.half_decode(
        DecodeExpressions.xz_decompress(col("content"))).as("v"))
      .head().getSeq[Float](0)
    assert(got.toSeq === vals.toSeq)
  }

  test("registered SQL functions decode in pure SQL") {
    DecodeExpressions.registerAll(spark)
    Seq(Tuple1(payload)).toDF("content").createOrReplaceTempView("payloads")
    val got = spark.sql(
      "SELECT half_decode(xz_decompress(content)) AS v FROM payloads")
      .head().getSeq[Float](0)
    assert(got.toSeq === vals.toSeq)
  }

  test("expressions stay inside whole-stage codegen") {
    // a parquet scan keeps the input non-literal (a literal input would be
    // constant-folded into a LocalTableScan before codegen)
    val dir = java.nio.file.Files.createTempDirectory("exprtest").toString
    Seq(Tuple1(payload)).toDF("content").write.mode("overwrite")
      .parquet(s"$dir/p")
    val df = spark.read.parquet(s"$dir/p")
      .select(size(DecodeExpressions.half_decode(
        DecodeExpressions.xz_decompress(col("content")))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" stage prefix marks operators inside WholeStageCodegen
    assert(plan.contains("*(1) Project"), plan)
    assert(df.head().getInt(0) === vals.length)
  }

  test("null propagates, type mismatch is an analysis error") {
    val df = Seq(Tuple1(null: Array[Byte])).toDF("content")
    assert(df.select(DecodeExpressions.xz_decompress(col("content")))
      .head().isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("x").select(DecodeExpressions.half_decode(col("x"))).head()
    }
  }
}
