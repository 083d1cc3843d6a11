package graft

import org.apache.spark.sql.functions._
import graft.functions.{Aggregators, TimeOps}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("letCol binds once and is semantically transparent") {
    import graft.functions.TextOps.letCol
    val df = Seq("a b c", "", null.asInstanceOf[String]).toDF("t")
    // identity: letCol(x)(v => f(v)) == f(x)
    val got = df.select(
      letCol(split(col("t"), " "))(ws => size(ws)).as("n"),
      size(split(col("t"), " ")).as("want")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getInt(0) === r.getInt(1))
    }
    // null input flows through the binding (array(null) -> body(null))
    val n = df.filter(col("t").isNull)
      .select(letCol(col("t"))(v => length(v))).head()
    assert(n.isNullAt(0))
  }

  test("QuantileAgg matches Spark's exact percentile") {
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val ds = vals.toDS()
    val med = ds.select(Aggregators.QuantileAgg(0.5).toColumn).head()
    val ref = ds.toDF("v").agg(percentile(col("v"), lit(0.5))).head().getDouble(0)
    assert(med === ref)
  }

  test("QuantileBundleAgg equals per-quantile QuantileAggs from one sort") {
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val ds = vals.toDS()
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val bundle = ds.select(Aggregators.QuantileBundleAgg(ps).toColumn).head()
    val singles = ps.map(p =>
      ds.select(Aggregators.QuantileAgg(p).toColumn).head())
    assert(bundle.toSeq === singles)
  }

  test("TrimmedMeanAgg matches the two-pass operator") {
    val vals = (1 to 100).map(_.toDouble)
    val ds = vals.toDS()
    val tm = ds.select(Aggregators.TrimmedMeanAgg(0.25, 0.75).toColumn).head()
    val kept = vals.filter(v => v >= 25.75 && v <= 75.25)
    assert(math.abs(tm - kept.sum / kept.size) < 1e-9)
  }

  test("interpolate matches numpy linear quantile convention") {
    val a = Array(1.0, 2.0, 3.0, 4.0)
    assert(Aggregators.interpolate(a, 0.5) === 2.5)
    assert(Aggregators.interpolate(a, 0.0) === 1.0)
    assert(Aggregators.interpolate(a, 1.0) === 4.0)
    assert(Aggregators.interpolate(a, 0.25) === 1.75)
  }

  test("localizeTimestamps shifts wall-clock by the zone offset") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))
      .toDF("ts").withColumn("name", lit("x"))
    val local = TimeOps.localizeTimestamps(df, "America/Denver")
    val got = local.select(date_format(col("ts"), "HH:mm")).head().getString(0)
    assert(got === "06:00") // UTC-6 in June (MDT)
    assert(local.columns.toSeq === Seq("ts", "name"))
  }

  test("timezoneFromLongitude column matches the scalar banding") {
    val got = Seq(-120.0, -105.0, -90.0, -75.0, 2.35).toDF("lng")
      .select(TimeOps.timezoneFromLongitude(col("lng"))).collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(got === Seq(Some("America/Los_Angeles"), Some("America/Denver"),
      Some("America/Chicago"), Some("America/New_York"), None))
  }

  test("calendarBlock labels for export partitioning") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-06-05 12:00:00")).toDF("ts")
    assert(df.select(TimeOps.calendarBlock(col("ts"), "month")).head().getString(0)
      === "2024-06")
    assert(df.select(TimeOps.calendarBlock(col("ts"), "day")).head().getString(0)
      === "2024-06-05")
    assert(df.select(TimeOps.calendarBlock(col("ts"), "week")).head().getString(0)
      .startsWith("2024-W"))
  }

  test("slidingChunks covers the text with overlap and a short tail") {
    import graft.functions.TextOps
    val df = Seq("a b c d e", "a b c d e f", "a", "", null.asInstanceOf[String])
      .toDF("t")
    val got = df.select(TextOps.slidingChunks(col("t"), 3, 2).as("c"))
      .collect().map(r => Option(r.getSeq[String](0)).map(_.toList))
    assert(got(0) === Some(List("a b c", "c d e")))
    assert(got(1) === Some(List("a b c", "c d e", "e f"))) // short tail
    assert(got(2) === Some(List("a")))
    assert(got(3) === Some(Nil))   // empty text -> zero chunks
    assert(got(4) === None)        // null propagates
  }

  test("PII counting and redaction handle emails, IPs, and edge overlaps") {
    import graft.functions.TextOps
    val cases = Seq(
      ("mail me at a.b+c@sub.example.org thanks", 1, 0,
        "mail me at <EMAIL> thanks"),
      ("server 192.168.1.1 and 10.0.0.255 up", 0, 2,
        "server <IP> and <IP> up"),
      // dotted quad inside an email's local part: email wins (replaced
      // first), no partial <IP> rewrite
      ("1.2.3.4@example.com wrote", 1, 1, "<EMAIL> wrote"),
      ("no pii here 1.2 or v3", 0, 0, "no pii here 1.2 or v3"),
      (null.asInstanceOf[String], -1, -1, null))
    val got = cases.map(_._1).toDF("t").select(
      TextOps.piiEmailCount(col("t")).as("ne"),
      TextOps.piiIpCount(col("t")).as("ni"),
      TextOps.redactPii(col("t")).as("red")).collect()
    cases.zip(got).foreach { case ((in, ne, ni, red), r) =>
      withClue(s"input: $in") {
        if (in == null) {
          assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
        } else {
          assert(r.getInt(0) === ne)
          assert(r.getInt(1) === ni)
          assert(r.getString(2) === red)
        }
      }
    }
  }
}
