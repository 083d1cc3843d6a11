package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {

  private def batchEvents = Tables.load(spark, sf(), "events")

  test("tumbling window counts match the batch equivalent") {
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.tumblingCounts(StreamingOps.eventsStream(spark, sf())),
      "t_tumbling", outputMode = "complete")
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
    val s = streamed.select("window_start", "event_type", "n")
      .orderBy("window_start", "event_type").collect().toSeq
    val b = batch.orderBy("window_start", "event_type").collect().toSeq
    assert(s === b)
    assert(s.nonEmpty)
  }

  test("session windows produce bounded per-user sessions") {
    val sess = StreamingOps.runToMemory(spark,
      StreamingOps.sessionWindows(StreamingOps.eventsStream(spark, sf())),
      "t_sessions", outputMode = "complete")
    assert(sess.count() > 0)
    // session integrity: total events across sessions == event count
    val total = sess.agg(sum("n_events")).head().getLong(0)
    assert(total === batchEvents.count())
  }

  test("dropDuplicatesWithinWatermark keeps one row per event_id") {
    val deduped = StreamingOps.runToMemory(spark,
      StreamingOps.dedupWithinWatermark(
        StreamingOps.eventsStream(spark, sf())), "t_dedup")
    assert(deduped.count() === batchEvents.count()) // fixture has unique ids
    assert(deduped.select("event_id").distinct().count() === deduped.count())
  }

  test("flatMapGroupsWithState gap detector matches the batch gap count") {
    implicit val s = spark
    val gaps = StreamingOps.runToMemory(spark,
      StreamingOps.streamingGaps(
        StreamingOps.eventsStream(spark, sf()), 1800.0).toDF(), "t_gaps")
    val batchGaps = graft.operators.Windowed
      .gaps(batchEvents, Seq("user_id"), "ts", 1800.0).count()
    assert(gaps.count() === batchGaps)
    assert(gaps.filter(col("gap_sec") <= 1800.0).count() === 0)
  }
}
