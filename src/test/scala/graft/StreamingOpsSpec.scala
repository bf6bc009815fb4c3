package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Tables
import graft.streaming.StreamingOps

class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("tumbling append emits exactly the watermark-closed windows of the batch answer") {
    val streamed = StreamingOps.st_tumbling(spark, sf)
    val events = Tables.events(spark, sf)
    val mx = events.agg(max("ts")).head.getTimestamp(0)
    val batch = events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n"))
      .filter(col("window_end") <= lit(new java.sql.Timestamp(mx.getTime - 3600 * 1000)))
    assert(streamed.count() == batch.count())
    assert(streamed.join(batch, Seq("window_start", "event_type", "n"), "left_anti").count() == 0)
  }

  test("streaming dedup emits each (day, user, type) key exactly once and actually drops rows") {
    val r = StreamingOps.st_dedup(spark, sf)
    val events = Tables.events(spark, sf)
    val batchKeys = events
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"), col("event_type"))
      .distinct()
    assert(r.count() == batchKeys.count())
    assert(r.count() < events.count(), "fixture must contain duplicate keys for the dedup to be non-vacuous")
    assert(r.join(batchKeys, Seq("day", "user_id", "event_type"), "left_anti").count() == 0)
  }

  test("sliding complete mode covers every event twice (2d window, 1d slide)") {
    val r = StreamingOps.st_sliding(spark, sf)
    val total = r.agg(sum("n")).head.getLong(0)
    assert(total == 2 * Tables.events(spark, sf).count())
  }

  test("session windows: n sums to watermark-closed prefix, gap respected") {
    val r = StreamingOps.st_session(spark, sf).collect()
    assert(r.nonEmpty)
    // session invariant: end - start >= gap (end = last event + 30min)
    r.foreach { row =>
      val span = row.getTimestamp(1).getTime - row.getTimestamp(0).getTime
      assert(span >= 30 * 60 * 1000, row.toString)
    }
    // no overlapping sessions per user
    r.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getTimestamp(0).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(1).getTime <= b.getTimestamp(0).getTime,
            s"overlap: $a / $b")
        case _ =>
      }
    }
  }
}
