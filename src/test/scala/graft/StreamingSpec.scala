package graft

import graft.streaming.{Sessionizer, UserSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

/** Drives the stateful sessionizer through a real incremental stream
  * (MemoryStream, two micro-batches) and asserts sessions close on gap and
  * on watermark timeout — behavior the batch oracle can't exercise.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val us = 1000L * 1000 // micros per second

  test("flatMapGroupsWithState sessionizer closes on gap and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)] // (user_id, ts_us, value)

    val sessions = input.toDS()
      .select(col("_1").as("user_id"), timestamp_micros(col("_2")).as("ts"),
        col("_3").as("value"))
      .withWatermark("ts", "0 seconds")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        Sessionizer.sessionize)

    val q = sessions.writeStream
      .queryName("sess_sink")
      .outputMode(OutputMode.Append())
      .format("memory")
      .start()

    // base offset keeps every event strictly above the initial watermark (0)
    val b = 1000L * us
    // batch 1: user 1 has two events 10 min apart (one session), then a
    // 40-min gap event -> first session closes inline
    input.addData((1L, b, 1.0), (1L, b + 600L * us, 2.0), (1L, b + 3000L * us, 5.0))
    q.processAllAvailable()
    val afterB1 = spark.table("sess_sink").as[UserSession].collect()
    assert(afterB1.toSeq == Seq(
      UserSession(1L, b, b + 600L * us + Sessionizer.GapUs, 2, 3.0)))

    // batch 2: far-future event advances the watermark past the open
    // session's timeout -> it closes via hasTimedOut
    input.addData((2L, b + 10000L * us, 9.0))
    q.processAllAvailable()
    val afterB2 = spark.table("sess_sink").as[UserSession].collect().sortBy(_.start_us)
    q.stop()

    assert(afterB2.exists(s =>
      s.user_id == 1L && s.start_us == b + 3000L * us && s.n_events == 1 && s.total == 5.0),
      s"timed-out session missing: ${afterB2.toSeq}")
  }

  test("streamed tumbling aggregation equals the batch plan") {
    val streamed = SparkEntry.queries("q70_stream_tumbling")(spark, sfDir)
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }
}
