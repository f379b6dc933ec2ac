package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** True multi-batch incrementality: the events table split into four files,
  * consumed one file per micro-batch — the incremental windowed aggregation
  * must converge to exactly the single-shot batch result.
  */
class IncrementalStreamSpec extends SparkSpec {

  test("4-micro-batch incremental window agg equals the batch result") {
    val dir = Files.createTempDirectory("graft-incr").toString
    val events = Tables.load(spark, sfDir, "events")
    events.repartition(4).write.mode("overwrite").parquet(dir)
    val nFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nFiles >= 4, s"expected >=4 part files, got $nFiles")

    val streamed = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

    var batches = 0
    @volatile var last: Array[org.apache.spark.sql.Row] = Array.empty
    val q = streamed.writeStream
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        last = batch
          .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("hour"), col("event_type")).collect()
      }
      .start()
    q.awaitTermination()
    assert(batches >= 4, s"expected >=4 micro-batches, saw $batches")

    val got = last
    val expected = events
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour"), col("event_type")).collect()
    assert(got.toSeq == expected.toSeq)
  }
}
