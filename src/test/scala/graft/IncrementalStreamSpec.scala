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

  test("streaming admission: batch-1 admissions reject their batch-2 near-dups") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // word-permuted copies share the exact distinct word set: identical
    // minhash signature, Jaccard 1.0 — deterministic rejection
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val perm = "juliet india hotel golf foxtrot echo delta charlie bravo alpha"
    val other = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val permOther = "tango sierra romeo quebec papa oscar november mike lima kilo"
    val third = "uniform victor whiskey xray yankee zulu one two three four"

    val store0 = graft.operators.Dedup.buildSigStore(
      Seq((1L, base)).toDF("doc_id", "text"), "spec_stream_admit")
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val admitted = collection.concurrent.TrieMap[Long, Seq[Long]]()
    val q = streaming.Streaming.admitStream(
      ms.toDF().toDF("doc_id", "text"), store0, 0.8,
      (df, id) => admitted(id) =
        df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    try {
      ms.addData((50L, other), (51L, perm)) // 51 near-dups the seeded doc 1
      q.processAllAvailable()
      ms.addData((60L, permOther), (61L, third)) // 60 near-dups batch-1's 50
      q.processAllAvailable()
    } finally q.stop()
    assert(admitted.values.flatten.toSeq.sorted == Seq(50L, 61L),
      s"cross-batch rejection failed: $admitted")
    assert(admitted.size == 2 && admitted(admitted.keys.min) == Seq(50L),
      "batch 1 must admit the novel doc and reject the store near-dup")
  }
}
