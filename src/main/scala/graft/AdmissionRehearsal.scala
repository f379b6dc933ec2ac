package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Admission-store rehearsal (VERDICT r10 #5/#6, post-append-only): grow
  * the corpus N×, keep the DELTA fixed, and measure what a nightly delta
  * run actually costs as the store grows —
  *
  *  1. batch: bootstrap a [[operators.Dedup.SigStore]] at 1× and N×,
  *     admit the same fixed delta through each, and report the admit
  *     wall time plus the BYTES the update wrote (the new epoch
  *     partition) against the store's own size. Under the r10
  *     union+overwrite formulation update bytes were O(store); under the
  *     epoch append they must track the delta.
  *  2. streaming: [[streaming.Streaming.admitStream]] over a file
  *     stream against the N× store, one delta file per micro-batch —
  *     per-batch wall must stay flat across batches (it cannot be while
  *     a batch rewrites the store).
  *
  * Usage: runMain graft.AdmissionRehearsal <sf1Dir> <outDir> [factor]
  * Run EXCLUSIVELY (bench hygiene).
  */
object AdmissionRehearsal {

  private def dirBytes(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (!f.exists) 0L
      else if (f.isDirectory) f.listFiles.map(walk).sum
      else f.length
    walk(new java.io.File(p))
  }

  def main(args: Array[String]): Unit = {
    val sf1 = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.get("graft-admission-rehearsal")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.rehearsal.unbounded", "true")
    import operators.Dedup

    val docs = Tables.load(spark, sf1, "documents")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.selectExpr("max(doc_id)").head().getLong(0) + 1
    val reps = spark.range(factor).selectExpr("id AS k")
    val grown = docs.crossJoin(reps)
      .selectExpr(
        s"doc_id + k * ${nDocs}L AS doc_id",
        "CASE WHEN k = 0 THEN text ELSE concat('v', k, ' ', text) END AS text")

    // the FIXED delta: 100 word-permutation near-dups of the first 100
    // docs (identical word set -> certain rejection at any store scale)
    // plus 100 novel docs — ids far above every replica band
    val base = 100L * factor * nDocs
    val nearDups = docs.filter(col("doc_id") < 100)
      .selectExpr(s"doc_id + ${base}L AS doc_id",
        "concat_ws(' ', reverse(split(text, ' '))) AS text")
    val novel = spark.range(100)
      .selectExpr(s"id + ${base + 1000}L AS doc_id",
        """concat_ws(' ', transform(sequence(0, 39),
             j -> concat('nv', id, 'w', j))) AS text""")
    val delta = nearDups.union(novel).repartition(8)
    delta.write.mode("overwrite").parquet(s"$out/delta1.parquet")
    val delta1 = spark.read.parquet(s"$out/delta1.parquet")

    println(s"factor=$factor corpus1x=${docs.count()} delta=${delta1.count()}")
    println(f"${"store"}%-8s ${"build(s)"}%9s ${"admit(s)"}%9s ${"admitted"}%9s " +
      f"${"storeKB"}%9s ${"epochKB"}%9s")

    for ((tag, corpus) <- Seq("1x" -> docs, s"${factor}x" -> grown)) {
      val baseDir = s"$out/store_$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(baseDir))
      val t0 = System.nanoTime()
      val store = Dedup.buildSigStore(corpus, s"adm_$tag", baseDir = Some(baseDir))
      val tBuild = (System.nanoTime() - t0) / 1e9
      val storeBytes = dirBytes(baseDir)
      val t1 = System.nanoTime()
      val (admitted, updated) =
        Dedup.incrementalAdmit(store, delta1, 0.8, None, 16, 2)
      val nAdm = admitted.count()
      val tAdmit = (System.nanoTime() - t1) / 1e9
      val epochBytes =
        dirBytes(s"$baseDir/adm_${tag}_words/epoch=${updated.epoch}") +
          dirBytes(s"$baseDir/adm_${tag}_bands/epoch=${updated.epoch}")
      println(f"$tag%-8s $tBuild%9.2f $tAdmit%9.2f $nAdm%9d " +
        f"${storeBytes / 1e3}%9.1f ${epochBytes / 1e3}%9.1f")
    }

    // ---- streaming flatness against the N× store ----
    val streamStore = Dedup.loadSigStore(spark, s"adm_${factor}x",
      s"$out/store_${factor}x")
    val inDir = s"$out/stream_in"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(inDir))
    new java.io.File(inDir).mkdirs()
    val batchTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .parquet(inDir)
    val q = streaming.Streaming.admitStream(stream, streamStore, 0.8,
      (batch: DataFrame, _: Long) =>
        { batch.write.format("noop").mode("overwrite").save() })
    // 4 serialized micro-batches, each a fresh novel+near-dup delta; the
    // near-dup half targets batch-(i-1) admissions so the chained store is
    // actually consulted
    for (i <- 1 to 4) {
      val off = base + 10000L * i
      val d = spark.range(100)
        .selectExpr(s"id + ${off}L AS doc_id",
          s"""concat_ws(' ', transform(sequence(0, 39),
               j -> concat('sb$i', 'x', id, 'w', j))) AS text""")
      d.repartition(2).write.mode("overwrite").parquet(s"$out/stream_batch_$i")
      val src = new java.io.File(s"$out/stream_batch_$i")
      src.listFiles.filter(f => f.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(inDir, s"b${i}_${f.getName}").toPath)
      }
      val t0 = System.nanoTime()
      q.processAllAvailable()
      batchTimes += (System.nanoTime() - t0) / 1e9
    }
    q.stop()
    println("stream batches (s): " +
      batchTimes.map(t => f"$t%.2f").mkString(", "))
    val flat = batchTimes.last <= batchTimes.head * 2.5
    println(f"stream flatness last/first = ${batchTimes.last / batchTimes.head}%.2f " +
      (if (flat) "(flat)" else "(NOT FLAT)"))
    spark.stop()
  }
}
