package graft.streaming

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.10 — pure extension: the
  * reference is batch-MR only). The same `events` table is consumed as a
  * file stream; windowed aggregations run through a real StreamingQuery so
  * the driver's oracle checks streaming results against batch SQL.
  *
  * Scale posture: file-source streaming with `maxFilesPerTrigger` batches,
  * event-time watermarks bound state, and the stateful sessionizer keys by
  * user_id so state partitions across executors like any keyed shuffle.
  */
object Streaming extends QueryModule {

  /** documents schema for readStream (q107 streams the corpus table). */
  private val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The stream declares whatever schema the fixture parquet actually has
    * (peeked via a batch footer read — readStream cannot infer), then runs
    * the same `ts` normalization as the batch path. A hardcoded schema here
    * once read TIMESTAMP_MICROS physical int64 through a declared LongType
    * and silently compressed every timestamp 1000× — deriving the schema
    * from the file makes that unit error structurally impossible, and
    * FixtureSpec's era-bound assert on min/max(ts) backstops it.
    */
  /** File-source path for a fixture table that is either a single file
    * (driver fixtures: `<dir>/<t>.parquet`) or a multi-file directory
    * (GenScale sf1+ fixtures). `pathGlobFilter` matches LEAF file names
    * only, so for a directory the stream must point AT the directory —
    * the glob would silently match nothing (0-row streams, r16 sf1 run).
    */
  private def sourcePath(spark: SparkSession, sfDir: String,
      table: String): (String, Option[String]) = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory) (p.toString, None)
    else (sfDir, Some(s"$table.parquet"))
  }

  /** Trigger sizing rule (VERDICT r16 #5). `maxFilesPerTrigger=1` scales
    * micro-batch COUNT with ingest-directory size — at a million-file
    * directory that is a million micro-batches of fixed per-batch overhead
    * (state-store commit, offset log, planning), the q111 α≈1 signature at
    * sf1. Size the trigger to the DIRECTORY instead: take
    * ceil(nFiles / 3) files per trigger so batch count stays ~constant
    * (≤3) as the directory grows, with per-batch overhead amortized over
    * 1/3 of the data. Watermark safety is unchanged: files are produced
    * mtime-ascending (GenScale stamps range order — a real ingest
    * directory's arrival order) and FileStreamSource takes them in mtime
    * order, so a batch of k consecutive files is a PREFIX of the stream —
    * the watermark after the batch is ≤ the max event time delivered, and
    * no later file holds earlier data than what already passed. Explicit
    * override: SET graft.stream.filesPerTrigger=N (specs use it to force
    * multi-batch topologies on small fixtures).
    */
  private[graft] def filesPerTrigger(spark: SparkSession, path: String): Int =
    spark.conf.getOption("graft.stream.filesPerTrigger").map(_.toInt)
      .getOrElse {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val n =
          if (fs.getFileStatus(p).isDirectory)
            fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
          else 1
        math.max(1, math.ceil(n / 3.0).toInt)
      }

  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val (path, glob) = sourcePath(spark, sfDir, "events")
    val reader = spark.readStream
      .schema(graft.Tables.eventsRawSchema(spark, sfDir))
      .option("maxFilesPerTrigger", filesPerTrigger(spark, path).toString)
    graft.Tables.normalizeEventsTs(
      glob.fold(reader)(g => reader.option("pathGlobFilter", g))
        .parquet(path))
  }

  /** Runs a streaming DataFrame to completion into an in-memory sink and
    * returns the materialized result.
    *
    * Streaming state partitioning is pinned at first run to
    * `spark.sql.shuffle.partitions`; every partition is a separate
    * checkpointed state store, so an oversized count is pure per-batch IO
    * overhead. The stream runs with a state-sized partition count (restored
    * afterwards) — on a real cluster this knob scales with stateful-op
    * parallelism, not with the batch shuffle width.
    */
  def runToTable(spark: SparkSession, streamed: DataFrame, name: String,
      mode: OutputMode, statePartitions: Int = 8): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    spark.conf.set(key, statePartitions.toString)
    try {
      val q = streamed.writeStream
        .queryName(name)
        .outputMode(mode)
        .format("memory")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, saved)
    spark.table(name)
  }

  /** STREAMING delta-dedup admission (VERDICT r9 #4) — the ingest-time half
    * of the dedup lifecycle: every micro-batch of `stream(doc_id, text)` is
    * admitted against the signature store via
    * [[graft.operators.Dedup.incrementalAdmit]], the admitted rows go to
    * `sink(batchDf, batchId)`, and the UPDATED store chains into the next
    * batch — a doc admitted in batch 1 rejects its near-dup in batch 2
    * (IncrementalStreamSpec). foreachBatch is the right tool: admission is
    * a multi-job batch pipeline (stage writes, iterative joins) that
    * Structured Streaming's incremental planner cannot express, and
    * micro-batches are serialized by contract, so the store
    * read-modify-write is race-free. On a real cluster the store lives on
    * the shared FS (`graft.exec.scratchdir`), exactly like the batch path.
    */
  def admitStream(stream: DataFrame,
      store0: graft.operators.Dedup.SigStore, threshold: Double,
      sink: (DataFrame, Long) => Unit,
      cap: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val ref = new java.util.concurrent.atomic.AtomicReference(store0)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val (admitted, updated) = graft.operators.Dedup.incrementalAdmit(
            ref.get, batch, threshold, cap, 16, 2)
          sink(admitted, id)
          ref.set(updated)
        }
      }
      .start()
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- Tumbling event-time window over a real stream (readStream →
    //      watermark → window agg → memory sink, AvailableNow). Complete
    //      mode so every window is emitted for the oracle comparison.
    QueryDef(
      "q70_stream_tumbling",
      (s, dir) => {
        val agg = eventsStream(s, dir)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        runToTable(s, agg, "q70_sink", OutputMode.Complete())
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        event_type, count(*) AS n, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // ---- Stream-static join: the events stream enriched against the
    //      static customer dimension (broadcast per micro-batch), then
    //      aggregated — the canonical streaming-enrichment topology
    QueryDef(
      "q72_stream_static_join",
      (s, dir) => {
        val cust = graft.Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val agg = eventsStream(s, dir)
          .join(broadcast(cust), col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        runToTable(s, agg, "q72_sink", OutputMode.Complete())
          .orderBy(col("c_mktsegment"), col("event_type"))
      },
      Some("""SELECT c_mktsegment, event_type, count(*) AS n,
        round(sum(value), 2) AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""")),

    // ---- Stream-stream interval self-join: pairs of events by the same
    //      user within 10 minutes, both sides watermarked (join state is
    //      bounded by the watermark + interval, the 100 TB-safe topology)
    QueryDef(
      "q73b_stream_stream_join",
      (s, dir) => {
        // filter BEFORE the watermark node so only the selected users'
        // events ever enter the join state store. Both join sides branch
        // off ONE source: two independent readStream instances are not
        // batch-aligned (each pulls its own file-per-trigger), and a
        // one-batch skew lets the join watermark evict a side's rows
        // before their same-file matches arrive (measured at sf1: 15 of
        // 22 pairs lost); one source also means one scan per batch.
        val base = eventsStream(s, dir).filter(col("user_id") < 20)
        val left = base
          .select(col("user_id"), col("ts").as("ts1"), col("event_id").as("e1"))
          .withWatermark("ts1", "10 minutes")
        val right = base
          .select(col("user_id").as("user_id2"), col("ts").as("ts2"),
            col("event_id").as("e2"))
          .withWatermark("ts2", "10 minutes")
        // e1<e2 stays OUT of the join condition: inside it, Spark's
        // StreamingJoinHelper cannot extract the state-value watermark
        // from the mixed clause (logged internal error per batch) and the
        // join falls back to coarser state cleanup; as a post-join filter
        // the band condition stays cleanly analyzable — identical
        // semantics for an inner join
        val joined = left.join(right,
          col("user_id") === col("user_id2")
            && col("ts2") >= col("ts1")
            && col("ts2") <= col("ts1") + expr("INTERVAL 10 MINUTES"))
          .filter(col("e1") < col("e2"))
        runToTable(s, joined, "q73b_sink", OutputMode.Append())
          .selectExpr("user_id", "e1", "e2",
            "unix_millis(ts2) - unix_millis(ts1) AS gap_ms")
          .orderBy(col("user_id"), col("e1"), col("e2"))
      },
      Some("""SELECT a.user_id, a.event_id AS e1, b.event_id AS e2,
        epoch_ms(b.ts) - epoch_ms(a.ts) AS gap_ms
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
         AND a.event_id < b.event_id
        WHERE a.user_id < 20 AND b.user_id < 20
        ORDER BY a.user_id, e1, e2""")),

    // ---- Streaming dedup: dropDuplicates on the dedup key with state
    //      (the streaming form of exact dedup — q50's batch counterpart);
    //      projecting only the key makes survivor choice irrelevant, so
    //      the streamed result equals batch DISTINCT exactly
    QueryDef(
      "q76_stream_dedup",
      (s, dir) => {
        val deduped = eventsStream(s, dir)
          .withWatermark("ts", "10 minutes")
          .selectExpr("user_id", "event_type",
            "date_trunc('hour', ts) AS hr")
          .dropDuplicates("user_id", "event_type", "hr")
        val agg = runToTable(s, deduped, "q76_sink", OutputMode.Append())
        agg.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_distinct"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n_distinct
        FROM (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
              FROM events)
        GROUP BY event_type ORDER BY event_type""")),

    // ---- Streaming benchmark decontamination — q102's production shape:
    //      the corpus arrives continuously (file stream), the eval-set
    //      probe shingles are a STATIC broadcast side refreshed per
    //      micro-batch. Matches GPT-3/Llama-style scrubbing run as
    //      ingest-time filtering instead of a batch sweep. State is one
    //      counter per contaminated doc (hit docs only — benchmark-overlap
    //      cardinality, not corpus cardinality); at web scale an ingest-
    //      time watermark would bound it further. Shingle hashing happens
    //      BEFORE the join, partition-parallel, exactly as in batch.
    QueryDef(
      "q107_stream_decontam",
      (s, dir) => {
        val probes = graft.Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 20 === 7)
          .selectExpr("explode_outer(shingle_md5(trim(text), 8)) AS sh")
          .filter(col("sh").isNotNull).distinct()
        val (docPath, docGlob) = sourcePath(s, dir, "documents")
        val reader = s.readStream
          .schema(documentsSchema)
          .option("maxFilesPerTrigger", filesPerTrigger(s, docPath).toString)
        val hits = docGlob.fold(reader)(g => reader.option("pathGlobFilter", g))
          .parquet(docPath)
          .filter(col("doc_id") % 20 =!= 7)
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("doc_id", "explode_outer(shingle_md5(trim(text), 8)) AS sh")
          .join(broadcast(probes), Seq("sh"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hits"))
        runToTable(s, hits, "q107_sink", OutputMode.Complete())
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
          SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
        probes AS (
          SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 6),
            i -> md5(array_to_string(ws[i:i+7], ' ')))) AS sh
          FROM w WHERE doc_id % 20 = 7 AND len(ws) >= 8),
        cand AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 6),
            i -> md5(array_to_string(ws[i:i+7], ' '))))) AS sh
          FROM w WHERE doc_id % 20 <> 7 AND len(ws) >= 8)
        SELECT doc_id, count(*) AS n_hits
        FROM cand JOIN probes USING (sh)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- Streaming frequent items: the Misra-Gries `freq_items` aggregate
    //      (functions/FreqItems.scala) running under Structured Streaming —
    //      partial summaries merge across shuffle partitions and micro-
    //      batches through the SAME merge law PropertySpec pins, and k ≫
    //      |distinct| keeps it in the exact regime so the batch oracle
    //      checks the streamed counts exactly. The production shape of
    //      hot-key / heavy-user monitoring over an event stream: state per
    //      group is ≤ k counters, never one row per distinct key.
    QueryDef(
      "q111_stream_freq",
      (s, dir) => {
        // explicit null-key filter on BOTH sides: the aggregate's update
        // skips nulls while a SQL GROUP BY would count a NULL group — on
        // null-free fixtures they agree, the filters make it a contract
        val agg = eventsStream(s, dir)
          .filter(col("user_id").isNotNull)
          .groupBy(col("event_type"))
          .agg(expr("freq_items(cast(user_id AS string), 65536)").as("fi"))
        runToTable(s, agg, "q111_sink", OutputMode.Complete())
          .selectExpr("event_type", "posexplode(slice(fi, 1, 5)) AS (i, e)")
          .selectExpr("event_type", "cast(i + 1 AS int) AS rk",
            "e.item AS user_key", "e.cnt AS cnt")
          .orderBy(col("event_type"), col("rk"))
      },
      Some("""WITH c AS (
          SELECT event_type, CAST(user_id AS VARCHAR) AS u, count(*) AS cnt
          FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        r AS (SELECT event_type, u, cnt,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY cnt DESC, u) AS rk
              FROM c)
        SELECT event_type, CAST(rk AS INT) AS rk, u AS user_key, cnt
        FROM r WHERE rk <= 5 ORDER BY event_type, rk""")),

    // ---- session_window (30-min gap) batch aggregation — the declarative
    //      sibling of the stateful sessionizer below; oracled against the
    //      classic lag/cumsum sessionization SQL
    QueryDef(
      "q71_session_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("s_start")),
      Some("""WITH e AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events),
        s AS (SELECT user_id, ts, value,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM e)
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM s GROUP BY user_id, sid ORDER BY user_id, s_start"""))
  )
}

/** Emitted session record of the stateful sessionizer. */
final case class UserSession(
    user_id: Long, start_us: Long, end_us: Long, n_events: Long, total: Double)

/** In-flight state: session bounds + running aggregates (micros since epoch
  * — Long state keeps the encoder simple and exact).
  */
final case class SessionState(
    startUs: Long, lastUs: Long, n: Long, total: Double)

/** Stateful sessionization via flatMapGroupsWithState (the KeyValueGrouped
  * custom-state API the reference's batch engine has no analogue for;
  * closest lineage is the memory-bounded per-group flush in
  * GroupByOperator.java:694-778). Sessions close after `gap` of event-time
  * silence; the event-time timeout emits them as the watermark passes.
  */
object Sessionizer {
  val GapUs: Long = 30L * 60 * 1000 * 1000

  private def toUs(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  def sessionize(
      key: Long,
      rows: Iterator[(Long, java.sql.Timestamp, Double)], // (user_id, ts, value)
      state: GroupState[SessionState]): Iterator[UserSession] = {
    val sorted = rows.map { case (u, t, v) => (u, toUs(t), v) }.toSeq.sortBy(_._2)
    var closed = List.empty[UserSession]
    var cur = state.getOption
    if (sorted.nonEmpty) {
      sorted.foreach { case (_, us, v) =>
        cur match {
          case Some(st) if us - st.lastUs < GapUs =>
            cur = Some(st.copy(lastUs = us, n = st.n + 1, total = st.total + v))
          case Some(st) =>
            closed ::= UserSession(key, st.startUs, st.lastUs + GapUs, st.n, st.total)
            cur = Some(SessionState(us, us, 1, v))
          case None =>
            cur = Some(SessionState(us, us, 1, v))
        }
      }
      state.update(cur.get)
      state.setTimeoutTimestamp((cur.get.lastUs + GapUs) / 1000)
      closed.reverseIterator
    } else if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      Iterator.single(UserSession(key, st.startUs, st.lastUs + GapUs, st.n, st.total))
    } else Iterator.empty
  }
}
