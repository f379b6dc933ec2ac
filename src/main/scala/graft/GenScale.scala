package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator (VERDICT r15 "Next round" #1): produce a
  * K×-scaled copy of a driver fixture directory with referential
  * integrity preserved, so the full oracled battery and the bench can run
  * at sf1 (10× sf0.1) and beyond and yield honest time-vs-sf exponents.
  *
  * Method: dimension roots (`region`, `nation`) copy verbatim; every
  * other table unions K copies with entity keys offset by copy×stride
  * (stride = max(key)+1 of the source), and FK columns offset by the SAME
  * stride as their parent so joins land exactly as in the source — join
  * fan-outs, group cardinalities per key, and selectivities are invariant
  * while entity counts and bytes scale ×K. Value distributions
  * (dates, amounts, flags, text) are untouched. `documents.text` is
  * salted with a per-copy suffix (and `n_chars` recomputed) so the
  * near-dup structure scales instead of every doc gaining K exact
  * clones; `embeddings.vec_id` offsets with vectors kept, which preserves
  * ANN recall structure per copy.
  *
  * Deterministic (no rand anywhere) — two runs produce identical data.
  *
  * Usage: runMain graft.GenScale <srcDir> <dstDir> <factor>
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    // optional 4th arg: comma-separated table subset (e.g. the VERDICT #7
    // 100x LLM-op rehearsal needs only documents+embeddings — scaling
    // lineitem 100x would burn disk the rehearsal never reads)
    val only = args.drop(3).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = Sessions.get("graft-genscale")
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, factorS.toInt, only)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, k: Int,
      only: Option[Set[String]] = None): Unit = {
    require(k >= 1, "factor must be >= 1")
    def wanted(t: String): Boolean = only.forall(_.contains(t))

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")

    def strideOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).head.getLong(0) + 1L

    /** Union K copies, adding copy*stride to each (column -> stride). */
    def scaled(df: DataFrame, offsets: Map[String, Long],
        salt: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        val shifted = offsets.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, (col(c).cast("long") + lit(i * s)).cast(
            df.schema(c).dataType))
        }
        salt(shifted, i)
      }.reduce(_ unionAll _)

    // fixed dims verbatim
    if (wanted("region")) wr(rd("region"), "region", 1)
    if (wanted("nation")) wr(rd("nation"), "nation", 1)

    val customer = rd("customer")
    val supplier = rd("supplier")
    val part = rd("part")
    val orders = rd("orders")
    val custS = strideOf(customer, "c_custkey")
    val suppS = strideOf(supplier, "s_suppkey")
    val partS = strideOf(part, "p_partkey")
    val ordS = strideOf(orders, "o_orderkey")

    if (wanted("customer")) wr(scaled(customer, Map("c_custkey" -> custS)),
      "customer", math.max(1, k / 2))
    if (wanted("supplier"))
      wr(scaled(supplier, Map("s_suppkey" -> suppS)), "supplier", 1)
    if (wanted("part"))
      wr(scaled(part, Map("p_partkey" -> partS)), "part", math.max(1, k / 2))
    if (wanted("orders"))
      wr(scaled(orders, Map("o_orderkey" -> ordS, "o_custkey" -> custS)),
        "orders", math.max(2, k))
    if (wanted("lineitem"))
      wr(scaled(rd("lineitem"), Map("l_orderkey" -> ordS,
        "l_partkey" -> partS, "l_suppkey" -> suppS)), "lineitem",
        math.max(4, 2 * k))

    // events: range-partition by event time, one ascending span per file —
    // the streaming battery consumes this table file-per-batch, and a
    // random row-to-file shuffle would put most of batch 2..K behind the
    // watermark batch 1 advanced (late-data drops that no real,
    // arrival-ordered stream exhibits)
    if (wanted("events")) {
    val events = rd("events")
    // user_id is an FK to customer (streaming q72 joins user_id=c_custkey,
    // ScaleOps joins o_custkey=user_id) — offset by the PARENT's stride so
    // copy i's events attach to copy i's customers/orders; offsetting by
    // events' own max(user_id)+1 re-attached every copy to copy-0 parents
    // and broke join-selectivity invariance (ADVICE r16 #1)
    scaled(events, Map(
      "event_id" -> strideOf(events, "event_id"),
      "user_id" -> custS))
      .repartitionByRange(math.max(2, k), col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    // FileStreamSource replays files in MODIFICATION-TIME order, and
    // parallel write tasks finish in arbitrary order — stamp ascending
    // mtimes in range (= part-number) order so the streamed table arrives
    // time-ordered, as a real ingest directory would
    locally {
      val d = new java.io.File(s"$dst/events.parquet")
      val parts = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
      val base = System.currentTimeMillis() - parts.length * 2000L
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(base + i * 2000L)
      }
    }

    }

    // documents: per-copy text salt keeps exact-dup rate ~flat per copy
    if (wanted("documents")) {
    val docs = rd("documents")
    wr(scaled(docs, Map("doc_id" -> strideOf(docs, "doc_id")),
      salt = (d, i) =>
        if (i == 0) d
        else d
          .withColumn("text", concat(col("text"), lit(s" rv$i"),
            pmod(col("doc_id"), lit(89)).cast("string")))
          .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents", math.max(1, k / 2))

    }

    if (wanted("embeddings")) {
      val emb = rd("embeddings")
      wr(scaled(emb, Map("vec_id" -> strideOf(emb, "vec_id"))),
        "embeddings", math.max(1, k / 2))
    }

    println(s"[genscale] wrote ${k}x of $src to $dst")
  }
}
