package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-technique operators: explicit skew-salting (the manual form of the
  * reference's runtime skew path, SkewJoinHandler.java:73 / AQE skew join),
  * the extended window-function battery, and ROLLUP (absent in the
  * reference's grammar — capability extension like §2.6).
  */
object ScaleOps extends QueryModule {

  val defs: Seq[QueryDef] = Seq(

    // ---- Salted skew join: big side derives a deterministic salt, small
    //      side replicates across the salt domain; join on (key, salt) then
    //      aggregate — result provably equals the unsalted join. The manual
    //      fallback when a single hot key overwhelms one reducer and AQE
    //      splitting isn't available (e.g. pre-shuffle bucketing decisions).
    QueryDef(
      "q49_salted_join",
      (s, dir) => {
        val salts = 8
        val big = t(s, dir, "lineitem")
          .withColumn("salt", pmod(col("l_linenumber"), lit(salts)))
        val small = t(s, dir, "supplier")
          .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
        big.join(small,
            col("l_suppkey") === col("s_suppkey")
              && big("salt") === small("salt"))
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")
            .cast("decimal(30,6)")).cast("double"), 2).as("rev"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey, count(*) AS n, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE), 2) AS rev
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // ---- SMB bucket join (SMBMapJoinOperator.java:51; CLUSTERED BY +
    //      SORTED BY INTO n BUCKETS → bucketBy+sortBy): both sides
    //      pre-bucketed on the join key, so the join AND the following
    //      groupBy on the same key run with ZERO exchanges — the plan is
    //      asserted shuffle-free in-query (the only permissible exchange
    //      is the final deterministic ORDER BY, outside the assert). At
    //      100 TB this is the co-located-join path: bucket the fact tables
    //      once at ingest, never shuffle them again for key-aligned work.
    QueryDef(
      "q101_smb_join",
      (s, dir) => {
        val sfx = (dir.hashCode & Int.MaxValue).toString // per-SF tables
        val to = s"smb_orders_$sfx"
        val tl = s"smb_lineitem_$sfx"
        // a fresh JVM has an empty in-memory catalog but the warehouse dir
        // survives — clear BOTH or saveAsTable hits LOCATION_ALREADY_EXISTS
        Seq(to, tl).foreach { name =>
          s.sql(s"DROP TABLE IF EXISTS $name")
          val p = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), name)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        // repartition on the bucket column BEFORE the bucketed write:
        // repartition's HashPartitioning and bucketBy use the same
        // murmur3-pmod hash, so each task holds exactly one bucket and
        // writes ONE file — without it every task writes a sliver of all
        // 8 buckets (tasks × buckets small files, the classic bucketed-
        // write mistake at scale)
        t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
          .repartition(8, col("o_orderkey"))
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable(to)
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"))
          .repartition(8, col("l_orderkey"))
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable(tl)
        // merge hint: at test SF the filtered side fits a broadcast, which
        // would dodge the plan being demonstrated — at 100 TB both sides
        // are fact tables and SortMergeJoin IS the choice AQE makes
        val joined = s.table(to).filter(col("o_orderkey") <= 2000).hint("merge")
          .join(s.table(tl), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("rev"))
        val plan = joined.queryExecution.executedPlan.toString
        require(!plan.contains("Exchange"),
          s"SMB join+agg on the bucket key must be exchange-free:\n$plan")
        joined.orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n,
        round(sum(l_extendedprice), 2) AS rev
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey <= 2000
        GROUP BY o_orderkey ORDER BY o_orderkey""")),

    // ---- Window battery #2: lead/lag/ntile/first/last/dense_rank/
    //      percent_rank over frames (extension surface, §2.6)
    QueryDef(
      "q56_window_battery",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .filter(col("o_custkey") <= 200)
          .select(
            col("o_custkey"), col("o_orderkey"),
            lag(col("o_orderkey"), 1).over(w).as("prev_ord"),
            lead(col("o_orderkey"), 1).over(w).as("next_ord"),
            ntile(4).over(w).as("quartile"),
            first(col("o_orderkey")).over(w).as("first_ord"),
            dense_rank().over(w).as("drk"),
            round(percent_rank().over(w), 6).as("prk"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        lag(o_orderkey, 1) OVER w AS prev_ord,
        lead(o_orderkey, 1) OVER w AS next_ord,
        ntile(4) OVER w AS quartile,
        first_value(o_orderkey) OVER w AS first_ord,
        dense_rank() OVER w AS drk,
        round(percent_rank() OVER w, 6) AS prk
        FROM orders WHERE o_custkey <= 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")),

    // ---- PIVOT (extension — no grammar support in the reference): explicit
    //      value list keeps the output schema static and plannable
    QueryDef(
      "q67_pivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum(col("l_quantity")), 2))
        .selectExpr("l_linestatus",
          "coalesce(A, 0) AS qty_a", "coalesce(N, 0) AS qty_n", "coalesce(R, 0) AS qty_r")
        .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
        coalesce(round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2), 0) AS qty_a,
        coalesce(round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2), 0) AS qty_n,
        coalesce(round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2), 0) AS qty_r
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- UNPIVOT/melt (extension; inverse of q67's PIVOT, the Dataset
    //      unpivot API rather than the stack generator of q39)
    QueryDef(
      "q79_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .withColumn("value", round(col("value"), 2))
        // value joins the sort key: the synthetic fixture duplicates
        // (l_orderkey, l_linenumber) pairs, so without it the order of
        // tied rows would be engine-defined
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"), col("value")),
      Some("""SELECT l_orderkey, l_linenumber, measure, round(value, 2) AS value
        FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
          FROM lineitem WHERE l_orderkey <= 300
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
          FROM lineitem WHERE l_orderkey <= 300
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          FROM lineitem WHERE l_orderkey <= 300)
        ORDER BY l_orderkey, l_linenumber, measure, round(value, 2)""")),

    // ---- As-of join (capability extension; absent in the reference —
    //      §2.4 notes no range/as-of joins): latest event at-or-before each
    //      order date per customer. The scalable shape: hash equi-join on
    //      the key (never an inequality-only join), inequality as a
    //      post-join filter, then a per-order window picks the latest.
    QueryDef(
      "q73_asof_join",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderkey") <= 2000)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val e = t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderkey"))
          .orderBy(col("ts").desc, col("event_id").desc)
        o.join(e, col("o_custkey") === col("user_id") && col("ts") <= col("o_orderdate"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("o_orderkey"), col("event_id").as("asof_event"),
            col("event_type").as("asof_type"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("asof_ts"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, event_id AS asof_event, event_type AS asof_type,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS asof_ts
        FROM orders JOIN events ON o_custkey = user_id AND ts <= o_orderdate
        WHERE o_orderkey <= 2000
        QUALIFY row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY o_orderkey""")),

    // ---- CUBE and explicit GROUPING SETS with grouping() markers
    //      (extension alongside ROLLUP; Catalyst Expand)
    QueryDef(
      "q68_cube",
      (s, dir) => t(s, dir, "orders")
        .cube(col("o_orderstatus"), substring(col("o_orderpriority"), 1, 1).as("prio"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).as("g_status"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("prio").asc_nulls_first,
          col("g_status")),
      Some("""SELECT o_orderstatus, substr(o_orderpriority, 1, 1) AS prio,
        count(*) AS n, CAST(grouping(o_orderstatus) AS INT) AS g_status
        FROM orders GROUP BY CUBE (o_orderstatus, prio)
        ORDER BY o_orderstatus ASC NULLS FIRST, prio ASC NULLS FIRST, g_status""")),

    QueryDef(
      "q69_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n,
                        round(sum(l_quantity), 2) AS qty
                 FROM lineitem
                 GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                 ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        round(sum(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- ROLLUP (absent in Hive 0.8 — no KW_ROLLUP in Hive.g; Catalyst
    //      Expand-based grouping sets)
    QueryDef(
      "q57_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- Pure range (interval) join — no equi-key, the plan Catalyst can
    //      only express as a nested loop — via RangeJoin.pointsInIntervals
    //      time-bin bucketing (see RangeJoin.scala for the cost model).
    //      Incident windows (high-value errors, 30 min) × click points;
    //      zero-click windows kept by the left join-back. Click values sum
    //      as exact cents (double sums are accumulation-order-dependent).
    QueryDef(
      "q96_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val incidents = ev
          .filter(col("event_type") === "error" && col("value") > 19)
          .selectExpr("event_id AS inc_id", "ts AS w_start",
            "ts + INTERVAL 30 MINUTES AS w_end")
        val clicks = ev.filter(col("event_type") === "click")
          .selectExpr("event_id AS click_id", "ts AS c_ts",
            "cast(round(value * 100) AS bigint) AS cents")
        val matched = RangeJoin
          .pointsInIntervals(clicks, "c_ts", incidents, "w_start", "w_end", 600)
          .groupBy(col("inc_id"))
          .agg(count(lit(1)).as("n_clicks"), sum(col("cents")).as("c"))
        incidents.select(col("inc_id")).join(matched, Seq("inc_id"), "left")
          // 100.0D: a bare 100.0 in SQL text is DECIMAL(4,1), and
          // bigint/decimal produces a DECIMAL column the driver's gate
          // renders differently than the oracle's double
          .selectExpr("inc_id", "coalesce(n_clicks, 0L) AS n_clicks",
            "coalesce(c, 0L) / 100.0D AS click_value")
          .orderBy(col("inc_id"))
      },
      Some("""WITH i AS (
          SELECT event_id AS inc_id, ts AS w_start,
                 ts + INTERVAL 30 MINUTE AS w_end
          FROM events WHERE event_type = 'error' AND value > 19),
        c AS (
          SELECT event_id AS click_id, ts AS c_ts,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'click')
        SELECT inc_id, count(click_id) AS n_clicks,
               CAST(coalesce(sum(cents), 0) AS BIGINT) / 100.0 AS click_value
        FROM i LEFT JOIN c ON c_ts >= w_start AND c_ts <= w_end
        GROUP BY inc_id ORDER BY inc_id""")),

    // ---- Per-group top-k via the bounded-buffer `top_k` aggregate
    //      (functions/TopK.scala): the window row_number formulation the
    //      oracle uses shuffles and sorts EVERY group row; the aggregate
    //      ships at most k rows per partial buffer. Labels are unique
    //      (orderkey), so (value desc, label asc) ranking is total.
    QueryDef(
      "q98_topk_per_group",
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("top_k(o_totalprice, cast(o_orderkey AS string), 3)").as("tk"))
        .select(col("o_orderstatus"), posexplode(col("tk")).as(Seq("pos", "e")))
        .selectExpr("o_orderstatus", "pos + 1 AS rk", "e.label AS okey",
          "e.v AS price")
        .orderBy(col("o_orderstatus"), col("rk")),
      Some("""SELECT o_orderstatus, rk, okey, price FROM (
          SELECT o_orderstatus, CAST(o_orderkey AS VARCHAR) AS okey,
                 o_totalprice AS price,
                 row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, CAST(o_orderkey AS VARCHAR)) AS rk
          FROM orders)
        WHERE rk <= 3 ORDER BY o_orderstatus, rk""")),

    // ---- CDC merge/upsert (MERGE INTO without a lakehouse — the corpus-
    //      snapshot-refresh plan of an incremental crawl): deletes as an
    //      anti-join, updates as a left join + coalesce, inserts as a
    //      union — all shuffle equi-joins on the primary key. AQE
    //      broadcasts the delta sides when they are small (the typical CDC
    //      shape); against a bucketed base (q101) the merge is
    //      exchange-free on the base side. FP discipline: all money math
    //      in exact integer cents — the only rounds are of near-integers
    //      and exact binary halves, which both engines round identically.
    QueryDef(
      "q110_merge_upsert",
      (s, dir) => {
        val base = t(s, dir, "orders").selectExpr("o_orderkey", "o_orderstatus",
          "cast(round(o_totalprice * 100.0D) AS bigint) AS cents")
        val upd = base.filter(col("o_orderkey") % 10 === 3)
          .selectExpr("o_orderkey",
            "cast(round(cents * 110.0D / 100.0D) AS bigint) AS new_cents")
        val del = base.filter(col("o_orderkey") % 100 === 7)
          .select(col("o_orderkey"))
        val ins = base.filter(col("o_orderkey") % 500 === 11)
          .selectExpr("o_orderkey + 10000000 AS o_orderkey", "o_orderstatus",
            "cast(round(cents * 50.0D / 100.0D) AS bigint) AS cents",
            "'I' AS action")
        // left_anti (null-unsafe equality: null keys kept) matches the
        // oracle's NOT IN only because o_orderkey is a non-null PK — with
        // nullable keys SQL NOT IN goes three-valued (any NULL in the del
        // list drops EVERY row) and the two forms diverge; a nullable-key
        // CDC merge must pre-filter null keys on both sides
        base
          .join(del, Seq("o_orderkey"), "left_anti")
          .join(upd, Seq("o_orderkey"), "left")
          .selectExpr("o_orderkey", "o_orderstatus",
            "coalesce(new_cents, cents) AS cents",
            "CASE WHEN new_cents IS NOT NULL THEN 'U' ELSE 'K' END AS action")
          .unionByName(ins)
          .groupBy(col("o_orderstatus"), col("action"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("price_cents"))
          .orderBy(col("o_orderstatus"), col("action"))
      },
      Some("""WITH base AS (
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
          FROM orders),
        upd AS (SELECT o_orderkey,
                       CAST(round(cents * 110.0 / 100.0) AS BIGINT) AS new_cents
                FROM base WHERE o_orderkey % 10 = 3),
        del AS (SELECT o_orderkey FROM base WHERE o_orderkey % 100 = 7),
        ins AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_orderstatus,
                       CAST(round(cents * 50.0 / 100.0) AS BIGINT) AS cents,
                       'I' AS action
                FROM base WHERE o_orderkey % 500 = 11),
        merged AS (
          SELECT b.o_orderkey, b.o_orderstatus,
                 COALESCE(u.new_cents, b.cents) AS cents,
                 CASE WHEN u.o_orderkey IS NOT NULL THEN 'U' ELSE 'K' END AS action
          FROM base b LEFT JOIN upd u USING (o_orderkey)
          WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM del)
          UNION ALL
          SELECT o_orderkey, o_orderstatus, cents, action FROM ins)
        SELECT o_orderstatus, action, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS price_cents
        FROM merged GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
