package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator surface of the reference engine, re-expressed
  * Spark-first (DataFrame DSL → Catalyst).
  *
  * Reference operator inventory (SURVEY.md §2.1): TableScan/Filter/Select →
  * scan+filter+project with parquet pushdown; GroupBy (hash/partial/final,
  * ref ql/exec/GroupByOperator.java:66) → `groupBy().agg()`; ReduceSink
  * (shuffle, ref ql/exec/ReduceSinkOperator.java:52) → Exchange; Join
  * (reduce-side, ref ql/exec/JoinOperator.java:41 + CommonJoinOperator.java)
  * and MapJoin (broadcast, ref ql/exec/MapJoinOperator.java:51) → SortMergeJoin
  * / BroadcastHashJoin; Union (ref ql/exec/UnionOperator.java:38) → union;
  * Limit (ref ql/exec/LimitOperator.java:31) → limit / TakeOrderedAndProject.
  *
  * Determinism contract for the DuckDB oracle: total ORDER BY on a unique key
  * set, floating aggregates rounded, column names aliased identically on both
  * sides.
  */
object Relational extends QueryModule {

  val defs: Seq[QueryDef] = Seq(

    // ---- Aggregation (TPC-H Q1 shape; ref groupby1.q, GroupByOperator modes
    //      plan/GroupByDesc.java:28-45: Catalyst plans partial+final HashAggregate)
    QueryDef(
      "q01_agg",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          // price sums accumulate in exact DECIMAL(30,6) and cast back —
          // at 30x magnitudes (~1e11/group) double association-order error
          // crosses the 2dp rounding boundary cross-engine (SURVEY 6.13n #4;
          // quantity sums are integer-valued doubles, exact as-is)
          round(sum(col("l_extendedprice").cast("decimal(30,6)"))
            .cast("double"), 2).as("sum_base_price"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(30,6)")).cast("double"), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity),2) AS sum_qty,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE),2) AS sum_base_price,
        round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE),2) AS sum_disc_price,
        round(avg(l_quantity),4) AS avg_qty,
        round(avg(l_discount),4) AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- Filter + scalar aggregate (TPC-H Q6 shape; FilterOperator →
    //      parquet-pushed predicates, ref ql/exec/FilterOperator.java:35)
    QueryDef(
      "q02_filter",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(round(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(30,6)")).cast("double"), 2).as("revenue")),
      Some("""SELECT round(CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(30,6))) AS DOUBLE),2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    // ---- Shuffle join + agg + top-k (TPC-H Q3 shape; JoinOperator →
    //      SortMergeJoin; LIMIT+ORDER BY → TakeOrderedAndProject)
    QueryDef(
      "q03_join_topk",
      (s, dir) => t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp")
          && col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
        round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---- Broadcast (map-side) join; ref MapJoinOperator.java:51 /
    //      /*+ MAPJOIN */ hint Hive.g:1472-1499 → broadcast() hint
    QueryDef(
      "q04_broadcast_join",
      (s, dir) => t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          // exact DECIMAL accumulation: a double sum over 100k+ rows per
          // group carries ~0.3 of association-order error at sf1 scale, so
          // round(sum(double),2) diverges cross-engine; the per-row product
          // is the SAME IEEE double in both engines, its decimal(30,6) cast
          // is exact-or-identically-rounded, and decimal addition is
          // order-independent — then one cast back to double for the gate
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(30,6)")).cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand,
        round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE),2) AS revenue,
        count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand""")),

    // ---- 6-way star join (TPC-H Q5 shape): N-way join on shared + chained
    //      keys; ref CommonJoinOperator n-way tagged co-group
    QueryDef(
      "q05_multijoin",
      (s, dir) => t(s, dir, "region").filter(col("r_name") === "ASIA")
        .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,6)")).cast("double"), 2).as("revenue"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name, round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE),2) AS revenue
        FROM region JOIN nation ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name ORDER BY n_name""")),

    // ---- LEFT OUTER join; ref joinObjectsLeftOuterJoin
    //      CommonJoinOperator.java:432
    QueryDef(
      "q06_left_outer",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spend"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        round(coalesce(sum(o_totalprice),0),2) AS total_spend
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    // ---- RIGHT OUTER join; ref CommonJoinOperator.java:459
    QueryDef(
      "q07_right_outer",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy(col("c_nationkey"))
        .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
        .orderBy(col("c_nationkey")),
      Some("""SELECT c_nationkey, count(o_orderkey) AS n_orders, count(*) AS n_rows
        FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ---- FULL OUTER join; ref CommonJoinOperator.java:515 (also the
    //      UNIQUEJOIN/PRESERVE rewrite target, Hive.g:1596-1614)
    QueryDef(
      "q08_full_outer",
      (s, dir) => {
        val bySeg = t(s, dir, "customer").groupBy(col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).as("n_cust"))
        val byPrio = t(s, dir, "orders")
          .withColumn("seg", substring(col("o_orderpriority"), 3, 20))
          .groupBy(col("seg")).agg(count(lit(1)).as("n_ord"))
        bySeg.join(byPrio, Seq("seg"), "full_outer")
          .select(col("seg"), coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_ord"), lit(0L)).as("n_ord"))
          .orderBy(col("seg"))
      },
      Some("""SELECT seg, coalesce(n_cust,0) AS n_cust, coalesce(n_ord,0) AS n_ord
        FROM (SELECT c_mktsegment AS seg, count(*) AS n_cust FROM customer GROUP BY 1) a
        FULL OUTER JOIN (SELECT substr(o_orderpriority,3) AS seg, count(*) AS n_ord
                         FROM orders GROUP BY 1) b USING (seg)
        ORDER BY seg""")),

    // ---- LEFT SEMI join; ref joinObjectsLeftSemiJoin
    //      CommonJoinOperator.java:411, joinToken Hive.g:1616-1625
    QueryDef(
      "q09_semi_join",
      (s, dir) => t(s, dir, "part")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") >= 48),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand, count(*) AS n_parts FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 48)
        GROUP BY p_brand ORDER BY p_brand""")),

    // ---- LEFT ANTI join (capability extension: the reference has no anti
    //      join — NOT EXISTS was inexpressible in Hive 0.8)
    QueryDef(
      "q10_anti_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // ---- UNION ALL (positional, like Hive; ref UnionOperator.java:38,
    //      queryOperator Hive.g:1331-1335)
    QueryDef(
      "q11_union_all",
      (s, dir) => {
        val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("k"), lit("urgent").as("src"))
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey").as("k"), lit("big").as("src"))
        urgent.union(big).groupBy(col("src")).agg(count(lit(1)).as("n"))
          .orderBy(col("src"))
      },
      Some("""SELECT src, count(*) AS n FROM (
          SELECT o_orderkey AS k, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT o_orderkey AS k, 'big' AS src FROM orders WHERE o_totalprice > 400000)
        GROUP BY src ORDER BY src""")),

    // ---- SELECT DISTINCT (GroupByOperator with no aggregates)
    QueryDef(
      "q12_distinct",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey")).distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey")),
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        ORDER BY c_mktsegment, c_nationkey""")),

    // ---- multi COUNT(DISTINCT); ref distinct-column shuffle-key expansion
    //      ReduceSinkOperator.java:143-176 → Catalyst Expand rewrite
    QueryDef(
      "q13_count_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- ORDER BY + LIMIT → TakeOrderedAndProject (better than the
    //      reference's single-reducer global limit, SemanticAnalyzer:4307)
    QueryDef(
      "q14_orderby_limit",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(20),
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS price
        FROM orders ORDER BY price DESC, o_orderkey LIMIT 20""")),

    // ---- GROUP BY + HAVING (Hive.g havingClause)
    QueryDef(
      "q15_having",
      (s, dir) => t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), round(avg(col("c_acctbal")), 2).as("avg_bal"))
        .filter(col("n_cust") > 50)
        .orderBy(col("c_nationkey")),
      Some("""SELECT c_nationkey, count(*) AS n_cust, round(avg(c_acctbal),2) AS avg_bal
        FROM customer GROUP BY c_nationkey HAVING count(*) > 50
        ORDER BY c_nationkey""")),

    // ---- Subquery in FROM (the only subquery form in Hive 0.8;
    //      subQuerySource Hive.g:1692-1697)
    QueryDef(
      "q16_from_subquery",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("order_qty"))
        .agg(
          round(avg(col("order_qty")), 4).as("avg_order_qty"),
          round(max(col("order_qty")), 2).as("max_order_qty"),
          count(lit(1)).as("n_orders")),
      Some("""SELECT round(avg(order_qty),4) AS avg_order_qty,
        round(max(order_qty),2) AS max_order_qty, count(*) AS n_orders
        FROM (SELECT l_orderkey, sum(l_quantity) AS order_qty
              FROM lineitem GROUP BY l_orderkey)""")),

    // ---- CASE/WHEN, IF, IN, COALESCE, boolean ops
    //      (ref FunctionRegistry.java:331-347,415-418)
    QueryDef(
      "q17_conditionals",
      (s, dir) => t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large"))
        .withColumn("is_open", when(col("o_orderstatus").isin("O", "P"), 1).otherwise(0))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("is_open")).as("n_open"))
        .orderBy(col("bucket")),
      Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 200000 THEN 'medium'
                     ELSE 'large' END AS bucket,
        count(*) AS n,
        CAST(sum(CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_open
        FROM orders GROUP BY 1 ORDER BY bucket""")),

    // ---- String function battery (ref FunctionRegistry.java:223-286 string
    //      group: concat, substr, upper, lower, trim, length, reverse, lpad…)
    QueryDef(
      "q18_string_funcs",
      (s, dir) => t(s, dir, "part")
        .select(
          col("p_partkey"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          substring(col("p_name"), 1, 5).as("prefix5"),
          length(col("p_name")).as("name_len"),
          reverse(col("p_type")).as("rtype"),
          lpad(col("p_size").cast("string"), 4, "0").as("size4"),
          trim(lit("  pad  ")).as("trimmed"),
          regexp_replace(col("p_name"), "a", "@").as("subbed"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
        p_brand || '/' || p_type AS brand_type,
        upper(p_name) AS uname, lower(p_brand) AS lbrand,
        substr(p_name,1,5) AS prefix5,
        CAST(length(p_name) AS INT) AS name_len, reverse(p_type) AS rtype,
        lpad(CAST(p_size AS VARCHAR),4,'0') AS size4,
        trim('  pad  ') AS trimmed,
        regexp_replace(p_name,'a','@','g') AS subbed
        FROM part ORDER BY p_partkey""")),

    // ---- Math function battery (ref FunctionRegistry.java:234-265)
    QueryDef(
      "q19_math_funcs",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("r1"),
          floor(col("l_extendedprice")).as("flr"),
          ceil(col("l_extendedprice")).as("cl"),
          abs(col("l_discount") - 0.05).as("ad"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          round(exp(col("l_discount")), 6).as("ex"),
          round(pow(col("l_quantity"), 2), 2).as("p2"),
          signum(col("l_discount") - 0.05).as("sg"),
          (col("l_orderkey") % 7).as("m7"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture;
        // appending source-derived cols makes remaining ties identical rows
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("r1"), col("ad"), col("sq")),
      Some("""SELECT l_orderkey, l_linenumber,
        round(l_extendedprice,1) AS r1, CAST(floor(l_extendedprice) AS BIGINT) AS flr,
        CAST(ceil(l_extendedprice) AS BIGINT) AS cl, abs(l_discount - 0.05) AS ad,
        round(sqrt(l_quantity),6) AS sq, round(ln(l_extendedprice),6) AS lg,
        round(exp(l_discount),6) AS ex, round(pow(l_quantity,2),2) AS p2,
        CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sg,
        l_orderkey % 7 AS m7
        FROM lineitem WHERE l_orderkey <= 100
        ORDER BY l_orderkey, l_linenumber, r1, ad, sq""")),

    // ---- Date/time battery (ref FunctionRegistry.java:291-305 —
    //      year/month/day/hour/…, datediff, date_add)
    QueryDef(
      "q20_date_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          weekofyear(col("o_orderdate")).as("wk"),
          datediff(lit("1999-01-01").cast("date"), col("o_orderdate")).as("days_to_99"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
          unix_timestamp(col("o_orderdate")).as("epoch"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        CAST(day(o_orderdate) AS INT) AS d,
        CAST(quarter(o_orderdate) AS INT) AS q, CAST(weekofyear(o_orderdate) AS INT) AS wk,
        CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT) AS days_to_99,
        strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ---- get_json_object (ref GenericUDFGetJsonObject, registry :307)
    QueryDef(
      "q21_json",
      (s, dir) => t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
        CAST(sum(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INT)) AS BIGINT) AS sum_k,
        count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- LATERAL VIEW explode (ref GenericUDTFExplode.java:43,
    //      LateralViewJoinOperator.java:75) → generator expression
    QueryDef(
      "q22_explode",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"), explode(split(col("o_orderpriority"), "-")).as("token"))
        .orderBy(col("o_orderkey"), col("token")),
      Some("""SELECT o_orderkey, unnest(string_split(o_orderpriority,'-')) AS token
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey, token""")),

    // ---- Statistical UDAFs (ref GenericUDAFStd/Variance/Correlation/
    //      Covariance, FunctionRegistry.java:377-403)
    QueryDef(
      "q23_stats_agg",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(stddev_pop(col("l_discount")), 6).as("sdp_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qe"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qe"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        round(stddev_samp(l_quantity),4) AS sd_qty,
        round(var_samp(l_quantity),4) AS var_qty,
        round(stddev_pop(l_discount),6) AS sdp_disc,
        round(corr(l_quantity,l_extendedprice),4) AS corr_qe,
        round(covar_samp(l_quantity,l_extendedprice),2) AS cov_qe
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Exact percentile / median (ref UDAFPercentile.java, registry :403)
    //      Both columns go through Percentiles.exact — bucketed-histogram
    //      order-statistic selection (see Percentiles.scala for the scale
    //      contract). The small-domain quantity column uses the value itself
    //      as its bucket (the degenerate exact histogram, the reference's
    //      integer-percentile shape); the wide-domain price column uses
    //      100-unit coarse buckets so no task ever sorts more than one
    //      bucket's population.
    QueryDef(
      "q24_percentile",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .selectExpr("l_linestatus", "cast(l_quantity AS bigint) AS qv_in",
            "l_extendedprice")
        // ONE histogram pass + ONE selection pass for both columns
        // (Percentiles.exactMulti melts the metrics in-scan)
        val px = Percentiles.exactMulti(li, "l_linestatus", Seq(
          Percentiles.Spec("qv_in", col("qv_in"), Seq(0.5, 0.9)),
          Percentiles.Spec("l_extendedprice",
            floor(col("l_extendedprice") / 100), Seq(0.25))))
        px.groupBy(col("l_linestatus"))
          .agg(
            round(max(when(col("metric") === "qv_in" && col("qv") === 0.5,
              col("value"))), 4).as("p50"),
            round(max(when(col("metric") === "qv_in" && col("qv") === 0.9,
              col("value"))), 4).as("p90"),
            round(max(when(col("metric") === "l_extendedprice" && col("qv") === 0.25,
              col("value"))), 4).as("price_p25"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
        round(quantile_cont(CAST(l_quantity AS BIGINT), 0.5),4) AS p50,
        round(quantile_cont(CAST(l_quantity AS BIGINT), 0.9),4) AS p90,
        round(quantile_cont(l_extendedprice, 0.25),4) AS price_p25
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- collect_set (ref GenericUDAFCollectSet.java:167) — emitted as a
    //      sorted CSV string so the nondeterministic set order can hash-match
    QueryDef(
      "q25_collect_set",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
          concat_ws(",", sort_array(collect_set(col("l_quantity").cast("int")))).as("qtys"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        array_to_string(list_sort(list(DISTINCT CAST(l_quantity AS INT))), ',') AS qtys
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Cross join (comma-join with no keys; KW_CROSS reserved-only in
    //      Hive.g — expressed as keyless JOIN)
    QueryDef(
      "q26_cross_join",
      (s, dir) => t(s, dir, "region")
        .crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
        ORDER BY r_name, n_name""")),

    // ---- GROUP BY on a computed expression
    QueryDef(
      "q27_groupby_expr",
      (s, dir) => t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("order_year"),
          substring(col("o_orderpriority"), 1, 1).as("prio"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")
          .cast("decimal(30,6)")).cast("double"), 2).as("total"))
        .orderBy(col("order_year"), col("prio")),
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS order_year, substr(o_orderpriority,1,1) AS prio,
        count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE),2) AS total
        FROM orders GROUP BY 1, 2 ORDER BY order_year, prio""")),

    // ---- DISTRIBUTE BY + SORT BY (ref Hive.g:1769/:1777 → repartition +
    //      sortWithinPartitions). Partition-local order is not globally
    //      observable, so the DRIVER-CHECKABLE surface is the CLUSTER BY
    //      CONTRACT itself, verified in-query (the q66/q113 verdict
    //      pattern): spark_partition_id + monotonically_increasing_id
    //      capture the physical row placement the clauses promise — each
    //      key lives in exactly one partition (co_located), and within a
    //      partition the (key, line) tuples are non-decreasing in emission
    //      order (sorted_ok, via a lag window over the captured ids).
    //      Exact per-key counts ride along. SortClauseSpec keeps the
    //      spec-level invariants.
    QueryDef(
      "q28_cluster_by",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val placed = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .repartition(col("l_orderkey"))
          .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
          // capture placement BEFORE anything reshuffles: id order within
          // a partition = emission order (narrow projection)
          .select(col("l_orderkey"), col("l_linenumber"),
            spark_partition_id().as("pid"),
            monotonically_increasing_id().as("rid"))
        val w = Window.partitionBy(col("pid")).orderBy(col("rid"))
        val sortedOk = placed
          .select(col("pid"),
            (lag(col("l_orderkey"), 1).over(w).isNull ||
              lag(col("l_orderkey"), 1).over(w) < col("l_orderkey") ||
              (lag(col("l_orderkey"), 1).over(w) === col("l_orderkey") &&
                lag(col("l_linenumber"), 1).over(w) <= col("l_linenumber")))
              .as("ok"))
          .agg(min(col("ok")).as("sorted_ok"))
        placed
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_lines"),
            (countDistinct(col("pid")) === 1).as("co_located"))
          .crossJoin(broadcast(sortedOk))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey, count(*) AS n_lines, TRUE AS co_located,
            TRUE AS sorted_ok
          FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ---- Window functions (capability extension: absent in the reference —
    //      no KW_OVER in Hive.g; Spark Window API)
    QueryDef(
      "q29_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("best"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS best FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders) WHERE rk = 1 ORDER BY o_custkey""")),

    // ---- Running window aggregate (extension; frame semantics)
    QueryDef(
      "q30_window_running",
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .filter(col("l_suppkey") <= 5)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            round(sum(col("l_quantity")).over(w), 2).as("running_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("running_qty"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, round(running_qty,2) AS running_qty
        FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
               sum(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
              FROM lineitem WHERE l_suppkey <= 5)
        ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""")),

    // ---- Time-bucketed aggregation over the events table (batch analogue of
    //      the streaming tumbling window, §2.10)
    QueryDef(
      "q31_event_windows",
      (s, dir) => t(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("hour"), col("event_type")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        event_type, count(*) AS n, round(sum(value),2) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // ---- Type coercions / casts (ref castExpression Hive.g:1809; Hive 0.8
    //      string↔numeric implicit conversion, FunctionRegistry.java:1121-1190)
    QueryDef(
      "q32_casts",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 50)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_quantity").cast("int").as("q_int"),
          col("l_quantity").cast("string").as("q_str"),
          col("l_extendedprice").cast("bigint").as("price_long"),
          (col("l_linenumber").cast("double") / 2).as("half_line"),
          col("l_returnflag").cast("string").as("flag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("q_str"), col("price_long"), col("flag")),
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(l_quantity AS INT) AS q_int,
        CAST(l_quantity AS VARCHAR) AS q_str,
        CAST(trunc(l_extendedprice) AS BIGINT) AS price_long,
        CAST(l_linenumber AS DOUBLE) / 2 AS half_line,
        CAST(l_returnflag AS VARCHAR) AS flag
        FROM lineitem WHERE l_orderkey <= 50
        ORDER BY l_orderkey, l_linenumber, q_str, price_long, flag"""))
  )
}
