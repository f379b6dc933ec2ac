package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.functions._

/** Remaining reference-parity surface: pinned coercion/null-order semantics
  * (SURVEY.md §7.4 hard part 2), the ewah-bitmap family, virtual columns
  * (§1.4), the UNIQUEJOIN/PRESERVE rewrite (§2.4 #7), and context_ngrams.
  */
object Misc extends QueryModule {

  val defs: Seq[QueryDef] = Seq(

    // ---- Coercion semantics pinned against the oracle: string↔numeric
    //      compare (FunctionRegistry.java:1121-1190), int `/` → double,
    //      `div` integer division, ASC sort = NULLS FIRST
    //      (BinarySortableSerDe null-byte prefix)
    QueryDef(
      "q44_coercions",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 200)
        .selectExpr(
          "l_orderkey", "l_linenumber",
          "CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_linenumber END AS nullable_ln",
          "'0042' = 42 AS str_eq_int",
          "'3.5' > '3' AS str_gt",
          "l_quantity / 2 AS half_q",
          "l_orderkey div 7 AS div7",
          "cast(l_orderkey AS string) = l_orderkey AS roundtrip_eq")
        .orderBy(col("nullable_ln").asc, col("l_orderkey"), col("l_linenumber"),
          col("half_q")),
      Some("""SELECT l_orderkey, l_linenumber,
        CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_linenumber END AS nullable_ln,
        '0042' = 42 AS str_eq_int,
        '3.5' > '3' AS str_gt,
        l_quantity / 2 AS half_q,
        l_orderkey // 7 AS div7,
        CAST(l_orderkey AS VARCHAR) = CAST(l_orderkey AS VARCHAR) AS roundtrip_eq
        FROM lineitem WHERE l_orderkey <= 200
        ORDER BY nullable_ln ASC NULLS FIRST, l_orderkey, l_linenumber, half_q""")),

    // ---- ewah_bitmap family (GenericUDAFEWAHBitmap.java:53 + and/or/empty
    //      scalars): per-flag supplier bitmaps, then set algebra on the
    //      serialized bitmaps; oracled via INTERSECT/UNION cardinalities
    QueryDef(
      "q45_bitmap",
      (s, dir) => {
        val bm = t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(expr("bitmap_agg(l_suppkey)").as("bm"))
        val a = bm.filter(col("l_returnflag") === "A").select(col("bm").as("bm_a"))
        val n = bm.filter(col("l_returnflag") === "N").select(col("bm").as("bm_n"))
        a.crossJoin(n).selectExpr(
          "bitmap_count(bm_a) AS n_a",
          "bitmap_count(bm_n) AS n_n",
          "bitmap_count(bitmap_and(bm_a, bm_n)) AS n_both",
          "bitmap_count(bitmap_or(bm_a, bm_n)) AS n_any")
      },
      Some("""SELECT
        (SELECT count(DISTINCT l_suppkey) FROM lineitem WHERE l_returnflag = 'A') AS n_a,
        (SELECT count(DISTINCT l_suppkey) FROM lineitem WHERE l_returnflag = 'N') AS n_n,
        (SELECT count(*) FROM (
           SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
           INTERSECT
           SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'N')) AS n_both,
        (SELECT count(*) FROM (
           SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
           UNION
           SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'N')) AS n_any""")),

    // ---- Virtual columns (VirtualColumn.java:34-38): INPUT__FILE__NAME →
    //      input_file_name(), ROW__OFFSET → monotonically_increasing_id
    //      (uniqueness checked, values engine-specific)
    QueryDef(
      "q46_virtual_cols",
      (s, dir) => t(s, dir, "lineitem")
        .select(
          // both virtual columns must bind in the scan stage
          // (input_file_name is empty after an exchange); the regexp runs
          // AFTER aggregation — once per partition row, not per data row
          input_file_name().as("path"),
          monotonically_increasing_id().as("rid"))
        // uniqueness proof without a full-width distinct shuffle: the id is
        // (scanPartition << 33) + consecutive offset, so ids are globally
        // unique iff every scan partition's count equals its max-min+1 span
        // (high bits keep partitions disjoint). Partial-aggregates to one
        // row per scan partition — O(partitions) crosses the wire, not rows.
        .groupBy(shiftright(col("rid"), 33).as("src_part"))
        .agg(first(col("path")).as("path"), count(lit(1)).as("cnt"),
          (max(col("rid")) - min(col("rid")) + 1).as("span"))
        .agg(
          // the FIXTURE path segment, not the leaf: GenScale fixtures are
          // directories (<t>.parquet/part-*.snappy.parquet), driver
          // fixtures single files — the first `*.parquet` segment is the
          // table in both layouts
          regexp_extract(first(col("path")),
            "([a-z_]+\\.parquet)", 1).as("file"),
          (sum(when(col("cnt") === col("span"), 0).otherwise(1)) === 0)
            .as("ids_unique"),
          sum(col("cnt")).as("n_rows")),
      Some("""SELECT 'lineitem.parquet' AS file, true AS ids_unique,
        count(*) AS n_rows FROM lineitem""")),

    // ---- UNIQUEJOIN ... PRESERVE (Hive.g:1596-1614, JoinDesc.UNIQUE_JOIN)
    //      re-expressed as chained FULL OUTER joins on the key tuple: every
    //      key from every PRESERVEd side survives with per-side presence
    QueryDef(
      "q47_uniquejoin",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_custkey").as("k")).distinct()
          .withColumn("in_cust", lit(1))
        val o = t(s, dir, "orders")
          .select(col("o_custkey").as("k")).distinct()
          .withColumn("in_ord", lit(1))
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("k")).distinct()
          .withColumn("in_big", lit(1))
        c.join(o, Seq("k"), "full_outer")
          .join(big, Seq("k"), "full_outer")
          .selectExpr("k", "coalesce(in_cust, 0) AS in_cust",
            "coalesce(in_ord, 0) AS in_ord", "coalesce(in_big, 0) AS in_big")
          .groupBy(col("in_cust"), col("in_ord"), col("in_big"))
          .agg(count(lit(1)).as("n_keys"))
          .orderBy(col("in_cust"), col("in_ord"), col("in_big"))
      },
      Some("""WITH c AS (SELECT DISTINCT c_custkey AS k, 1 AS in_cust FROM customer),
        o AS (SELECT DISTINCT o_custkey AS k, 1 AS in_ord FROM orders),
        big AS (SELECT DISTINCT o_custkey AS k, 1 AS in_big FROM orders
                WHERE o_totalprice > 300000)
        SELECT coalesce(in_cust, 0) AS in_cust, coalesce(in_ord, 0) AS in_ord,
               coalesce(in_big, 0) AS in_big, count(*) AS n_keys
        FROM c FULL OUTER JOIN o USING (k) FULL OUTER JOIN big USING (k)
        GROUP BY 1, 2, 3 ORDER BY in_cust, in_ord, in_big""")),

    // ---- Null semantics battery: null propagation through arithmetic,
    //      aggregate null-skipping, count(*) vs count(col), null-safe
    //      equality (<=> ↔ IS NOT DISTINCT FROM), all-null groups
    QueryDef(
      "q74_null_semantics",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 5000)
        .selectExpr("o_orderstatus",
          "CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS maybe_price",
          "CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS maybe_cust")
        .selectExpr("o_orderstatus", "maybe_price", "maybe_cust",
          "maybe_price + 1 AS plus1",
          "maybe_cust <=> NULL AS nse_null",
          "maybe_cust <=> maybe_cust AS nse_self")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("maybe_price")).as("n_nonnull"),
          // Exact arithmetic for the oracle compare: double sum/avg are
          // accumulation-order-dependent (Spark's partial/final tree order ≠
          // DuckDB's sequential order), so sum cents as BIGINT and divide
          // once at the end — one integer division is IEEE-identical across
          // engines. Null-skipping behavior (GenericUDAFSum/Count) unchanged.
          (sum(expr("cast(round(maybe_price * 100) as bigint)")) / 100.0)
            .as("sum_skipnull"),
          (sum(expr("cast(round(maybe_price * 100) as bigint)")) /
            (lit(100.0) * count(col("maybe_price")))).as("avg_skipnull"),
          round(max(col("plus1")), 2).as("max_plus1"),
          sum(when(col("nse_null"), 1).otherwise(0)).as("n_null_cust"),
          sum(when(col("nse_self"), 1).otherwise(0)).as("n_self_eq"))
        .orderBy(col("o_orderstatus")),
      // CAST(sum ... AS BIGINT) in the oracle: DuckDB sum(integer) returns
      // HUGEINT (int128), which the driver's fetch path normalizes
      // differently than Spark's bigint → hash mismatch on identical values.
      Some("""WITH t AS (
          SELECT o_orderstatus,
                 CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS maybe_price,
                 CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS maybe_cust
          FROM orders WHERE o_orderkey <= 5000)
        SELECT o_orderstatus,
               count(*) AS n_rows,
               count(maybe_price) AS n_nonnull,
               sum(CAST(round(maybe_price * 100) AS BIGINT)) / 100.0 AS sum_skipnull,
               sum(CAST(round(maybe_price * 100) AS BIGINT)) / (100.0 * count(maybe_price)) AS avg_skipnull,
               round(max(maybe_price + 1), 2) AS max_plus1,
               CAST(sum(CASE WHEN maybe_cust IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_cust,
               CAST(sum(CASE WHEN maybe_cust IS NOT DISTINCT FROM maybe_cust THEN 1 ELSE 0 END) AS BIGINT) AS n_self_eq
        FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- Non-ANSI error semantics battery (Sessions sets
    //      spark.sql.ansi.enabled=false): ported HiveQL relies on NULL-not-
    //      throw for bad casts (UDFToInteger), OOB array indexes, and x/0
    //      (NULL per post-0.8 Hive; the reference's raw Java division gave
    //      Infinity — documented divergence), and on Java wraparound for
    //      int overflow.
    QueryDef(
      "q88_error_semantics",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 100)
        .selectExpr("o_orderkey",
          // NULL-on-zero-divisor pinned two ways without comparing float
          // division results (round(x/2, 2) of a 2-decimal value lands on
          // exact decimal halfway points whose rounding is engine-specific)
          "(o_totalprice / (o_orderkey % 3)) IS NULL AS div0_null",
          "cast(round(o_totalprice * 100) AS bigint) div (o_orderkey % 3) AS cents_div",
          "cast(o_orderstatus AS int) AS bad_cast",
          "to_date(o_orderpriority) AS bad_date",
          "array('a', 'b', 'c')[cast(o_orderkey % 5 AS int)] AS maybe_oob",
          "cast(2147483647 AS int) + cast(o_orderkey AS int) AS wrapped")
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        (o_totalprice / (o_orderkey % 3)) IS NULL AS div0_null,
        CAST(round(o_totalprice * 100) AS BIGINT) // (o_orderkey % 3) AS cents_div,
        TRY_CAST(o_orderstatus AS INT) AS bad_cast,
        TRY_CAST(o_orderpriority AS DATE) AS bad_date,
        (['a', 'b', 'c'])[CAST(o_orderkey % 5 AS INT) + 1] AS maybe_oob,
        CAST(((2147483647 + o_orderkey + 2147483648) % 4294967296) - 2147483648 AS INT) AS wrapped
        FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""")),

    // ---- histogram_numeric + percentile_approx (registry :255/:70; same
    //      NumericHistogram algorithm family as the reference). The bin
    //      placement is approximation-algorithm-specific — not
    //      cross-engine-replicable — so the DRIVER-CHECKABLE surface is
    //      what IS exact (the q113 pattern): group keys, row counts, and
    //      in-query verdicts on the sketch's hard invariants, TRUE on both
    //      sides iff the sketch honors them: bin weights sum to the row
    //      count (NumericHistogram merges weights additively), bin centers
    //      are sorted and inside the data range, and the approx median
    //      passes a RANK-WINDOW check: ≥45% of rows on each side of the
    //      estimate (rank error 1/accuracy ≪ 5%) — two linear passes and a
    //      3-row broadcast instead of an exact-percentile per-group sort;
    //      the verification must not cost more than the sketch it checks.
    //      ApproxAggSpec additionally bounds the numeric error laws.
    QueryDef(
      "q66_histogram",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val aggd = li.groupBy(col("l_returnflag"))
          .agg(
            expr("histogram_numeric(l_quantity, 5)").as("hist"),
            expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("p50a"),
            count(lit(1)).as("n_rows"),
            min(col("l_quantity")).as("qmin"),
            max(col("l_quantity")).as("qmax"))
        val rank = li
          .join(broadcast(aggd.select(col("l_returnflag").as("rf"), col("p50a"))),
            col("l_returnflag") === col("rf"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("l_extendedprice") <= col("p50a"), 1L).otherwise(0L)).as("n_le"),
            sum(when(col("l_extendedprice") >= col("p50a"), 1L).otherwise(0L)).as("n_ge"))
        aggd.join(rank, "l_returnflag")
          .selectExpr("l_returnflag", "n_rows",
            "size(hist) AS n_bins",
            "abs(aggregate(hist, 0D, (a, b) -> a + b.y) - double(n_rows)) < 1e-6 AS weight_ok",
            """aggregate(hist, true,
                 (acc, h) -> acc AND h.x >= double(qmin) AND h.x <= double(qmax)) AS bounds_ok""",
            "array_sort(transform(hist, h -> h.x)) = transform(hist, h -> h.x) AS sorted_ok",
            "n_le >= cast(0.45D * n_rows AS bigint) AND n_ge >= cast(0.45D * n_rows AS bigint) AS p50_ok")
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n_rows, 5 AS n_bins,
            TRUE AS weight_ok, TRUE AS bounds_ok, TRUE AS sorted_ok,
            TRUE AS p50_ok
          FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Hive-NAMED function registrations exercised through SQL text:
    //      `hash` = reference Java hash (FunctionRegistry.java:417, NOT
    //      murmur3), `create_union` (registry :413) as the uniontype struct
    //      encoding, `reflect` (registry :407, Spark ships it natively).
    //      Oracle side pins Hive hash algebra: hash(int)=int,
    //      hash(a,b)=31*a+b, hash(1-char string)=char code.
    QueryDef(
      "q83_hive_named_fns",
      (s, dir) => {
        graft.Sessions.ensureRegistered(s)
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey,
                   hash(o_orderkey) AS h_key,
                   hash(o_orderkey, o_custkey) AS h_pair,
                   hash(o_orderstatus) AS h_status,
                   reflect('java.lang.String', 'valueOf', o_orderkey) AS str_key,
                   u.tag AS u_tag, u.field0 AS u_status, u.field1 AS u_cust
                 FROM (SELECT *,
                         create_union(cast(o_orderkey % 2 AS INT),
                                      o_orderstatus, o_custkey) AS u
                       FROM orders WHERE o_orderkey <= 500)
                 ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
        CAST(o_orderkey AS INT) AS h_key,
        CAST(31 * o_orderkey + o_custkey AS INT) AS h_pair,
        ascii(o_orderstatus) AS h_status,
        CAST(o_orderkey AS VARCHAR) AS str_key,
        o_orderkey % 2 AS u_tag,
        CASE WHEN o_orderkey % 2 = 0 THEN o_orderstatus END AS u_status,
        CASE WHEN o_orderkey % 2 = 1 THEN o_custkey END AS u_cust
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ---- Hive 0.8 string↔numeric comparison coercion pinned END-TO-END
    //      (FunctionRegistry.java:1121-1190 getCommonClassForComparison:
    //      string vs ANY numeric compares by casting BOTH to double —
    //      plans/HiveComparisonCoercion rewrites exactly the analyzer-
    //      inserted coercion casts). Cases chosen where modern Spark's
    //      cast-string-to-numeric-type rule DIVERGES: exponent strings
    //      ('1e1' = 10 → Hive TRUE, native Spark NULL), fractional strings
    //      in ordering predicates ('3.5' > 3 → Hive TRUE, native FALSE),
    //      and float-vs-string precision ('0.1' = float 0.1 → Hive FALSE at
    //      double precision, native TRUE at float precision). Exercised on
    //      literals, derived columns, AND a WHERE predicate (the row count
    //      itself depends on the coercion). The oracle writes Hive's
    //      both-to-double rule explicitly — DuckDB's native varchar↔int
    //      compare would ERROR on '1e1'. Explicit user casts are honored
    //      unchanged (spec'd in HiveCoercionSpec, not oracle-expressible).
    QueryDef(
      "q100_coercion_cmp",
      (s, dir) => {
        graft.Sessions.ensureRegistered(s)
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey,
                   concat(cast(o_custkey % 5 AS string), 'e1') AS s_exp,
                   concat(cast(o_custkey % 7 AS string), '.5') AS s_frac,
                   concat(cast(o_custkey % 5 AS string), 'e1')
                     = (o_custkey % 3) * 10 AS exp_eq,
                   concat(cast(o_custkey % 7 AS string), '.5') > 3 AS frac_gt,
                   '1e1' = 10 AS lit_exp_eq,
                   '3.5' > 3 AS lit_frac_gt,
                   '0.1' = cast(0.1 AS float) AS float_prec
                 FROM orders
                 WHERE o_orderkey <= 2000
                   AND concat(cast(o_custkey % 7 AS string), '.5') > 1
                 ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
        CAST(o_custkey % 5 AS VARCHAR) || 'e1' AS s_exp,
        CAST(o_custkey % 7 AS VARCHAR) || '.5' AS s_frac,
        CAST(CAST(o_custkey % 5 AS VARCHAR) || 'e1' AS DOUBLE)
          = CAST((o_custkey % 3) * 10 AS DOUBLE) AS exp_eq,
        CAST(CAST(o_custkey % 7 AS VARCHAR) || '.5' AS DOUBLE) > CAST(3 AS DOUBLE) AS frac_gt,
        CAST('1e1' AS DOUBLE) = CAST(10 AS DOUBLE) AS lit_exp_eq,
        CAST('3.5' AS DOUBLE) > CAST(3 AS DOUBLE) AS lit_frac_gt,
        CAST(0.1 AS DOUBLE) = CAST(CAST(0.1 AS FLOAT) AS DOUBLE) AS float_prec
        FROM orders
        WHERE o_orderkey <= 2000
          AND CAST(CAST(o_custkey % 7 AS VARCHAR) || '.5' AS DOUBLE) > CAST(1 AS DOUBLE)
        ORDER BY o_orderkey""")),

    // ---- context_ngrams (GenericUDAFContextNGrams.java:424): top-10 words
    //      following 'the' per language
    QueryDef(
      "q48_context_ngrams",
      (s, dir) => t(s, dir, "documents")
        .select(col("lang"), split(lower(col("text")), " ").as("words"))
        .groupBy(col("lang"))
        .agg(expr("context_ngrams_topk(words, array('the', cast(null AS string)), 10)")
          .as("grams"))
        .select(col("lang"), explode(col("grams")).as("g"))
        .select(col("lang"), col("g.ngram").as("follower"), col("g.freq").as("freq"))
        .orderBy(col("lang"), col("freq").desc, col("follower")),
      Some("""WITH w AS (SELECT lang, str_split(lower(text), ' ') AS words FROM documents),
        b AS (SELECT lang,
                unnest(list_transform(range(1, len(words)),
                       i -> CASE WHEN words[i] = 'the' THEN words[i + 1] END)) AS follower
              FROM w),
        c AS (SELECT lang, follower, count(*) AS freq FROM b
              WHERE follower IS NOT NULL GROUP BY 1, 2)
        SELECT lang, follower, freq FROM c
        QUALIFY row_number() OVER (PARTITION BY lang ORDER BY freq DESC, follower) <= 10
        ORDER BY lang, freq DESC, follower""")),

    // ---- Trig + sign/identity + case-alias battery (FunctionRegistry.java
    //      registry rows not exercised by q19/q36: sin/cos/tan/asin/acos/
    //      atan, sign, negative/positive, ucase/lcase). 6-dp rounds absorb
    //      the last-ulp libm differences between the JVM and DuckDB's C
    //      runtime; asin/acos stay in-domain on l_discount ∈ [0, 0.1].
    QueryDef(
      "q115_trig_funcs",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 60)
        .selectExpr("l_orderkey", "l_linenumber",
          "round(sin(l_discount), 6) AS sn",
          "round(cos(l_discount), 6) AS cs",
          "round(tan(l_discount), 6) AS tn",
          "round(asin(l_discount), 6) AS asn",
          "round(acos(l_discount), 6) AS acs",
          "round(atan(l_quantity), 6) AS att",
          "round(degrees(l_discount), 6) AS dg",
          "round(radians(l_quantity), 6) AS rd",
          "sign(l_discount - 0.05D) AS sg",
          "negative(l_quantity) AS neg",
          "positive(l_linenumber) AS pos",
          "ucase(l_returnflag) AS uc",
          "lcase(l_linestatus) AS lc")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("sn"),
          col("att"), col("neg")),
      Some("""SELECT l_orderkey, l_linenumber,
        round(sin(l_discount), 6) AS sn,
        round(cos(l_discount), 6) AS cs,
        round(tan(l_discount), 6) AS tn,
        round(asin(l_discount), 6) AS asn,
        round(acos(l_discount), 6) AS acs,
        round(atan(l_quantity), 6) AS att,
        round(degrees(l_discount), 6) AS dg,
        round(radians(l_quantity), 6) AS rd,
        CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
        -l_quantity AS neg,
        l_linenumber AS pos,
        upper(l_returnflag) AS uc,
        lower(l_linestatus) AS lc
        FROM lineitem WHERE l_orderkey <= 60
        ORDER BY l_orderkey, l_linenumber, sn, att, neg""")),

    // ---- RCFile interchange (closes the last §7.5 format drop): write the
    //      reference's columnar container from the executors (one .rc part
    //      per partition), read it back per-file-parallel, and prove the
    //      round trip against the parquet oracle — including a null column
    //      (\N cells) and schema-driven casts. Format re-implemented from
    //      the documented layout in sources/HiveRCFile (EwahCodec posture);
    //      RCFileSpec holds the hand-built golden decode.
    QueryDef(
      "q127_rcfile_roundtrip",
      (s, dir) => {
        val out = sys.props("java.io.tmpdir") + "/graft_rcfile_q127"
        val src = fixtureBound(t(s, dir, "part"), "p_partkey", 301)
          .select(col("p_partkey"), col("p_name"), col("p_size"),
            col("p_retailprice"),
            when(col("p_partkey") % 7 === 0, lit(null))
              .otherwise(col("p_brand")).as("maybe_brand"))
        graft.sources.HiveRCFile.write(src, out)
        graft.sources.HiveRCFile.read(s, out, src.schema)
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_name, p_size, p_retailprice,
               CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_brand END AS maybe_brand
        FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""")),

    // ---- SequenceFile PRODUCTION write + key-agnostic read (closes the
    //      §7.5 "SequenceFile production writer" drop): the reference's
    //      exact table layout — empty BytesWritable key, LazySimpleSerDe-
    //      delimited Text value (HiveSequenceFileOutputFormat.java:40-43) —
    //      written from the executors and read back with schema casts and
    //      a null column riding the \N sequence.
    QueryDef(
      "q128_seqfile_roundtrip",
      (s, dir) => {
        val out = sys.props("java.io.tmpdir") + "/graft_seqfile_q128"
        val src = fixtureBound(t(s, dir, "customer"), "c_custkey", 301)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal"),
            when(col("c_custkey") % 5 === 0, lit(null))
              .otherwise(col("c_mktsegment")).as("seg"))
        graft.sources.HiveSequenceFile.write(src, out) // write() overwrites
        graft.sources.HiveSequenceFile.readTable(s, out, src.schema)
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal,
               CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg
        FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""")),

    // ---- Hadoop-archive round trip (closes the §7.5 HAR drop with an
    //      oracle, like q127/q128 do for RCFile/SequenceFile): write
    //      parquet, pack it into a REAL version-3 HAR, and read the
    //      payload back through Hadoop's own har:// filesystem — the
    //      reference's ALTER TABLE ARCHIVE read path, end to end.
    QueryDef(
      "q138_har_roundtrip",
      (s, dir) => {
        val out = sys.props("java.io.tmpdir") +
          s"/graft_har_q138_${Integer.toHexString(dir.hashCode)}"
        val p = new org.apache.hadoop.fs.Path(out)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val src = fixtureBound(t(s, dir, "supplier"), "s_suppkey", 301)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
            col("s_acctbal"))
        src.repartition(3).write.parquet(out)
        val uri = graft.sources.HiveArchive.archive(s, out)
        s.read.parquet(uri).orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier WHERE s_suppkey <= 300 ORDER BY s_suppkey"""))
  )
}
