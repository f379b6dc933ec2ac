package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.HiveCompat
import org.apache.spark.sql.functions._

/** Scalar/generator/UDAF function surface of the reference
  * (SURVEY.md §2.8/§2.9): URL parsing, string battery beyond q18, complex
  * types incl. the uniontype encoding, numeric conv/bin/hex + bitwise ops,
  * JSON functions, UDTFs (posexplode/stack), and the ngrams UDAF.
  *
  * Every query projects ground-truth-reconstructible values so the DuckDB
  * oracle states the expected result independently (it does not need the
  * same function to exist in DuckDB).
  */
object HiveFunctions extends QueryModule {

  val defs: Seq[QueryDef] = Seq(

    // ---- parse_url + parse_url_tuple (ref GenericUDFParseUrl registry :284,
    //      GenericUDTFParseUrlTuple :436) against URLs built from columns
    QueryDef(
      "q33_url_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 300)
        .selectExpr(
          "o_orderkey",
          """concat('https://shop.example.com/', o_orderstatus, '/', o_orderkey,
             '?prio=', substr(o_orderpriority, 1, 1), '&cust=', o_custkey,
             '#f', o_orderkey) AS url""")
        .selectExpr(
          "o_orderkey",
          "parse_url(url, 'HOST') AS host",
          "parse_url(url, 'PATH') AS path",
          "parse_url(url, 'QUERY', 'prio') AS q_prio",
          "parse_url_tuple(url, 'QUERY:cust', 'REF') AS (q_cust, ref)")
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        'shop.example.com' AS host,
        '/' || o_orderstatus || '/' || o_orderkey AS path,
        substr(o_orderpriority, 1, 1) AS q_prio,
        CAST(o_custkey AS VARCHAR) AS q_cust,
        'f' || o_orderkey AS ref
        FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""")),

    // ---- string battery #2: str_to_map, find_in_set, elt, instr, locate,
    //      translate, initcap, repeat, space, ascii, field (custom)
    //      (ref FunctionRegistry.java:276-286,420-423)
    QueryDef(
      "q34_string_funcs2",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 1000)
        .selectExpr(
          "o_orderkey",
          "str_to_map(concat('status:', o_orderstatus, ',prio:', split(o_orderpriority, '-')[0]), ',', ':')['status'] AS st",
          "str_to_map(concat('status:', o_orderstatus, ',prio:', split(o_orderpriority, '-')[0]), ',', ':')['prio'] AS pr",
          "find_in_set(o_orderstatus, 'F,O,P') AS fis",
          "elt(2, 'x', o_orderstatus) AS e2",
          "instr(o_orderpriority, '-') AS ins",
          "locate('R', o_orderpriority) AS loc",
          "concat_ws('|', o_orderstatus, o_orderpriority) AS cw",
          "translate(o_orderstatus, 'FOP', 'fop') AS tr",
          "initcap(lower(o_orderstatus)) AS ic",
          "field(o_orderstatus, 'F', 'O', 'P') AS fld",
          "repeat(o_orderstatus, 2) AS rep",
          "concat('a', space(2), 'b') AS spc",
          "ascii(o_orderstatus) AS asc")
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        o_orderstatus AS st,
        split_part(o_orderpriority, '-', 1) AS pr,
        CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 WHEN 'P' THEN 3 ELSE 0 END AS fis,
        o_orderstatus AS e2,
        position('-' IN o_orderpriority) AS ins,
        position('R' IN o_orderpriority) AS loc,
        o_orderstatus || '|' || o_orderpriority AS cw,
        translate(o_orderstatus, 'FOP', 'fop') AS tr,
        o_orderstatus AS ic,
        CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 WHEN 'P' THEN 3 ELSE 0 END AS fld,
        repeat(o_orderstatus, 2) AS rep,
        'a  b' AS spc,
        unicode(o_orderstatus) AS asc
        FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""")),

    // ---- complex types: array/map/struct/named_struct/size/array_contains/
    //      map_keys + the uniontype encoding (ref FunctionRegistry.java:409-427,
    //      create_union :413; SURVEY.md §1.2)
    QueryDef(
      "q35_complex_types",
      (s, dir) => {
        val u = HiveCompat.createUnion(
          col("l_linenumber") % 2, col("l_orderkey"), col("l_returnflag"))
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 50)
          .withColumn("u", u)
          .selectExpr(
            "l_orderkey", "l_linenumber",
            "array(l_linenumber, l_linenumber * 2)[0] AS a0",
            "size(array(l_linenumber, l_linenumber * 2)) AS sz",
            "array_contains(array(l_linenumber, l_linenumber * 2), 2) AS has2",
            "map('a', l_linenumber, 'b', 7)['a'] AS ma",
            "aggregate(map_values(map('a', l_linenumber, 'b', 7)), 0, (acc, x) -> acc + x) AS mvsum",
            "concat_ws(',', sort_array(map_keys(map('a', l_linenumber, 'b', 7)))) AS mk",
            "named_struct('q', l_quantity, 'ln', l_linenumber).q AS stq",
            "cast(u.tag AS INT) AS utag",
            "coalesce(cast(u.field0 AS string), u.field1) AS uval")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("stq"), col("uval"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
        l_linenumber AS a0,
        2 AS sz,
        (l_linenumber = 2 OR l_linenumber = 1) AS has2,
        l_linenumber AS ma,
        l_linenumber + 7 AS mvsum,
        'a,b' AS mk,
        l_quantity AS stq,
        l_linenumber % 2 AS utag,
        CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_orderkey AS VARCHAR)
             ELSE l_returnflag END AS uval
        FROM lineitem WHERE l_orderkey <= 50
        ORDER BY l_orderkey, l_linenumber, stq, uval""")),

    // ---- numeric/bitwise battery: conv, bin, hex, unhex, pmod, degrees,
    //      radians, atan2, log2/log10/cbrt, shifts, & | ^ ~
    //      (ref FunctionRegistry.java:234-265,326-329)
    QueryDef(
      "q36_numeric_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey").between(1, 500))
        .selectExpr(
          "o_orderkey",
          "conv(cast(o_orderkey AS string), 10, 16) AS hx16",
          "bin(o_orderkey) AS bn",
          "hex(o_orderkey) AS hx",
          "decode(unhex(hex(encode(o_orderstatus, 'UTF-8'))), 'UTF-8') AS rt",
          "pmod(0 - o_orderkey, 7) AS pm",
          "round(degrees(acos(-1) / 2), 6) AS deg",
          "round(radians(180), 6) AS rad",
          "round(atan2(1, o_orderkey), 6) AS at2",
          "round(log2(o_orderkey), 6) AS lg2",
          "round(log10(o_orderkey), 6) AS lg10",
          "round(cbrt(o_orderkey), 6) AS cb",
          "shiftleft(o_orderkey, 2) AS shl",
          "shiftright(o_orderkey, 1) AS shr",
          "o_orderkey & 255 AS band",
          "o_orderkey | 256 AS bor",
          "o_orderkey ^ 85 AS bxor",
          "~o_orderkey AS bnot")
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        hex(o_orderkey) AS hx16,
        bin(o_orderkey) AS bn,
        hex(o_orderkey) AS hx,
        o_orderstatus AS rt,
        ((-o_orderkey % 7) + 7) % 7 AS pm,
        CAST(90.0 AS DOUBLE) AS deg,
        round(pi(), 6) AS rad,
        round(atan2(1, o_orderkey), 6) AS at2,
        round(log2(o_orderkey), 6) AS lg2,
        round(log10(o_orderkey), 6) AS lg10,
        round(cbrt(o_orderkey), 6) AS cb,
        o_orderkey * 4 AS shl,
        o_orderkey // 2 AS shr,
        o_orderkey & 255 AS band,
        o_orderkey | 256 AS bor,
        xor(o_orderkey, 85) AS bxor,
        ~o_orderkey AS bnot
        FROM orders WHERE o_orderkey BETWEEN 1 AND 500 ORDER BY o_orderkey""")),

    // ---- JSON: json_tuple (ref GenericUDTFJSONTuple :435), from_json/to_json
    //      round trip on the events props column
    QueryDef(
      "q37_json_funcs",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_id") <= 2000)
        .selectExpr(
          "event_id",
          "json_tuple(props, 'k') AS jk",
          "from_json(props, 'k INT').k AS fk",
          "to_json(named_struct('k', from_json(props, 'k INT').k)) AS js")
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        regexp_extract(props, '"k": (-?\d+)', 1) AS jk,
        CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INT) AS fk,
        '{"k":' || regexp_extract(props, '"k": (-?\d+)', 1) || '}' AS js
        FROM events WHERE event_id <= 2000 ORDER BY event_id""")),

    // ---- posexplode generator (ref UDTFOperator.java:41; explode's
    //      positional variant)
    QueryDef(
      "q38_posexplode",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 100)
        .selectExpr("o_orderkey",
          "posexplode(split(o_orderpriority, '-')) AS (pos, token)")
        .orderBy(col("o_orderkey"), col("pos")),
      Some("""SELECT o_orderkey, unnest(range(0, len(l))) AS pos, unnest(l) AS token
        FROM (SELECT o_orderkey, str_split(o_orderpriority, '-') AS l
              FROM orders WHERE o_orderkey <= 100) t
        ORDER BY o_orderkey, pos""")),

    // ---- stack generator: n-row pivot-longer without a UNION of scans
    QueryDef(
      "q39_stack",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 100)
        .selectExpr("o_orderkey",
          "stack(2, 'status', o_orderstatus, 'prio', o_orderpriority) AS (tag, v)")
        .orderBy(col("o_orderkey"), col("tag")),
      Some("""SELECT o_orderkey, tag, v FROM (
          SELECT o_orderkey, 'status' AS tag, o_orderstatus AS v FROM orders WHERE o_orderkey <= 100
          UNION ALL
          SELECT o_orderkey, 'prio' AS tag, o_orderpriority AS v FROM orders WHERE o_orderkey <= 100)
        ORDER BY o_orderkey, tag""")),

    // ---- ngrams UDAF (ref GenericUDAFnGrams.java:361) — custom Aggregator,
    //      top-10 bigrams per language over documents
    QueryDef(
      "q40_ngrams",
      (s, dir) => t(s, dir, "documents")
        .select(col("lang"), split(lower(col("text")), " ").as("words"))
        .groupBy(col("lang"))
        .agg(expr("ngrams_topk(words, 2, 10)").as("grams"))
        .select(col("lang"), explode(col("grams")).as("g"))
        .select(col("lang"), col("g.ngram").as("ngram"), col("g.freq").as("freq"))
        .orderBy(col("lang"), col("freq").desc, col("ngram")),
      Some("""WITH w AS (SELECT lang, str_split(lower(text), ' ') AS words FROM documents),
        b AS (SELECT lang,
                unnest(list_transform(range(1, len(words)),
                                      i -> words[i] || ' ' || words[i + 1])) AS ngram
              FROM w),
        c AS (SELECT lang, ngram, count(*) AS freq FROM b GROUP BY 1, 2)
        SELECT lang, ngram, freq FROM c
        QUALIFY row_number() OVER (PARTITION BY lang ORDER BY freq DESC, ngram) <= 10
        ORDER BY lang, freq DESC, ngram""")),

    // ---- Array-function battery (extension beyond the reference's
    //      size/array/index surface): set algebra, flatten, zip, slicing,
    //      containment — flattened to scalars for the oracle
    QueryDef(
      "q78_array_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .selectExpr("o_orderkey", "o_orderstatus",
          "split(o_orderpriority, '-') AS toks",
          "array(o_orderstatus, 'X') AS st")
        .selectExpr("o_orderkey",
          "concat_ws(',', sort_array(array_union(toks, st))) AS au",
          "concat_ws(',', array_intersect(toks, array('1', '2', '3'))) AS ai",
          "concat_ws(',', array_except(toks, array('URGENT'))) AS ae",
          "concat_ws(',', flatten(array(toks, st))) AS fl",
          "concat_ws(',', array_compact(array(o_orderstatus, NULL, 'Z'))) AS ac",
          "concat_ws(',', slice(toks, 1, 1)) AS sl",
          "concat_ws(',', array_repeat(o_orderstatus, 2)) AS ar",
          "concat_ws(',', zip_with(toks, st, (a, b) -> concat(a, '+', b))) AS zw",
          "array_position(toks, 'URGENT') AS ap",
          "concat_ws(',', array_remove(st, 'X')) AS arm",
          "concat_ws(',', sort_array(st, false)) AS sa")
        .orderBy(col("o_orderkey")),
      Some("""WITH t AS (
          SELECT o_orderkey, o_orderstatus,
                 str_split(o_orderpriority, '-') AS toks,
                 [o_orderstatus, 'X'] AS st
          FROM orders WHERE o_orderkey <= 500)
        SELECT o_orderkey,
          array_to_string(list_sort(list_distinct(list_concat(toks, st))), ',') AS au,
          coalesce(array_to_string(list_filter(toks, x -> x IN ('1', '2', '3')), ','), '') AS ai,
          array_to_string(list_filter(toks, x -> x != 'URGENT'), ',') AS ae,
          array_to_string(list_concat(toks, st), ',') AS fl,
          array_to_string([x for x in [o_orderstatus, NULL, 'Z'] if x IS NOT NULL], ',') AS ac,
          array_to_string(toks[1:1], ',') AS sl,
          o_orderstatus || ',' || o_orderstatus AS ar,
          array_to_string(list_transform(range(1, greatest(len(toks), len(st)) + 1),
            i -> toks[i] || '+' || st[i]), ',') AS zw,
          coalesce(list_position(toks, 'URGENT'), 0) AS ap,
          array_to_string(list_filter(st, x -> x != 'X'), ',') AS arm,
          array_to_string(list_sort(st, 'DESC'), ',') AS sa
        FROM t ORDER BY o_orderkey""")),

    // ---- Pattern matching: LIKE %/_ wildcards, escaped literals, RLIKE
    //      regex, case-insensitive match (ref like/rlike/regexp registered
    //      FunctionRegistry.java:279-281)
    QueryDef(
      "q77_patterns",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_partkey") <= 800)
        .selectExpr("p_partkey",
          "p_type LIKE '%BRUSHED%' AS has_brushed",
          "p_name LIKE 'a_u%' AS a_u_prefix",
          "p_brand LIKE 'Brand#1_' AS brand_teens",
          "p_type RLIKE '^(STANDARD|SMALL) ' AS std_or_small",
          "p_name RLIKE '[aeiou]{3}' AS triple_vowel",
          "lower(p_type) LIKE lower('%Steel%') AS has_steel_ci")
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
        p_type LIKE '%BRUSHED%' AS has_brushed,
        p_name LIKE 'a_u%' AS a_u_prefix,
        p_brand LIKE 'Brand#1_' AS brand_teens,
        regexp_matches(p_type, '^(STANDARD|SMALL) ') AS std_or_small,
        regexp_matches(p_name, '[aeiou]{3}') AS triple_vowel,
        lower(p_type) LIKE lower('%Steel%') AS has_steel_ci
        FROM part WHERE p_partkey <= 800 ORDER BY p_partkey""")),

    // ---- date/time battery #2: last_day, add_months, next_day, trunc,
    //      from/to_utc_timestamp (registry :291-305, :429-430) — timezone
    //      cases use the DST-free Etc/GMT+5 so both engines agree exactly
    QueryDef(
      "q64_datetime2",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .selectExpr(
          "o_orderkey",
          "date_format(last_day(o_orderdate), 'yyyy-MM-dd') AS ld",
          "date_format(add_months(o_orderdate, 2), 'yyyy-MM-dd') AS am2",
          "date_format(next_day(o_orderdate, 'Monday'), 'yyyy-MM-dd') AS nmon",
          "date_format(trunc(cast(o_orderdate AS date), 'MM'), 'yyyy-MM-dd') AS mstart",
          "date_format(from_utc_timestamp(o_orderdate, 'Etc/GMT+5'), 'yyyy-MM-dd HH:mm:ss') AS minus5",
          "date_format(to_utc_timestamp(o_orderdate, 'Etc/GMT+5'), 'yyyy-MM-dd HH:mm:ss') AS plus5")
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS ld,
        strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d') AS am2,
        strftime(CAST(o_orderdate AS DATE)
                 + ((7 - dayofweek(CAST(o_orderdate AS DATE))) % 7 + 1) * INTERVAL 1 DAY,
                 '%Y-%m-%d') AS nmon,
        strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS mstart,
        strftime(o_orderdate - INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S') AS minus5,
        strftime(o_orderdate + INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S') AS plus5
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ---- xpath battery (ref xpath_string/boolean/number..., registry
    //      :309-317) over XML built from columns so the oracle states
    //      ground truth without a DuckDB xpath
    QueryDef(
      "q58_xpath",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_partkey") <= 500)
        .selectExpr("p_partkey",
          "concat('<r><b>', p_brand, '</b><s>', p_size, '</s></r>') AS x")
        .selectExpr("p_partkey",
          "xpath_string(x, 'r/b') AS xb",
          "xpath_int(x, 'r/s') AS xs",
          "xpath_boolean(x, 'r/b') AS has_b",
          "xpath_boolean(x, 'r/missing') AS has_missing",
          "size(xpath(x, 'r/*/text()')) AS n_parts")
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
        p_brand AS xb, p_size AS xs, true AS has_b, false AS has_missing,
        2 AS n_parts
        FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""")),

    // ---- HiveQL dialect through spark.sql: DISTRIBUTE BY / SORT BY parse
    //      natively (Hive.g:1769/:1777); outer ORDER BY makes it oracle-able
    QueryDef(
      "q41_hiveql_sortby",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT l_orderkey, l_linenumber, l_quantity FROM (
                   SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
                   WHERE l_orderkey <= 2000
                   DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_linenumber)
                 ORDER BY l_orderkey, l_linenumber, l_quantity""")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_orderkey <= 2000 ORDER BY l_orderkey, l_linenumber, l_quantity""")),

    // ---- LATERAL VIEW in SQL (ref Hive.g:1628-1633, LateralViewJoinOperator)
    QueryDef(
      "q42_hiveql_lateral_view",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey, token
                 FROM orders
                 LATERAL VIEW explode(split(o_orderpriority, '-')) tok AS token
                 WHERE o_orderkey <= 200
                 ORDER BY o_orderkey, token""")
      },
      Some("""SELECT o_orderkey, unnest(str_split(o_orderpriority, '-')) AS token
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey, token""")),

    // ---- TABLESAMPLE (BUCKET x OUT OF y ON col) — Hive.g tableSample +
    //      SamplePruner semantics (rows where hash(col) % y == x-1): the
    //      grammar form parses through HiveQl's rewrite and the predicate
    //      uses the Hive-named `hash`, so a bucket sample here selects the
    //      exact rows the reference's bucket pruning would read.
    QueryDef(
      "q84_tablesample",
      (s, dir) => {
        graft.Sessions.ensureRegistered(s)
        graft.Tables.registerAll(s, dir)
        graft.HiveQl.sql(s,
          """SELECT l_suppkey, count(*) AS n
             FROM lineitem TABLESAMPLE (BUCKET 1 OUT OF 32 ON l_suppkey)
             GROUP BY l_suppkey ORDER BY l_suppkey""")
      },
      // hash(bigint) folds to the value itself for small positives, so the
      // oracle's arithmetic form is the same bucket function
      Some("""SELECT l_suppkey, count(*) AS n FROM lineitem
        WHERE l_suppkey % 32 = 0 GROUP BY l_suppkey ORDER BY l_suppkey""")),

    // ---- TABLESAMPLE with a STRING ON-column and a non-power-of-two bucket
    //      count: Java String.hashCode goes NEGATIVE ("1-URGENT" →
    //      -1002256291), so the reference's ((hash & Integer.MAX_VALUE) % y)
    //      (SemanticAnalyzer.java:6089) picks bucket 2 of 7 while a naive
    //      pmod(hash, y) picks bucket 7 — this query returns zero rows under
    //      the pmod form. Also exercises the explicit trailing alias path of
    //      the rewrite. Oracle emulates Java hashCode with a per-step
    //      mod-2^32 list_reduce (BIGINT accumulator; per-step wrap ≡ Java's
    //      int wrap because mod 2^32 is multiplication-homomorphic).
    QueryDef(
      "q89_tablesample_str",
      (s, dir) => {
        graft.Sessions.ensureRegistered(s)
        graft.Tables.registerAll(s, dir)
        graft.HiveQl.sql(s,
          """SELECT o.o_orderpriority, count(*) AS n
             FROM orders TABLESAMPLE (BUCKET 2 OUT OF 7 ON o_orderpriority) o
             GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""")
      },
      Some("""WITH h AS (
          SELECT o_orderpriority,
                 ((list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, length(o_orderpriority) + 1),
                       i -> CAST(ascii(o_orderpriority[i:i]) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 4294967296)
                   + 2147483648) % 4294967296) - 2147483648 AS jh
          FROM orders)
        SELECT o_orderpriority, count(*) AS n FROM h
        WHERE (jh & 2147483647) % 7 = 1
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- TRANSFORM ... USING (script operator, ref ScriptOperator.java:54) —
    //      rows piped through /bin/cat and read back, Spark's native
    //      no-serde script transform
    QueryDef(
      "q43_hiveql_transform",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT k, v FROM (
                   SELECT TRANSFORM(o_orderkey, o_orderstatus) USING 'cat' AS (k STRING, v STRING)
                   FROM orders WHERE o_orderkey <= 100)
                 ORDER BY cast(k AS BIGINT)""")
      },
      Some("""SELECT CAST(o_orderkey AS VARCHAR) AS k, o_orderstatus AS v
        FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey"""))
  )
}
