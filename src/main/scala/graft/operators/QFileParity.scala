package graft.operators

import graft.{HiveQl, QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference `.q`-file parity battery (SURVEY.md §5 carry-over): the
  * reference's OWN clientpositive test statements, executed through
  * [[graft.HiveQl.sql]] — the same entry point a reference user's scripts
  * hit — and checked against the DuckDB oracle.
  *
  * The reference's golden harness (QTestUtil.java:417-520) runs each `.q`
  * against canonical fixtures (`src` = 500 (key,value) rows of kv1.txt,
  * `srcpart` = the same rows in 4 (ds,hr) partitions) and diffs result rows.
  * We reproduce the harness shape, not its bytes: the fixtures derive
  * DETERMINISTICALLY from the driver's parquet tables (same derivation in
  * the oracle SQL), statements run verbatim from the `.q` corpus — dest
  * table names carry a per-SF suffix so concurrent scale factors can't
  * collide, and readbacks gain a total ORDER BY (+ rounding on DOUBLE
  * aggregates) because our gate hash-compares rows instead of diffing a
  * golden file. `STORED AS TEXTFILE` maps to Hive-text-shaped CSV tables in
  * the dialect (HiveQl.rewriteMasked), so the dest files on disk are ^A-
  * delimited Hive text a reference deployment could LOAD back.
  *
  * Fixture shape: `key = (rn*rn) % 500` over the first 500 orders rows —
  * like kv1.txt it has duplicate keys (quadratic residues collide; counts
  * reach >3 so having.q's `HAVING c > 3` is non-empty) and gaps. The
  * fixture is CONSTANT-SIZE by construction (it is the reference's unit
  * fixture, not scale-out data), so these queries are correctness surface,
  * not rehearsal surface.
  */
object QFileParity extends QueryModule {

  /** Register `src`/`srcpart` temp views on this session; returns the per-SF
    * dest-table suffix. Idempotent per (session, dir).
    */
  private def fixtures(s: SparkSession, dir: String): String = {
    t(s, dir, "orders").createOrReplaceTempView("graft_qf_orders")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW src AS
      SELECT CAST((rn * rn) % 500 AS STRING) AS key,
             concat('val_', CAST((rn * rn) % 500 AS STRING)) AS value
      FROM (SELECT row_number() OVER (ORDER BY o_orderkey) AS rn
            FROM graft_qf_orders) t
      WHERE rn <= 500""")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW srcpart AS
      SELECT src.key, src.value, p.ds, p.hr
      FROM src, (SELECT ds, hr FROM VALUES
        ('2008-04-08','11'), ('2008-04-08','12'),
        ('2008-04-09','11'), ('2008-04-09','12') AS v(ds, hr)) p""")
    (dir.hashCode & Int.MaxValue).toString
  }

  /** DuckDB twin of the `src` view (same derivation over the same parquet). */
  private val SrcCte =
    """WITH src AS (
         SELECT CAST((rn * rn) % 500 AS VARCHAR) AS key,
                'val_' || CAST((rn * rn) % 500 AS VARCHAR) AS value
         FROM (SELECT row_number() OVER (ORDER BY o_orderkey) AS rn
               FROM orders) t
         WHERE rn <= 500)"""

  private val SrcPartCte = SrcCte.stripSuffix(")") + """),
       srcpart AS (
         SELECT src.key, src.value, p.ds, p.hr
         FROM src, (SELECT * FROM (VALUES
           ('2008-04-08','11'), ('2008-04-08','12'),
           ('2008-04-09','11'), ('2008-04-09','12')) v(ds, hr)) p)"""

  /** Fresh dest table: drop catalog entry AND any stale warehouse dir (the
    * q101 pattern — a fresh JVM has an empty in-memory catalog but the
    * warehouse dir survives).
    */
  private def fresh(s: SparkSession, names: String*): Unit = names.foreach { n =>
    s.sql(s"DROP TABLE IF EXISTS $n")
    val p = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), n)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- clientpositive/groupby1.q: the corpus' canonical aggregation —
    //      sum over a substring of the value, stored through an INT/DOUBLE
    //      dest (string→numeric store casts, Hive's LEGACY assignment)
    QueryDef(
      "q139_qf_groupby1",
      (s, dir) => {
        val d = s"dest_g1_${fixtures(s, dir)}"
        fresh(s, d)
        HiveQl.sql(s, s"CREATE TABLE $d(key INT, value DOUBLE) STORED AS TEXTFILE")
        HiveQl.sql(s, s"FROM src INSERT OVERWRITE TABLE $d " +
          s"SELECT src.key, sum(substr(src.value,5)) GROUP BY src.key")
        HiveQl.sql(s, s"SELECT $d.key, round($d.value, 2) AS value FROM $d ORDER BY key")
      },
      Some(s"""$SrcCte
        SELECT CAST(key AS INT) AS key,
               round(sum(CAST(substr(value, 5) AS DOUBLE)), 2) AS value
        FROM src GROUP BY key ORDER BY key""")),

    // ---- clientpositive/groupby3.q: the 9-aggregate battery in one pass —
    //      incl. avg(DISTINCT) and the Hive POPULATION spellings std /
    //      variance (GenericUDAFStd; Spark's same-named builtins are SAMPLE,
    //      so these resolve to graft's population registrations)
    QueryDef(
      "q140_qf_groupby3",
      (s, dir) => {
        val d = s"dest_g3_${fixtures(s, dir)}"
        fresh(s, d)
        HiveQl.sql(s, s"CREATE TABLE $d(c1 DOUBLE, c2 DOUBLE, c3 DOUBLE, " +
          "c4 DOUBLE, c5 DOUBLE, c6 DOUBLE, c7 DOUBLE, c8 DOUBLE, c9 DOUBLE) " +
          "STORED AS TEXTFILE")
        HiveQl.sql(s,
          s"""FROM src INSERT OVERWRITE TABLE $d SELECT
             sum(substr(src.value,5)),
             avg(substr(src.value,5)),
             avg(DISTINCT substr(src.value,5)),
             max(substr(src.value,5)),
             min(substr(src.value,5)),
             std(substr(src.value,5)),
             stddev_samp(substr(src.value,5)),
             variance(substr(src.value,5)),
             var_samp(substr(src.value,5))""")
        HiveQl.sql(s, s"SELECT round(c1,2) AS c1, round(c2,4) AS c2, " +
          s"round(c3,4) AS c3, c4, c5, round(c6,4) AS c6, round(c7,4) AS c7, " +
          s"round(c8,2) AS c8, round(c9,2) AS c9 FROM $d ORDER BY c1")
      },
      Some(s"""$SrcCte
        SELECT round(sum(v), 2) AS c1, round(avg(v), 4) AS c2,
               round(avg(DISTINCT v), 4) AS c3,
               CAST(max(sv) AS DOUBLE) AS c4, CAST(min(sv) AS DOUBLE) AS c5,
               round(stddev_pop(v), 4) AS c6, round(stddev_samp(v), 4) AS c7,
               round(var_pop(v), 2) AS c8, round(var_samp(v), 2) AS c9
        FROM (SELECT substr(value, 5) AS sv,
                     CAST(substr(value, 5) AS DOUBLE) AS v FROM src) t
        ORDER BY c1""")),

    // ---- clientpositive/input12.q: 3-way multi-insert off one scan —
    //      disjoint filters into two flat dests plus a STATIC-partition
    //      dest (PARTITION(ds,hr) branch through operators.MultiInsert)
    QueryDef(
      "q141_qf_input12",
      (s, dir) => {
        val sfx = fixtures(s, dir)
        val (d1, d2, d3) = (s"dest1_$sfx", s"dest2_$sfx", s"dest3_$sfx")
        fresh(s, d1, d2, d3)
        HiveQl.sql(s, s"CREATE TABLE $d1(key INT, value STRING) STORED AS TEXTFILE")
        HiveQl.sql(s, s"CREATE TABLE $d2(key INT, value STRING) STORED AS TEXTFILE")
        HiveQl.sql(s, s"CREATE TABLE $d3(key INT) PARTITIONED BY(ds STRING, hr STRING) STORED AS TEXTFILE")
        HiveQl.sql(s,
          s"""FROM src
             INSERT OVERWRITE TABLE $d1 SELECT src.* WHERE src.key < 100
             INSERT OVERWRITE TABLE $d2 SELECT src.key, src.value WHERE src.key >= 100 and src.key < 200
             INSERT OVERWRITE TABLE $d3 PARTITION(ds='2008-04-08', hr='12') SELECT src.key WHERE src.key >= 200""")
        HiveQl.sql(s,
          s"""SELECT 'd1' AS tag, key, value FROM $d1
             UNION ALL SELECT 'd2', key, value FROM $d2
             UNION ALL SELECT 'd3', key, concat(ds, '/', hr) FROM $d3
             ORDER BY tag, key, value""")
      },
      Some(s"""$SrcCte, base AS
          (SELECT CAST(key AS DOUBLE) AS kd, CAST(key AS INT) AS key, value FROM src)
        SELECT * FROM (
          SELECT 'd1' AS tag, key, value FROM base WHERE kd < 100
          UNION ALL SELECT 'd2', key, value FROM base WHERE kd >= 100 AND kd < 200
          UNION ALL SELECT 'd3', key, '2008-04-08/12' FROM base WHERE kd >= 200) u
        ORDER BY tag, key, value""")),

    // ---- clientpositive/join2.q: three-way self join whose second ON
    //      condition ADDS string keys (src1.key + src2.key = src3.key —
    //      Hive arithmetic coerces string→double, then the comparison
    //      coerces the string side; both are the dialect's coercion surface)
    QueryDef(
      "q142_qf_join2",
      (s, dir) => {
        val d = s"dest_j2_${fixtures(s, dir)}"
        fresh(s, d)
        HiveQl.sql(s, s"CREATE TABLE $d(key INT, value STRING) STORED AS TEXTFILE")
        HiveQl.sql(s,
          s"""FROM src src1 JOIN src src2 ON (src1.key = src2.key) JOIN src src3 ON (src1.key + src2.key = src3.key)
             INSERT OVERWRITE TABLE $d SELECT src1.key, src3.value""")
        HiveQl.sql(s, s"SELECT key, value, CAST(count(*) AS BIGINT) AS n " +
          s"FROM $d GROUP BY key, value ORDER BY key, value")
      },
      Some(s"""$SrcCte
        SELECT CAST(s1.key AS INT) AS key, s3.value AS value,
               CAST(count(*) AS BIGINT) AS n
        FROM src s1 JOIN src s2 ON s1.key = s2.key
        JOIN src s3
          ON CAST(s1.key AS DOUBLE) + CAST(s2.key AS DOUBLE) = CAST(s3.key AS DOUBLE)
        GROUP BY 1, 2 ORDER BY key, value""")),

    // ---- clientpositive/having.q: all five HAVING shapes — aggregate
    //      alias in HAVING (h1), non-grouped coerced key filter (h2),
    //      aggregate-only predicates with and without the aggregate in the
    //      select list (h3/h5), WHERE + HAVING combined (h4)
    QueryDef(
      "q143_qf_having",
      (s, dir) => {
        fixtures(s, dir)
        HiveQl.sql(s,
          """SELECT tag, a, b FROM (
             SELECT 'h1' AS tag, CAST(c AS STRING) AS a, '' AS b FROM
               (SELECT count(value) AS c FROM src GROUP BY key HAVING c > 3) h1
             UNION ALL SELECT 'h2', key, c FROM
               (SELECT key, max(value) AS c FROM src GROUP BY key HAVING key != 302) h2
             UNION ALL SELECT 'h3', key, '' FROM
               (SELECT key FROM src GROUP BY key HAVING max(value) > "val_255") h3
             UNION ALL SELECT 'h4', key, '' FROM
               (SELECT key FROM src where key > 300 GROUP BY key HAVING max(value) > "val_255") h4
             UNION ALL SELECT 'h5', key, mv FROM
               (SELECT key, max(value) AS mv FROM src GROUP BY key HAVING max(value) > "val_255") h5
             ) u ORDER BY tag, a, b""")
      },
      Some(s"""$SrcCte
        SELECT tag, a, b FROM (
          SELECT 'h1' AS tag, CAST(count(value) AS VARCHAR) AS a, '' AS b
            FROM src GROUP BY key HAVING count(value) > 3
          UNION ALL SELECT 'h2', key, max(value) FROM src GROUP BY key
            HAVING CAST(key AS DOUBLE) != 302
          UNION ALL SELECT 'h3', key, '' FROM src GROUP BY key
            HAVING max(value) > 'val_255'
          UNION ALL SELECT 'h4', key, '' FROM src
            WHERE CAST(key AS DOUBLE) > 300 GROUP BY key
            HAVING max(value) > 'val_255'
          UNION ALL SELECT 'h5', key, max(value) FROM src GROUP BY key
            HAVING max(value) > 'val_255') u
        ORDER BY tag, a, b""")),

    // ---- clientpositive/union3.q: four-branch UNION ALL with CLUSTER BY
    //      and LIMIT-1 subqueries inside branches, inserted through a table
    QueryDef(
      "q144_qf_union3",
      (s, dir) => {
        val d = s"union_out_${fixtures(s, dir)}"
        fresh(s, d)
        HiveQl.sql(s, s"CREATE TABLE $d (id int) STORED AS TEXTFILE")
        HiveQl.sql(s,
          s"""insert overwrite table $d
             SELECT * FROM (
               (SELECT 1 AS id FROM (SELECT * FROM src LIMIT 1) s1 CLUSTER BY id)
               UNION ALL
               (SELECT 2 AS id FROM (SELECT * FROM src LIMIT 1) s1 CLUSTER BY id)
               UNION ALL
               (SELECT 3 AS id FROM (SELECT * FROM src LIMIT 1) s2)
               UNION ALL
               (SELECT 4 AS id FROM (SELECT * FROM src LIMIT 1) s2)
             ) a""")
        HiveQl.sql(s, s"SELECT id FROM $d ORDER BY id")
      },
      Some("SELECT * FROM (VALUES (1), (2), (3), (4)) t(id) ORDER BY id")),

    // ---- clientpositive/input_part1.q: partition-predicate select out of
    //      srcpart into a dest carrying the partition columns as data
    QueryDef(
      "q145_qf_input_part1",
      (s, dir) => {
        val d = s"dest_p1_${fixtures(s, dir)}"
        fresh(s, d)
        HiveQl.sql(s, s"CREATE TABLE $d(key INT, value STRING, hr STRING, ds STRING) STORED AS TEXTFILE")
        HiveQl.sql(s,
          s"""FROM srcpart
             INSERT OVERWRITE TABLE $d SELECT srcpart.key, srcpart.value, srcpart.hr, srcpart.ds WHERE srcpart.key < 100 and srcpart.ds = '2008-04-08' and srcpart.hr = '12'""")
        HiveQl.sql(s, s"SELECT key, value, hr, ds FROM $d ORDER BY key, value")
      },
      Some(s"""$SrcPartCte
        SELECT CAST(key AS INT) AS key, value, hr, ds
        FROM srcpart
        WHERE CAST(key AS DOUBLE) < 100 AND ds = '2008-04-08' AND hr = '12'
        ORDER BY key, value""")))
}
