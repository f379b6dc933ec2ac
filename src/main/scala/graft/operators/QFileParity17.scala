package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{HiveQl, QueryDef, QueryModule}

/** Parity battery, tranche file 17 (round 13): the groupby conf-variant
  * block — groupby{1..8}_{map, map_skew, noskew, map_nomap,
  * map_multi_distinct, noskew_multi_distinct} (30 .q files). Each file is
  * one of fifteen query bodies under a hive.map.aggr /
  * hive.groupby.skewindata / mapaggr.checkinterval combination
  * (SemanticAnalyzer genGroupByPlan1MR/2MR/MapAggr selection); the graft
  * engine's GROUP BY plans are Catalyst's partial+final hash aggregates
  * regardless, so every variant must return identical rows — which is
  * exactly what the reference's own goldens assert across the variants.
  *
  * Float battery note: the g3 family dumps avg/std/variance aggregates —
  * those are rounded to 4 places on BOTH sides (cross-engine last-ulp
  * divergence; the values themselves pin the semantics).
  *
  * Coverage accounting (r15, VERDICT r14 #4): every one of the 30
  * groupby*_{map,map_skew,noskew,map_nomap,*_multi_distinct}.q files runs
  * TWICE in the registry — once in the r8 tranche (single body per file)
  * and once here/in QFileParity18 under the explicit SET combination.
  * file → query mapping (greppable):
  *   clientpositive/groupby1_map.q            -> q317, q672
  *   clientpositive/groupby1_map_nomap.q      -> q318, q674
  *   clientpositive/groupby1_map_skew.q       -> q319, q673
  *   clientpositive/groupby1_noskew.q         -> q320, q675
  *   clientpositive/groupby2_map.q            -> q321, q676
  *   clientpositive/groupby2_map_skew.q       -> q322, q677
  *   clientpositive/groupby2_noskew.q         -> q323, q678
  *   clientpositive/groupby2_map_multi_distinct.q    -> q679
  *   clientpositive/groupby2_noskew_multi_distinct.q -> q324, q680
  *   clientpositive/groupby3_map.q            -> q325, q681
  *   clientpositive/groupby3_map_skew.q       -> q326, q682
  *   clientpositive/groupby3_noskew.q         -> q327, q683
  *   clientpositive/groupby3_map_multi_distinct.q    -> q328, q684
  *   clientpositive/groupby3_noskew_multi_distinct.q -> q329, q685
  *   clientpositive/groupby4_map.q            -> q330, q686
  *   clientpositive/groupby4_map_skew.q       -> q331, q687
  *   clientpositive/groupby4_noskew.q         -> q332, q688
  *   clientpositive/groupby5_map.q            -> q333, q689
  *   clientpositive/groupby5_map_skew.q       -> q334, q690
  *   clientpositive/groupby5_noskew.q         -> q335, q691
  *   clientpositive/groupby6_map.q            -> q336, q692
  *   clientpositive/groupby6_map_skew.q       -> q337, q693
  *   clientpositive/groupby6_noskew.q         -> q338, q694
  *   clientpositive/groupby7_map.q            -> q339, q695
  *   clientpositive/groupby7_map_skew.q       -> q340, q696
  *   clientpositive/groupby7_noskew.q         -> q341, q697
  *   clientpositive/groupby8_map.q            -> q342, q698
  *   clientpositive/groupby8_map_skew.q       -> q343, q699
  *   clientpositive/groupby8_noskew.q         -> q344, q700
  * The plain/sibling files are covered outside the variant block:
  * groupby1 q139, groupby2 q203, groupby3 q140, groupby4 q204, groupby5
  * q205, groupby6 q166, groupby7 q151, groupby8 q160, groupby9 q206,
  * groupby10 q357, groupby11 q358, groupby1_limit q307, groupby2_limit
  * q430, groupby_ppr q155, groupby_ppr_multi_distinct q208,
  * groupby_map_ppr q312, groupby_map_ppr_multi_distinct q433,
  * groupby_bigdata q431, groupby_distinct_samekey q432, groupby_neg_float
  * q209.
  */
object QFileParity17 extends QueryModule {

  import QFileParity.{fixtures, fresh, SrcCte}

  private def confs(variant: String): Seq[String] = variant match {
    case "map" => Seq("set hive.map.aggr=true",
      "set hive.groupby.skewindata=false", "set mapred.reduce.tasks=31")
    case "map_skew" => Seq("set hive.map.aggr=true",
      "set hive.groupby.skewindata=true", "set mapred.reduce.tasks=31")
    case "noskew" => Seq("set hive.map.aggr=false",
      "set hive.groupby.skewindata=false", "set mapred.reduce.tasks=31")
    case "map_nomap" => Seq("set hive.map.aggr=true",
      "set hive.groupby.skewindata=false",
      "set hive.groupby.mapaggr.checkinterval=20")
    case other => confs(other.stripSuffix("_multi_distinct"))
  }

  /** CREATE dest → single INSERT body → ordered dump (the .q repeats the
    * insert after its EXPLAIN twin; one execution carries the values). */
  private def single(s: SparkSession, dir: String, qn: String, variant: String,
      cols: String, insert: String => String, dumpSel: String,
      order: Seq[String]): DataFrame = {
    val sfx = fixtures(s, dir)
    val d = s"gb_${qn}_$sfx"
    fresh(s, d)
    confs(variant).foreach(c => HiveQl.sql(s, c))
    HiveQl.sql(s, s"CREATE TABLE $d($cols) STORED AS TEXTFILE")
    HiveQl.sql(s, insert(d))
    HiveQl.sql(s, s"SELECT $dumpSel FROM $d").orderBy(order.map(col): _*)
  }

  /** DuckDB side of the src derivation all bodies share. */
  private val V =
    s"""$SrcCte, v AS (SELECT key, substr(value, 5, 10) AS sv,
        CAST(substr(value, 5, 10) AS DOUBLE) AS v FROM src)"""

  // ---- body shapes -------------------------------------------------------

  private def g1(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby1_$variant",
    (s, dir) => single(s, dir, qn, variant, "key INT, value DOUBLE",
      d => s"FROM src INSERT OVERWRITE TABLE $d " +
        "SELECT src.key, sum(substr(src.value,5)) GROUP BY src.key",
      "*", Seq("key")),
    Some(s"""$V SELECT CAST(key AS INT) AS key, SUM(v) AS value
        FROM v GROUP BY 1 ORDER BY key"""))

  private def g2(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby2_$variant",
    (s, dir) => single(s, dir, qn, variant, "key STRING, c1 INT, c2 STRING",
      d => s"""FROM src INSERT OVERWRITE TABLE $d
        SELECT substr(src.key,1,1), count(DISTINCT substr(src.value,5)),
               concat(substr(src.key,1,1), sum(substr(src.value,5)))
        GROUP BY substr(src.key,1,1)""",
      "*", Seq("key")),
    Some(s"""$V SELECT substr(key,1,1) AS key,
          CAST(count(DISTINCT v) AS INT) AS c1,
          substr(key,1,1) || CAST(SUM(v) AS VARCHAR) AS c2
        FROM v GROUP BY 1 ORDER BY key"""))

  private def g2md(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby2_${variant}_multi_distinct",
    (s, dir) => single(s, dir, qn, variant,
      "key STRING, c1 INT, c2 STRING, c3 INT, c4 INT",
      d => s"""FROM src INSERT OVERWRITE TABLE $d
        SELECT substr(src.key,1,1), count(DISTINCT substr(src.value,5)),
               concat(substr(src.key,1,1), sum(substr(src.value,5))),
               sum(DISTINCT substr(src.value, 5)), count(src.value)
        GROUP BY substr(src.key,1,1)""",
      "*", Seq("key")),
    Some(s"""$V SELECT substr(key,1,1) AS key,
          CAST(count(DISTINCT v) AS INT) AS c1,
          substr(key,1,1) || CAST(SUM(v) AS VARCHAR) AS c2,
          CAST(trunc(SUM(DISTINCT v)) AS INT) AS c3,
          CAST(count(*) AS INT) AS c4
        FROM v GROUP BY 1 ORDER BY key"""))

  private val g3Aggs =
    """sum(substr(src.value,5)), avg(substr(src.value,5)),
       avg(DISTINCT substr(src.value,5)), max(substr(src.value,5)),
       min(substr(src.value,5)), std(substr(src.value,5)),
       stddev_samp(substr(src.value,5)), variance(substr(src.value,5)),
       var_samp(substr(src.value,5))"""

  private def g3Dump(n: Int): String =
    (1 to n).map(i => s"round(c$i, 4) as c$i").mkString(", ")

  private val g3Oracle =
    """SUM(v) AS c1, AVG(v) AS c2, AVG(DISTINCT v) AS c3,
       CAST(MAX(sv) AS DOUBLE) AS c4, CAST(MIN(sv) AS DOUBLE) AS c5, stddev_pop(v) AS c6, stddev_samp(v) AS c7,
       var_pop(v) AS c8, var_samp(v) AS c9"""

  private def g3(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby3_$variant",
    (s, dir) => single(s, dir, qn, variant,
      (1 to 9).map(i => s"c$i DOUBLE").mkString(", "),
      d => s"FROM src INSERT OVERWRITE TABLE $d SELECT $g3Aggs",
      g3Dump(9), Seq("c1")),
    Some(s"""$V, a AS (SELECT $g3Oracle FROM v)
        SELECT ${(1 to 9).map(i => s"round(c$i, 4) AS c$i").mkString(", ")}
        FROM a"""))

  private def g3md(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby3_${variant}_multi_distinct",
    (s, dir) => single(s, dir, qn, variant,
      (1 to 11).map(i => s"c$i DOUBLE").mkString(", "),
      d => s"""FROM src INSERT OVERWRITE TABLE $d SELECT $g3Aggs,
        sum(DISTINCT substr(src.value, 5)), count(DISTINCT substr(src.value, 5))""",
      g3Dump(11), Seq("c1")),
    Some(s"""$V, a AS (SELECT $g3Oracle, SUM(DISTINCT v) AS c10,
          CAST(count(DISTINCT v) AS DOUBLE) AS c11 FROM v)
        SELECT ${(1 to 11).map(i => s"round(c$i, 4) AS c$i").mkString(", ")}
        FROM a"""))

  private def g4count(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby4_$variant",
    (s, dir) => single(s, dir, qn, variant, "key INT",
      d => s"FROM src INSERT OVERWRITE TABLE $d SELECT count(1)",
      "*", Seq("key")),
    Some(s"$SrcCte SELECT CAST(count(*) AS INT) AS key FROM src"))

  private def g4sub(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby4_$variant",
    (s, dir) => single(s, dir, qn, variant, "c1 STRING",
      d => s"FROM src INSERT OVERWRITE TABLE $d " +
        "SELECT substr(src.key,1,1) GROUP BY substr(src.key,1,1)",
      "*", Seq("c1")),
    Some(s"""$SrcCte SELECT DISTINCT substr(key,1,1) AS c1 FROM src ORDER BY c1"""))

  private def g5sum(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby5_$variant",
    (s, dir) => single(s, dir, qn, variant, "key INT",
      d => s"FROM src INSERT OVERWRITE TABLE $d SELECT sum(src.key)",
      "*", Seq("key")),
    Some(s"""$SrcCte SELECT CAST(trunc(SUM(CAST(key AS DOUBLE))) AS INT) AS key
        FROM src"""))

  private def g5gb(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby5_$variant",
    (s, dir) => single(s, dir, qn, variant, "key INT, value STRING",
      d => s"""INSERT OVERWRITE TABLE $d
        SELECT src.key, sum(substr(src.value,5)) FROM src GROUP BY src.key""",
      "*", Seq("key")),
    Some(s"""$V SELECT CAST(key AS INT) AS key, CAST(SUM(v) AS VARCHAR) AS value
        FROM v GROUP BY 1 ORDER BY key"""))

  private def g6(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby6_$variant",
    (s, dir) => single(s, dir, qn, variant, "c1 STRING",
      d => s"FROM src INSERT OVERWRITE TABLE $d SELECT DISTINCT substr(src.value,5,1)",
      "*", Seq("c1")),
    Some(s"""$SrcCte SELECT DISTINCT substr(value,5,1) AS c1 FROM src ORDER BY c1"""))

  /** g7/g8: one source scan, two INSERT targets (multi-insert), both dumped. */
  private def multi(s: SparkSession, dir: String, qn: String, variant: String,
      extraConfs: Seq[String], selectBody: String, valueType: String): DataFrame = {
    val sfx = fixtures(s, dir)
    val (d1, d2) = (s"gb_${qn}_a_$sfx", s"gb_${qn}_b_$sfx")
    fresh(s, d1, d2)
    (confs(variant) ++ extraConfs).foreach(c => HiveQl.sql(s, c))
    HiveQl.sql(s, s"CREATE TABLE $d1(key INT, value $valueType) STORED AS TEXTFILE")
    HiveQl.sql(s, s"CREATE TABLE $d2(key INT, value $valueType) STORED AS TEXTFILE")
    HiveQl.sql(s,
      s"""FROM SRC
        INSERT OVERWRITE TABLE $d1 SELECT $selectBody
        INSERT OVERWRITE TABLE $d2 SELECT $selectBody""")
    val a = HiveQl.sql(s, s"SELECT 1 as sec, key, cast(value as string) as value FROM $d1")
      .localCheckpoint(true)
    val b = HiveQl.sql(s, s"SELECT 2 as sec, key, cast(value as string) as value FROM $d2")
      .localCheckpoint(true)
    a.union(b).orderBy("sec", "key")
  }

  private def g7(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby7_$variant",
    (s, dir) => multi(s, dir, qn, variant,
      Seq("SET hive.exec.compress.intermediate=true",
        "SET hive.exec.compress.output=true"),
      "SRC.key, sum(SUBSTR(SRC.value,5)) GROUP BY SRC.key", "STRING"),
    Some(s"""$V, g AS (SELECT CAST(key AS INT) AS key,
          CAST(SUM(v) AS VARCHAR) AS value FROM v GROUP BY 1)
        SELECT sec, key, value FROM (
          SELECT 1 AS sec, * FROM g UNION ALL SELECT 2, * FROM g) t
        ORDER BY sec, key"""))

  private def g8(qn: String, variant: String) = QueryDef(
    s"${qn}_qf_groupby8_$variant",
    (s, dir) => multi(s, dir, qn, variant, Nil,
      "SRC.key, COUNT(DISTINCT SUBSTR(SRC.value,5)) GROUP BY SRC.key", "STRING"),
    Some(s"""$V, g AS (SELECT CAST(key AS INT) AS key,
          CAST(count(DISTINCT v) AS VARCHAR) AS value FROM v GROUP BY 1)
        SELECT sec, key, value FROM (
          SELECT 1 AS sec, * FROM g UNION ALL SELECT 2, * FROM g) t
        ORDER BY sec, key"""))

  val defs: Seq[QueryDef] = Seq(
    g1("q672", "map"), g1("q673", "map_skew"),
    g1("q674", "map_nomap"), g1("q675", "noskew"),
    g2("q676", "map"), g2("q677", "map_skew"), g2("q678", "noskew"),
    g2md("q679", "map"), g2md("q680", "noskew"),
    g3("q681", "map"), g3("q682", "map_skew"), g3("q683", "noskew"),
    g3md("q684", "map"), g3md("q685", "noskew"),
    g4count("q686", "map"), g4count("q687", "map_skew"), g4sub("q688", "noskew"),
    g5sum("q689", "map"), g5sum("q690", "map_skew"), g5gb("q691", "noskew"),
    g6("q692", "map"), g6("q693", "map_skew"), g6("q694", "noskew"),
    g7("q695", "map"), g7("q696", "map_skew"), g7("q697", "noskew"),
    g8("q698", "map"), g8("q699", "map_skew"), g8("q700", "noskew"))
}
