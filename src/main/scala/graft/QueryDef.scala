package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark query plus (when SQL-expressible)
  * an equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Column names MUST match between `fn`'s result and the oracle: the driver
  * sorts columns by name before hashing values. Every oracle-checked query is
  * made deterministic (explicit total ORDER BY, rounded floating aggregates).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
  protected def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // queries must run on ANY session, incl. one the driver built without
    // graft's extensions — registration is idempotent
    Sessions.ensureRegistered(s)
    Tables.load(s, dir, name)
  }

  /** Fixture truncation that the scale rehearsal LIFTS
    * (`graft.rehearsal.unbounded`): oracles need small outputs, but a
    * rehearsal that keeps `c < lim` bounds measures a CONSTANT query —
    * grown replicas all land above the bound (§6.10's round-6 lesson).
    * Every query-level doc_id/vec_id truncation must go through here.
    */
  protected def fixtureBound(df: DataFrame, c: String, lim: Long): DataFrame =
    if (df.sparkSession.conf.getOption("graft.rehearsal.unbounded")
        .contains("true")) df
    else df.filter(org.apache.spark.sql.functions.col(c) < lim)
}
