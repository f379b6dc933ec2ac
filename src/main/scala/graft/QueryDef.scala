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
}
