package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** A HiveQL statement form (LOAD/EXPORT/IMPORT/TEMPORARY FUNCTION/
  * multi-insert) planned as an eagerly-run command, so the statement
  * surface works from ANY parser entry point (Thrift, raw spark.sql) —
  * the reference executes these as driver-side Tasks (MoveTask,
  * FunctionTask), which is exactly Spark's RunnableCommand shape.
  */
case class HiveStatement(statement: String, exec: SparkSession => Unit)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = { exec(spark); Nil }
}

/** A HiveQL statement form that RETURNS ROWS with a statically-known
  * schema (SHOW INDEXES / SHOW LOCKS / SHOW GRANT — the reference's
  * DDLTask writes these to a result file the fetch task reads;
  * a RunnableCommand with declared output is the Spark shape of that).
  */
case class HiveShowStatement(statement: String, rowSchema: StructType,
    rows: SparkSession => Seq[Row]) extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(rowSchema)
  override def run(spark: SparkSession): Seq[Row] = rows(spark)
}

/** Session-parser injection of the HiveQL dialect (SparkSessionExtensions
  * `injectParser`): every STATEMENT entering the session — `spark.sql`,
  * Thrift/JDBC clients, view re-parsing — passes through variable
  * substitution and the HiveQl text rewrites (MAPJOIN/STREAMTABLE hints,
  * TABLESAMPLE ... ON, UNIQUEJOIN) before the delegate parser sees it.
  * This is the reference's layering: CliDriver and HiveServer both funnel
  * through Driver.compile (Driver.java), so dialect handling lives below
  * every entry point, not in one client.
  *
  * Both passes are IDEMPOTENT (a rewritten statement contains none of the
  * trigger tokens; substitution reaches a fixed point), so text routed via
  * [[graft.HiveQl.sql]] — which substitutes/rewrites for its own statement
  * dispatch — parses identically when it re-enters through `spark.sql`.
  * Fragment hooks (expressions, identifiers, schemas) delegate untouched:
  * the dialect is a statement-level surface.
  */
class HiveDialectParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def dialect(sqlText: String): String =
    graft.HiveQl.rewrite(graft.HiveQl.resolveScriptPaths(session,
      graft.HiveQl.resolveDefaultSampleCols(session,
        graft.HiveQl.substituteVars(session, sqlText))))

  override def parsePlan(sqlText: String): LogicalPlan = {
    val text = graft.HiveQl.substituteVars(session, sqlText)
    graft.HiveQl.statementRows(text) match {
      case Some((schema, rows)) =>
        return HiveShowStatement(
          text.linesIterator.mkString(" ").take(120), schema, rows)
      case None =>
    }
    graft.HiveQl.statementExec(text) match {
      case Some(exec) => HiveStatement(text.linesIterator.mkString(" ").take(120), exec)
      case None => delegate.parsePlan(graft.HiveQl.rewrite(
        graft.HiveQl.resolveScriptPaths(session,
          graft.HiveQl.resolveDefaultSampleCols(session, text))))
    }
  }
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(dialect(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
