package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

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
    graft.HiveQl.rewrite(graft.HiveQl.substituteVars(session, sqlText))

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(dialect(sqlText))
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
