package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL syntax extension (`injectParser`) for the custom as-of join:
  *
  * {{{
  *   GRAFT ASOF JOIN probes, quotes
  *     ON user_id MATCH ts TO quote_ts VALUES price, venue
  * }}}
  *
  * reads "join each `probes` row to the latest `quotes` row per `user_id`
  * with `quote_ts` ≤ `ts`, appending `price` and `venue`". Table names
  * resolve through the session catalog (temp views included); everything
  * that is not a GRAFT statement delegates verbatim to Spark's parser, so
  * the extension is purely additive.
  *
  * The statement parses to [[UnresolvedAsOfJoin]] — names only, no catalog
  * access at parse time — and an analyzer resolution rule
  * ([[ResolveGraftAsOf]]) lowers it onto the checked [[AsOfJoin]] builder
  * once both relations are resolved, inheriting every API guard (type
  * checks, float-key rejection, null-key filtering) and the operator's
  * whole pipeline (pushdown/pruning rules, broadcast strategy).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseGraftStatement(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    GraftSqlParser.parseGraftStatement(sqlText)
      .getOrElse(delegate.parseQuery(sqlText))

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

object GraftSqlParser {
  // GRAFT ASOF JOIN <left>, <right> ON k1[, k2…] MATCH lts TO rts VALUES v1[, v2…]
  private val AsOfStmt =
    ("""(?is)\s*GRAFT\s+ASOF\s+JOIN\s+([\w.]+)\s*,\s*([\w.]+)""" +
     """\s+ON\s+([\w]+(?:\s*,\s*[\w]+)*)""" +
     """\s+MATCH\s+(\w+)\s+TO\s+(\w+)""" +
     """\s+VALUES\s+([\w]+(?:\s*,\s*[\w]+)*)\s*;?\s*""").r

  def parseGraftStatement(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case AsOfStmt(l, r, keys, lts, rts, vals) =>
        Some(UnresolvedAsOfJoin(
          UnresolvedRelation(l.split('.').toIndexedSeq),
          UnresolvedRelation(r.split('.').toIndexedSeq),
          keys.split(',').map(_.trim).toIndexedSeq, lts, rts,
          vals.split(',').map(_.trim).toIndexedSeq))
      case _ => None
    }
}

/** Parsed-but-unresolved `GRAFT ASOF JOIN`: carries the column NAMES until
  * the analyzer has resolved both relations. Never survives analysis —
  * [[ResolveGraftAsOf]] replaces it, and `resolved = false` guarantees the
  * analyzer fails loudly if the rule is not installed. */
case class UnresolvedAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    keys: Seq[String],
    leftTs: String,
    rightTs: String,
    values: Seq[String])
  extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule (`injectResolutionRule`): once both children resolve,
  * lower [[UnresolvedAsOfJoin]] through the public [[AsOfJoin]] builder so
  * the SQL syntax and the Scala API are one code path. */
case class ResolveGraftAsOf(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedAsOfJoin if u.childrenResolved =>
        AsOfJoin(
          PlanBridge.ofRows(spark, u.left), PlanBridge.ofRows(spark, u.right),
          u.keys, u.leftTs, u.rightTs, u.values)
          .queryExecution.analyzed
    }
}
