package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, RenameTable, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.types.{BooleanType, StringType}

/** SQL VIEW support for [[GraftCatalog]] — the wiring OSS Spark 4.1
  * does not ship: the V2 [[ViewCatalog]] API exists in Catalyst, but
  * `ResolveSessionCatalog` still rejects `CREATE VIEW` against any
  * non-session catalog ("does not support views"). Iceberg solves this
  * with its own session extensions; we do the same, two injections:
  *
  *  1. a PARSER wrapper that intercepts the parsed `CreateView` /
  *     `DropView` / `ShowViews` / `ALTER VIEW ... RENAME` plans whose
  *     identifier targets a graft catalog and rewrites them to local
  *     commands calling the [[ViewCatalog]] API — before the analyzer
  *     ever reaches the rejecting rule;
  *  2. a RESOLUTION rule that substitutes `UnresolvedRelation`s naming
  *     a stored view with its re-parsed definition (late-bound, like
  *     every SQL view: the view sees the base tables' CURRENT state —
  *     time travel, DVs, equality deletes all compose for free).
  *
  * View definitions should reference base tables by qualified name
  * (`cat.ns.table`) — the definition re-resolves in the reader's
  * session, which is also exactly what makes a view over a graft
  * table see that table's current generation. */
object GraftViews {

  private[sources] def isGraftCatalog(spark: SparkSession, name: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$name")
      .contains(classOf[GraftCatalog].getName)

  private def viewCatalog(spark: SparkSession, name: String): ViewCatalog =
    spark.sessionState.catalogManager.catalog(name).asInstanceOf[ViewCatalog]

  private def identOf(parts: Seq[String]): Identifier =
    Identifier.of(parts.drop(1).dropRight(1).toArray, parts.last)

  /** Parser-level rewrite: view DDL whose identifier's head names a
    * graft catalog becomes a local command. Everything else passes
    * through untouched. */
  private[sources] def rewrite(spark: SparkSession,
      plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
        props, originalText, query, allowExisting, replace, _)
        if parts.length >= 2 && isGraftCatalog(spark, parts.head) =>
      CreateGraftViewCommand(parts, cols.map(_._1), comment,
        props, originalText.getOrElse(cv.query.toString), query,
        allowExisting, replace)
    case DropView(UnresolvedIdentifier(parts, _), ifExists)
        if parts.length >= 2 && isGraftCatalog(spark, parts.head) =>
      DropGraftViewCommand(parts, ifExists)
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, _)
        if parts.nonEmpty && isGraftCatalog(spark, parts.head) =>
      ShowGraftViewsCommand(parts, pattern)
    case RenameTable(
        org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView(
          parts, _, _), newName, true)
        if parts.length >= 2 && isGraftCatalog(spark, parts.head) =>
      RenameGraftViewCommand(parts, newName)
    case other => other
  }

  /** Read-path substitution: an unresolved relation that names a
    * stored graft view becomes its re-parsed definition. Runs to a
    * fixed point, so views over views resolve; tables always win (the
    * substitution only fires when a view marker exists and no table
    * does — the catalog keeps the two namespaces disjoint). */
  case class GraftViewSubstitution(spark: SparkSession)
      extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsUp {
        case u: UnresolvedRelation if substitutable(u).isDefined =>
          val (ident, v) = substitutable(u).get
          val body = spark.sessionState.sqlParser.parsePlan(v.query)
          val aliased =
            if (v.columnAliases != null && v.columnAliases.nonEmpty &&
                !v.columnAliases.sameElements(v.queryColumnNames))
              UnresolvedSubqueryColumnAliases(v.columnAliases.toSeq, body)
            else body
          SubqueryAlias(ident.name(), aliased)
      }

    private def substitutable(u: UnresolvedRelation)
        : Option[(Identifier, org.apache.spark.sql.connector.catalog.View)] = {
      val parts = u.multipartIdentifier
      if (parts.length < 2 || !isGraftCatalog(spark, parts.head)) return None
      val cat = viewCatalog(spark, parts.head)
      val ident = identOf(parts)
      if (!cat.viewExists(ident)) None
      else Some(ident -> cat.loadView(ident))
    }
  }
}

/** `CREATE [OR REPLACE] VIEW cat.v [(aliases)] AS <body>`: analyzes
  * the body ONCE for the stored schema, then persists the definition
  * through the catalog's [[ViewCatalog]]. */
private[sources] final case class CreateGraftViewCommand(parts: Seq[String],
    aliases: Seq[String], comment: Option[String],
    props: Map[String, String], bodyText: String, query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import GraftViews._
    val cat = spark.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(parts.drop(1).dropRight(1).toArray, parts.last)
    val exists = cat.viewExists(ident)
    if (exists && allowExisting) return Nil
    if (exists && replace) cat.dropView(ident)
    val qe = spark.sessionState.executePlan(query)
    qe.assertAnalyzed()
    val outNames = qe.analyzed.schema.fieldNames
    require(aliases.isEmpty || aliases.length == outNames.length,
      s"view column list names ${aliases.length} columns, query produces " +
        s"${outNames.length}")
    val schema =
      if (aliases.isEmpty) qe.analyzed.schema
      else org.apache.spark.sql.types.StructType(
        qe.analyzed.schema.fields.zip(aliases).map { case (f, a) =>
          f.copy(name = a) })
    val allProps = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => allProps.put(k, v) }
    comment.foreach(c => allProps.put(ViewCatalog.PROP_COMMENT, c))
    cat.createView(new ViewInfo(ident, bodyText,
      spark.sessionState.catalogManager.currentCatalog.name(),
      spark.sessionState.catalogManager.currentNamespace,
      schema, outNames,
      (if (aliases.isEmpty) Array.empty[String] else aliases.toArray),
      Array.empty[String], allProps))
    Nil
  }
}

private[sources] final case class DropGraftViewCommand(parts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(parts.drop(1).dropRight(1).toArray, parts.last)
    val existed = cat.dropView(ident)
    if (!existed && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        ident)
    Nil
  }
}

private[sources] final case class ShowGraftViewsCommand(parts: Seq[String],
    pattern: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[ViewCatalog]
    val ns = parts.tail
    cat.listViews(ns: _*).toSeq
      .filter(i => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(i.name()), p).nonEmpty))
      .sortBy(_.name())
      .map(i => Row(ns.mkString("."), i.name(), false))
  }
}

private[sources] final case class RenameGraftViewCommand(parts: Seq[String],
    newName: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[ViewCatalog]
    def identOf(ps: Seq[String]) =
      Identifier.of(ps.drop(1).dropRight(1).toArray, ps.last)
    // `ALTER VIEW a.b RENAME TO c` spells the new name relative to the
    // same catalog when unqualified.
    val to =
      if (newName.length >= 2 && newName.head == parts.head) identOf(newName)
      else Identifier.of(parts.drop(1).dropRight(1).toArray, newName.last)
    cat.renameView(identOf(parts), to)
    Nil
  }
}

/** `CREATE MATERIALIZED VIEW cat.v AS <agg query>` — the SQL front
  * door to [[MaterializedViews]], intercepted at the TEXT level
  * (Spark's grammar has no MATERIALIZED VIEW statement to rewrite).
  * The body must be one of the self-maintainable aggregate shapes the
  * IVM machinery folds exactly:
  *
  *   - `SELECT g, avg(v) FROM cat.base GROUP BY g` → the avg kind
  *     (partials `(g, sum_p, cnt_p)`, view adds `sum_v/cnt_v/avg_v`);
  *   - `SELECT g, min(v), max(v) FROM cat.base GROUP BY g` → the
  *     min/max kind (append-only monoids).
  *
  * The partial-log table lands at `<view>__mv` (the convention DROP
  * MATERIALIZED VIEW uses to find it); refresh through
  * `CALL cat.system.refresh_mv('<view>__mv')` or the Scala API —
  * exactly-once either way. Anything outside the recognized shapes
  * fails loudly with the supported grammar (no silent fallback to a
  * plain view — a "materialized" view that recomputes would lie). */
private[sources] final case class CreateGraftMaterializedViewCommand(
    parts: Seq[String], bodyText: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val cat = parts.head
    val viewName = parts.drop(1).mkString(".")
    val mvTable = viewName + "__mv"
    def unsupported(why: String): Nothing =
      throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW supports exactly " +
          "'SELECT g, avg(v) FROM cat.ns.base GROUP BY g' or " +
          "'SELECT g, min(v), max(v) FROM cat.ns.base GROUP BY g' " +
          s"(self-maintainable aggregate shapes) — $why")
    def attrName(e: Any): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        Some(a.nameParts.head)
      case al: Alias => attrName(al.child)
      case ua: UnresolvedAlias => attrName(ua.child)
      case _ => None
    }
    def fn(e: Any): Option[(String, String)] = e match {
      case al: Alias => fn(al.child)
      case ua: UnresolvedAlias => fn(ua.child)
      case f: UnresolvedFunction if f.nameParts.length == 1 &&
          f.arguments.length == 1 =>
        attrName(f.arguments.head)
          .map(col => f.nameParts.head.toLowerCase -> col)
      case _ => None
    }
    spark.sessionState.sqlParser.parsePlan(bodyText) match {
      case agg: Aggregate if agg.groupingExpressions.length == 1 =>
        val aggs = agg.aggregateExpressions
        val groupCol = attrName(agg.groupingExpressions.head).getOrElse(
          unsupported("the GROUP BY key must be a plain column"))
        val baseTable = agg.child match {
          case r: UnresolvedRelation
              if r.multipartIdentifier.length >= 2 &&
                r.multipartIdentifier.head == cat =>
            r.multipartIdentifier.tail.mkString(".")
          case _ => unsupported(
            s"the FROM clause must name a table in catalog '$cat' " +
              "by qualified name")
        }
        aggs.filterNot(e => attrName(e).contains(groupCol)).map(fn) match {
          case Seq(Some(("avg", v))) =>
            MaterializedViews.createAvg(spark, cat, viewName, baseTable,
              mvTable, groupCol, v)
          case Seq(Some(("min", v1)), Some(("max", v2))) if v1 == v2 =>
            MaterializedViews.createMinMax(spark, cat, viewName, baseTable,
              mvTable, groupCol, v1)
          case other => unsupported(
            s"unrecognized aggregate list: ${other.mkString(", ")}")
        }
      case _ => unsupported("the body is not a single GROUP BY aggregate")
    }
    Nil
  }
}

/** `DROP MATERIALIZED VIEW cat.v [IF EXISTS]`: drops the finalizing
  * view AND its `<view>__mv` partial-log table (the CMV convention). */
private[sources] final case class DropGraftMaterializedViewCommand(
    parts: Seq[String], ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(parts.drop(1).dropRight(1).toArray, parts.last)
    val existed = cat.dropView(ident)
    if (!existed && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        ident)
    spark.sql(s"DROP TABLE IF EXISTS " +
      s"${parts.head}.${parts.drop(1).mkString(".")}__mv")
    Nil
  }
}

/** The delegating parser that applies [[GraftViews.rewrite]] to every
  * parsed statement. */
private[sources] final class GraftViewParser(spark: SparkSession,
    delegate: ParserInterface) extends ParserInterface {
  // MATERIALIZED VIEW DDL never reaches the delegate: Spark's grammar
  // has no such statement, so it is recognized from the SQL TEXT here.
  // The identifier grammar is deliberately narrow (dotted bare/backtick
  // parts); everything else about the body is parsed by Spark itself.
  private val CreateMv =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s+AS\s+(.+)""".r
  private val DropMv =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*""".r

  private def identParts(txt: String): Seq[String] =
    delegate.parseMultipartIdentifier(txt)

  // Some(cmd) when the text is MATERIALIZED VIEW DDL; checked in BOTH
  // parse entry points (Spark 4's `spark.sql` routes through
  // parsePlanWithParameters, not parsePlan).
  private def materializedViewDdl(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case CreateMv(ident, body) =>
        val parts = identParts(ident)
        require(parts.length >= 2 &&
          GraftViews.isGraftCatalog(spark, parts.head),
          s"CREATE MATERIALIZED VIEW needs a graft-catalog-qualified " +
            s"name, got '$ident'")
        Some(CreateGraftMaterializedViewCommand(parts, body))
      case DropMv(ifExists, ident) =>
        val parts = identParts(ident)
        require(parts.length >= 2 &&
          GraftViews.isGraftCatalog(spark, parts.head),
          s"DROP MATERIALIZED VIEW needs a graft-catalog-qualified " +
            s"name, got '$ident'")
        Some(DropGraftMaterializedViewCommand(parts, ifExists != null))
      case _ => None
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    materializedViewDdl(sqlText).getOrElse(
      GraftViews.rewrite(spark, delegate.parsePlan(sqlText)))
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    materializedViewDdl(sqlText).getOrElse(
      GraftViews.rewrite(spark, delegate.parsePlanWithParameters(sqlText, ctx)))
  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String) =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}
