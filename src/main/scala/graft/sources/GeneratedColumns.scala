package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, LogicalPlan, OverwriteByExpression, OverwritePartitionsDynamic, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.MetadataBuilder

/** GENERATED ALWAYS AS columns for manifest tables. Spark's
  * `SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS` capability is
  * DDL-acceptance only — the connector owns computing the values (the
  * Delta model: an analysis rule rewrites the write query). This rule
  * fires on the three INSERT-shaped v2 writes (append, overwrite by
  * expression, dynamic-partition overwrite) whose target table carries
  * generation expressions on its v2 columns (the relation's OUTPUT
  * attributes carry no field metadata — the expressions round-trip
  * `_table.json` → StructField metadata → `Table.columns()`), and
  * projects each generated column to its computed expression:
  *
  *  - an OMITTED column (the analyzer filled a null literal — a
  *    generated column has no default) computes from the row's other
  *    columns, which is the feature; the fill sits one Project below
  *    the aligned output attribute, so detection resolves the
  *    attribute through the query's own projection;
  *  - an EXPLICIT value is refused at analysis time (`GENERATED
  *    ALWAYS`, the Postgres posture) — with one honest boundary: a
  *    provable NULL-LITERAL projection (`INSERT ... SELECT 3, NULL`,
  *    or a DataFrame `lit(null)` column — the DataFrame API's only
  *    way to address a no-default column) is indistinguishable from
  *    the analyzer's own omitted-column fill and COMPUTES, while a
  *    `VALUES (3, NULL)` row materializes into the local relation and
  *    is refused like any other data. A generated column never stores
  *    null either way;
  *  - row-level operations (UPDATE / MERGE rewrites) are NOT touched:
  *    they re-write stored rows, and stored generated values remain
  *    exactly what the insert computed. Updating a SOURCE column does
  *    not recompute dependents — documented, spec-pinned.
  *
  * The computed projection is marked in its alias metadata; the marker
  * is scanned SUBTREE-WIDE because the output resolver may stack its
  * own compatibility projection on top of ours, and re-applying would
  * mistake the computed value for an explicit assignment. */
case class GraftGeneratedColumns(session: SparkSession)
    extends Rule[LogicalPlan] {

  private val AppliedKey = "graft.generated.applied"

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case w: V2WriteCommand if insertShaped(w) && w.query.resolved &&
          w.table.isInstanceOf[DataSourceV2Relation] &&
          genSqls(w.table.asInstanceOf[DataSourceV2Relation]).nonEmpty &&
          w.query.output.length == w.table.output.length &&
          !applied(w.query) =>
        w.withNewQuery(rewrite(w))
    }

  private def insertShaped(w: V2WriteCommand): Boolean = w match {
    case _: AppendData | _: OverwriteByExpression |
        _: OverwritePartitionsDynamic => true
    case _ => false
  }

  /** Generation expressions by column name, off the table's v2
    * columns. */
  private def genSqls(rel: DataSourceV2Relation): Map[String, String] =
    rel.table.columns().iterator
      .flatMap(c => Option(c.generationExpression()).map(c.name() -> _))
      .toMap

  private def applied(query: LogicalPlan): Boolean =
    query.collectFirst {
      case p: Project if p.projectList.exists {
            case a: Alias => a.metadata.contains(AppliedKey)
            case _ => false
          } => ()
    }.isDefined

  /** The analyzer fills an omitted generated column (no default) with
    * a null literal under the write's aligned output — possibly
    * SEVERAL Projects down (`INSERT ... SELECT 3, NULL` stacks the
    * output resolver's cast projection over the query's own). Chase
    * the attribute through alias/cast/Project layers to its core:
    * a null LITERAL is an omitted fill (or an explicit null-literal
    * projection — same storable outcome, the generated value);
    * anything else is explicit data and errors loudly rather than
    * being silently overwritten. A `VALUES (…, NULL)` row
    * materializes into a LocalRelation, so its core is an attribute,
    * not a literal — refused, as pinned. */
  private def omittedFill(query: LogicalPlan, out: Attribute): Boolean = {
    @annotation.tailrec
    def core(plan: LogicalPlan, e: Expression): Expression = e match {
      case a: Alias => core(plan, a.child)
      case c: Cast => core(plan, c.child) // cast of the fill is still null
      case attr: Attribute => plan match {
        case p: Project =>
          p.projectList.find(_.exprId == attr.exprId) match {
            case Some(al: Alias) => core(p.child, al.child)
            case Some(_) => core(p.child, attr) // pass-through column
            case None => attr
          }
        case _ => attr
      }
      case other => other
    }
    core(query, out) match {
      case l: Literal => l.value == null
      case _ => false
    }
  }

  private def rewrite(w: V2WriteCommand): LogicalPlan = {
    val resolver = session.sessionState.conf.resolver
    val byName = genSqls(w.table.asInstanceOf[DataSourceV2Relation])
    val query = w.query
    val projections: Seq[NamedExpression] =
      w.table.output.zip(query.output).map { case (target, incoming) =>
        val gen = byName.keys.find(resolver(_, target.name))
        if (gen.isEmpty) incoming
        else {
          val genSql = byName(gen.get)
          if (!omittedFill(query, incoming))
            throw new UnsupportedOperationException(
              s"column '${target.name}' is GENERATED ALWAYS AS " +
                s"($genSql) and cannot be assigned — omit it from the " +
                "insert column list")
          val parsed = session.sessionState.sqlParser.parseExpression(genSql)
          val bound = parsed.transformUp {
            case u: UnresolvedAttribute if u.nameParts.length == 1 =>
              query.output.find(a => resolver(a.name, u.nameParts.head))
                .getOrElse(throw new UnsupportedOperationException(
                  s"generation expression of '${target.name}' references " +
                    s"unknown column '${u.nameParts.head}'"))
          }
          val castTo =
            if (bound.resolved && bound.dataType == target.dataType) bound
            else Cast(bound, target.dataType)
          Alias(castTo, target.name)(explicitMetadata = Some(
            new MetadataBuilder().putBoolean(AppliedKey, true).build()))
        }
      }
    Project(projections, query)
  }
}
