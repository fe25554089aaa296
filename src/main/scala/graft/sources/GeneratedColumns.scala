package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, OverwriteByExpression, OverwritePartitionsDynamic, Project, UpdateAction, UpdateTable, V2WriteCommand}
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
  *  - row-level operations (round-17): UPDATE and MERGE refuse
  *    explicit assignment of a generated column, RECOMPUTE it when an
  *    assignment touches one of its source columns (the Delta
  *    posture — stored values never go stale), and compute a MERGE
  *    INSERT's omitted columns like any insert. Two interception
  *    points cover every shape: the resolved-but-unaligned
  *    UpdateTable/MergeIntoTable when the fixpoint exposes one, and
  *    the rewritten ReplaceData/WriteDelta value rows as the
  *    deterministic backstop ([[fixRowLevelQuery]]).
  *
  * The computed projection is marked in its alias metadata; the marker
  * is scanned SUBTREE-WIDE because the output resolver may stack its
  * own compatibility projection on top of ours, and re-applying would
  * mistake the computed value for an explicit assignment. */
case class GraftGeneratedColumns(session: SparkSession)
    extends Rule[LogicalPlan] {

  private val AppliedKey = "graft.generated.applied"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.resolveOperators {
      case w: V2WriteCommand if insertShaped(w) && w.query.resolved &&
          w.table.isInstanceOf[DataSourceV2Relation] && {
            val rel = w.table.asInstanceOf[DataSourceV2Relation]
            genSqls(rel).nonEmpty || identityCol(rel).isDefined
          } &&
          w.query.output.length == w.table.output.length &&
          !applied(w.query) =>
        rewrite(w) match {
          case Some(q) => w.withNewQuery(q)
          case None => w // identity-only pass: nothing to compute
        }
      // Row-level commands (round-17, closing the MERGE/UPDATE bypass),
      // first chance: the window where the command is RESOLVED but not
      // yet ALIGNED — Spark's ResolveRowLevelCommandAssignments and the
      // ReplaceData/WriteDelta rewrite run earlier in the same
      // Resolution batch, so this window only exists when resolution
      // completes AFTER their position in an iteration (it usually
      // does for UPDATE and default-filling merges; a fast-resolving
      // merge skips straight past — the post-rewrite case below is the
      // deterministic backstop). The rewrite here edits the USER's
      // assignment lists and alignment carries the edits into either
      // physical shape:
      //  - explicit assignment to a GENERATED ALWAYS column refuses;
      //  - an UPDATE (or MERGE UPDATE) that assigns a SOURCE column of
      //    a generated column appends a recomputation assignment — the
      //    dependent tracks post-update values (the Delta posture);
      //  - a MERGE INSERT that omits the generated column appends the
      //    computation, deps bound to the same action's values.
      case u: UpdateTable if u.resolved && !u.aligned &&
          relationOf(u.table).exists(r =>
            genSqls(r).nonEmpty || identityCol(r).isDefined) =>
        val rel = relationOf(u.table).get
        val next = rewriteAssignments(u.assignments, rel, update = true)
        if (next eq u.assignments) u else u.copy(assignments = next)
      case m: MergeIntoTable if m.resolved && !m.aligned &&
          relationOf(m.targetTable).exists(r =>
            genSqls(r).nonEmpty || identityCol(r).isDefined) =>
        val rel = relationOf(m.targetTable).get
        def fix(a: MergeAction): MergeAction = a match {
          case ua: UpdateAction =>
            val next = rewriteAssignments(ua.assignments, rel, update = true)
            if (next eq ua.assignments) ua else ua.copy(assignments = next)
          case ia: InsertAction =>
            val next = rewriteAssignments(ia.assignments, rel, update = false)
            if (next eq ia.assignments) ia else ia.copy(assignments = next)
          case other => other // DELETE carries no values
        }
        val ma = m.matchedActions.map(fix)
        val nma = m.notMatchedActions.map(fix)
        val nmbsa = m.notMatchedBySourceActions.map(fix)
        if (ma == m.matchedActions && nma == m.notMatchedActions &&
            nmbsa == m.notMatchedBySourceActions) m
        else m.copy(matchedActions = ma, notMatchedActions = nma,
          notMatchedBySourceActions = nmbsa)
      // Second chance, DETERMINISTIC: the rewritten row-level plans
      // themselves. A merge that resolved fast enough to be aligned
      // and rewritten inside one fixpoint iteration never shows this
      // rule its MergeIntoTable — but its ReplaceData/WriteDelta
      // always lands here. The value surgery ([[fixRowLevelQuery]])
      // applies the same semantics to the physical value rows: a
      // carried-over generated column whose deps were touched
      // recomputes, an insert's null fill computes, anything else that
      // isn't the recomputation refuses. Values already fixed by the
      // first-chance path compare equal and pass through.
      case w: V2WriteCommand if rowLevelShaped(w) && w.query.resolved &&
          relationOf(w.table).exists(r =>
            genSqls(r).nonEmpty || identityCol(r).isDefined) =>
        val rel = relationOf(w.table).get
        val next = fixRowLevelQuery(w.query, rel)
        if (next eq w.query) w else w.withNewQuery(next)
    }
  }

  private def rowLevelShaped(w: V2WriteCommand): Boolean = w match {
    case _: org.apache.spark.sql.catalyst.plans.logical.ReplaceData |
        _: org.apache.spark.sql.catalyst.plans.logical.WriteDelta => true
    case _ => false
  }

  private def relationOf(table: LogicalPlan): Option[DataSourceV2Relation] =
    EliminateSubqueryAliases(table) match {
      case r: DataSourceV2Relation => Some(r)
      case _ => None
    }

  /** The relation's IDENTITY column, if declared ([[GraftIdentity]]).
    * Treated by this rule as a generated column with NO expression:
    * explicit assignment refuses in every write shape, the omitted
    * null fill passes through untouched (the WRITER mints a
    * placeholder and the COMMIT allocates the value), and nothing
    * recomputes. */
  private def identityCol(rel: DataSourceV2Relation): Option[String] =
    scala.util.Try(GraftIdentity.of(underlying(rel).schema()))
      .toOption.flatten.map(_.col)

  /** The REAL connector table behind a relation: a row-level write's
    * relation wraps it in Spark's private[sql] RowLevelOperationTable,
    * whose schema() path throws (it implements neither deprecated
    * schema() nor columns() cleanly) — unwrap reflectively. */
  private def underlying(rel: DataSourceV2Relation)
      : org.apache.spark.sql.connector.catalog.Table = rel.table match {
    case t if t.getClass.getName.endsWith("RowLevelOperationTable") =>
      t.getClass.getMethod("table").invoke(t)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.Table]
    case t => t
  }

  /** Rewrite one RAW (pre-alignment) assignment list — an UPDATE's SET
    * entries or a MERGE action's assignments, exactly what the user
    * wrote, attribute-resolved — for the relation's generated columns:
    *
    *  - an EXPLICIT assignment to a generated column refuses (`GENERATED
    *    ALWAYS`), unless its value is semantically the recomputation —
    *    which is this rule's own earlier fixpoint pass;
    *  - UPDATE shape: if any SOURCE column of g's expression is
    *    assigned, APPEND `g = E` with each dep substituted by its
    *    post-update value (its assignment if present, else the
    *    pre-update attribute) — expressions compose over pre-update
    *    attributes, so the result is exact. Untouched deps append
    *    nothing: unmodified rows keep their stored values;
    *  - INSERT shape (MERGE not-matched): g omitted APPENDS `g = E`
    *    with deps bound to the action's assigned values; a dep the
    *    action itself omits reads as its declared DEFAULT, or null —
    *    the same value alignment will give the stored column.
    *
    * Alignment then folds the appended assignments into the aligned
    * per-column list, and the ReplaceData (copy-on-write) or WriteDelta
    * (deletion-vector) rewrite carries them — one fix for both physical
    * shapes. Returns the SAME list reference when unchanged. */
  private def rewriteAssignments(assignments: Seq[Assignment],
      rel: DataSourceV2Relation, update: Boolean): Seq[Assignment] = {
    val resolver = session.sessionState.conf.resolver
    val gens = genSqls(rel)
    // IDENTITY: any assignment refuses — values exist only through
    // commit-time allocation; an omitted MERGE-INSERT identity needs
    // nothing appended (the null fill is exactly what the writer
    // mints from).
    identityCol(rel).foreach { ic =>
      assignments.foreach { a =>
        a.key match {
          case at: Attribute if resolver(at.name, ic) =>
            throw new UnsupportedOperationException(
              s"column '$ic' is GENERATED ALWAYS AS IDENTITY and cannot " +
                "be assigned by UPDATE or MERGE")
          case _ => ()
        }
      }
    }
    def attrOf(a: Assignment): Option[Attribute] = a.key match {
      case at: Attribute => Some(at)
      case _ => None
    }
    def assignedTo(col: String): Option[Assignment] =
      assignments.find(a => attrOf(a).exists(at => resolver(at.name, col)))
    def relAttr(col: String): Attribute =
      rel.output.find(at => resolver(at.name, col)).getOrElse(
        throw new UnsupportedOperationException(
          s"generation expression references unknown column '$col'"))
    def depsOf(genSql: String): Seq[String] =
      session.sessionState.sqlParser.parseExpression(genSql).collect {
        case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
          ua.nameParts.head
      }
    /** Post-write value of `col` under this action. */
    def valueOf(col: String): Expression =
      assignedTo(col).map(_.value).getOrElse {
        if (update) relAttr(col) // unassigned column keeps its value
        else {
          // Omitted on insert: alignment will fill the declared
          // DEFAULT (or null) — bind the dep to the same value so the
          // stored generated value matches the stored dep.
          val at = relAttr(col)
          val fld = scala.util.Try(underlying(rel).schema()).toOption
            .toSeq.flatMap(_.fields)
            .find(f => resolver(f.name, col))
          fld.flatMap { f =>
            val rd = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            if (f.metadata.contains(rd.CURRENT_DEFAULT_COLUMN_METADATA_KEY))
              Some(session.sessionState.sqlParser.parseExpression(
                f.metadata.getString(rd.CURRENT_DEFAULT_COLUMN_METADATA_KEY)))
            else None
          }.getOrElse(Literal(null, at.dataType))
        }
      }
    def expectedFor(target: Attribute, genSql: String): Expression = {
      val parsed = session.sessionState.sqlParser.parseExpression(genSql)
      val bound = parsed.transformUp {
        case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
          valueOf(ua.nameParts.head)
      }
      if (bound.resolved && bound.dataType == target.dataType) bound
      else Cast(bound, target.dataType)
    }
    // "Is this assignment the rule's own earlier pass?" — compared
    // MODULO CASTS: the analyzer's type coercion re-wraps the appended
    // expression between fixpoint iterations (int literals widen, the
    // outer cast folds), so a structural compare of cast-stripped
    // canonical forms is the stable identity. A user assignment that
    // happens to BE the recomputation also passes — same stored value,
    // harmless.
    def sameModuloCasts(a: Expression, b: Expression): Boolean = {
      def strip(e: Expression): Expression = e.transformUp {
        case c: Cast => c.child
      }
      strip(a).semanticEquals(strip(b))
    }
    var out = assignments
    var changed = false
    gens.foreach { case (g, genSql) =>
      val target = relAttr(g)
      val expected = expectedFor(target, genSql)
      assignedTo(g) match {
        case Some(a) =>
          if (!sameModuloCasts(a.value, expected)) // ours from earlier pass?
            throw new UnsupportedOperationException(
              s"column '${target.name}' is GENERATED ALWAYS AS " +
                s"($genSql) and cannot be assigned — " +
                (if (update) "it recomputes when its source columns are " +
                  "updated"
                 else "omit it from the insert column list"))
        case None =>
          val needed =
            if (!update) true // inserted rows always store the computation
            else depsOf(genSql).exists(d => assignedTo(d).isDefined)
          if (needed) {
            out = out :+ Assignment(target, expected)
            changed = true
          }
      }
    }
    if (changed) out else assignments
  }

  /** Deterministic backstop over the REWRITTEN row-level plans.
    * Locates the value rows — a MergeRows' instruction outputs, or the
    * bottom-most Project above the scan (the CoW update stacks the
    * operation projection on top of the value projection; the value
    * one is where `if(cond) new else old` lives) — and applies
    * [[fixValueRow]] to each. Unknown query shapes pass through
    * untouched (today's rewrites produce exactly these two). */
  private def fixRowLevelQuery(query: LogicalPlan,
      rel: DataSourceV2Relation): LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical.MergeRows
    val resolver = session.sessionState.conf.resolver
    val gens = genSqls(rel)
    // Exit fast when every generated column is untouchable (no data
    // columns in the shape — e.g. a merge-on-read DELETE projects only
    // (_file, _pos)).
    query match {
      case mr: MergeRows =>
        val idxOf: String => Option[Int] = c =>
          mr.output.zipWithIndex.find(p => resolver(p._1.name, c)).map(_._2)
        var changed = false
        def fixInstr(i: MergeRows.Instruction): MergeRows.Instruction =
          i match {
            case k: MergeRows.Keep => k.context match {
              case MergeRows.Copy | MergeRows.Delete => k // no new values
              case _ =>
                fixValueRow(k.output.toIndexedSeq, idxOf, rel, gens) match {
                  case Some(next) => changed = true; k.copy(output = next)
                  case None => k
                }
            }
            case sp: MergeRows.Split =>
              // A split emits two rows (merge-on-read update: delete +
              // reinsert). The delete half's data columns are carried
              // attributes, which fixValueRow leaves alone unless deps
              // were touched there too — and recomputing an unread
              // value is harmless; the insert half gets the real fix.
              val a = fixValueRow(sp.output.toIndexedSeq, idxOf, rel, gens)
              val b = fixValueRow(sp.otherOutput.toIndexedSeq, idxOf, rel,
                gens)
              if (a.isEmpty && b.isEmpty) sp
              else {
                changed = true
                sp.copy(output = a.getOrElse(sp.output),
                  otherOutput = b.getOrElse(sp.otherOutput))
              }
            case other => other
          }
        val m = fixInstr(_)
        val mi = mr.matchedInstructions.map(m)
        val nmi = mr.notMatchedInstructions.map(m)
        val nmbsi = mr.notMatchedBySourceInstructions.map(m)
        if (!changed) query
        else mr.copy(matchedInstructions = mi, notMatchedInstructions = nmi,
          notMatchedBySourceInstructions = nmbsi)
      case p: Project =>
        // Bottom-most Project on the spine holds the values.
        p.child match {
          case inner: Project =>
            fixProjectList(inner, rel, gens) match {
              case Some(next) => p.copy(child = next)
              case None => query
            }
          case _ =>
            fixProjectList(p, rel, gens).getOrElse(query)
        }
      case _ => query
    }
  }

  /** Fix one Project's named values in place, PRESERVING every alias
    * exprId — projections above reference them. */
  private def fixProjectList(p: Project, rel: DataSourceV2Relation,
      gens: Map[String, String]): Option[Project] = {
    val resolver = session.sessionState.conf.resolver
    val idxOf: String => Option[Int] = c =>
      p.projectList.zipWithIndex.find(e => resolver(e._1.name, c)).map(_._2)
    fixValueRow(p.projectList.map {
      case a: Alias => a.child
      case other => other
    }.toIndexedSeq, idxOf, rel, gens).map { vals =>
      val next = p.projectList.zip(vals).map {
        case (a: Alias, v) if !(v eq a.child) =>
          Alias(v, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = a.explicitMetadata,
            nonInheritableMetadataKeys = a.nonInheritableMetadataKeys)
        case (orig: Alias, _) => orig
        case (orig, v) if !(v eq orig) =>
          // A bare attribute replaced by a computation needs a name.
          Alias(v, orig.name)()
        case (orig, _) => orig
      }
      p.copy(projectList = next)
    }
  }

  /** The value surgery for ONE physical value row (a MergeRows
    * instruction output or a Project's stripped values), positions
    * resolved by name through `idxOf`:
    *
    *  - CARRY-OVER of a generated column (the expression normalizes —
    *    trivial `if(c,x,x)` collapsed, casts stripped — to the target
    *    relation's own attribute): recompute IFF some dep's value does
    *    NOT normalize to its own attribute (the row changes them);
    *    the recomputation binds deps to their FULL value expressions,
    *    so an `if(cond) new else old` dep yields `E(new)` on updated
    *    rows and `E(old)` = the stored value on carried rows (the
    *    GENERATED ALWAYS invariant every insert path enforces);
    *  - NULL literal (a merge-insert's omitted fill): compute;
    *  - anything else must BE the recomputation (modulo casts — the
    *    first-chance rule or an earlier pass of this one), else
    *    refuse.
    *
    * Returns Some(newRow) when changed, None when untouched. A
    * generated column or dep absent from the row (shape carries no
    * data columns) stands down. */
  private def fixValueRow(vals: IndexedSeq[Expression],
      idxOf: String => Option[Int], rel: DataSourceV2Relation,
      gens: Map[String, String]): Option[IndexedSeq[Expression]] = {
    val resolver = session.sessionState.conf.resolver
    def normalize(e: Expression): Expression = e.transformUp {
      case a: Alias => a.child // alignment re-aliases nested values
      case org.apache.spark.sql.catalyst.expressions.If(_, t, f)
          if t.semanticEquals(f) => t
      case c: Cast => c.child
    }
    def targetAttr(c: String): Option[Attribute] =
      rel.output.find(a => resolver(a.name, c))
    def carries(c: String, e: Expression): Boolean =
      (normalize(e), targetAttr(c)) match {
        case (at: Attribute, Some(t)) => at.exprId == t.exprId
        case _ => false
      }
    def depsOf(genSql: String): Seq[String] =
      session.sessionState.sqlParser.parseExpression(genSql).collect {
        case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
          ua.nameParts.head
      }
    var changed = false
    val buf = vals.toArray
    // IDENTITY backstop: carried attributes and null fills (the
    // writer's minting input) pass; anything else was an explicit
    // assignment that slipped past the first-chance path — refuse.
    identityCol(rel).foreach { ic =>
      for (pg <- idxOf(ic); gAttr <- targetAttr(ic)) {
        val nx = normalize(vals(pg))
        val ok = carries(ic, vals(pg)) ||
          (nx match {
            case l: Literal => l.value == null
            case org.apache.spark.sql.catalyst.expressions.If(_, t, f)
                if carries(ic, f) =>
              normalize(t) match {
                case l: Literal => l.value == null
                case at: Attribute => at.exprId == gAttr.exprId
                case _ => false
              }
            case _ => false
          })
        if (!ok)
          throw new UnsupportedOperationException(
            s"column '${gAttr.name}' is GENERATED ALWAYS AS IDENTITY " +
              "and cannot be assigned by UPDATE or MERGE")
      }
    }
    gens.foreach { case (g, genSql) =>
      for (pg <- idxOf(g); gAttr <- targetAttr(g)) {
        val deps = depsOf(genSql)
        val depPos = deps.flatMap(d => idxOf(d).map(d -> _)).toMap
        if (depPos.size == deps.distinct.size) { // all deps present
          val parsed = session.sessionState.sqlParser.parseExpression(genSql)
          val bound = parsed.transformUp {
            case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
              vals(depPos(deps.find(resolver(_, ua.nameParts.head))
                .getOrElse(ua.nameParts.head)))
          }
          val expected =
            if (bound.resolved && bound.dataType == gAttr.dataType) bound
            else Cast(bound, gAttr.dataType)
          // The conditional-update form `if(cond) v else <carry>`: the
          // first-chance rule (or a user's WHERE) produces values that
          // recompute only on matched rows. Accept v when it is the
          // recomputation over the deps' own matched-row values.
          def trueBranch(c: String, e: Expression): Expression =
            normalize(e) match {
              case org.apache.spark.sql.catalyst.expressions.If(_, t, f)
                  if carries(c, f) => t
              case other => other
            }
          lazy val expectedTrue = {
            val b = parsed.transformUp {
              case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
                val d = deps.find(resolver(_, ua.nameParts.head))
                  .getOrElse(ua.nameParts.head)
                trueBranch(d, vals(depPos(d)))
            }
            normalize(b)
          }
          val x = vals(pg)
          if (carries(g, x)) {
            if (deps.exists(d => !carries(d, vals(depPos(d))))) {
              buf(pg) = expected; changed = true
            }
          } else if (normalize(x) match {
            case l: Literal => l.value == null
            case _ => false
          }) {
            buf(pg) = expected; changed = true
          } else {
            val ok = normalize(x).semanticEquals(normalize(expected)) ||
              (normalize(x) match {
                case org.apache.spark.sql.catalyst.expressions.If(_, t, f)
                    if carries(g, f) =>
                  normalize(t).semanticEquals(expectedTrue)
                case _ => false
              })
            if (!ok) {
              throw new UnsupportedOperationException(
                s"column '${gAttr.name}' is GENERATED ALWAYS AS ($genSql) " +
                  "and cannot be assigned by UPDATE or MERGE — it " +
                  "recomputes when its source columns change")
            }
          }
        }
      }
    }
    if (changed) Some(scala.collection.immutable.ArraySeq.unsafeWrapArray(buf))
    else None
  }

  private def insertShaped(w: V2WriteCommand): Boolean = w match {
    case _: AppendData | _: OverwriteByExpression |
        _: OverwritePartitionsDynamic => true
    case _ => false
  }

  /** Generation expressions by column name, off the table's v2
    * columns. */
  private def genSqls(rel: DataSourceV2Relation): Map[String, String] =
    underlying(rel).columns().iterator
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

  private def rewrite(w: V2WriteCommand): Option[LogicalPlan] = {
    val resolver = session.sessionState.conf.resolver
    val rel = w.table.asInstanceOf[DataSourceV2Relation]
    val byName = genSqls(rel)
    val ident = identityCol(rel)
    val query = w.query
    var computed = false
    val projections: Seq[NamedExpression] =
      w.table.output.zip(query.output).map { case (target, incoming) =>
        val gen = byName.keys.find(resolver(_, target.name))
        if (ident.exists(resolver(_, target.name))) {
          // IDENTITY: the omitted null fill passes through UNTOUCHED —
          // the writer mints a placeholder and the commit allocates
          // the value. Anything else is an explicit assignment.
          if (!omittedFill(query, incoming))
            throw new UnsupportedOperationException(
              s"column '${target.name}' is GENERATED ALWAYS AS IDENTITY " +
                "and cannot be assigned — omit it from the insert " +
                "column list (values are allocated at commit)")
          incoming
        }
        else if (gen.isEmpty) incoming
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
          computed = true
          Alias(castTo, target.name)(explicitMetadata = Some(
            new MetadataBuilder().putBoolean(AppliedKey, true).build()))
        }
      }
    // Wrap only when something was computed: an identity-only table's
    // legal insert changes nothing, and re-wrapping an unchanged
    // projection every fixpoint iteration would never converge.
    if (computed) Some(Project(projections, query)) else None
  }
}
