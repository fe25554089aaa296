package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BindReferences, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.types.StructType

/** Executor-side row guards for the STREAMING epoch sink (round-17).
  *
  * Spark's analyzer plants enforced-CHECK validation and this engine's
  * resolution rule computes GENERATED ALWAYS columns on BATCH write
  * plans — but the streaming `toTable` path resolves through
  * WriteToMicroBatchDataSource, where neither fires: a violating
  * micro-batch would publish, and a generated column would store the
  * incoming null. These guards close both holes at the WRITER, the
  * one place every epoch's rows must pass:
  *
  *  - each enforced CHECK predicate is compiled ONCE, driver-side, at
  *    stream start (full analyzer resolution, so type coercion matches
  *    the batch path) and evaluated per row — SQL semantics: only a
  *    provable FALSE violates, null passes;
  *  - each generated column computes from the row when the incoming
  *    value is null (the only value a legal writer can send — explicit
  *    values refuse loudly, the batch posture), the row patched before
  *    the payload writer sees it.
  *
  * Constraints added MID-stream are the epoch commit's drift check
  * ([[ManifestSink.requireNoConstraintDrift]]): the guard set is
  * stream-start state, and a later epoch refuses rather than publish
  * rows validated against less. */
private[sources] final case class RowGuards(
    // (constraint name, predicate SQL, bound predicate): the SQL rides
    // along for the error message.
    checks: Seq[(String, String, Expression)],
    // (column index in the write schema, generation SQL, bound expr).
    gens: Seq[(Int, String, Expression)]) extends Serializable {
  def isEmpty: Boolean = checks.isEmpty && gens.isEmpty
}

private[sources] object RowGuards {
  val Empty: RowGuards = RowGuards(Nil, Nil)

  /** Compile the guards for a write into `dir` with `writeSchema` —
    * DRIVER-side (needs the session's analyzer; the bound expressions
    * serialize to executors). Tables without catalog meta have neither
    * constraints nor generated columns: Empty. */
  def compile(dir: String, writeSchema: StructType): RowGuards = {
    val metaP = java.nio.file.Paths.get(dir, "_table.json")
    if (!java.nio.file.Files.exists(metaP)) return Empty
    val session = org.apache.spark.sql.SparkSession.active
    val (tableSchema, _, props) =
      GraftCatalog.readMeta(java.nio.file.Paths.get(dir))
    val attrs: Seq[Attribute] =
      org.apache.spark.sql.catalyst.types.DataTypeUtils
        .toAttributes(writeSchema).toSeq

    /** Resolve + coerce `sql` against the write schema through the real
      * analyzer (a LocalRelation stand-in), then bind to row ordinals. */
    def bind(sql: String, what: String): Expression = {
      val parsed = session.sessionState.sqlParser.parseExpression(sql)
      val plan = Project(Seq(Alias(parsed, "g")()), LocalRelation(attrs))
      val analyzed = session.sessionState.analyzer.execute(plan)
      val resolvedExpr = analyzed match {
        case Project(Seq(a: Alias), _) => a.child
        case other => throw new IllegalStateException(
          s"$what '$sql' did not analyze to a single projection: $other")
      }
      require(resolvedExpr.deterministic,
        s"$what '$sql' must be deterministic")
      BindReferences.bindReference(resolvedExpr, attrs)
    }

    val checks = GraftCatalog.enforcedCheckKeys(props).toSeq.sorted.flatMap {
      k =>
        GraftCatalog.parseConstraint(props(k)).collect {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            (c.name(), c.predicateSql(),
              bind(c.predicateSql(), s"CHECK constraint '${c.name()}'"))
        }
    }
    val gens = tableSchema.fields.toSeq.flatMap { f =>
      if (!f.metadata.contains(GraftCatalog.GenerationExpressionKey)) None
      else {
        val sql = f.metadata.getString(GraftCatalog.GenerationExpressionKey)
        val idx = writeSchema.fieldNames.indexOf(f.name)
        if (idx < 0) None // column pruned from the write: nothing to fill
        else {
          val bound = bind(sql, s"generated column '${f.name}'")
          val cast =
            if (bound.dataType == f.dataType) bound
            else org.apache.spark.sql.catalyst.expressions.Cast(
              bound, f.dataType)
          Some((idx, sql, cast))
        }
      }
    }
    RowGuards(checks, gens)
  }

  /** Apply the guards to one row: compute generated columns first (a
    * CHECK may reference them), then validate. Returns the row to
    * write — patched when a generated column computed, the input row
    * otherwise. */
  def apply(guards: RowGuards, schema: StructType,
      row: InternalRow): InternalRow = {
    var out = row
    if (guards.gens.nonEmpty) {
      var patched: Array[Any] = null
      guards.gens.foreach { case (idx, sql, expr) =>
        if (!row.isNullAt(idx))
          throw new UnsupportedOperationException(
            s"column '${schema.fields(idx).name}' is GENERATED ALWAYS AS " +
              s"($sql) and cannot be assigned by a streaming write — " +
              "send null (the omitted-column fill); the sink computes it")
        if (patched == null) {
          patched = new Array[Any](schema.fields.length)
          var i = 0
          while (i < schema.fields.length) {
            patched(i) =
              if (row.isNullAt(i)) null
              else row.get(i, schema.fields(i).dataType)
            i += 1
          }
        }
        patched(idx) = expr.eval(row)
      }
      if (patched != null) out = new GenericInternalRow(patched)
    }
    guards.checks.foreach { case (name, sql, pred) =>
      // SQL CHECK semantics: only a provable FALSE violates.
      if (pred.eval(out) == false)
        throw new RuntimeException(
          s"[CHECK_CONSTRAINT_VIOLATION] streaming row violates CHECK " +
            s"constraint '$name' ($sql) — the epoch aborts and publishes " +
            "nothing")
    }
    out
  }
}
