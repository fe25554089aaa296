package graft.sources

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, WriteBuilder}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** GROUP-BASED (copy-on-write) row-level operation over a manifest
  * table — what makes `DELETE` with a partially-overlapping predicate,
  * `UPDATE`, and `MERGE INTO` work through plain `spark.sql` (the
  * Iceberg copy-on-write shape; the reference's DELETE-then-INSERT
  * load loop, `dags/users_etl.py:206-214`, upgraded to the form
  * lakehouse users actually write).
  *
  * A "group" is a committed data FILE. Spark's rewrite rules
  * (`RewriteDeleteFromTable` / `RewriteUpdateTable` /
  * `RewriteMergeIntoTable`) plan: scan the candidate groups in full,
  * compute the post-operation rows, write them back; the connector's
  * job is to (a) serve complete groups — our scan prunes whole files
  * against manifest stats but never filters rows, exactly the
  * "complete groups" contract — and (b) atomically swap the scanned
  * files for the rewritten output in ONE manifest commit.
  *
  * Scale shape: static pushdown prunes files whose bounds exclude a
  * literal condition; for conditions that cannot be pushed (a MERGE
  * keyed on source-table values), Spark's runtime group filtering
  * evaluates the condition in a `_file`-projecting subquery over a
  * REGULAR scan and narrows this operation's scan to exactly the
  * files holding matching rows ([[ManifestScan.filter]]) — so a
  * 10-row upsert into a 10k-file table rewrites a handful of files,
  * never the table. A concurrent commit that retires a scanned file
  * first fails the swap loudly (optimistic concurrency — see
  * [[ManifestBatchWrite.commit]]'s replaceFiles validation). */
private[sources] class GraftRowLevelOperation(path: String,
    tableSchema: StructType, partCols: Seq[String],
    props: Map[String, String], cmd: Command) extends RowLevelOperation {

  /** The groups (file names) the configured scan actually planned —
    * recorded at plan time, AFTER static pruning and runtime group
    * filtering ([[ManifestScan.planInputPartitions]]), consumed by the
    * write at commit time as the retire set. None until the scan
    * plans: a write that somehow commits first fails loudly rather
    * than guessing (replacing too few files would resurrect rows). */
  @volatile private var planned: Option[Set[String]] = None
  private[sources] def recordScanned(files: Set[String]): Unit =
    planned = Some(files)

  override def command(): Command = cmd
  override def description(): String = s"graft copy-on-write $cmd on $path"

  /** `_file` rides the row-level read relation so the runtime group
    * filter has an attribute to join scan-side groups against. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(ManifestSink.FileColumn))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(path, tableSchema, partCols = partCols,
      rowLevel = Some(this))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val bad = info.schema().fields
      .filterNot(f => NdjsonCodec.supported(f.dataType))
    require(bad.isEmpty,
      s"row-level $cmd writes flat primitive/temporal/binary columns only; " +
        s"unsupported: ${bad.map(f => s"${f.name}: ${f.dataType}").mkString(", ")}")
    new ManifestWriteBuilder(path, info.schema(), info.queryId(),
      truncate = false,
      retain = props.get("retainhistory").exists(_.toBoolean),
      partCols = partCols,
      replaceFiles = () => planned.getOrElse(throw new IllegalStateException(
        s"row-level $cmd write on $path committed before its scan planned " +
          "the affected file set — cannot determine which files to retire")))
  }
}
