package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES over a manifest table: suffixing the
  * table name exposes the format's own bookkeeping relationally —
  *
  *   - ``SELECT * FROM cat.`t$history` `` — one row per resolvable
  *     generation (generation, tag, committed_at, is_current): the
  *     DESCRIBE HISTORY audit trail;
  *   - ``SELECT * FROM cat.`t$files` `` — one row per committed data
  *     file (name, rows, bytes, per-column bound/null-count summary):
  *     what file skipping and metadata DELETE actually reason over,
  *     queryable when debugging why a file did or didn't prune.
  *
  * Both are driver-computed [[LocalScan]]s: the data IS driver-side
  * metadata (O(files), the same rows every plan already resolves), so
  * shipping it through executors would add cost, not parallelism. */
private[sources] object MetadataTables {
  val HistorySuffix = "$history"
  val FilesSuffix = "$files"

  val historySchema: StructType = StructType(Seq(
    StructField("generation", LongType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("is_current", BooleanType, nullable = false)))

  val filesSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("stats", StringType, nullable = false),
    // Merge-on-read state: rows minus the deletion vector's count, and
    // the sidecar name (null when the file carries no vector) — the
    // debugging view of "why does count(*) differ from t$files.rows".
    StructField("live_rows", LongType, nullable = false),
    StructField("dv", StringType, nullable = true),
    // Consolidation metrics (round 12): how many rows the vector
    // deletes and the sidecar's on-disk bytes — what "is it time to
    // CALL system.compact and materialize this debt" reads, per file
    // (dv_rows/rows is the vector density; dv_bytes the sidecar I/O
    // every scan of this file re-pays).
    StructField("dv_rows", LongType, nullable = false),
    StructField("dv_bytes", LongType, nullable = false),
    // Commit sequence (the generation that committed the file) —
    // what equality-delete applicability is decided against.
    StructField("seq", LongType, nullable = false),
    // Round-13 layout facts: compression codec ("" = plain), declared
    // sort order (comma list, "" = unsorted), bloom-indexed columns,
    // and sub-file stat-block count (0 = file-level bounds only) —
    // what "will this query prune/skip/sort-free here" reads per file.
    StructField("codec", StringType, nullable = false),
    StructField("sorted", StringType, nullable = false),
    StructField("bloom_cols", StringType, nullable = false),
    StructField("blocks", LongType, nullable = false)))

  def historyRows(dir: String): Array[InternalRow] =
    ManifestSink.history(dir).map { c =>
      new GenericInternalRow(Array[Any](c.generation,
        UTF8String.fromString(c.tag), c.ts * 1000L, c.current))
    }.toArray

  val PartitionsSuffix = "$partitions"

  val TagsSuffix = "$tags"

  val tagsSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("generation", LongType, nullable = false)))

  def tagsRows(dir: String): Array[InternalRow] =
    ManifestSink.readTags(dir).toSeq.sortBy(_._1).map { case (t, g) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), g))
    }.toArray

  val partitionsSchema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("files", LongType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  /** Per-partition-tuple rollup (files/rows/bytes). Tuples come from
    * the entries' RECORDED partition values first (what the
    * partitioned writer stamps — a bucket id is never derivable from
    * column bounds, and truncated string stats defeat any bounds
    * proof); legacy entries without recorded values fall back to the
    * identity min == max stat proof the pruner uses. Files that
    * resolve no tuple either way land under `<unaligned>` — visible,
    * not hidden, since they are exactly the files that defeat
    * partition-level operations. */
  def partitionsRows(dir: String, partCols: Seq[String]): Array[InternalRow] = {
    val specs = PartSpec.parseAll(partCols)
    ManifestSink.committedEntries(dir).groupBy { e =>
      val vals = specs.map { sp =>
        e.partValues.get(sp.name).orElse(sp match {
          case _: IdentityPart => e.stats.find(_.col == sp.col) match {
            case Some(st) if st.min == st.max && !st.hasNan => Some(st.min)
            case _ => None
          }
          case _: BucketPart => None
        })
      }
      if (specs.isEmpty || vals.exists(_.isEmpty)) "<unaligned>"
      else specs.zip(vals.map(_.get)).map { case (sp, v) => s"${sp.name}=$v" }
        .mkString(", ")
    }.toSeq.sortBy(_._1).map { case (part, es) =>
      // LIVE rows (physical minus deletion-vectored): the rollup a
      // partition-level operation actually acts on.
      new GenericInternalRow(Array[Any](UTF8String.fromString(part),
        es.size.toLong, es.map(_.liveRows).sum, es.map(_.bytes).sum))
    }.toArray
  }

  def filesRows(dir: String): Array[InternalRow] =
    ManifestSink.committedEntries(dir).map { e =>
      val stats = (e.stats.map(s =>
        s"${s.col}: [${s.min}, ${s.max}]" +
          (if (s.hasNan) " +NaN" else "")) ++
        e.nullCounts.toSeq.sortBy(_._1).map { case (c, n) =>
          s"nulls.$c: $n"
        }).mkString("; ")
      // Sidecar bytes via one stat (driver-side, only for DV'd files
      // — the same O(files) loop already building these rows).
      val dvBytes = e.dv.map { d =>
        try java.nio.file.Files.size(java.nio.file.Paths.get(dir, d))
        catch { case _: java.io.IOException => 0L }
      }.getOrElse(0L)
      new GenericInternalRow(Array[Any](UTF8String.fromString(e.name),
        e.rows, e.bytes, UTF8String.fromString(stats),
        e.liveRows, e.dv.map(UTF8String.fromString).orNull,
        e.dvRows, dvBytes, e.seq,
        UTF8String.fromString(e.codec),
        UTF8String.fromString(e.sorted.mkString(",")),
        UTF8String.fromString(e.bloomCols.mkString(",")),
        e.blocks.size.toLong))
    }.toArray
}

/** A read-only driver-local table serving precomputed metadata rows. */
private[sources] class MetadataTable(tableName: String,
    metaSchema: StructType, compute: () => Array[InternalRow])
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = metaSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        // Computed at SCAN build (query planning), not table resolution:
        // the rows reflect the table at query time.
        private val data = compute()
        override def rows(): Array[InternalRow] = data
        override def readSchema(): StructType = metaSchema
      }
    }
}
