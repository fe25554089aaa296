package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.sources.In
import java.util.OptionalLong
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 mapping of the reference's paginated-REST staging step
  * (`dags/operators/rest_api_json_to_gcs_operator.py:7-85`) re-expressed
  * the way a 100 TB engine must: the reference fetches the WHOLE payload
  * on the scheduler (fine for jsonplaceholder's 500 comments, fatal for a
  * paginated API with 10⁹ records), while this source plans ONE
  * `InputPartition` per page range so executors fetch their own pages in
  * parallel and the driver never holds a byte of payload.
  *
  * The transport is a deterministic in-process synthesizer (the sandbox
  * has no egress; `Ingest.fetchJson` keeps the real-HTTP analog) — every
  * record is a pure function of its global offset, which is exactly what
  * makes the source ORACLE-REPLAYABLE: DuckDB regenerates the identical
  * table from `range(pages·pageSize)` (spec `a10_dsv2_paged_source`).
  *
  * Implements `SupportsPushDownRequiredColumns`: a projection reaches the
  * reader, so `SELECT category` synthesizes/ships one column, not four —
  * the DSv2 contract that replaces a REST source's "fetch everything,
  * prune later" (plan-pinned in `IngestSpec`).
  *
  * Usage: `spark.read.format("graft.sources.PagedApiSource")
  *   .option("pages", 40).option("pageSize", 250).load()`
  */
class PagedApiSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedApiSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // getTable receives the raw option map with the caller's key case
    // ("pageSize"); normalize like inferSchema's CaseInsensitiveStringMap.
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedApiTable(opts.getInt("pages", 10), opts.getInt("pagesize", 100))
  }
}

object PagedApiSource {
  /** The "API response" schema. */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("score", LongType, nullable = false),
    StructField("category", StringType, nullable = false)))

  private val categories = Array("news", "blog", "forum", "wiki")

  /** Record as a pure function of the global offset — the determinism
    * contract the DuckDB oracle replays. */
  def userIdAt(i: Long): Long = i % 97
  def scoreAt(i: Long): Long = (i * 31 + 7) % 1000
  def categoryAt(i: Long): String = categories((i % 4).toInt)
}

private[sources] class PagedApiTable(pages: Int, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"paged_api(pages=$pages, pageSize=$pageSize)"
  override def schema(): StructType = PagedApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedApiScanBuilder(pages, pageSize,
      Option(options.get("maxpagespertrigger")).map(_.toInt))
}

/** Page-cursor offset: "pages consumed so far" — exactly the cursor a
  * paginated API hands back. */
private[sources] final case class PageOffset(page: Int) extends Offset {
  override def json(): String = page.toString
}

/** Incremental ("tail the API") read: each micro-batch covers the pages
  * between the committed cursor and the current end of the feed. With
  * `Trigger.AvailableNow` this drains all pages then stops — giving the
  * streaming twin of the batch scan, which is what the st25 oracle
  * compares against. Restart-safe by construction: the offset is the
  * page cursor, so a restarted query resumes fetching at the first
  * uncommitted page. */
private[sources] class PagedApiMicroBatchStream(pages: Int, pageSize: Int,
    required: StructType, maxPagesPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  // AvailableNow contract: pin the drain target when the query starts,
  // so a feed that grows mid-run doesn't keep the trigger alive.
  @volatile private var drainTo: Int = pages

  override def prepareForTriggerAvailableNow(): Unit = { drainTo = pages }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Rate-limited cursor advance: at most `maxPagesPerTrigger` pages per
    * micro-batch (an API quota made declarative); unbounded otherwise. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[PageOffset].page
    PageOffset(maxPagesPerTrigger.fold(drainTo)(m => math.min(drainTo, s + m)))
  }

  override def initialOffset(): Offset = PageOffset(0)
  override def latestOffset(): Offset = PageOffset(drainTo)
  override def deserializeOffset(json: String): Offset = PageOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    (s until e).map(p => PagedApiPartition(p, pageSize): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedApiReaderFactory(required)
}

private[sources] class PagedApiScanBuilder(pages: Int, pageSize: Int,
    maxPagesPerTrigger: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = PagedApiSource.schema
  private var idLo: Long = 0L
  private var idHi: Long = Long.MaxValue
  private var idSet: Option[Set[Long]] = None
  private var pushed: Array[Filter] = Array.empty

  /** The id literals of an `In` / OR-of-equals predicate, if that is
    * what `f` is — these arrive from IN lists and from Catalyst's
    * constraint propagation across equi-joins with literal-filtered
    * dims, and prune to exactly the pages holding some listed id. */
  private def idLiterals(f: Filter): Option[Seq[Long]] = f match {
    case In("id", vs) =>
      val ls = vs.collect { case v: java.lang.Long => v.longValue() }
      if (ls.length == vs.length) Some(ls.toSeq) else None
    case EqualTo("id", v: Long) => Some(Seq(v))
    case org.apache.spark.sql.sources.Or(a, b) =>
      for (x <- idLiterals(a); y <- idLiterals(b)) yield x ++ y
    case _ => None
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Empty projection (e.g. count(*)) still needs row CARDINALITY:
    // keep a zero-column schema as-is; the reader emits empty rows.
    required = requiredSchema

  /** `id` range predicates prune whole PAGES at plan time — the source
    * never plans (never "fetches") a partition the query cannot need,
    * the paginated-API analog of parquet partition pruning. Every
    * filter is also RETURNED as residual, so Spark re-applies it
    * post-scan: pruning is a pure optimization, never a correctness
    * dependency. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach { f =>
      f match {
        case GreaterThan("id", v: Long) => idLo = math.max(idLo, v + 1)
        case GreaterThanOrEqual("id", v: Long) => idLo = math.max(idLo, v)
        case LessThan("id", v: Long) => idHi = math.min(idHi, v - 1)
        case LessThanOrEqual("id", v: Long) => idHi = math.min(idHi, v)
        case EqualTo("id", v: Long) =>
          idLo = math.max(idLo, v); idHi = math.min(idHi, v)
        case _ => () // non-id / non-range filters: residual only
      }
      idLiterals(f).foreach { ls =>
        val s = ls.toSet
        idSet = Some(idSet.fold(s)(_ intersect s))
      }
    }
    pushed = filters.filter {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case f => idLiterals(f).isDefined
    }
    filters // all residual — Spark re-applies row-level
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val setPages = idSet.map(_.map(v => (v / pageSize).toInt))
    new PagedApiScan(pages, pageSize, required, idLo, idHi,
      maxPagesPerTrigger, setPages)
  }
}

private[sources] class PagedApiScan(pages: Int, pageSize: Int,
    required: StructType, idLo: Long, idHi: Long,
    maxPagesPerTrigger: Option[Int] = None,
    staticPages: Option[Set[Int]] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required

  // Runtime (join-time) page pruning — the DSv2 analog of dynamic
  // partition pruning: declaring `id` filterable lets Spark push the
  // OTHER join side's key values into this scan at execution time; the
  // page set shrinks to pages containing some joined id. Static
  // (planning-time) bounds and runtime values compose.
  @volatile private var runtimePages: Option[Set[Int]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", values) =>
      runtimePages = Some(values.collect { case v: java.lang.Long =>
        (v.longValue() / pageSize).toInt }.toSet)
    case _ => ()
  }

  /** Exact statistics AFTER page pruning and column pruning — what lets
    * Catalyst pick a broadcast join over a small slice of this source
    * with no hint (plan-pinned in IngestSpec). A REST source knows its
    * page count up front; reporting it is free and buys the optimizer
    * its cardinality. */
  override def estimateStatistics(): Statistics = {
    val survivingPages = (0 until pages).count { p =>
      val first = p.toLong * pageSize
      first + pageSize - 1 >= idLo && first <= idHi &&
        staticPages.forall(_.contains(p))
    }
    val rows = survivingPages.toLong * pageSize
    // Per-row width from the PRUNED schema: longs 8 B, category ~6 B.
    val width = required.fields.map(f =>
      if (f.dataType == StringType) 6L else 8L).sum.max(1L)
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(rows * width)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
    }
  }
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PagedApiMicroBatchStream(pages, pageSize, required, maxPagesPerTrigger)

  override def planInputPartitions(): Array[InputPartition] =
    // One partition per page: the unit a paginated API parallelizes by.
    // (A production source would coalesce tiny pages into ranges; one
    // page per task keeps the planning contract visible in tests.)
    // Pages wholly outside the pushed id range — or outside the
    // runtime-filtered page set — are never planned.
    (0 until pages)
      .filter { p =>
        val first = p.toLong * pageSize
        val last = first + pageSize - 1
        last >= idLo && first <= idHi && staticPages.forall(_.contains(p)) &&
          runtimePages.forall(_.contains(p))
      }
      .map(p => PagedApiPartition(p, pageSize): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedApiReaderFactory(required)
}

private[sources] final case class PagedApiPartition(page: Int, pageSize: Int)
    extends InputPartition

private[sources] class PagedApiReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedApiPartition]
    new PagedApiReader(p.page, p.pageSize, required)
  }
}

/** Executor-side "page fetch": synthesizes only the projected columns of
  * its page — the per-partition parallel fetch the reference's
  * driver-side operator cannot do. */
private[sources] class PagedApiReader(page: Int, pageSize: Int,
    required: StructType) extends PartitionReader[InternalRow] {
  private val start = page.toLong * pageSize
  private var i = -1L

  // Column generators resolved ONCE per partition from the pruned
  // schema, not per row.
  private val gens: Array[Long => Any] = required.fields.map(_.name match {
    case "id" => (i: Long) => i
    case "user_id" => (i: Long) => PagedApiSource.userIdAt(i)
    case "score" => (i: Long) => PagedApiSource.scoreAt(i)
    case "category" =>
      (i: Long) => UTF8String.fromString(PagedApiSource.categoryAt(i))
    case other => throw new IllegalArgumentException(
      s"paged_api has no column '$other'")
  })

  override def next(): Boolean = { i += 1; i < pageSize }

  override def get(): InternalRow = {
    val g = start + i
    InternalRow.fromSeq(gens.toSeq.map(_(g)))
  }

  override def close(): Unit = ()
}
