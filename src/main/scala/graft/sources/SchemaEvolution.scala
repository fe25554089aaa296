package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

/** Column RENAME and type WIDENING for manifest tables — the schema
  * evolution a 100 TB corpus needs, done WITHOUT rewriting a byte of
  * data.
  *
  * The format's payloads are name-keyed NDJSON, so a naive rename
  * would silently null out every pre-rename file's column (the
  * Iceberg field-id problem). Instead of field ids, the table keeps a
  * RENAME LOG in its `_table.json` properties: an ordered list of
  * `(old, new)` steps. Everything name-keyed then resolves through it
  * at READ time:
  *
  *  - Manifest entries (stat bounds, null counts, partition tuples,
  *    sort stamps, bloom-column lists) are NORMALIZED to current names
  *    the moment they are parsed ([[normalizeEntry]]), so every proof
  *    in the planner — bounds pruning, metadata-only DELETE,
  *    aggregate pushdown, SPJ tuples, sorted-scan claims — works on
  *    current names unchanged, including against pre-rename manifests
  *    reached by time travel or change-feed windows.
  *  - Data files keep their vintage payload keys (that is the whole
  *    point — no rewrite); the reader looks each current column up
  *    under its ALIASES ([[aliases]]): the current name first, then
  *    every historic name that resolves to it. A file written under
  *    one vintage carries exactly one of the candidate keys, so the
  *    lookup is unambiguous; compaction CONCATENATES raw lines, so a
  *    merged file may mix vintages — per-line candidate lookup handles
  *    that too.
  *  - Equality-delete key files and bloom sidecars are immutable
  *    per-commit artifacts keyed by their own vintage; their lookups
  *    resolve through the same alias sets.
  *
  * Names used by any rename step are RETIRED: re-adding one as a new
  * column would let old files' payload values leak into it, so
  * `AddColumn`/rename targets must be fresh.
  *
  * TYPE WIDENING (int-family upcasts, float→double) needs no name
  * machinery at all: payloads and stat bounds are TEXT tokens re-parsed
  * by the CURRENT read schema's converter, so `"3"` written through an
  * INT column reads back as a LONG after the widen, and the bloom
  * index already hashes all integrals width-normalized (8-byte LE).
  * The one width-SENSITIVE consumer is bucket hashing (Murmur3 over
  * the Catalyst value) — widening a bucket-source column is refused.
  */
private[sources] object SchemaEvolution {

  /** Table property holding the rename log: a flat JSON string array
    * of alternating old/new names, in rename order —
    * `["old1","new1","old2","new2"]`. */
  val PropKey = "renamelog"

  def parseLog(props: Map[String, String]): Seq[(String, String)] =
    props.get(PropKey) match {
      case None => Nil
      case Some(txt) =>
        GraftCatalog.parseStringArray(txt).grouped(2).collect {
          case Seq(o, n) => (o, n)
        }.toSeq
    }

  def renderLog(log: Seq[(String, String)]): String =
    log.flatMap { case (o, n) => Seq(o, n) }
      .map(s => "\"" + NdjsonCodec.escape(s) + "\"")
      .mkString("[", ",", "]")

  /** Every name any rename step ever used — retired from reuse (a new
    * column under a retired name would inherit old files' payloads). */
  def logNames(log: Seq[(String, String)]): Set[String] =
    log.iterator.flatMap { case (o, n) => Iterator(o, n) }.toSet

  /** vintage → current name, for names whose final identity differs
    * (chains collapse: a→b, b→c yields a→c and b→c). */
  def currentNames(log: Seq[(String, String)]): Map[String, String] = {
    var m = Map.empty[String, String]
    log.foreach { case (o, n) =>
      m = m.map { case (k, v) => k -> (if (v == o) n else v) } + (o -> n)
    }
    m.filter { case (k, v) => k != v }
  }

  /** current name → historic payload-key candidates (itself excluded),
    * deterministic order. At most one candidate appears in any given
    * data line (retired names are never re-added), so order never
    * changes a result. */
  def aliases(cur: Map[String, String]): Map[String, Seq[String]] =
    cur.toSeq.groupBy(_._2).map { case (c, kvs) => c -> kvs.map(_._1).sorted }

  // Dir-level cache of the parsed rename mapping, guarded by the
  // metadata file's mtime — planning resolves entries many times per
  // query and ALTERs are rare; a stale hit is impossible (every ALTER
  // rewrites `_table.json` via atomic move, bumping the mtime).
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Map[String, String])]()

  /** vintage → current of the table at `dir`; empty for path-only
    * tables (no `_table.json`) and tables that never renamed. */
  def currentNamesAt(dir: String): Map[String, String] = {
    val p = Paths.get(dir, "_table.json")
    try {
      if (!Files.exists(p)) return Map.empty
      val mtime = Files.getLastModifiedTime(p).toMillis
      val hit = cache.get(dir)
      if (hit != null && hit._1 == mtime) return hit._2
      val props = GraftCatalog.readMeta(Paths.get(dir))._3
      val out = currentNames(parseLog(props))
      cache.put(dir, (mtime, out))
      out
    } catch { case _: Exception => Map.empty }
  }

  def aliasesAt(dir: String): Map[String, Seq[String]] =
    aliases(currentNamesAt(dir))

  /** Lossless upcasts only: every value AND every recorded stat token
    * re-parses exactly under the wider type (payloads are text — the
    * token, not a binary width, is the source of truth). */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Rename the source column inside a persisted partition-spec string
    * (`"lang"`, `"bucket(8,doc_id)"`), preserving the transform. */
  def renameSpec(spec: String, cur: Map[String, String]): String =
    PartSpec.parse(spec) match {
      case IdentityPart(c) => cur.getOrElse(c, spec)
      case BucketPart(n, c) if cur.contains(c) => BucketPart(n, cur(c)).name
      case _ => spec
    }

  /** Rewrite an entry's name-keyed metadata to CURRENT names — the
    * plan-time normalization that makes every stats/partition/sort/
    * bloom proof rename-transparent. Identity-fast when the table
    * never renamed. */
  def normalizeEntry(e: StagedFile, cur: Map[String, String]): StagedFile =
    if (cur.isEmpty) e
    else e.copy(
      stats = e.stats.map(s => cur.get(s.col).fold(s)(n => s.copy(col = n))),
      nullCounts = e.nullCounts.map { case (k, v) => (cur.getOrElse(k, k), v) },
      partValues = e.partValues.map { case (k, v) => (renameSpec(k, cur), v) },
      sorted = e.sorted.map(c => cur.getOrElse(c, c)),
      bloomCols = e.bloomCols.map(c => cur.getOrElse(c, c)),
      blocks = e.blocks.map(b => b.copy(stats = b.stats.map(s =>
        cur.get(s.col).fold(s)(n => s.copy(col = n))))),
      kmv = e.kmv.map { case (k, v) => (cur.getOrElse(k, k), v) })

  def normalizeEqDelete(d: ManifestSink.EqDelete,
      cur: Map[String, String]): ManifestSink.EqDelete =
    if (cur.isEmpty) d else d.copy(cols = d.cols.map(c => cur.getOrElse(c, c)))
}
