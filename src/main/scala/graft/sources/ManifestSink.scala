package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path — the reference's object-store sink
  * (`rest_api_json_to_gcs_operator.py:64-85` uploads a staged blob to
  * GCS) re-expressed through Spark's two-phase committer protocol, which
  * is what makes a distributed write ATOMIC on storage that has no
  * rename-into-place transaction of its own:
  *
  *  1. each task's [[DataWriter]] writes its partition to a STAGED file
  *     named by (task, attempt) — speculative/retried attempts can never
  *     collide — and describes it in a [[WriterCommitMessage]];
  *  2. the driver's [[BatchWrite.commit]] publishes, in one step, ONLY
  *     the attempts Spark declared winners: staged files move into place
  *     and a `manifest.json` naming the committed files + row counts is
  *     written last via temp-file + atomic rename — readers resolve the
  *     manifest, so they see the whole job's output or none of it
  *     (the `Ingest.commitSnapshot` idea, V2-native);
  *  3. [[BatchWrite.abort]] deletes the staging directory — a failed job
  *     leaves the target exactly as it was.
  *
  * Payload format is NDJSON (the scale layout the read side prefers).
  * Local-fs here; the protocol is the part that transfers to GCS/S3.
  *
  * Usage: `df.write.format("graft.sources.ManifestSink")
  *   .option("path", dir).mode("append"|"overwrite").save()`
  */
class ManifestSink extends TableProvider {
  // The sink takes whatever schema the written DataFrame has.
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null, "ManifestSink requires a 'path' option")
    new ManifestTable(path, schema)
  }
}

object ManifestSink {
  val ManifestName = "manifest.json"

  /** Committed (file, rows) entries per the manifest — the manifest is
    * self-describing, so a commit composes the next manifest from these
    * instead of re-counting every prior file's lines (which would cost
    * O(total corpus) per commit — per EPOCH on the streaming path). */
  private[sources] def committedEntries(dir: String): Seq[StagedFile] = {
    val m = Paths.get(dir, ManifestName)
    if (!Files.exists(m)) return Seq.empty
    val txt = new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
    // Minimal parse of the {"files":[{"name":...,"rows":...},...]} shape
    // this sink writes (no JSON library on the unmanaged classpath).
    "\\{\"name\":\"([^\"]+)\",\"rows\":(\\d+)\\}".r.findAllMatchIn(txt)
      .map(mt => StagedFile(mt.group(1), mt.group(2).toLong)).toSeq
  }

  /** Committed data files per the manifest — the only files a reader may
    * trust (staged or orphaned files are invisible by construction). */
  def committedFiles(dir: String): Seq[String] =
    committedEntries(dir).map(_.name)

  def committedRowCount(dir: String): Long =
    committedEntries(dir).map(_.rows).sum
}

private[sources] class ManifestTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"manifest_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ManifestWriteBuilder(path, info.schema(), info.queryId(),
      truncate = false)
}

private[sources] class ManifestWriteBuilder(path: String, schema: StructType,
    queryId: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new ManifestWriteBuilder(path, schema, queryId, truncate = true)

  override def buildForBatch(): BatchWrite =
    new ManifestBatchWrite(path, schema, queryId, truncate)

  override def buildForStreaming(): StreamingWrite =
    new ManifestStreamingWrite(path, schema, queryId)
}

/** Streaming (epoch-committed) writes: each micro-batch publishes like a
  * small batch job — task-staged files, driver-side manifest append —
  * with the EPOCH id baked into every file name, so a replayed epoch
  * (failure between sink commit and checkpoint advance) regenerates the
  * SAME names and the manifest composition stays idempotent: re-running
  * epoch k replaces epoch k's files instead of duplicating them. That is
  * the V2-native version of the foreachBatch idempotent-upsert recipe. */
private[sources] class ManifestStreamingWrite(path: String, schema: StructType,
    queryId: String) extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Files.createDirectories(Paths.get(path, s".staging-$queryId"))
    new ManifestStreamingWriterFactory(path, queryId, schema)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val staging = Paths.get(path, s".staging-$queryId")
    val winners = messages.map(_.asInstanceOf[StagedFile])
    winners.foreach { f =>
      Files.move(staging.resolve(f.name), dir.resolve(f.name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    // Manifest composition keyed by EPOCH: a replayed epoch (failure
    // between sink commit and checkpoint advance) retires ALL of its
    // first attempt's entries, not just name collisions — a replay that
    // plans fewer partitions must not leave the first attempt's extra
    // files committed (they would double-count rows). Prior rows come
    // from the manifest itself (no per-epoch re-count).
    val epochPrefix = f"part-e$epochId%05d-"
    val (stale, prior) = ManifestSink.committedEntries(path)
      .partition(_.name.startsWith(epochPrefix))
    val winnerNames = winners.map(_.name).toSet
    stale.filterNot(f => winnerNames.contains(f.name))
      .foreach(f => Files.deleteIfExists(dir.resolve(f.name)))
    val all = prior ++ winners
    val json = all.map(f => s"""{"name":"${f.name}","rows":${f.rows}}""")
      .mkString("{\"files\":[", ",", "]}")
    val tmp = dir.resolve(s".${ManifestSink.ManifestName}.$queryId.$epochId.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(ManifestSink.ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val staging = Paths.get(path, s".staging-$queryId")
    messages.collect { case f: StagedFile =>
      Files.deleteIfExists(staging.resolve(f.name))
    }
  }
}

private[sources] class ManifestStreamingWriterFactory(path: String,
    queryId: String, schema: StructType) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new NdjsonDataWriter(path, queryId, schema, partitionId, taskId,
      Some(epochId))
}

private[sources] final case class StagedFile(name: String, rows: Long)
    extends WriterCommitMessage

private[sources] class ManifestBatchWrite(path: String, schema: StructType,
    queryId: String, truncate: Boolean) extends BatchWrite {
  private def staging: Path = Paths.get(path, s".staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    new ManifestWriterFactory(path, queryId, schema)
  }

  /** Driver-side publish: exactly the winner attempts move into place;
    * the manifest (written LAST, temp + atomic rename) is the read
    * barrier that makes the whole job's output visible at once. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val winners = messages.map(_.asInstanceOf[StagedFile])
    // Prior entries come from the manifest (self-describing — no re-count)
    // and are keyed OUT by winner name: if an append's task file name
    // collides with a prior commit's, the move below replaces the file in
    // place, so the manifest must carry the new entry only, not both.
    val winnerNames = winners.map(_.name).toSet
    val prior =
      if (truncate) Seq.empty
      else ManifestSink.committedEntries(path)
        .filterNot(f => winnerNames.contains(f.name))
    winners.foreach { f =>
      Files.move(staging.resolve(f.name), dir.resolve(f.name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    if (truncate) {
      // Truncate semantics: files of prior commits leave the manifest
      // (and the directory) in the same publish step — except a prior
      // name a winner just replaced in place, which must survive.
      ManifestSink.committedFiles(path)
        .filterNot(winnerNames.contains)
        .foreach(n => Files.deleteIfExists(dir.resolve(n)))
    }
    val all = prior ++ winners
    val json = all.map(f => s"""{"name":"${f.name}","rows":${f.rows}}""")
      .mkString("{\"files\":[", ",", "]}")
    val tmp = dir.resolve(s".${ManifestSink.ManifestName}.$queryId.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(ManifestSink.ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    cleanupStaging()
  }

  /** A failed job leaves the target exactly as it was. */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging()

  private def cleanupStaging(): Unit =
    if (Files.exists(staging)) {
      val ls = Files.list(staging)
      try ls.forEach(p => Files.deleteIfExists(p)) finally ls.close()
      Files.deleteIfExists(staging)
    }
}

private[sources] class ManifestWriterFactory(path: String, queryId: String,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new NdjsonDataWriter(path, queryId, schema, partitionId, taskId)
}

/** Executor-side writer: NDJSON rows into a (partition, task)-unique
  * staged file — attempt uniqueness is what lets speculative duplicates
  * coexist until the driver picks winners. */
private[sources] class NdjsonDataWriter(path: String, queryId: String,
    schema: StructType, partitionId: Int, taskId: Long,
    epochId: Option[Long] = None)
    extends DataWriter[InternalRow] {
  // Batch: (partition, task) uniqueness isolates speculative attempts.
  // Streaming: (epoch, partition) DETERMINISM is what makes an epoch
  // replay regenerate — and therefore replace — its own files.
  private val name = epochId match {
    case Some(e) => f"part-e$e%05d-$partitionId%05d.ndjson"
    case None => f"part-$partitionId%05d-$taskId.ndjson"
  }
  private val file = Paths.get(path, s".staging-$queryId", name)
  private val out = Files.newBufferedWriter(file, StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      val v = record.get(i, f.dataType)
      val rendered = v match {
        case null => "null"
        case s: org.apache.spark.unsafe.types.UTF8String =>
          "\"" + s.toString.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        case other => other.toString
      }
      s""""${f.name}":$rendered"""
    }
    out.write(fields.mkString("{", ",", "}"))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(name, rows)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(file)
  }

  override def close(): Unit = ()
}
