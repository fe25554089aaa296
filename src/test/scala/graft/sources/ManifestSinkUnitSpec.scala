package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side committer invariants that the end-to-end IngestSpec write
  * tests cannot reach (Spark's monotonic task ids never produce a batch
  * file-name collision in one JVM, and rows-from-manifest vs rows-from-
  * recount are indistinguishable when the files are intact). Lives in
  * `graft.sources` to exercise the package-private commit path directly —
  * `ManifestBatchWrite.commit` is pure local file work, no session needed. */
class ManifestSinkUnitSpec extends AnyFunSuite {
  private val schema = StructType(Seq(StructField("id", LongType)))

  private def writeManifest(dir: String, entries: (String, Long)*): Unit = {
    val json = entries
      .map { case (n, r) => s"""{"name":"$n","rows":$r}""" }
      .mkString("{\"files\":[", ",", "]}")
    Files.write(Paths.get(dir, ManifestSink.ManifestName),
      json.getBytes(StandardCharsets.UTF_8))
  }

  test("prior rows come from the manifest, not a per-commit file re-count") {
    // The manifest claims 5 rows for a file that does not even exist on
    // disk: a commit composing the next manifest must carry the claimed
    // count forward (self-describing manifest), not open the file.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    writeManifest(dir, "part-old.ndjson" -> 5L)
    assert(ManifestSink.committedRowCount(dir) == 5L)

    val staging = Files.createDirectories(Paths.get(dir, ".staging-q1"))
    Files.write(staging.resolve("part-new.ndjson"),
      "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
    new ManifestBatchWrite(dir, schema, "q1", truncate = false)
      .commit(Array(StagedFile("part-new.ndjson", 1L)))

    assert(ManifestSink.committedFiles(dir).sorted ==
      Seq("part-new.ndjson", "part-old.ndjson"))
    assert(ManifestSink.committedRowCount(dir) == 6L)
  }

  test("append commit replaces a colliding prior manifest entry, never duplicates") {
    // A winner whose file name collides with a prior commit's (possible
    // across applications — batch names carry only partition and task
    // ids) REPLACES the file on disk via the atomic move; the manifest
    // must carry exactly the new entry, not both.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    val name = "part-00000-1.ndjson"
    Files.write(Paths.get(dir, name),
      "{\"id\":9}\n{\"id\":8}\n{\"id\":7}\n".getBytes(StandardCharsets.UTF_8))
    writeManifest(dir, name -> 3L)

    val staging = Files.createDirectories(Paths.get(dir, ".staging-q2"))
    Files.write(staging.resolve(name),
      "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
    new ManifestBatchWrite(dir, schema, "q2", truncate = false)
      .commit(Array(StagedFile(name, 1L)))

    val entries = ManifestSink.committedEntries(dir)
    assert(entries == Seq(StagedFile(name, 1L)),
      s"manifest should hold exactly the replacing entry, got $entries")
    assert(ManifestSink.committedRowCount(dir) == 1L)
  }

  test("epoch replay retires ALL of the epoch's first-attempt files") {
    // Failure between sink commit and checkpoint advance replays the
    // epoch; if the replay plans FEWER partitions than the first attempt
    // (e.g. the recomputed batch coalesced), the extra first-attempt
    // files must leave the manifest AND the directory — else their rows
    // double-count. Entries of other epochs are untouched.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    val e0 = "part-e00000-00000.ndjson"
    val e1a = "part-e00001-00000.ndjson"
    val e1b = "part-e00001-00001.ndjson"
    Seq(e0, e1a, e1b).foreach { n =>
      Files.write(Paths.get(dir, n),
        "{\"id\":0}\n".getBytes(StandardCharsets.UTF_8))
    }
    writeManifest(dir, e0 -> 1L, e1a -> 1L, e1b -> 1L)

    val staging = Files.createDirectories(Paths.get(dir, ".staging-q3"))
    Files.write(staging.resolve(e1a),
      "{\"id\":1}\n{\"id\":2}\n".getBytes(StandardCharsets.UTF_8))
    new ManifestStreamingWrite(dir, schema, "q3")
      .commit(1L, Array(StagedFile(e1a, 2L)))

    assert(ManifestSink.committedEntries(dir).sortBy(_.name) ==
      Seq(StagedFile(e0, 1L), StagedFile(e1a, 2L)),
      "replayed epoch must hold exactly its replay's files")
    assert(!Files.exists(Paths.get(dir, e1b)),
      "first attempt's extra partition file must be deleted")
    assert(Files.exists(Paths.get(dir, e0)), "other epochs untouched")
  }
}
