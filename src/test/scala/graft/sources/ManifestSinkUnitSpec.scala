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
    // seq = the committing generation (equality-delete applicability).
    assert(entries == Seq(StagedFile(name, 1L, seq = 1L)),
      s"manifest should hold exactly the replacing entry, got $entries")
    assert(ManifestSink.committedRowCount(dir) == 1L)
  }

  test("NDJSON codec round-trips control characters and every payload type") {
    // The documents corpus is full of whitespace: a newline that leaks
    // unescaped splits one logical record across two physical lines and
    // the file stops being NDJSON. Escape → parse must be identity for
    // the full control range, and every supported DataType must survive
    // renderer → converter bit-for-bit.
    import org.apache.spark.sql.types._
    val nasty = "line1\nline2\r\ttabbed \"quoted\" back\\slash  end"
    val esc = NdjsonCodec.escape(nasty)
    assert(!esc.exists(_ < 0x20), s"control char leaked into: $esc")
    val back = NdjsonCodec.parseLine(s"""{"t":"$esc"}""")("t")
    assert(back == NdjsonCodec.JsonStr(nasty))

    def rt(dt: DataType, v: Any): Any = {
      val rendered = NdjsonCodec.renderer(dt)(v)
      NdjsonCodec.converter(dt)(NdjsonCodec.parseLine(s"""{"v":$rendered}""")("v"))
    }
    assert(rt(LongType, 42L) == 42L)
    assert(rt(IntegerType, -7) == -7)
    assert(rt(BooleanType, true) == true)
    assert(rt(DoubleType, 1.5e-3) == 1.5e-3)
    assert(rt(DoubleType, Double.NaN).asInstanceOf[Double].isNaN)
    assert(rt(DateType, 19000) == 19000) // days since epoch → ISO date → days
    assert(rt(TimestampType, 1700000000123456L) == 1700000000123456L)
    assert(rt(DecimalType(10, 2),
      org.apache.spark.sql.types.Decimal(BigDecimal("12345.67"), 10, 2))
      .asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
      == new java.math.BigDecimal("12345.67"))
    assert(java.util.Arrays.equals(
      rt(BinaryType, Array[Byte](0, 1, -2, 127)).asInstanceOf[Array[Byte]],
      Array[Byte](0, 1, -2, 127)))
    // StringType is also inference's CONSERVATIVE spelling: foreign
    // files can carry arrays or type-conflicted values that infer as
    // StringType, and the converter must surface their raw JSON text
    // (not fail at read what inference accepted at plan time).
    val sConv = NdjsonCodec.converter(StringType)
    assert(sConv(NdjsonCodec.parseLine("""{"v":[1,2,3]}""")("v")).toString
      == "[1,2,3]")
    assert(sConv(NdjsonCodec.parseLine("""{"v":42}""")("v")).toString == "42")
  }

  test("eqKeySet: tombstone key sets cache per JVM; mtime change invalidates") {
    val dir = Files.createTempDirectory("graft_eqcache")
    val f = dir.resolve("eqdel-g000002-test.ndjson")
    Files.write(f, "{\"id\":1}\n{\"id\":2}\n".getBytes(StandardCharsets.UTF_8))
    val a = ManifestSink.eqKeySet(dir.toString, f.getFileName.toString, Seq("id"))
    val loadsAfterFirst = ManifestSink.eqKeySetLoads.get()
    val b = ManifestSink.eqKeySet(dir.toString, f.getFileName.toString, Seq("id"))
    // Same INSTANCE, zero physical re-loads: a 1000-split scan pays the
    // read+parse once per executor, not once per split.
    assert(b eq a, "second lookup must hit the cache")
    assert(ManifestSink.eqKeySetLoads.get() == loadsAfterFirst)
    assert(a.contains(ManifestSink.eqKeyOf(
      NdjsonCodec.parseLine("{\"id\":2}"), Seq("id"))))
    // Different KEY COLUMNS = different cache entry (key sets are
    // column-tuple-specific), not a stale hit.
    val other = ManifestSink.eqKeySet(dir.toString, f.getFileName.toString,
      Seq("id", "v"))
    assert(!(other eq a))
    // A rewrite with a new mtime invalidates: fresh content is served.
    Files.write(f, "{\"id\":3}\n".getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() + 5000))
    val c = ManifestSink.eqKeySet(dir.toString, f.getFileName.toString, Seq("id"))
    assert(!(c eq a) && c.size == 1)
    assert(c.contains(ManifestSink.eqKeyOf(
      NdjsonCodec.parseLine("{\"id\":3}"), Seq("id"))))
  }

  test("parseLineSelect materializes only needed keys; skipped values keep structure honest") {
    // Hostile skipped values: escaped quotes, backslashes, braces,
    // commas and colons inside strings, \uXXXX, a null, numbers —
    // none may derail the tokenizer or leak into the result.
    val line = """{"id":42,"junk1":"a\"b\\c{,}:","junk2":"\t\\u-free","n":null,""" +
      """"w":"yyy","k":-3.5,"text":"keep \"this\" one"}"""
    val needed = new java.util.HashSet[java.lang.String]()
    needed.add("id"); needed.add("text"); needed.add("n")
    val sel = NdjsonCodec.parseLineSelect(line, needed)
    assert(sel.keySet == Set("id", "text", "n"), sel.keySet)
    assert(sel("id") == NdjsonCodec.JsonTok("42"))
    assert(sel("text") == NdjsonCodec.JsonStr("keep \"this\" one"))
    assert(sel("n") == NdjsonCodec.JsonNull)
    // Agreement: on the needed keys, the selective parse IS the full
    // parse; with needed = null it degenerates to parseLine exactly.
    val full = NdjsonCodec.parseLine(line)
    needed.forEach(k => assert(sel(k) == full(k), k))
    assert(NdjsonCodec.parseLineSelect(line, null) == full)
    // Empty needed set: pure structural walk, still validates framing.
    assert(NdjsonCodec.parseLineSelect(line,
      new java.util.HashSet[java.lang.String]()).isEmpty)
    // Malformed input still fails loudly even when every field is skipped.
    intercept[IllegalArgumentException] {
      NdjsonCodec.parseLineSelect("""{"a":"unterminated}""",
        new java.util.HashSet[java.lang.String]())
    }
  }

  test("parseBytesSelect: byte-level parse agrees with parseLine, UTF-8 and escapes intact") {
    val line = """{"id":7,"t\u00e9xt":"caf\u00e9 \"x\" \\ done","wide":"\u4e2d\u6587 payload {,}:","k":-2.25,"z":null}"""
      .replace("\\u00e9", "\u00e9").replace("\\u4e2d", "\u4e2d")
      .replace("\\u6587", "\u6587")
    val bytes = line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // needed = all keys: byte path must agree with the char path exactly
    // (multi-byte keys and values included).
    val full = NdjsonCodec.parseLine(line)
    val allKeys = new NdjsonCodec.NeededKeys(full.keys.toSeq)
    assert(NdjsonCodec.parseBytesSelect(bytes, allKeys) == full)
    assert(NdjsonCodec.parseBytesSelect(bytes, null) == full)
    // Narrow projection: the wide multi-byte value is skipped at the
    // BYTE level (never decoded); needed values come out canonical.
    val narrow = new NdjsonCodec.NeededKeys(Seq("id", "k", "z"))
    val sel = NdjsonCodec.parseBytesSelect(bytes, narrow)
    assert(sel.keySet == Set("id", "k", "z"), sel.keySet)
    assert(sel("id") == NdjsonCodec.JsonTok("7"))
    assert(sel("k") == NdjsonCodec.JsonTok("-2.25"))
    assert(sel("z") == NdjsonCodec.JsonNull)
    // Nested values (round 14): captured as raw text when projected,
    // skipped structurally when not — commas/braces inside nested
    // strings are data, never structure.
    val nested =
      """{"a":{"x":"b} , r{","y":[1,2]},"id":5}""".getBytes("UTF-8")
    val nsel = NdjsonCodec.parseBytesSelect(nested, null)
    assert(nsel("a") == NdjsonCodec.JsonRaw("""{"x":"b} , r{","y":[1,2]}"""))
    assert(nsel("id") == NdjsonCodec.JsonTok("5"))
    val nskip = NdjsonCodec.parseBytesSelect(nested,
      new NdjsonCodec.NeededKeys(Seq("id")))
    assert(nskip.keySet == Set("id") && nskip("id") == NdjsonCodec.JsonTok("5"))
    // The String tokenizer agrees byte-for-byte.
    assert(NdjsonCodec.parseLine(new String(nested, "UTF-8")) == nsel)
    // Structure violations still fail loudly on the byte path.
    intercept[IllegalArgumentException] {
      NdjsonCodec.parseBytesSelect(
        """{"a":"unterminated}""".getBytes("UTF-8"), narrow)
    }
    intercept[IllegalArgumentException] {
      NdjsonCodec.parseBytesSelect(
        """{"a":{"never":"closed"}""".getBytes("UTF-8"), null)
    }
  }

  test("streaming: a losing concurrent attempt cannot clobber the winner's staged bytes") {
    // Speculation / zombie retry: two attempts of the SAME (epoch,
    // partition). Staging is attempt-unique; the deterministic epoch
    // name is claimed only at task commit, so the loser's abort deletes
    // its own file and the winner's staged bytes survive intact.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    Files.createDirectories(Paths.get(dir, ".staging-q5"))
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("t", org.apache.spark.sql.types.StringType)))
    val winner = new NdjsonDataWriter(dir, "q5", sch, 0, 100L, Some(3L))
    val zombie = new NdjsonDataWriter(dir, "q5", sch, 0, 101L, Some(3L))
    winner.write(InternalRow(1L, UTF8String.fromString("multi\nline")))
    zombie.write(InternalRow(1L, UTF8String.fromString("stale attempt")))
    val msg = winner.commit().asInstanceOf[StagedFile]
    zombie.abort() // must delete ONLY the zombie's attempt file
    val staged = Paths.get(dir, ".staging-q5", msg.name)
    assert(Files.exists(staged), "winner's staged file was destroyed by the loser")
    val content = new String(Files.readAllBytes(staged), StandardCharsets.UTF_8)
    assert(content == "{\"id\":1,\"t\":\"multi\\nline\"}\n",
      s"winner's bytes corrupted or unescaped: $content")
    // And the driver-side epoch commit publishes the winner cleanly.
    new ManifestStreamingWrite(dir, sch, "q5").commit(3L, Array(msg))
    assert(ManifestSink.committedEntries(dir)
      .map(e => (e.name, e.rows)) == Seq((msg.name, 1L)))
  }

  test("publish lock (round-16 contract): a held lock fails a TRUNCATE " +
      "committer loudly at the short wait; an APPEND queues past it " +
      "and lands once the holder releases") {
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    val staging = Files.createDirectories(Paths.get(dir, ".staging-q6"))
    Files.write(staging.resolve("part-00000-1.ndjson"),
      "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
    val lock = Paths.get(dir, ".manifest.lock")
    Files.createFile(lock) // a committer mid-publish
    // Conflict-detecting shape: surfaces the contention at the short
    // wait — its plan would go stale queueing behind a long holder.
    val ex = intercept[IllegalStateException] {
      new ManifestBatchWrite(dir, schema, "q6", truncate = true)
        .commit(Array(StagedFile("part-00000-1.ndjson", 1L)))
    }
    assert(ex.getMessage.contains("concurrent committer"),
      s"wrong failure: ${ex.getMessage}")
    // Append shape: composes against whatever manifest it finds under
    // the lock, so it QUEUES (up to the holder's lease) — release the
    // lock from a helper thread past the short wait and the commit
    // must land rather than throw (the pre-round-16 behavior).
    val releaseMs = ManifestSink.LockAcquireWaitMs + 1500L
    val releaser = new Thread(() => {
      Thread.sleep(releaseMs)
      Files.delete(lock)
    })
    releaser.start()
    val t0 = System.nanoTime()
    new ManifestBatchWrite(dir, schema, "q6", truncate = false)
      .commit(Array(StagedFile("part-00000-1.ndjson", 1L)))
    val waitedMs = (System.nanoTime() - t0) / 1e6
    releaser.join()
    assert(waitedMs > ManifestSink.LockAcquireWaitMs.toDouble,
      s"append landed in ${waitedMs}ms — it cannot have queued behind " +
        "the held lock")
    assert(ManifestSink.committedRowCount(dir) == 1L)
    assert(!Files.exists(lock), "lock leaked")
  }

  test("per-file column bounds ride the manifest and compose across commits") {
    // The writer records min/max per orderable column (parquet-footer
    // style); the bounds must survive the manifest's flat-entry encoding
    // AND re-compose unchanged when a later commit carries prior entries
    // forward.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    Files.createDirectories(Paths.get(dir, ".staging-q7"))
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("t", org.apache.spark.sql.types.StringType)))
    val w = new NdjsonDataWriter(dir, "q7", sch, 0, 1L)
    w.write(InternalRow(5L, UTF8String.fromString("m\"id")))
    w.write(InternalRow(2L, UTF8String.fromString("aaa")))
    w.write(InternalRow(9L, UTF8String.fromString("zzz")))
    val msg = w.commit().asInstanceOf[StagedFile]
    assert(msg.stats.toSet == Set(
      ColStat("id", "2", "9"),
      ColStat("t", "\"aaa\"", "\"zzz\"")), s"writer stats: ${msg.stats}")
    new ManifestBatchWrite(dir, sch, "q7", truncate = false).commit(Array(msg))
    assert(ManifestSink.committedEntries(dir).head.stats.toSet == msg.stats.toSet,
      "stats lost in the manifest round trip")
    // Second commit composes the first entry forward, bounds intact.
    val staging2 = Files.createDirectories(Paths.get(dir, ".staging-q8"))
    Files.write(staging2.resolve("part-00001-2.ndjson"),
      "{\"id\":100,\"t\":\"k\"}\n".getBytes(StandardCharsets.UTF_8))
    new ManifestBatchWrite(dir, sch, "q8", truncate = false)
      .commit(Array(StagedFile("part-00001-2.ndjson", 1L,
        Seq(ColStat("id", "100", "100")))))
    val byName = ManifestSink.committedEntries(dir).map(e => e.name -> e).toMap
    assert(byName(msg.name).stats.toSet == msg.stats.toSet,
      "prior entry's bounds corrupted by composition")
    assert(byName("part-00001-2.ndjson").stats == Seq(ColStat("id", "100", "100")))
  }

  test("file skipping: bounds prune files; uncertainty always keeps the file") {
    import org.apache.spark.sql.sources._
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("t", org.apache.spark.sql.types.StringType)))
    val e = StagedFile("f", 10L,
      Seq(ColStat("id", "10", "20"), ColStat("t", "\"b\"", "\"d\"")))
    def may(f: Filter): Boolean = ManifestStats.mayMatch(sch, e, f)
    assert(!may(EqualTo("id", 5L)) && may(EqualTo("id", 10L)) &&
      may(EqualTo("id", 15L)) && !may(EqualTo("id", 21L)))
    assert(!may(GreaterThan("id", 20L)) && may(GreaterThan("id", 19L)))
    assert(!may(LessThan("id", 10L)) && may(LessThanOrEqual("id", 10L)))
    assert(!may(In("id", Array(1L, 5L, 30L))) && may(In("id", Array(1L, 12L))))
    assert(!may(EqualTo("t", "a")) && may(EqualTo("t", "c")) && !may(EqualTo("t", "x")))
    assert(!may(And(EqualTo("id", 15L), EqualTo("t", "z"))),
      "And must prune when either side cannot match")
    assert(may(Or(EqualTo("id", 5L), EqualTo("t", "c"))),
      "Or must keep when either side can match")
    // Conservative directions: unknown column, no stats, unsupported
    // predicate, un-normalizable literal — all keep the file.
    assert(may(EqualTo("nope", 1L)))
    assert(may(EqualTo("id", "not-a-number")))
    assert(may(IsNull("id")))
    assert(ManifestStats.mayMatch(sch, StagedFile("bare", 1L), EqualTo("id", 999L)))
  }

  test("compact bin-packs small files atomically, preserving rows and bounds") {
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    // Four 1-row files + one already-big file; target 2 rows/file.
    val sch = StructType(Seq(StructField("id", LongType)))
    val entries = (1 to 4).map { i =>
      val n = s"part-0000$i-$i.ndjson"
      Files.write(Paths.get(dir, n),
        s"""{"id":$i}\n""".getBytes(StandardCharsets.UTF_8))
      StagedFile(n, 1L, Seq(ColStat("id", i.toString, i.toString)))
    } :+ {
      Files.write(Paths.get(dir, "part-big.ndjson"),
        "{\"id\":50}\n{\"id\":51}\n".getBytes(StandardCharsets.UTF_8))
      StagedFile("part-big.ndjson", 2L, Seq(ColStat("id", "50", "51")))
    }
    ManifestSink.withPublishLock(Paths.get(dir)) {
      ManifestSink.publishManifest(Paths.get(dir), entries, 1L, "t")
    }
    assert(ManifestSink.compact(dir, targetRows = 2L) == 4)
    val after = ManifestSink.committedEntries(dir)
    // 4 singles -> 2 merged pairs; the big file is untouched.
    assert(after.size == 3, s"entries after compact: $after")
    assert(ManifestSink.committedRowCount(dir) == 6L)
    assert(after.exists(_.name == "part-big.ndjson"))
    val mergedStats = after.filter(_.name.startsWith("compact-"))
      .flatMap(_.stats).sortBy(_.min)
    // min-of-mins / max-of-maxs per merged pair (1+2 and 3+4 by
    // name-sorted first-fit).
    assert(mergedStats == Seq(ColStat("id", "1", "2"), ColStat("id", "3", "4")),
      s"merged bounds: $mergedStats")
    // Retired originals are GONE; merged payload is the concatenation.
    assert((1 to 4).forall(i => !Files.exists(Paths.get(dir, s"part-0000$i-$i.ndjson"))))
    val allRows = after.flatMap { e =>
      new String(Files.readAllBytes(Paths.get(dir, e.name)),
        StandardCharsets.UTF_8).split("\n").toSeq
    }.sorted
    assert(allRows == Seq("{\"id\":1}", "{\"id\":2}", "{\"id\":3}", "{\"id\":4}",
      "{\"id\":50}", "{\"id\":51}"))
    // Nothing left to do: idempotent no-op second pass.
    assert(ManifestSink.compact(dir, targetRows = 2L) == 0)
    assert(!Files.exists(Paths.get(dir, ".manifest.lock")), "lock leaked")
  }

  test("mergeStats: decimal/lexical bound folding, conservative drops") {
    def cs(c: String, lo: String, hi: String) = ColStat(c, lo, hi)
    assert(ManifestSink.mergeStats(Seq(
      Seq(cs("a", "10", "20"), cs("s", "\"b\"", "\"d\"")),
      Seq(cs("a", "2", "30"), cs("s", "\"a\"", "\"c\"")))) ==
      Seq(cs("a", "2", "30"), cs("s", "\"a\"", "\"d\"")))
    // A column missing from one member drops; others survive.
    assert(ManifestSink.mergeStats(Seq(
      Seq(cs("a", "1", "2"), cs("b", "1", "2")), Seq(cs("a", "3", "4")))) ==
      Seq(cs("a", "1", "4")))
    // Mixed string/number shapes drop ONLY the broken column.
    assert(ManifestSink.mergeStats(Seq(
      Seq(cs("a", "1", "2"), cs("ok", "5", "6")),
      Seq(cs("a", "\"x\"", "\"y\""), cs("ok", "7", "8")))) ==
      Seq(cs("ok", "5", "8")))
  }

  test("manifest generation is monotonic across commits") {
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    assert(ManifestSink.committedGeneration(dir) == 0L)
    (1 to 3).foreach { g =>
      val staging = Files.createDirectories(Paths.get(dir, s".staging-g$g"))
      Files.write(staging.resolve(s"part-0000$g-1.ndjson"),
        "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
      new ManifestBatchWrite(dir, schema, s"g$g", truncate = false)
        .commit(Array(StagedFile(s"part-0000$g-1.ndjson", 1L)))
      assert(ManifestSink.committedGeneration(dir) == g.toLong)
    }
    assert(ManifestSink.committedRowCount(dir) == 3L)
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
      Seq(StagedFile(e0, 1L), StagedFile(e1a, 2L, seq = 1L)),
      "replayed epoch must hold exactly its replay's files")
    assert(!Files.exists(Paths.get(dir, e1b)),
      "first attempt's extra partition file must be deleted")
    assert(Files.exists(Paths.get(dir, e0)), "other epochs untouched")
  }

  test("braces inside string stats survive manifest parse and composition") {
    // Round-9's flat-object regex dropped any entry whose string bound
    // contained '{' or '}' — committed data became invisible to readers
    // AND to the next commit's composition (then GC'd as unreferenced:
    // permanent loss). The string-aware scanner must hold the entry
    // through parse, a forward composition, and a re-parse.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    val brace = StagedFile("part-brace.ndjson", 3L, Seq(
      ColStat("t", "\"a{b\"", "\"z}x\""),
      ColStat("u", "\"{\\\"json\\\":1}\"", "\"}}{{\"")))
    ManifestSink.withPublishLock(Paths.get(dir)) {
      ManifestSink.publishManifest(Paths.get(dir), Seq(brace), 1L, "t")
    }
    assert(ManifestSink.committedEntries(dir) == Seq(brace),
      s"brace-stat entry corrupted: ${ManifestSink.committedEntries(dir)}")
    // Composition: an append commit must carry the brace entry forward.
    val staging = Files.createDirectories(Paths.get(dir, ".staging-qb"))
    Files.write(staging.resolve("part-plain.ndjson"),
      "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
    new ManifestBatchWrite(dir, schema, "qb", truncate = false)
      .commit(Array(StagedFile("part-plain.ndjson", 1L)))
    val after = ManifestSink.committedEntries(dir)
    assert(after.size == 2, s"entry lost across composition: $after")
    assert(after.contains(brace), s"brace bounds corrupted: $after")
    assert(ManifestSink.committedRowCount(dir) == 4L)
  }

  test("string stat bounds truncate parquet-style; bounds stay valid") {
    import org.apache.spark.unsafe.types.UTF8String
    val n = NdjsonCodec.StatLen
    // Short strings pass through untouched.
    assert(NdjsonCodec.truncLower("abc") == "abc")
    assert(NdjsonCodec.truncUpper("abc").contains("abc"))
    val exact = "x" * n
    assert(NdjsonCodec.truncUpper(exact).contains(exact))
    // Long: lower is the plain prefix, upper increments the last cp.
    val long = "a" * (n + 100)
    assert(NdjsonCodec.truncLower(long) == "a" * n)
    assert(NdjsonCodec.truncUpper(long).contains("a" * (n - 1) + "b"))
    // The truncated bounds must bracket the original in UTF8String
    // byte order (the order the scan prunes with).
    def leq(a: String, b: String) =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) <= 0
    for (s <- Seq(long, "ünïcödé-" * 20, "日本語テキスト" * 15, "a" * 63 + "퟿퟿퟿")) {
      assert(leq(NdjsonCodec.truncLower(s), s), s"lower bound broken for $s")
      val hi = NdjsonCodec.truncUpper(s)
      assert(hi.isDefined && leq(s, hi.get), s"upper bound broken for $s -> $hi")
    }
    // Incrementing U+D7FF skips the surrogate range entirely.
    val preSurrogate = "a" * (n - 1) + "퟿" + "tail"
    assert(NdjsonCodec.truncUpper(preSurrogate)
      .contains("a" * (n - 1) + ""))
    // Carry: a prefix ending in U+10FFFF increments the codepoint
    // before it; all-U+10FFFF has no finite bound and drops the stat.
    val top = new String(Character.toChars(0x10FFFF))
    assert(NdjsonCodec.truncUpper("a" * (n - 1) + top + "tail")
      .contains("a" * (n - 2) + "b"))
    assert(NdjsonCodec.truncUpper(top * (n + 1)).isEmpty)
    // End to end: the writer records truncated bounds.
    import org.apache.spark.sql.catalyst.InternalRow
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    Files.createDirectories(Paths.get(dir, ".staging-qt"))
    val sch = StructType(Seq(StructField("t", org.apache.spark.sql.types.StringType)))
    val w = new NdjsonDataWriter(dir, "qt", sch, 0, 1L)
    w.write(InternalRow(UTF8String.fromString("m" * 500)))
    w.write(InternalRow(UTF8String.fromString("b" * 500)))
    val msg = w.commit().asInstanceOf[StagedFile]
    assert(msg.stats == Seq(ColStat("t",
      "\"" + "b" * n + "\"", "\"" + "m" * (n - 1) + "n\"")),
      s"writer bounds not truncated: ${msg.stats}")
  }

  test("NaN presence disables upper-bound pruning for float/double") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.types.DoubleType
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    Files.createDirectories(Paths.get(dir, ".staging-qn"))
    val sch = StructType(Seq(StructField("v", DoubleType)))
    val w = new NdjsonDataWriter(dir, "qn", sch, 0, 1L)
    Seq(1.0, 2.0, Double.NaN).foreach(d => w.write(InternalRow(d)))
    val msg = w.commit().asInstanceOf[StagedFile]
    assert(msg.stats == Seq(ColStat("v", "1.0", "2.0", hasNan = true)),
      s"NaN presence not recorded: ${msg.stats}")
    // Spark orders NaN above every value: a filter above the recorded
    // max STILL matches the NaN rows, so the file must survive pruning.
    val nanFile = StagedFile("f", 3L, Seq(ColStat("v", "1.0", "2.0", hasNan = true)))
    val cleanFile = StagedFile("g", 3L, Seq(ColStat("v", "1.0", "2.0")))
    def may(e: StagedFile, f: Filter) = ManifestStats.mayMatch(sch, e, f)
    assert(may(nanFile, GreaterThan("v", 5.0)), "NaN rows match > 5.0")
    assert(!may(cleanFile, GreaterThan("v", 5.0)), "NaN-free file prunes")
    assert(may(nanFile, EqualTo("v", Double.NaN)), "NaN = NaN is true in Spark")
    assert(!may(cleanFile, EqualTo("v", Double.NaN)))
    // Lower bound stays exact either way (NaN is never the minimum).
    assert(!may(nanFile, LessThan("v", 1.0)))
    // The flag rides the manifest and survives a merge.
    ManifestSink.withPublishLock(Paths.get(dir)) {
      ManifestSink.publishManifest(Paths.get(dir), Seq(nanFile), 1L, "t")
    }
    assert(ManifestSink.committedEntries(dir) == Seq(nanFile),
      "hasNan lost in manifest round trip")
    assert(ManifestSink.mergeStats(Seq(
      Seq(ColStat("v", "1.0", "2.0", hasNan = true)),
      Seq(ColStat("v", "0.5", "9.0")))) ==
      Seq(ColStat("v", "0.5", "9.0", hasNan = true)),
      "NaN presence must survive a stat merge")
  }

  test("file bytes ride the manifest: planning never stats the filesystem") {
    import org.apache.spark.sql.catalyst.InternalRow
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    Files.createDirectories(Paths.get(dir, ".staging-qz"))
    val w = new NdjsonDataWriter(dir, "qz", StructType(Seq(StructField("id", LongType))), 0, 1L)
    (1L to 5L).foreach(i => w.write(InternalRow(i)))
    val msg = w.commit().asInstanceOf[StagedFile]
    assert(msg.bytes == 5 * "{\"id\":1}\n".length,
      s"writer must record the staged file's size, got ${msg.bytes}")
    new ManifestBatchWrite(dir, StructType(Seq(StructField("id", LongType))),
      "qz", truncate = false).commit(Array(msg))
    val entry = ManifestSink.committedEntries(dir).head
    assert(entry.bytes == msg.bytes, "bytes lost in manifest round trip")
    // The proof: DELETE the data file — the plan (partitions + stats)
    // must still come out right, because it reads sizes from the
    // manifest, not the filesystem (O(files) object-store round-trips
    // per query otherwise).
    Files.delete(Paths.get(dir, entry.name))
    val sch = StructType(Seq(StructField("id", LongType)))
    val scan = new ManifestScan(dir, sch, sch)
    assert(scan.planInputPartitions().length == 1)
    assert(scan.estimateStatistics().sizeInBytes().getAsLong == entry.bytes)
    assert(scan.estimateStatistics().numRows().getAsLong == 5L)
    // Split planning sizes from the manifest too.
    val split = new ManifestScan(dir, sch, sch, maxSplitBytes = 10L)
    assert(split.planInputPartitions().length ==
      (entry.bytes + 9) / 10, "split count must derive from manifest bytes")
  }

  test("a stale publish lock is reclaimed after its lease; a live one is not") {
    val dir = Files.createTempDirectory("graft_manifest_unit")
    val lock = dir.resolve(".manifest.lock")
    // Crashed committer: lock mtime an hour old, lease 1 s — reclaimed,
    // body runs, lock released.
    Files.write(lock, "dead-owner".getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 3600L * 1000))
    var ran = false
    ManifestSink.withPublishLock(dir, leaseMs = 1000L) { ran = true }
    assert(ran, "stale lock must be reclaimed after its lease")
    assert(!Files.exists(lock), "reclaimed lock must be released")
    // Live committer: fresh lock within lease — refused, lock intact.
    Files.write(lock, "live-owner".getBytes(StandardCharsets.UTF_8))
    val ex = intercept[IllegalStateException] {
      ManifestSink.withPublishLock(dir, leaseMs = 60000L) { fail("must not run") }
    }
    assert(ex.getMessage.contains("lease"), s"wrong failure: ${ex.getMessage}")
    assert(Files.exists(lock), "live lock must not be deleted")
    assert(new String(Files.readAllBytes(lock), StandardCharsets.UTF_8)
      == "live-owner", "live lock content must be untouched")
  }

  test("byte-range split reads: every split size yields the whole file exactly once") {
    // The Hadoop line-split contract, swept exhaustively: for EVERY
    // split size 1..fileSize the union of range readers must equal the
    // whole-file read — same rows, exactly once — through empty lines,
    // \r\n terminators, multi-byte UTF-8, and a final line with no
    // trailing newline. Byte-offset framing is exactly the code that
    // needs this (round 9 shipped the reader with zero split coverage).
    val dir = Files.createTempDirectory("graft_manifest_unit")
    val lines = Seq(
      """{"t":"alpha"}""",
      """{"t":"héllo wörld ünïcödé"}""",
      "",
      """{"t":"crlf-terminated"}""" + "\r",
      """{"t":"日本語テキスト"}""",
      "",
      """{"t":"последняя строка"}""")
    // Mixed terminators; final line deliberately lacks a newline.
    val content = lines.mkString("\n")
    val file = dir.resolve("part-sweep.ndjson")
    Files.write(file, content.getBytes(StandardCharsets.UTF_8))
    val size = Files.size(file)
    val sch = StructType(Seq(StructField("t", org.apache.spark.sql.types.StringType)))
    def readRange(start: Long, end: Long): Seq[String] = {
      val r = new NdjsonPartitionReader(file.toString, start, end, sch)
      try Iterator.continually(r.next()).takeWhile(identity)
        .map(_ => r.get().getUTF8String(0).toString).toVector
      finally r.close()
    }
    val whole = readRange(0L, Long.MaxValue)
    assert(whole.size == 5 && whole.head == "alpha", s"baseline read broken: $whole")
    for (split <- 1L to size) {
      val rows = (0L until size by split).flatMap(s =>
        readRange(s, math.min(s + split, size)))
      assert(rows == whole,
        s"split=$split lost/duplicated rows: got ${rows.size} of ${whole.size}")
    }
  }

  test("retention streaming: replay-retired files defer GC to expireSnapshots") {
    // retainHistory mode: an epoch replay retires its first attempt's
    // extra files from the CURRENT manifest, but older generations
    // still reference them — the files must stay until expireSnapshots,
    // and versionAsOf must keep reading them until then.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    val e1a = "part-e00001-00000.ndjson"
    val e1b = "part-e00001-00001.ndjson"
    val staging = Files.createDirectories(Paths.get(dir, ".staging-qr"))
    def stage(n: String, rows: Int): StagedFile = {
      Files.write(staging.resolve(n),
        (1 to rows).map(i => s"""{"id":$i}""").mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8))
      StagedFile(n, rows.toLong)
    }
    val sink = new ManifestStreamingWrite(dir, schema, "qr", retain = true)
    sink.commit(1L, Array(stage(e1a, 1), stage(e1b, 2))) // first attempt: gen 1
    sink.commit(1L, Array(stage(e1a, 1)))                // replay: gen 2, e1b retired
    assert(ManifestSink.committedEntries(dir).map(_.name) == Seq(e1a))
    assert(Files.exists(Paths.get(dir, e1b)),
      "retention mode must defer replay-retired file GC to expireSnapshots")
    // The retained snapshot still reads the retired file.
    assert(ManifestSink.committedEntriesAt(dir, Some(1L)).map(_.name).sorted
      == Seq(e1a, e1b))
    val (droppedFiles, droppedManifests) = ManifestSink.expireSnapshots(dir, 1)
    assert((droppedFiles, droppedManifests) == (1, 1),
      s"expected e1b + gen-1 manifest to drop, got ($droppedFiles, $droppedManifests)")
    assert(!Files.exists(Paths.get(dir, e1b)), "expired file must be deleted")
    assert(ManifestSink.committedEntries(dir).map(_.name) == Seq(e1a),
      "current snapshot must survive expiry")
    intercept[IllegalArgumentException] {
      ManifestSink.committedEntriesAt(dir, Some(1L))
    }
  }

  test("streaming auto-compaction bounds manifest growth across epochs") {
    // One 1-row file per epoch, autoCompactRows=10: prior epochs'
    // entries keep collapsing into compact-* files, the CURRENT epoch's
    // file is never merged (a replay must find its epoch-named entries
    // to retire), and no rows are lost or doubled.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    val staging = Files.createDirectories(Paths.get(dir, ".staging-qa"))
    val sink = new ManifestStreamingWrite(dir, schema, "qa",
      retain = false, autoCompactRows = 10L)
    (1 to 6).foreach { e =>
      val n = f"part-e$e%05d-00000.ndjson"
      Files.write(staging.resolve(n),
        s"""{"id":$e}\n""".getBytes(StandardCharsets.UTF_8))
      sink.commit(e.toLong, Array(StagedFile(n, 1L,
        Seq(ColStat("id", e.toString, e.toString)))))
    }
    val entries = ManifestSink.committedEntries(dir)
    // Without compaction there would be 6 entries; with it, everything
    // before epoch 6 is merged into one compact file.
    assert(entries.size == 2, s"manifest not bounded: ${entries.map(_.name)}")
    assert(entries.exists(_.name == "part-e00006-00000.ndjson"),
      "current epoch's file must stay epoch-named for replay")
    assert(ManifestSink.committedRowCount(dir) == 6L)
    val allRows = entries.flatMap { e =>
      new String(Files.readAllBytes(Paths.get(dir, e.name)),
        StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    }.sorted
    assert(allRows == (1 to 6).map(i => s"""{"id":$i}""").sorted,
      s"auto-compaction lost or doubled rows: $allRows")
    // Merged bounds survive: the compact entry spans epochs 1-5.
    val compactEntry = entries.find(_.name.startsWith("compact-")).get
    assert(compactEntry.stats == Seq(ColStat("id", "1", "5")),
      s"merged bounds: ${compactEntry.stats}")
  }

  test("EXTERNAL compaction never merges the latest epoch's files: a " +
      "sink commit awaiting its checkpoint must keep its epoch-named " +
      "entries for replay retirement") {
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    val staging = Files.createDirectories(Paths.get(dir, ".staging-qe"))
    val sink = new ManifestStreamingWrite(dir, schema, "qe", retain = false)
    (1 to 3).foreach { e =>
      val n = f"part-e$e%05d-00000.ndjson"
      Files.write(staging.resolve(n),
        s"""{"id":$e}\n""".getBytes(StandardCharsets.UTF_8))
      sink.commit(e.toLong, Array(StagedFile(n, 1L,
        Seq(ColStat("id", e.toString, e.toString)))))
    }
    // Maintenance compaction between epoch 3's sink commit and its
    // checkpoint advance: epochs 1-2 merge, epoch 3 must carry over
    // epoch-named — a replay of epoch 3 retires entries BY PREFIX and
    // would otherwise double-count its rows beside the compact file.
    assert(ManifestSink.compact(dir, 1000L) == 2)
    val entries = ManifestSink.committedEntries(dir)
    assert(entries.exists(_.name == "part-e00003-00000.ndjson"),
      s"latest epoch merged away: ${entries.map(_.name)}")
    // The replay proof: re-commit epoch 3 (one replacement attempt
    // file); rows must stay exactly 1..3 — no double count.
    val n3 = "part-e00003-11111.ndjson"
    Files.write(staging.resolve(n3),
      """{"id":3}""".stripMargin.concat("\n")
        .getBytes(StandardCharsets.UTF_8))
    sink.commit(3L, Array(StagedFile(n3, 1L,
      Seq(ColStat("id", "3", "3")))))
    assert(ManifestSink.committedRowCount(dir) == 3L,
      "epoch-3 replay double-counted rows")
  }

  test("inferSchema samples past leading nulls and widens long|double") {
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    Files.write(Paths.get(dir, "part-s.ndjson"),
      Seq("""{"a":null,"b":1,"c":"x"}""",
        """{"a":2.5,"b":2,"c":null}""",
        """{"a":3,"b":null,"c":"y"}""").mkString("", "\n", "\n")
        .getBytes(StandardCharsets.UTF_8))
    writeManifest(dir, "part-s.ndjson" -> 3L)
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", dir))
    val inferred = new ManifestSink().inferSchema(opts)
    import org.apache.spark.sql.types.{DoubleType, StringType}
    assert(inferred == StructType(Seq(
      StructField("a", DoubleType),  // null → 2.5 → 3 widens to double
      StructField("b", LongType),
      StructField("c", StringType))), s"inferred: $inferred")
  }

  // --- two-level (segmented) manifest -----------------------------------

  /** Stage one single-row file and batch-commit it. */
  private def appendOne(dir: String, q: String, name: String,
      maxSegments: Int = ManifestSink.DefaultMaxSegments): Unit = {
    val staging = Files.createDirectories(Paths.get(dir, s".staging-$q"))
    Files.write(staging.resolve(name),
      "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
    new ManifestBatchWrite(dir, schema, q, truncate = false,
      maxSegments = maxSegments)
      .commit(Array(StagedFile(name, 1L)))
  }

  private def pointerText(dir: String): String =
    ManifestSink.manifestText(dir, ManifestSink.ManifestName)

  private def segFilesOnDisk(dir: String): Seq[String] = {
    val ls = Files.list(Paths.get(dir))
    try {
      val it = ls.iterator()
      val buf = collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("seg-") && n.endsWith(".json")) buf += n
      }
      buf.toSeq.sorted
    } finally ls.close()
  }

  test("append commits write O(delta): prior segments carried by name, unchanged") {
    // The manifest-list layer: each append writes ONE new segment plus a
    // tiny pointer; the prior segments are referenced, never re-rendered.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    appendOne(dir, "s1", "part-00000-1.ndjson")
    appendOne(dir, "s2", "part-00000-2.ndjson")
    val seg1 = ManifestSink.segmentRefs(pointerText(dir)).head
    val seg1Bytes = Files.readAllBytes(Paths.get(dir, seg1)).toSeq
    appendOne(dir, "s3", "part-00000-3.ndjson")

    val ptr = pointerText(dir)
    val segs = ManifestSink.segmentRefs(ptr)
    assert(segs.size == 3, s"one segment per append commit: $segs")
    // The pointer is O(#segments): segment references (name + summary
    // rollup), never inline FILE entries.
    assert(ManifestSink.parseEntries(ptr).isEmpty,
      s"pointer must not inline file entries: $ptr")
    assert(!ptr.contains("part-"), s"pointer must not name data files: $ptr")
    // Immutability: the first commit's segment is byte-identical after
    // two more commits — O(delta) means untouched, not rewritten.
    assert(Files.readAllBytes(Paths.get(dir, seg1)).toSeq == seg1Bytes,
      "a carried segment must never be rewritten by an append")
    // The delta segment holds ONLY the new entry.
    assert(ManifestSink.parseEntries(
      ManifestSink.manifestText(dir, segs.last)).map(_.name) ==
      Seq("part-00000-3.ndjson"))
    assert(ManifestSink.committedFiles(dir).sorted == Seq(
      "part-00000-1.ndjson", "part-00000-2.ndjson", "part-00000-3.ndjson"))
    assert(ManifestSink.committedRowCount(dir) == 3L)
  }

  test("legacy inline manifest migrates into a segment on first append") {
    // Pre-segmentation tables carry entries inline in manifest.json;
    // the first append moves them into a one-time migration segment so
    // later appends never re-render them again.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    writeManifest(dir, "part-old-1.ndjson" -> 5L, "part-old-2.ndjson" -> 7L)
    appendOne(dir, "m1", "part-00000-9.ndjson")

    val segs = ManifestSink.segmentRefs(pointerText(dir))
    assert(segs.size == 2, s"migration + delta segments expected: $segs")
    assert(ManifestSink.parseEntries(pointerText(dir)).isEmpty,
      "no inline entries may remain after migration")
    assert(ManifestSink.committedRowCount(dir) == 13L)
    assert(ManifestSink.committedFiles(dir).sorted == Seq(
      "part-00000-9.ndjson", "part-old-1.ndjson", "part-old-2.ndjson"))
  }

  test("segment list collapses at maxSegments; retired segments are swept") {
    // Unbounded segment accretion would just move the manifest-growth
    // problem down a level: every maxSegments-th commit collapses the
    // list to ONE segment (amortized O(total/max) write cost) and the
    // collapsed-away segment files leave the directory.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    (1 to 5).foreach(i =>
      appendOne(dir, s"c$i", s"part-0000$i-1.ndjson", maxSegments = 3))
    // Commits 1-3 append (1,2,3 segments); commit 4 sees 3 ≥ max →
    // collapse to 1; commit 5 appends → 2.
    val segs = ManifestSink.segmentRefs(pointerText(dir))
    assert(segs.size == 2, s"collapse must bound the list: $segs")
    assert(segFilesOnDisk(dir) == segs.sorted,
      s"retired segments must be swept: disk=${segFilesOnDisk(dir)} refs=$segs")
    assert(ManifestSink.committedRowCount(dir) == 5L)
    assert(ManifestSink.committedFiles(dir).size == 5)
  }

  test("epoch replay retires stale entries buried inside carried segments") {
    // A replayed epoch's first-attempt entries live inside an immutable
    // carried segment — the append fast path cannot retire them, so the
    // commit must fall back to a collapse that can. (The all-inline
    // variant of this invariant is the earlier epoch-replay test.)
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    val e1a = "part-e00001-00000.ndjson"
    val e1b = "part-e00001-00001.ndjson"
    val sw = new ManifestStreamingWrite(dir, schema, "qr")
    val staging = Files.createDirectories(Paths.get(dir, ".staging-qr"))
    Seq(e1a, e1b).foreach { n =>
      Files.write(staging.resolve(n),
        "{\"id\":0}\n".getBytes(StandardCharsets.UTF_8))
    }
    sw.commit(1L, Array(StagedFile(e1a, 1L), StagedFile(e1b, 1L)))
    assert(ManifestSink.segmentRefs(pointerText(dir)).nonEmpty,
      "epoch commit must publish as a segment")
    // Replay of epoch 1 with ONE partition: e1b must leave the table.
    Files.write(staging.resolve(e1a),
      "{\"id\":1}\n{\"id\":2}\n".getBytes(StandardCharsets.UTF_8))
    sw.commit(1L, Array(StagedFile(e1a, 2L)))
    assert(ManifestSink.committedEntries(dir) ==
      Seq(StagedFile(e1a, 2L, seq = 2L)),
      s"stale segment entries must be retired: ${ManifestSink.committedEntries(dir)}")
    assert(!Files.exists(Paths.get(dir, e1b)),
      "first attempt's extra file must be deleted")
    // The collapse swept the first attempt's segment.
    assert(segFilesOnDisk(dir) ==
      ManifestSink.segmentRefs(pointerText(dir)).sorted)
  }

  test("compaction sweeps crash-orphaned segments, keeps referenced ones") {
    // A crash between segment write and pointer swap leaves an orphan
    // segment no manifest references; the next collapse (compaction
    // here) sweeps it. Segments the pointer still references survive.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    (1 to 3).foreach { i =>
      Files.write(Paths.get(dir, s"part-0000$i-1.ndjson"),
        "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
      appendOne(dir, s"o$i", s"part-0000$i-1.ndjson")
    }
    Files.write(Paths.get(dir, "seg-g000099.json"),
      """{"files":[{"name":"ghost.ndjson","rows":9}]}"""
        .getBytes(StandardCharsets.UTF_8))
    assert(ManifestSink.committedRowCount(dir) == 3L,
      "an unreferenced segment must be invisible to readers")
    assert(ManifestSink.compact(dir, 10L) == 3)
    assert(!Files.exists(Paths.get(dir, "seg-g000099.json")),
      "orphan segment must be swept by the collapse")
    assert(segFilesOnDisk(dir) ==
      ManifestSink.segmentRefs(pointerText(dir)).sorted)
    assert(ManifestSink.committedRowCount(dir) == 3L)
  }

  test("segment summaries prune whole segments UNREAD at plan time") {
    // The manifest-list skip: each pointer reference carries the
    // segment's merged column bounds, so a filtered scan tests the
    // summary and never READS a segment no entry of which can match.
    // Hard proof: the pruned segment file is DELETED from disk — if
    // planning touched it, this would throw, not plan.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    def commitRange(q: String, name: String, lo: Long, hi: Long): Unit = {
      val staging = Files.createDirectories(Paths.get(dir, s".staging-$q"))
      Files.write(staging.resolve(name),
        s"""{"id":$lo}\n{"id":$hi}\n""".getBytes(StandardCharsets.UTF_8))
      new ManifestBatchWrite(dir, schema, q, truncate = false)
        .commit(Array(StagedFile(name, 2L,
          Seq(ColStat("id", lo.toString, hi.toString)), 20L)))
    }
    commitRange("lo", "part-00000-1.ndjson", 1L, 10L)
    commitRange("hi", "part-00000-2.ndjson", 100L, 110L)
    // Both summaries ride the pointer with their merged id bounds.
    val refs = ManifestSink.segmentRefsFull(pointerText(dir))
    assert(refs.size == 2 && refs.forall(_.summary.exists(
      _.stats.exists(_.col == "id"))), s"summaries missing: $refs")
    val loSeg = refs.head.name
    Files.delete(Paths.get(dir, loSeg)) // pruned segments must stay unread
    import org.apache.spark.sql.sources.GreaterThan
    val sb = new ManifestScanBuilder(dir, schema)
    sb.pushFilters(Array(GreaterThan("id", 50L)))
    val parts = sb.build().toBatch.planInputPartitions()
    assert(parts.map(_.asInstanceOf[ManifestFilePartition].file).toSeq ==
      Seq(Paths.get(dir, "part-00000-2.ndjson").toString),
      "only the surviving segment's files may plan")
    // Without a filter the scan must READ the deleted segment and fail
    // LOUDLY — a missing referenced segment silently vanishing its
    // entries would be the brace-bug class again. This also proves the
    // skip above was real, not a lucky empty read.
    intercept[java.io.UncheckedIOException] {
      new ManifestScanBuilder(dir, schema).build().toBatch.planInputPartitions()
    }
  }

  test("mustMatch proves all-match only when stats leave no escape hatch") {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("x", DoubleType), StructField("s", StringType)))
    def entry(stats: Seq[ColStat], nulls: Map[String, Long],
        rows: Long = 10L): StagedFile =
      StagedFile("f.ndjson", rows, stats, 100L, nulls)
    def must(e: StagedFile, f: Filter): Boolean =
      ManifestStats.mustMatch(sch, e, f)
    val idStat = ColStat("id", "5", "5")
    // Equality: min == max == v AND a recorded zero null count.
    assert(must(entry(Seq(idStat), Map("id" -> 0L)), EqualTo("id", 5L)))
    assert(!must(entry(Seq(idStat), Map("id" -> 1L)), EqualTo("id", 5L)),
      "a null row does not satisfy id = 5")
    assert(!must(entry(Seq(idStat), Map.empty), EqualTo("id", 5L)),
      "unknown null counts (legacy entry) prove nothing")
    assert(!must(entry(Seq(ColStat("id", "4", "5")), Map("id" -> 0L)),
      EqualTo("id", 5L)), "min < max cannot prove equality")
    // Ranges: > / >= hold for NaN rows (Spark orders NaN above all),
    // < / <= do not.
    val nan = ColStat("x", "1.0", "2.0", hasNan = true)
    val noNan = ColStat("x", "1.0", "2.0")
    assert(must(entry(Seq(noNan), Map("x" -> 0L)), GreaterThan("x", 0.5)))
    assert(must(entry(Seq(nan), Map("x" -> 0L)), GreaterThan("x", 0.5)),
      "NaN rows satisfy > under Spark ordering")
    assert(must(entry(Seq(noNan), Map("x" -> 0L)), LessThan("x", 3.0)))
    assert(!must(entry(Seq(nan), Map("x" -> 0L)), LessThan("x", 3.0)),
      "a NaN row is NOT below the recorded max")
    // Strings: bounds at the truncation cap never prove equality.
    val long64 = "a" * NdjsonCodec.StatLen
    val sEq = ColStat("s", "\"" + long64 + "\"", "\"" + long64 + "\"")
    assert(!must(entry(Seq(sEq), Map("s" -> 0L)), EqualTo("s", long64)),
      "64-codepoint bounds may be truncated — equality unprovable")
    val short = ColStat("s", "\"en\"", "\"en\"")
    assert(must(entry(Seq(short), Map("s" -> 0L)), EqualTo("s", "en")))
    assert(must(entry(Seq(short), Map("s" -> 0L)), In("s", Array("en", "fr"))))
    // Null predicates need exact counts.
    assert(must(entry(Nil, Map("id" -> 10L)), IsNull("id")))
    assert(!must(entry(Nil, Map("id" -> 9L)), IsNull("id")))
    assert(must(entry(Nil, Map("id" -> 0L)), IsNotNull("id")))
    // Duality: NOT f is all-match exactly when f cannot match any row.
    assert(must(entry(Seq(idStat), Map("id" -> 0L)), Not(EqualTo("id", 99L))))
    assert(!must(entry(Seq(idStat), Map("id" -> 0L)), Not(EqualTo("id", 5L))))
    // And the mayMatch side of the null counts:
    assert(!ManifestStats.mayMatch(sch, entry(Nil, Map("id" -> 0L)),
      IsNull("id")), "zero nulls prunes IS NULL")
    assert(!ManifestStats.mayMatch(sch, entry(Nil, Map("id" -> 10L)),
      IsNotNull("id")), "all-null prunes IS NOT NULL")
    assert(ManifestStats.mayMatch(sch, entry(Nil, Map.empty), IsNull("id")),
      "unknown counts keep the file")
  }

  test("deleteWhere: metadata-only file drops; partial overlap refuses untouched") {
    import org.apache.spark.sql.sources._
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    def commitFile(q: String, name: String, ids: Seq[Long]): Unit = {
      val staging = Files.createDirectories(Paths.get(dir, s".staging-$q"))
      Files.write(staging.resolve(name),
        ids.map(i => s"""{"id":$i}""").mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8))
      new ManifestBatchWrite(dir, schema, q, truncate = false)
        .commit(Array(StagedFile(name, ids.size.toLong,
          Seq(ColStat("id", ids.min.toString, ids.max.toString)), 20L,
          Map("id" -> 0L))))
    }
    commitFile("q1", "part-00000-1.ndjson", Seq(1L, 2L, 3L))
    commitFile("q2", "part-00000-2.ndjson", Seq(10L, 11L))
    val table = new ManifestTable(dir, schema)
    // Whole-file delete: bounds prove all of file 2 matches id >= 10.
    assert(table.canDeleteWhere(Array[Filter](GreaterThanOrEqual("id", 10L))))
    table.deleteWhere(Array[Filter](GreaterThanOrEqual("id", 10L)))
    assert(ManifestSink.committedFiles(dir) == Seq("part-00000-1.ndjson"))
    assert(!Files.exists(Paths.get(dir, "part-00000-2.ndjson")),
      "dropped data file must be GC'd (no retained history)")
    // Partial overlap: id >= 2 intersects file 1 without covering it.
    assert(!table.canDeleteWhere(Array[Filter](GreaterThanOrEqual("id", 2L))))
    intercept[UnsupportedOperationException] {
      table.deleteWhere(Array[Filter](GreaterThanOrEqual("id", 2L)))
    }
    assert(ManifestSink.committedRowCount(dir) == 3L,
      "refused delete leaves the table untouched")
    // DELETE with no predicate (SQL TRUNCATE path) drops everything.
    assert(table.canDeleteWhere(Array.empty[Filter]))
    table.deleteWhere(Array.empty[Filter])
    assert(ManifestSink.committedFiles(dir).isEmpty)
  }

  test("history reads commit provenance: generation, tag, timestamp, newest first") {
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    def commit(q: String, name: String, retain: Boolean): Unit = {
      val staging = Files.createDirectories(Paths.get(dir, s".staging-$q"))
      Files.write(staging.resolve(name),
        "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
      new ManifestBatchWrite(dir, schema, q, truncate = false, retain = retain)
        .commit(Array(StagedFile(name, 1L)))
    }
    val t0 = System.currentTimeMillis()
    commit("q-first", "part-00000-1.ndjson", retain = true)
    commit("q \"quoted{brace\"", "part-00000-2.ndjson", retain = true)
    ManifestSink.compact(dir, targetRows = 10L)
    val h = ManifestSink.history(dir)
    assert(h.map(_.generation) == Seq(3L, 2L, 1L), h.toString)
    assert(h.map(_.tag) == Seq("compact", "q \"quoted{brace\"", "q-first"),
      "tags survive escaping round trip: " + h)
    assert(h.head.current && h.tail.forall(!_.current))
    assert(h.forall(c => c.ts >= t0 && c.ts <= System.currentTimeMillis()))
    // A non-retained table still reports its current commit.
    val dir2 = Files.createTempDirectory("graft_manifest_unit").toString
    val staging2 = Files.createDirectories(Paths.get(dir2, ".staging-z"))
    Files.write(staging2.resolve("part-00000-1.ndjson"),
      "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
    new ManifestBatchWrite(dir2, schema, "z", truncate = false)
      .commit(Array(StagedFile("part-00000-1.ndjson", 1L)))
    val h2 = ManifestSink.history(dir2)
    assert(h2.map(c => (c.generation, c.tag, c.current)) == Seq((1L, "z", true)))
  }

  test("vacuum deletes aged orphans only; references and young files survive") {
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    def put(name: String, ageMs: Long): Unit = {
      val p = Paths.get(dir, name)
      Files.write(p, "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - ageMs))
    }
    // A committed file (referenced), an aged orphan (crashed commit's
    // moved-but-never-published file), a YOUNG orphan (in-flight), and
    // an aged crashed staging dir.
    val staging = Files.createDirectories(Paths.get(dir, ".staging-q1"))
    Files.write(staging.resolve("part-live.ndjson"),
      "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
    // retain=true: generation 1's manifest copy is what must keep the
    // retired file reachable after the truncate below.
    new ManifestBatchWrite(dir, schema, "q1", truncate = false, retain = true)
      .commit(Array(StagedFile("part-live.ndjson", 1L)))
    put("part-orphan-old.ndjson", ageMs = 100000L)
    put("part-orphan-young.ndjson", ageMs = 0L)
    val crashed = Files.createDirectories(Paths.get(dir, ".staging-dead"))
    Files.write(crashed.resolve("part-x.ndjson.a3"),
      "{\"id\":9}\n".getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(crashed, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 100000L))
    // Deletion-vector sidecars orphan the same ways data files do: an
    // aged orphan sweeps; a REFERENCED one survives regardless of age;
    // a young orphan survives on the in-flight guard.
    val staging15 = Files.createDirectories(Paths.get(dir, ".staging-q15"))
    Files.write(staging15.resolve("part-dv.ndjson"),
      "{\"id\":5}\n{\"id\":6}\n".getBytes(StandardCharsets.UTF_8))
    ManifestSink.writeDvSidecar(Paths.get(dir),
      "part-dv.ndjson.dv-g000002", Array(0L))
    new ManifestBatchWrite(dir, schema, "q15", truncate = false, retain = true)
      .commit(Array(StagedFile("part-dv.ndjson", 2L,
        dv = Some("part-dv.ndjson.dv-g000002"), dvRows = 1L)))
    Files.setLastModifiedTime(Paths.get(dir, "part-dv.ndjson.dv-g000002"),
      java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - 100000L))
    put("part-zz.ndjson.dv-g000009", ageMs = 100000L) // aged orphan sidecar
    put("part-yy.ndjson.dv-g000010", ageMs = 0L) // young orphan sidecar
    val (data, stg) = ManifestOps.vacuum(dir, olderThanMs = 50000L)
    assert(data == 2 && stg == 1, s"($data, $stg)")
    assert(Files.exists(Paths.get(dir, "part-live.ndjson")),
      "referenced file must survive")
    assert(Files.exists(Paths.get(dir, "part-orphan-young.ndjson")),
      "young file must survive (in-flight commit guard)")
    assert(!Files.exists(Paths.get(dir, "part-orphan-old.ndjson")))
    assert(Files.exists(Paths.get(dir, "part-dv.ndjson.dv-g000002")),
      "a sidecar the manifest references must survive vacuum")
    assert(Files.exists(Paths.get(dir, "part-yy.ndjson.dv-g000010")),
      "young orphan sidecar survives the in-flight guard")
    assert(!Files.exists(Paths.get(dir, "part-zz.ndjson.dv-g000009")),
      "aged orphan sidecar must sweep")
    assert(ManifestSink.committedRowCount(dir) == 2L,
      "live rows: part-live's 1 + part-dv's (2 physical - 1 vectored)")
    assert(!Files.exists(crashed))
    // Retained generations hold their references: overwrite with
    // retention, then vacuum must keep the RETIRED file too.
    val staging2 = Files.createDirectories(Paths.get(dir, ".staging-q2"))
    Files.write(staging2.resolve("part-gen2.ndjson"),
      "{\"id\":2}\n".getBytes(StandardCharsets.UTF_8))
    new ManifestBatchWrite(dir, schema, "q2", truncate = true, retain = true)
      .commit(Array(StagedFile("part-gen2.ndjson", 1L)))
    val oldLive = Paths.get(dir, "part-live.ndjson")
    Files.setLastModifiedTime(oldLive, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 100000L))
    val (data2, _) = ManifestOps.vacuum(dir, olderThanMs = 50000L)
    assert(data2 == 0 && Files.exists(oldLive),
      "a file a retained generation references must survive vacuum")
  }

  test("time travel resolves segmented generations; expire sweeps their segments") {
    // Retained generation manifests are pointer COPIES referencing
    // immutable segments — versionAsOf must resolve through them, and
    // expireSnapshots must release segments only the dropped
    // generations referenced.
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    (1 to 3).foreach { i =>
      val staging = Files.createDirectories(Paths.get(dir, s".staging-r$i"))
      Files.write(staging.resolve(s"part-0000$i-1.ndjson"),
        "{\"id\":1}\n".getBytes(StandardCharsets.UTF_8))
      new ManifestBatchWrite(dir, schema, s"r$i", truncate = false,
        retain = true).commit(Array(StagedFile(s"part-0000$i-1.ndjson", 1L)))
    }
    assert(ManifestSink.committedEntriesAt(dir, Some(1L)).map(_.name) ==
      Seq("part-00001-1.ndjson"), "gen 1 must resolve via its segment")
    assert(ManifestSink.committedEntriesAt(dir, Some(2L)).size == 2)
    val (gone, dropped) = ManifestSink.expireSnapshots(dir, keepLast = 1)
    assert(dropped == 2)
    assert(gone == 0, "all data files still referenced by the current gen")
    // Segments referenced by the current pointer survive; none dangle.
    assert(segFilesOnDisk(dir).toSet ==
      ManifestSink.segmentRefs(pointerText(dir)).toSet)
    assert(ManifestSink.committedRowCount(dir) == 3L)
    intercept[IllegalArgumentException] {
      ManifestSink.committedEntriesAt(dir, Some(1L))
    }
  }

  test("mustMatch NOT honors three-valued nulls: NULL rows survive DELETE WHERE c <> v") {
    import org.apache.spark.sql.sources._
    // File bounds exclude v=5 entirely, but 2 of 10 rows are NULL in id.
    // SQL: NOT(id = 5) is UNKNOWN for a NULL id — those rows do NOT
    // match the delete predicate and must survive, so the stats may NOT
    // prove all-match (a metadata-only drop would destroy them).
    val withNulls = StagedFile("f", 10L, Seq(ColStat("id", "10", "20")),
      nullCounts = Map("id" -> 2L))
    assert(!ManifestStats.mustMatch(schema, withNulls, Not(EqualTo("id", 5L))),
      "file with NULLs must not prove all-match for NOT(id = 5)")
    assert(!ManifestStats.mustMatch(schema, withNulls,
      Not(GreaterThan("id", 100L))), "same for NOT(id > 100)")
    // With a RECORDED zero null count the proof goes through again —
    // the fix must not cost the legitimate metadata-only fast path.
    val noNulls = withNulls.copy(nullCounts = Map("id" -> 0L))
    assert(ManifestStats.mustMatch(schema, noNulls, Not(EqualTo("id", 5L))))
    assert(ManifestStats.mustMatch(schema, noNulls, Not(GreaterThan("id", 100L))))
    // UNKNOWN null counts (legacy entry) stay conservative: no proof.
    val unknown = withNulls.copy(nullCounts = Map.empty)
    assert(!ManifestStats.mustMatch(schema, unknown, Not(EqualTo("id", 5L))))
  }

  test("stale-lock reclaim is atomic: racing breakers admit exactly one committer at a time") {
    val dir = Files.createTempDirectory("graft_manifest_unit")
    val lock = dir.resolve(ManifestSink.LockName)
    // A crashed committer's debris: a lock far older than any lease.
    Files.write(lock, "dead-owner".getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(0L))
    // N threads race to break the same stale lock. The invariant the
    // rename-based break provides: the critical section is NEVER
    // concurrently occupied (the old deleteIfExists break let a late
    // loser delete the winner's fresh lock, admitting a second
    // committer mid-section). Losers fail loudly — also acceptable.
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val entered = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try ManifestSink.withPublishLock(dir, leaseMs = 1000L) {
          entered.incrementAndGet()
          val now = inside.incrementAndGet()
          maxInside.updateAndGet(m => math.max(m, now))
          Thread.sleep(30)
          inside.decrementAndGet()
        } catch { case _: IllegalStateException => () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(entered.get() >= 1, "someone must reclaim the stale lock")
    assert(maxInside.get() == 1,
      s"critical section concurrently occupied by ${maxInside.get()} committers")
    assert(!Files.exists(lock), "lock leaked after the section")
    // No debris files linger either.
    val ls = Files.list(dir)
    try {
      val leftover = ls.iterator()
      val names = collection.mutable.ArrayBuffer[String]()
      while (leftover.hasNext) names += leftover.next().getFileName.toString
      assert(!names.exists(_.startsWith(ManifestSink.LockName)),
        s"lock debris left behind: $names")
    } finally ls.close()
  }

  test("compaction heartbeats the lock so a live holder outlasts the lease") {
    val dir = Files.createTempDirectory("graft_manifest_unit").toString
    val dirPath = Paths.get(dir)
    (1 to 4).foreach { i =>
      Files.write(Paths.get(dir, s"part-0000$i-$i.ndjson"),
        s"""{"id":$i}\n""".getBytes(StandardCharsets.UTF_8))
    }
    ManifestSink.withPublishLock(dirPath) {
      ManifestSink.publishManifest(dirPath, (1 to 4).map(i =>
        StagedFile(s"part-0000$i-$i.ndjson", 1L)), 1L, "t")
    }
    ManifestSink.withPublishLock(dirPath) {
      // Age the lock as if the holder had been working past the lease;
      // the per-bin heartbeat inside compactLocked must refresh it so
      // a concurrent committer's staleness check keeps failing loudly
      // instead of reclaiming a LIVE holder's lock.
      val lock = dirPath.resolve(ManifestSink.LockName)
      Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(0L))
      assert(ManifestSink.compactLocked(dirPath, targetRows = 2L) == 4)
      val age = System.currentTimeMillis -
        Files.getLastModifiedTime(lock).toMillis
      assert(age < 60000L,
        s"lock mtime not refreshed during compaction (age ${age}ms)")
    }
    assert(ManifestSink.committedRowCount(dir) == 4L)
  }

  // --- Optimistic-concurrency DV-drift validation (round-12): a
  // row-level commit whose touched files' deletion vectors changed
  // since its scan must CONFLICT, not silently merge — two concurrent
  // merge-on-read UPDATEs would otherwise both append replacement rows
  // for the same keys, and a CoW rewrite racing a DV delete would
  // resurrect the concurrently deleted rows.

  private def seedFourRows(dir: String, name: String): Unit = {
    val dirPath = Paths.get(dir)
    Files.write(dirPath.resolve(name),
      "{\"id\":1}\n{\"id\":2}\n{\"id\":3}\n{\"id\":4}\n"
        .getBytes(StandardCharsets.UTF_8))
    ManifestSink.withPublishLock(dirPath) {
      ManifestSink.publishManifest(dirPath, Seq(StagedFile(name, 4L)), 1L,
        "seed")
    }
  }

  /** Simulate the concurrent merge-on-read DELETE landing between a
    * rewrite's plan and its swap: the entry keeps its NAME but gains a
    * vector. */
  private def growVector(dir: String, name: String,
      offsets: Array[Long]): String = {
    val dirPath = Paths.get(dir)
    val gen = ManifestSink.committedGeneration(dir)
    val sidecar = ManifestSink.dvSidecarName(name, gen + 1)
    ManifestSink.withPublishLock(dirPath) {
      ManifestSink.writeDvSidecar(dirPath, sidecar, offsets)
      val updated = ManifestSink.committedEntries(dir).map {
        case e if e.name == name =>
          e.copy(dv = Some(sidecar), dvRows = offsets.length.toLong)
        case e => e
      }
      ManifestSink.publishManifest(dirPath, updated, gen + 1, "dv-delete")
    }
    sidecar
  }

  test("CoW commit conflicts when a replaced file's deletion vector drifted since plan") {
    val dir = Files.createTempDirectory("graft_dvdrift_cow").toString
    val name = "part-a.ndjson"
    seedFourRows(dir, name)
    // The rewrite PLANNED against the vector-less entry...
    val planned = Map(name -> (None: Option[String]))
    // ...then a concurrent DV delete landed on the same file name.
    val sidecar = growVector(dir, name, Array(0L))
    val staging = Files.createDirectories(Paths.get(dir, ".staging-qd"))
    Files.write(staging.resolve("part-rw.ndjson"),
      "{\"id\":9}\n".getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException] {
      new ManifestBatchWrite(dir, schema, "qd", truncate = false,
        replaceFilesFn = () => planned)
        .commit(Array(StagedFile("part-rw.ndjson", 1L)))
    }
    assert(e.getMessage.contains("deletion vector changed"), e.getMessage)
    // The conflict left the table untouched (old entry, old vector).
    assert(ManifestSink.committedFiles(dir) == Seq(name))
    assert(ManifestSink.committedEntries(dir).head.dv.contains(sidecar))
    // Re-planned against the CURRENT vector, the same swap goes through.
    new ManifestBatchWrite(dir, schema, "qd", truncate = false,
      replaceFilesFn = () => Map(name -> Some(sidecar)))
      .commit(Array(StagedFile("part-rw.ndjson", 1L)))
    assert(ManifestSink.committedFiles(dir) == Seq("part-rw.ndjson"))
  }

  test("position-delta commit: UPDATE-shaped drift conflicts; pure-DELETE drift merges") {
    val dir = Files.createTempDirectory("graft_dvdrift_delta").toString
    val name = "part-a.ndjson"
    seedFourRows(dir, name)
    // The delta scan read the vector-less file; a concurrent DV delete
    // then landed on the same file name.
    val scannedAtPlan = Map(name -> (None: Option[String]))
    val sidecar = growVector(dir, name, Array(0L))
    // An UPDATE/MERGE-shaped delta (staged replacement rows) must
    // CONFLICT: merging offsets silently would append both commits'
    // replacement rows for the same keys (duplicates).
    val e = intercept[IllegalStateException] {
      new DvDeltaBatchWrite(dir, schema, "qx", Nil, retain = false,
        scannedDvs = () => scannedAtPlan)
        .commit(Array(DvDelta(Map(name -> Array(9L)),
          Seq(StagedFile("part-up.ndjson", 1L)))))
    }
    assert(e.getMessage.contains("deletion vector changed"), e.getMessage)
    assert(ManifestSink.committedEntries(dir).head.dvRows == 1L,
      "failed commit must not have merged its offsets")
    // A PURE DELETE with the same stale snapshot merges instead:
    // position deletes are idempotent and commute (snapshot isolation —
    // racing disjoint DELETEs all land; pinned by the racing-DELETEs
    // IngestSpec test at the SQL layer).
    new DvDeltaBatchWrite(dir, schema, "qy", Nil, retain = false,
      scannedDvs = () => scannedAtPlan)
      .commit(Array(DvDelta(Map(name -> Array(9L)), Nil)))
    val entry = ManifestSink.committedEntries(dir).head
    assert(entry.dvRows == 2L, s"offsets must merge: $entry")
    assert(entry.dv.exists(_ != sidecar), "a new sidecar generation")
    // And an UPDATE-shaped delta whose snapshot IS current commits.
    val staging = Files.createDirectories(Paths.get(dir, ".staging-qz"))
    Files.write(staging.resolve("part-up.ndjson"),
      "{\"id\":9}\n".getBytes(StandardCharsets.UTF_8))
    new DvDeltaBatchWrite(dir, schema, "qz", Nil, retain = false,
      scannedDvs = () => Map(name -> ManifestSink.committedEntries(dir).head.dv))
      .commit(Array(DvDelta(Map(name -> Array(18L)),
        Seq(StagedFile("part-up.ndjson", 1L)))))
    val entries = ManifestSink.committedEntries(dir)
    assert(entries.map(_.name).sorted == Seq(name, "part-up.ndjson"))
    assert(entries.find(_.name == name).get.dvRows == 3L)
  }

  test("compaction drops merged null counts when a member carries a deletion vector") {
    val dir = Files.createTempDirectory("graft_dvcompact_nulls").toString
    val dirPath = Paths.get(dir)
    // f1: 3 physical rows, one null v — and a vector deleting row 0.
    // f2: 2 rows, no nulls, no vector.
    val l1 = Seq("{\"id\":1,\"v\":null}", "{\"id\":2,\"v\":5}", "{\"id\":3,\"v\":6}")
    val l2 = Seq("{\"id\":4,\"v\":7}", "{\"id\":5,\"v\":8}")
    Files.write(dirPath.resolve("part-f1.ndjson"),
      (l1.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    Files.write(dirPath.resolve("part-f2.ndjson"),
      (l2.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    val dv1 = "part-f1.ndjson.dv-g000001"
    ManifestSink.withPublishLock(dirPath) {
      ManifestSink.writeDvSidecar(dirPath, dv1, Array(0L))
      ManifestSink.publishManifest(dirPath, Seq(
        StagedFile("part-f1.ndjson", 3L, nullCounts = Map("id" -> 0L, "v" -> 1L),
          dv = Some(dv1), dvRows = 1L),
        StagedFile("part-f2.ndjson", 2L, nullCounts = Map("id" -> 0L, "v" -> 0L))),
        1L, "seed")
    }
    assert(ManifestSink.compact(dir, targetRows = 100L) == 2)
    val merged = ManifestSink.committedEntries(dir)
    assert(merged.size == 1 && merged.head.rows == 4L,
      s"live rows only after materialization: $merged")
    // Physical null counts paired with a LIVE row total would let
    // mustMatch(IsNull) / mayMatch(IsNotNull) reason incoherently —
    // the counts must stand down entirely for DV'd groups.
    assert(merged.head.nullCounts.isEmpty,
      s"null counts must drop when a member carried a DV: ${merged.head}")

    // Control: a DV-free group keeps the exact summed counts.
    val dir2 = Files.createTempDirectory("graft_compact_nulls").toString
    val dir2Path = Paths.get(dir2)
    Files.write(dir2Path.resolve("part-f1.ndjson"),
      (l1.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    Files.write(dir2Path.resolve("part-f2.ndjson"),
      (l2.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    ManifestSink.withPublishLock(dir2Path) {
      ManifestSink.publishManifest(dir2Path, Seq(
        StagedFile("part-f1.ndjson", 3L, nullCounts = Map("id" -> 0L, "v" -> 1L)),
        StagedFile("part-f2.ndjson", 2L, nullCounts = Map("id" -> 0L, "v" -> 0L))),
        1L, "seed")
    }
    assert(ManifestSink.compact(dir2, targetRows = 100L) == 2)
    assert(ManifestSink.committedEntries(dir2).head.nullCounts ==
      Map("id" -> 0L, "v" -> 1L))
  }

  test("restore to the current generation is a successful no-op") {
    val dir = Files.createTempDirectory("graft_restore_noop").toString
    seedFourRows(dir, "part-a.ndjson")
    // Delta's RESTORE semantics: the table already IS the requested
    // state — return the current generation, publish nothing.
    assert(ManifestSink.restore(dir, 1L) == 1L)
    assert(ManifestSink.committedGeneration(dir) == 1L)
    assert(ManifestSink.committedFiles(dir) == Seq("part-a.ndjson"))
  }
}
