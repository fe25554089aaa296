package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Data-file compression (`codec` table property): gzip'd NDJSON with
  * logical-offset row identity — DVs, `_pos`, equality deletes,
  * compaction (raw gzip-member concat AND transcode), sorted merges,
  * time travel and codec flips mid-life all compose. */
class CodecSpec extends AnyFunSuite with SparkSpec {

  private def catalog(name: String): String = {
    val wh = Files.createTempDirectory(s"graft_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.base", wh)
    wh
  }

  private def magic(dir: String, name: String, bytes: Int*): Boolean = {
    val in = Files.newInputStream(Paths.get(dir, name))
    try bytes.forall(b => in.read() == b) finally in.close()
  }
  private def gzipped(dir: String, name: String): Boolean =
    magic(dir, name, 0x1f, 0x8b)
  private def zstdded(dir: String, name: String): Boolean =
    magic(dir, name, 0x28, 0xb5, 0x2f, 0xfd)

  test("gzip round trip: bytes shrink, rows and filters read back exactly") {
    val wh = catalog("gcz1")
    spark.sql("""CREATE TABLE gcz1.t (id BIGINT, v STRING)
      TBLPROPERTIES ('codec'='gzip')""")
    spark.range(0, 20000)
      .selectExpr("id", "concat('payload-', id, '-', repeat('ab', 40)) AS v")
      .coalesce(1).writeTo("gcz1.t").append()
    val e = ManifestSink.committedEntries(s"$wh/t").head
    assert(e.codec == "gzip" && gzipped(s"$wh/t", e.name))
    // Repetitive text deflates hard; the entry records COMPRESSED size.
    assert(e.bytes < 2L * 1024 * 1024 / 4, s"bytes=${e.bytes}")
    assert(spark.sql("SELECT count(*), sum(id) FROM gcz1.t").head() ==
      org.apache.spark.sql.Row(20000L, (0L until 20000L).sum))
    assert(spark.sql("SELECT v FROM gcz1.t WHERE id = 777").head().getString(0)
      .startsWith("payload-777-"))
    // Stats pruning still works (bounds are codec-independent).
    spark.range(20000, 40000)
      .selectExpr("id", "concat('x', id) AS v").coalesce(1)
      .writeTo("gcz1.t").append()
    val q = spark.sql("SELECT count(*) FROM gcz1.t WHERE id >= 30000")
    assert(q.head().getLong(0) == 10000L)
    spark.sql("DROP TABLE gcz1.t")
  }

  test("logical-offset row identity: DVs and equality deletes apply " +
      "inside compressed files; compaction materializes both") {
    val wh = catalog("gcz2")
    spark.sql("""CREATE TABLE gcz2.t (id BIGINT, v STRING)
      TBLPROPERTIES ('codec'='gzip', 'deletionvectors'='true')""")
    spark.range(0, 5000).selectExpr("id", "concat('v', id) AS v")
      .coalesce(1).writeTo("gcz2.t").append()
    spark.sql("DELETE FROM gcz2.t WHERE id IN (17, 4017)") // DV (positional)
    import spark.implicits._
    ManifestOps.equalityDelete(s"$wh/t", Seq(23L, 4023L).toDF("id"))
    def survivors(): Set[Long] = spark.sql("SELECT id FROM gcz2.t")
      .collect().map(_.getLong(0)).toSet
    val expect = (0L until 5000L).toSet -- Set(17L, 4017L, 23L, 4023L)
    assert(survivors() == expect)
    // UPDATE through the merge-on-read DV path on a compressed file.
    spark.sql("UPDATE gcz2.t SET v = 'patched' WHERE id = 100")
    assert(spark.sql("SELECT v FROM gcz2.t WHERE id = 100").head()
      .getString(0) == "patched")
    // Compaction: gzip members transcode/concat; deletes materialize.
    spark.sql("CALL gcz2.system.compact('t', 1000000)")
    val entries = ManifestSink.committedEntries(s"$wh/t")
    assert(entries.size == 1 && entries.head.codec == "gzip" &&
      gzipped(s"$wh/t", entries.head.name))
    assert(survivors() == expect)
    assert(ManifestSink.committedEqDeleteNames(s"$wh/t").isEmpty)
    spark.sql("DROP TABLE gcz2.t")
  }

  test("codec flip mid-life: mixed files coexist; compaction converges " +
      "to the current codec") {
    val wh = catalog("gcz3")
    spark.sql("CREATE TABLE gcz3.t (id BIGINT, v STRING)")
    spark.range(0, 1000).selectExpr("id", "concat('a', id) AS v")
      .coalesce(1).writeTo("gcz3.t").append() // plain
    spark.sql("ALTER TABLE gcz3.t SET TBLPROPERTIES ('codec'='gzip')")
    spark.range(1000, 2000).selectExpr("id", "concat('b', id) AS v")
      .coalesce(1).writeTo("gcz3.t").append() // gzip
    val codecs = ManifestSink.committedEntries(s"$wh/t").map(_.codec).sorted
    assert(codecs == Seq("", "gzip"), codecs.toString)
    assert(spark.sql("SELECT count(*), sum(id) FROM gcz3.t").head() ==
      org.apache.spark.sql.Row(2000L, (0L until 2000L).sum))
    // Compaction transcodes the plain member into the table's codec.
    spark.sql("CALL gcz3.system.compact('t', 1000000)")
    val merged = ManifestSink.committedEntries(s"$wh/t")
    assert(merged.size == 1 && merged.head.codec == "gzip" &&
      gzipped(s"$wh/t", merged.head.name))
    assert(spark.sql("SELECT count(*), sum(id) FROM gcz3.t").head() ==
      org.apache.spark.sql.Row(2000L, (0L until 2000L).sum))
    // Unknown codecs refuse loudly at the catalog boundary.
    intercept[Exception](spark.sql(
      "ALTER TABLE gcz3.t SET TBLPROPERTIES ('codec'='brotli')"))
    intercept[Exception](spark.sql(
      "CREATE TABLE gcz3.bad (id BIGINT) TBLPROPERTIES ('codec'='lz4')"))
    spark.sql("DROP TABLE gcz3.t")
  }

  test("sorted-merge compaction on compressed sorted files keeps the stamp") {
    val wh = catalog("gcz4")
    spark.sql("""CREATE TABLE gcz4.t (ts BIGINT, v BIGINT)
      TBLPROPERTIES ('codec'='gzip')""")
    spark.range(0, 500).selectExpr("id * 2 AS ts", "id AS v")
      .coalesce(1).sortWithinPartitions("ts")
      .writeTo("gcz4.t").option("sortBy", "ts").append()
    spark.range(0, 500).selectExpr("id * 2 + 1 AS ts", "id AS v")
      .coalesce(1).sortWithinPartitions("ts")
      .writeTo("gcz4.t").option("sortBy", "ts").append()
    spark.sql("CALL gcz4.system.compact('t', 1000000)")
    val e = ManifestSink.committedEntries(s"$wh/t")
    assert(e.size == 1 && e.head.sorted == Seq("ts") && e.head.codec == "gzip")
    val got = spark.sql("SELECT ts FROM gcz4.t").collect()
      .map(_.getLong(0)).toSeq
    assert(got == (0L until 1000L), "merged compressed file lost sort order")
    spark.sql("DROP TABLE gcz4.t")
  }

  test("zstd: round trip, deletes inside frames, gzip->zstd transcode " +
      "compaction, multi-frame concat") {
    val wh = catalog("gcz6")
    spark.sql("""CREATE TABLE gcz6.t (id BIGINT, v STRING)
      TBLPROPERTIES ('codec'='gzip', 'deletionvectors'='true')""")
    spark.range(0, 2000).selectExpr("id", "concat('g', id) AS v")
      .coalesce(1).writeTo("gcz6.t").append() // gzip era
    spark.sql("ALTER TABLE gcz6.t SET TBLPROPERTIES ('codec'='zstd')")
    spark.range(2000, 4000).selectExpr("id", "concat('z', id) AS v")
      .coalesce(1).writeTo("gcz6.t").append() // zstd era
    val eras = ManifestSink.committedEntries(s"$wh/t")
      .map(e => e.codec -> (e.codec match {
        case "gzip" => gzipped(s"$wh/t", e.name)
        case "zstd" => zstdded(s"$wh/t", e.name)
        case _ => false
      })).toMap
    assert(eras == Map("gzip" -> true, "zstd" -> true), eras.toString)
    spark.sql("DELETE FROM gcz6.t WHERE id IN (7, 2007)") // DV in both eras
    import spark.implicits._
    ManifestOps.equalityDelete(s"$wh/t", Seq(11L, 2011L).toDF("id"))
    val expect = (0L until 4000L).toSet -- Set(7L, 2007L, 11L, 2011L)
    def survivors(): Set[Long] = spark.sql("SELECT id FROM gcz6.t")
      .collect().map(_.getLong(0)).toSet
    assert(survivors() == expect)
    // Compaction transcodes the gzip member into zstd and concats —
    // the merged file is a valid multi-frame zstd stream.
    spark.sql("CALL gcz6.system.compact('t', 1000000)")
    val merged = ManifestSink.committedEntries(s"$wh/t")
    assert(merged.size == 1 && merged.head.codec == "zstd" &&
      zstdded(s"$wh/t", merged.head.name))
    assert(survivors() == expect)
    // A second zstd append then a re-compaction exercises the raw
    // frame-concat fast path (zstd-to-zstd, no deletes pending).
    spark.range(4000, 5000).selectExpr("id", "concat('y', id) AS v")
      .coalesce(1).writeTo("gcz6.t").append()
    spark.sql("CALL gcz6.system.compact('t', 1000000)")
    assert(spark.sql("SELECT count(*), sum(id) FROM gcz6.t").head() ==
      org.apache.spark.sql.Row(expect.size + 1000L,
        expect.sum + (4000L until 5000L).sum))
    spark.sql("DROP TABLE gcz6.t")
  }

  // ---------- seekable compressed files (frame-aligned blocks) ----------

  private def readOpt(wh: String, cat: String, split: Long) = {
    val sch = spark.table(s"$cat.t").schema
    spark.read.format("graft.sources.ManifestSink").schema(sch)
      .option("path", s"$wh/t").option("maxsplitbytes", split.toString).load()
  }

  test("zstd seekable: frame-aligned blocks give back split reads — " +
      "any split size, same rows") {
    val wh = catalog("gcz7")
    spark.sql("""CREATE TABLE gcz7.t (id BIGINT, v STRING)
      TBLPROPERTIES ('codec'='zstd', 'blockbytes'='4096')""")
    spark.range(0, 8000)
      .selectExpr("id", "concat('payload-', id, '-', repeat('xy', 20)) AS v")
      .orderBy("id").coalesce(1).writeTo("gcz7.t").append()
    val e = ManifestSink.committedEntries(s"$wh/t").head
    assert(e.codec == "zstd" && e.blocks.size >= 2, s"blocks=${e.blocks.size}")
    assert(e.blocks.forall(_.physStart >= 0))
    assert(e.blocks.head.physStart == 0)
    // Physical offsets strictly increase and stay inside the file.
    val phys = e.blocks.map(_.physStart)
    assert(phys == phys.sorted && phys.distinct == phys)
    assert(phys.last < Files.size(Paths.get(s"$wh/t", e.name)))
    val expect = spark.sql("SELECT count(*), sum(id), sum(length(v)) FROM gcz7.t").head()
    // Sweep split sizes across frame boundaries: one unsplit read, the
    // block granularity, sub-block, and a giant split — identical rows.
    for (split <- Seq(1024L, 4096L, 16384L, 1L << 30)) {
      val df = readOpt(wh, "gcz7", split)
      val got = df.selectExpr("count(*)", "sum(id)", "sum(length(v))").head()
      assert(got == expect, s"split=$split: $got != $expect")
    }
    // Small splits actually fan out (one partition per block group).
    assert(readOpt(wh, "gcz7", 4096L).rdd.getNumPartitions >= 2)
    spark.sql("DROP TABLE gcz7.t")
  }

  test("gzip seekable: member-per-block files split and decode from " +
      "member boundaries") {
    val wh = catalog("gcz8")
    spark.sql("""CREATE TABLE gcz8.t (id BIGINT, v STRING)
      TBLPROPERTIES ('codec'='gzip', 'blockbytes'='4096')""")
    spark.range(0, 6000).selectExpr("id", "concat('g', id, repeat('q', 30)) AS v")
      .orderBy("id").coalesce(1).writeTo("gcz8.t").append()
    val e = ManifestSink.committedEntries(s"$wh/t").head
    assert(e.codec == "gzip" && e.blocks.size >= 2 &&
      e.blocks.forall(_.physStart >= 0))
    // Every recorded physStart sits on a gzip member header (1f 8b).
    val bytes = Files.readAllBytes(Paths.get(s"$wh/t", e.name))
    e.blocks.foreach { b =>
      assert((bytes(b.physStart.toInt) & 0xff) == 0x1f &&
        (bytes(b.physStart.toInt + 1) & 0xff) == 0x8b,
        s"physStart ${b.physStart} is not a member boundary")
    }
    val expect = spark.sql("SELECT count(*), sum(id) FROM gcz8.t").head()
    for (split <- Seq(2048L, 8192L, 1L << 30))
      assert(readOpt(wh, "gcz8", split)
        .selectExpr("count(*)", "sum(id)").head() == expect, s"split=$split")
    assert(readOpt(wh, "gcz8", 2048L).rdd.getNumPartitions >= 2)
    spark.sql("DROP TABLE gcz8.t")
  }

  test("compressed block pruning: a point lookup in a sorted zstd file " +
      "plans one block group, not the file") {
    val wh = catalog("gcz9")
    spark.sql("""CREATE TABLE gcz9.t (id BIGINT, v STRING)
      TBLPROPERTIES ('codec'='zstd', 'blockbytes'='4096')""")
    spark.range(0, 8000).selectExpr("id", "concat('p', id, repeat('w', 30)) AS v")
      .orderBy("id").coalesce(1).writeTo("gcz9.t").append()
    val blocks = ManifestSink.committedEntries(s"$wh/t").head.blocks
    assert(blocks.size >= 3)
    // Point lookup: exactly one planned partition (the surviving block).
    val q = spark.sql("SELECT v FROM gcz9.t WHERE id = 6100")
    assert(q.rdd.getNumPartitions == 1)
    assert(q.head().getString(0).startsWith("p6100"))
    // Range crossing one boundary: fewer partitions than blocks, result exact.
    val r = spark.sql(
      "SELECT count(*), sum(id) FROM gcz9.t WHERE id >= 1000 AND id < 1200")
    assert(r.head() == org.apache.spark.sql.Row(200L, (1000L until 1200L).sum))
    spark.sql("DROP TABLE gcz9.t")
  }

  test("row identity survives frame-aligned range reads: DVs and " +
      "equality deletes inside a multi-frame zstd file") {
    val wh = catalog("gcz10")
    spark.sql("""CREATE TABLE gcz10.t (id BIGINT, v STRING)
      TBLPROPERTIES ('codec'='zstd', 'blockbytes'='4096',
      'deletionvectors'='true')""")
    spark.range(0, 6000).selectExpr("id", "concat('r', id, repeat('e', 30)) AS v")
      .orderBy("id").coalesce(1).writeTo("gcz10.t").append()
    assert(ManifestSink.committedEntries(s"$wh/t").head.blocks.size >= 2)
    spark.sql("DELETE FROM gcz10.t WHERE id IN (5, 3005, 5995)") // DV offsets
    import spark.implicits._
    ManifestOps.equalityDelete(s"$wh/t", Seq(9L, 3009L).toDF("id"))
    val expect = (0L until 6000L).toSet -- Set(5L, 3005L, 5995L, 9L, 3009L)
    // Sub-block splits: every range read must apply the same vectors
    // against the same logical offsets.
    for (split <- Seq(2048L, 1L << 30)) {
      val got = readOpt(wh, "gcz10", split).select("id").collect()
        .map(_.getLong(0)).toSet
      assert(got == expect, s"split=$split lost row identity")
    }
    spark.sql("DROP TABLE gcz10.t")
  }

  test("streaming epoch writes honor the codec") {
    val wh = catalog("gcz5")
    spark.sql("""CREATE TABLE gcz5.t (id BIGINT, v STRING)
      TBLPROPERTIES ('codec'='gzip')""")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Long]
    src.addData(0L until 100L: _*)
    val q = src.toDF().selectExpr("value AS id", "concat('s', value) AS v")
      .writeStream.format("graft.sources.ManifestSink")
      .option("path", s"$wh/t")
      .option("checkpointLocation",
        Files.createTempDirectory("gcz5_ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val entries = ManifestSink.committedEntries(s"$wh/t")
    assert(entries.nonEmpty && entries.forall(_.codec == "gzip"),
      entries.map(e => e.name -> e.codec).toString)
    assert(spark.sql("SELECT count(*) FROM gcz5.t").head().getLong(0) == 100L)
    spark.sql("DROP TABLE gcz5.t")
  }
}
