package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Sub-file block stats ([[StagedFile.blocks]]): writer-recorded
  * per-block bounds, manifest round trip, and planner byte-range
  * pruning — plus the row-level-operation safety rule (a copy-on-write
  * rewrite must never block-prune the files it replaces). */
class BlockStatsSpec extends AnyFunSuite with SparkSpec {

  private def catalog(name: String): String = {
    val wh = Files.createTempDirectory(s"graft_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.base", wh)
    wh
  }

  private def scanOf(q: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.datasources.v2.BatchScanExec = {
    q.collect()
    q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
  }

  test("entry round trip: blocks render flat and re-parse exactly") {
    val entry = StagedFile("f.ndjson", 100L,
      Seq(ColStat("id", "0", "99")), 5000L, Map("id" -> 0L),
      blocks = Seq(
        BlockStat(0L, 2500L, 50L, Seq(ColStat("id", "0", "49"))),
        BlockStat(2500L, 5000L, 50L,
          Seq(ColStat("id", "50", "99"), ColStat("x", "1.5", "2.5", hasNan = true)))))
    val back = ManifestSink.parseEntryObj(ManifestSink.renderEntry(entry))
    assert(back.contains(entry), s"$back")
  }

  test("writer records blocks at line boundaries; single-block files carry none") {
    val wh = catalog("gbs1")
    spark.sql("""CREATE TABLE gbs1.t (id BIGINT, v STRING)
      TBLPROPERTIES ('blockbytes'='4096')""")
    spark.range(0, 5000)
      .selectExpr("id", "concat('value-', id) AS v")
      .orderBy("id").coalesce(1).writeTo("gbs1.t").append()
    val entries = ManifestSink.committedEntries(s"$wh/t")
    assert(entries.size == 1)
    val e = entries.head
    assert(e.blocks.size >= 2, s"blocks=${e.blocks.size}")
    // Frames tile the file exactly: contiguous, ascending, summing to
    // the file's bytes and rows.
    assert(e.blocks.head.start == 0L && e.blocks.last.end == e.bytes)
    e.blocks.sliding(2).foreach { case Seq(a, b) =>
      assert(a.end == b.start, s"gap: $a -> $b")
    }
    assert(e.blocks.map(_.rows).sum == e.rows)
    // Sorted input: block id-bounds are disjoint ascending ranges.
    val bounds = e.blocks.map(b =>
      (b.stats.find(_.col == "id").get.min.toLong,
        b.stats.find(_.col == "id").get.max.toLong))
    bounds.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping id bounds: $bounds")
    }
    // A small table (single block at this granularity) records none.
    spark.sql("""CREATE TABLE gbs1.small (id BIGINT)
      TBLPROPERTIES ('blockbytes'='1048576')""")
    spark.range(0, 10).coalesce(1).writeTo("gbs1.small").append()
    assert(ManifestSink.committedEntries(s"$wh/small").head.blocks.isEmpty)
    spark.sql("DROP TABLE gbs1.t"); spark.sql("DROP TABLE gbs1.small")
  }

  test("block pruning: a point lookup on a sorted big file plans a " +
      "fraction of its byte ranges; results stay exact") {
    val wh = catalog("gbs2")
    spark.sql("""CREATE TABLE gbs2.t (id BIGINT, v STRING)
      TBLPROPERTIES ('blockbytes'='4096')""")
    spark.range(0, 20000)
      .selectExpr("id", "concat('value-', id) AS v")
      .orderBy("id").coalesce(1).writeTo("gbs2.t").append()
    val blockCount =
      ManifestSink.committedEntries(s"$wh/t").head.blocks.size
    assert(blockCount >= 20, s"blockCount=$blockCount")
    // Unfiltered scan plans the whole file (legacy single partition).
    val full = scanOf(spark.sql("SELECT * FROM gbs2.t"))
    assert(full.inputRDD.getNumPartitions == 1)
    // A point lookup plans exactly the holding block.
    val point = spark.sql("SELECT v FROM gbs2.t WHERE id = 12345")
    val pScan = scanOf(point)
    assert(pScan.inputRDD.getNumPartitions == 1)
    assert(point.collect().map(_.getString(0)).toSeq == Seq("value-12345"))
    // A range over ~10% of the ids plans ~10% of the blocks.
    val range = spark.sql(
      "SELECT count(*) AS n, sum(id) AS s FROM gbs2.t " +
        "WHERE id BETWEEN 5000 AND 6999")
    assert(range.head() == org.apache.spark.sql.Row(2000L,
      (5000L to 6999L).sum))
    // The aggregate runs under AQE: the scan hides inside query stages.
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.collect {
        case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(st.plan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
      }.flatten
    val rScan = (range.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case p => scans(p)
    }).head
    val planned = rScan.inputRDD.getNumPartitions
    assert(planned < blockCount / 4, s"planned=$planned of $blockCount")
    // Boundary exactness: every id accounted for exactly once across
    // adjacent-block boundaries.
    assert(spark.sql("SELECT count(DISTINCT id) FROM gbs2.t")
      .head().getLong(0) == 20000L)
    spark.sql("DROP TABLE gbs2.t")
  }

  test("block pruning composes with deletion vectors and equality deletes") {
    val wh = catalog("gbs3")
    spark.sql("""CREATE TABLE gbs3.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('blockbytes'='2048', 'deletionvectors'='true')""")
    spark.range(0, 8000).selectExpr("id", "id * 3 AS v")
      .orderBy("id").coalesce(1).writeTo("gbs3.t").append()
    spark.sql("DELETE FROM gbs3.t WHERE id = 4100")
    import spark.implicits._
    ManifestOps.equalityDelete(s"$wh/t", Seq(4200L).toDF("id"))
    val got = spark.sql(
      "SELECT id FROM gbs3.t WHERE id BETWEEN 4000 AND 4999 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == (4000L to 4999L).filterNot(i => i == 4100L || i == 4200L),
      s"n=${got.size}")
    spark.sql("DROP TABLE gbs3.t")
  }

  test("row-level rewrite safety: UPDATE on a blocked table keeps every row") {
    catalog("gbs4")
    spark.sql("""CREATE TABLE gbs4.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('blockbytes'='2048')""")
    spark.range(0, 8000).selectExpr("id", "id AS v")
      .orderBy("id").coalesce(1).writeTo("gbs4.t").append()
    // Copy-on-write UPDATE with a pushable condition: the rewrite must
    // read the WHOLE file it replaces — block pruning here would drop
    // every row outside the matching block.
    spark.sql("UPDATE gbs4.t SET v = -1 WHERE id = 4321")
    assert(spark.sql("SELECT count(*) FROM gbs4.t").head().getLong(0) == 8000L)
    assert(spark.sql("SELECT v FROM gbs4.t WHERE id = 4321").head().getLong(0)
      == -1L)
    assert(spark.sql("SELECT sum(v) FROM gbs4.t").head().getLong(0)
      == (0L until 8000L).sum - 4321L - 1L)
    spark.sql("DROP TABLE gbs4.t")
  }

  test("raw-concat compaction CARRIES blocks with shifted offsets — " +
      "plain and zstd; re-rendering drops them") {
    // Plain: four sorted small files merge into one; the compacted
    // entry keeps per-member (and per-block) bounds, so a point lookup
    // still prunes INSIDE the merged file.
    val wh = catalog("gbs6")
    spark.sql("""CREATE TABLE gbs6.t (id BIGINT, v STRING)
      TBLPROPERTIES ('blockbytes'='4096')""")
    (0 until 4).foreach(k =>
      spark.range(k * 4000, (k + 1) * 4000)
        .selectExpr("id", "concat('p', id, repeat('x', 20)) AS v")
        .orderBy("id").coalesce(1).writeTo("gbs6.t").append())
    spark.sql("CALL gbs6.system.compact('t', 1000000)")
    val e = ManifestSink.committedEntries(s"$wh/t").head
    assert(ManifestSink.committedEntries(s"$wh/t").size == 1)
    assert(e.blocks.size >= 8, s"carried blocks: ${e.blocks.size}")
    // Offsets are contiguous, line-aligned, covering the whole file.
    assert(e.blocks.head.start == 0L)
    assert(e.blocks.sliding(2).forall {
      case Seq(a, b) => a.end == b.start; case _ => true })
    assert(e.blocks.last.end == e.bytes) // plain: logical == physical
    // Point lookup after compaction: one planned block group.
    val q = spark.sql("SELECT v FROM gbs6.t WHERE id = 9001")
    assert(q.rdd.getNumPartitions == 1)
    assert(q.head().getString(0).startsWith("p9001"))
    assert(spark.sql("SELECT CAST(sum(id) AS BIGINT) FROM gbs6.t")
      .head().getLong(0) == (0L until 16000L).sum)
    spark.sql("DROP TABLE gbs6.t")

    // zstd: carried blocks keep BOTH domains (logical + frame offsets);
    // the merged file still splits and prunes.
    val wh2 = catalog("gbs7")
    spark.sql("""CREATE TABLE gbs7.t (id BIGINT, v STRING)
      TBLPROPERTIES ('codec'='zstd', 'blockbytes'='4096')""")
    (0 until 3).foreach(k =>
      spark.range(k * 4000, (k + 1) * 4000)
        .selectExpr("id", "concat('z', id, repeat('y', 20)) AS v")
        .orderBy("id").coalesce(1).writeTo("gbs7.t").append())
    spark.sql("CALL gbs7.system.compact('t', 1000000)")
    val z = ManifestSink.committedEntries(s"$wh2/t").head
    assert(z.codec == "zstd" && z.blocks.size >= 6)
    assert(z.blocks.forall(_.physStart >= 0))
    assert(z.blocks.map(_.physStart) == z.blocks.map(_.physStart).sorted)
    assert(z.blocks.last.physStart < z.bytes)
    val zq = spark.sql("SELECT v FROM gbs7.t WHERE id = 8500")
    assert(zq.rdd.getNumPartitions == 1)
    assert(zq.head().getString(0).startsWith("z8500"))
    // Sub-block split read of the compacted file: rows exact.
    val sch = spark.table("gbs7.t").schema
    assert(spark.read.format("graft.sources.ManifestSink").schema(sch)
      .option("path", s"$wh2/t").option("maxsplitbytes", "2048").load()
      .selectExpr("CAST(sum(id) AS BIGINT)").head().getLong(0)
      == (0L until 12000L).sum)
    spark.sql("DROP TABLE gbs7.t")

    // Re-rendering path (DV materialization): the carry must DROP.
    val wh3 = catalog("gbs8")
    spark.sql("""CREATE TABLE gbs8.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('blockbytes'='2048', 'deletionvectors'='true')""")
    (0 until 2).foreach(k =>
      spark.range(k * 4000, (k + 1) * 4000).selectExpr("id", "id AS v")
        .orderBy("id").coalesce(1).writeTo("gbs8.t").append())
    spark.sql("DELETE FROM gbs8.t WHERE id IN (5, 4005)")
    spark.sql("CALL gbs8.system.compact('t', 1000000)")
    val d = ManifestSink.committedEntries(s"$wh3/t").head
    assert(d.blocks.isEmpty, "re-rendered compaction must not carry blocks")
    assert(spark.sql("SELECT count(*) FROM gbs8.t").head().getLong(0) == 7998L)
    spark.sql("DROP TABLE gbs8.t")
  }

  test("blockbytes=0 disables block recording") {
    val wh = catalog("gbs5")
    spark.sql("""CREATE TABLE gbs5.t (id BIGINT, v STRING)
      TBLPROPERTIES ('blockbytes'='0')""")
    spark.range(0, 5000).selectExpr("id", "concat('v', id) AS v")
      .orderBy("id").coalesce(1).writeTo("gbs5.t").append()
    assert(ManifestSink.committedEntries(s"$wh/t").head.blocks.isEmpty)
    spark.sql("DROP TABLE gbs5.t")
  }
}
