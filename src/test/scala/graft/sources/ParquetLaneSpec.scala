package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The COLUMNAR PAYLOAD LANE (`filekind='parquet'`): parquet data files
  * inside the same manifest/committer machinery — committed atomically,
  * pruned by the same manifest stats, deleted via ordinal-keyed DVs and
  * equality deletes, evolving schemas like the NDJSON kind, coexisting
  * with NDJSON files in one table. See GraftParquet.scala. */
class ParquetLaneSpec extends AnyFunSuite with SparkSpec {

  private var n = 0
  private def catalog(): (String, String) = {
    n += 1
    val cat = s"gpq$n"
    val wh = Files.createTempDirectory(s"graft_$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    (cat, wh)
  }

  test("round trip through the committer: payload files are parquet, " +
      "manifest carries stats/nulls, all types survive") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, s STRING, d DOUBLE,
      ts TIMESTAMP, day DATE, bin BINARY, vec ARRAY<DOUBLE>,
      u STRUCT<a: BIGINT, b: STRING>)
      TBLPROPERTIES ('filekind'='parquet')""")
    spark.sql("""SELECT CAST(1 AS BIGINT) AS id, 'x "q"\ny' AS s,
        1.5D AS d, TIMESTAMP'2024-03-01 10:00:00' AS ts,
        DATE'2024-03-01' AS day, X'0102' AS bin,
        array(1.0D, 2.0D) AS vec, named_struct('a', 7L, 'b', 'bb') AS u
      UNION ALL
      SELECT 2L, NULL, CAST('NaN' AS DOUBLE), NULL, NULL, NULL, NULL,
        NULL""").coalesce(1).writeTo(s"$cat.t").append()
    val e = ManifestSink.committedEntries(s"$wh/t")
    assert(e.size == 1 && e.forall(_.name.endsWith(".parquet")), e.map(_.name))
    assert(e.map(_.rows).sum == 2)
    // Manifest stats recorded for orderable top-level columns; NaN
    // flagged on d; null counts tracked.
    val all = e.flatMap(_.stats)
    assert(all.exists(s => s.col == "id" && s.min == "1" && s.max == "2"),
      all.toString)
    assert(all.find(_.col == "d").exists(s => s.hasNan && s.min == "1.5"))
    assert(e.flatMap(_.nullCounts.get("s")).sum == 1)
    val r = spark.sql(s"SELECT * FROM $cat.t ORDER BY id").collect()
    assert(r(0).getString(1) == "x \"q\"\ny")
    assert(r(0).getAs[java.sql.Date](4).toString == "2024-03-01")
    assert(r(0).getSeq[Double](6) == Seq(1.0, 2.0))
    assert(r(0).getStruct(7) == Row(7L, "bb"))
    assert(r(1).isNullAt(1) && r(1).getDouble(2).isNaN && r(1).isNullAt(7))
  }

  test("manifest stats prune parquet files from the plan; metadata " +
      "min/max folds with zero data bytes") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('filekind'='parquet')""")
    Seq(0L, 1000L).foreach(base =>
      spark.range(base, base + 100)
        .selectExpr("id", "id * 2 AS v").coalesce(1)
        .writeTo(s"$cat.t").append())
    assert(ManifestSink.committedEntries(s"$wh/t").size == 2)
    val q = spark.sql(s"SELECT v FROM $cat.t WHERE id >= 1050")
    assert(q.rdd.getNumPartitions == 1, "file skipping must prune one file")
    assert(q.collect().map(_.getLong(0)).sum == (1050L until 1100L).map(_ * 2).sum)
    // Metadata-only aggregate from manifest bounds.
    val agg = spark.sql(s"SELECT min(id) AS lo, max(id) AS hi FROM $cat.t")
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      agg.queryExecution.executedPlan.toString)
    assert(agg.head() == Row(0L, 1099L))
    // COUNT(*) needs no parquet columns: zero-column metadata path.
    assert(spark.table(s"$cat.t").count() == 200L)
  }

  test("row-level DML: DELETE via ordinal-keyed deletion vectors, " +
      "UPDATE, time travel, equality deletes") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('filekind'='parquet', 'retainhistory'='true',
        'deletionvectors'='true')""")
    spark.range(100).selectExpr("id", "id AS v").coalesce(1)
      .writeTo(s"$cat.t").append()
    spark.sql(s"DELETE FROM $cat.t WHERE id % 10 = 3")
    assert(spark.table(s"$cat.t").count() == 90)
    assert(spark.sql(s"SELECT CAST(sum(v) AS BIGINT) FROM $cat.t").head()
      .getLong(0) == (0L until 100L).filter(_ % 10 != 3).sum)
    // The delete took the DV path: the parquet file is NOT rewritten,
    // the vector records ROW ORDINALS (this kind's _pos domain).
    val e = ManifestSink.committedEntries(s"$wh/t")
    assert(e.exists(_.dv.isDefined), e.toString)
    spark.sql(s"UPDATE $cat.t SET v = v * 10 WHERE id = 50")
    assert(spark.sql(s"SELECT v FROM $cat.t WHERE id = 50").head()
      .getLong(0) == 500L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 1")
      .head().getLong(0) == 100L)
    // Equality delete (tombstone commit) applies to parquet files.
    ManifestOps.equalityDelete(s"$wh/t",
      spark.range(1).selectExpr("CAST(7 AS BIGINT) AS id"))
    assert(spark.table(s"$cat.t").count() == 89)
    assert(!spark.sql(s"SELECT * FROM $cat.t WHERE id = 7").collect()
      .exists(_ => true))
  }

  test("schema evolution: added column reads null/default, widen " +
      "INT->BIGINT upcasts at read, rename resolves old footers") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id INT, v INT)
      TBLPROPERTIES ('filekind'='parquet', 'mergeschema'='true')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10), (2, 20)")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN extra STRING")
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN v TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN id TO doc_id")
    spark.sql(s"INSERT INTO $cat.t VALUES (3, CAST(30 AS BIGINT), 'e3')")
    val r = spark.sql(
      s"SELECT doc_id, v, extra FROM $cat.t ORDER BY doc_id").collect()
    assert(r.map(x => (x.getInt(0), x.getLong(1),
        if (x.isNullAt(2)) null else x.getString(2))).toSeq ==
      Seq((1, 10L, null), (2, 20L, null), (3, 30L, "e3")))
    // Predicate on the renamed, widened columns still prunes/filters.
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE v >= 20").head()
      .getLong(0) == 2L)
  }

  test("kinds coexist in one table: NDJSON files written before the " +
      "property flip and parquet files after scan as one table") {
    val (cat, wh) = catalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v BIGINT)")
    spark.range(50).selectExpr("id", "id AS v").coalesce(1)
      .writeTo(s"$cat.t").append()
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('filekind'='parquet')")
    spark.range(50, 100).selectExpr("id", "id AS v").coalesce(1)
      .writeTo(s"$cat.t").append()
    val kinds = ManifestSink.committedEntries(s"$wh/t")
      .map(e => e.name.endsWith(".parquet")).toSet
    assert(kinds == Set(true, false), "both kinds expected")
    assert(spark.sql(s"SELECT CAST(sum(v) AS BIGINT) FROM $cat.t").head()
      .getLong(0) == (0L until 100L).sum)
    // Compaction leaves parquet entries untouched (raw concat is
    // NDJSON-only), and the table still reads correctly after it.
    ManifestSink.compact(s"$wh/t", 1000L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 100L)
  }

  test("leaf-keyed equality delete on the parquet kind: dotted path " +
      "extracts from the vectorized row, seq semantics hold") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (row_id BIGINT,
      profile STRUCT<doc_id: BIGINT, lang: STRING>)
      TBLPROPERTIES ('filekind'='parquet')""")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
      named_struct('doc_id', id + 100, 'lang', 'en') FROM range(10)""")
    ManifestOps.equalityDelete(s"$wh/t",
      spark.createDataFrame(Seq(Tuple1(103L), Tuple1(107L)))
        .toDF("profile.doc_id"))
    assert(spark.table(s"$cat.t").count() == 8)
    assert(spark.sql(
        s"SELECT count(*) FROM $cat.t WHERE profile.doc_id IN (103, 107)")
      .head().getLong(0) == 0)
    // Later re-insert survives the earlier tombstone.
    spark.sql(s"""INSERT INTO $cat.t VALUES
      (3, named_struct('doc_id', 103L, 'lang', 'de'))""")
    assert(spark.sql(
        s"SELECT profile.lang FROM $cat.t WHERE profile.doc_id = 103")
      .collect().map(_.getString(0)).toSeq == Seq("de"))
  }

  test("array/map-keyed equality delete hits parquet files: the key " +
      "text matches the NDJSON parse of the same value (JsonRaw, not " +
      "JsonTok) so deletes land on both kinds of one table") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, tags ARRAY<STRING>,
      attrs MAP<STRING, BIGINT>)""")
    // First half lands as NDJSON, second half as parquet: the delete
    // key text must agree across both renderings.
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
      array(concat('t', CAST(id % 5 AS STRING))),
      map('g', id % 5) FROM range(10)""")
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('filekind'='parquet')")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
      array(concat('t', CAST(id % 5 AS STRING))),
      map('g', id % 5) FROM range(10, 20)""")
    val kinds = ManifestSink.committedEntries(s"$wh/t")
      .map(_.name.endsWith(".parquet")).toSet
    assert(kinds == Set(true, false), "both kinds expected")
    // Array-keyed tombstone: ids with id % 5 == 3 carry tags=['t3'] —
    // two NDJSON rows (3, 8) and two parquet rows (13, 18).
    ManifestOps.equalityDelete(s"$wh/t",
      spark.sql("SELECT array('t3') AS tags"))
    assert(spark.table(s"$cat.t").count() == 16)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t " +
      "WHERE array_contains(tags, 't3')").head().getLong(0) == 0)
    // Map-keyed tombstone removes the id % 5 == 1 stratum on both kinds.
    ManifestOps.equalityDelete(s"$wh/t",
      spark.sql("SELECT map('g', CAST(1 AS BIGINT)) AS attrs"))
    assert(spark.table(s"$cat.t").count() == 12)
    assert(spark.sql(s"SELECT CAST(sum(id) AS BIGINT) FROM $cat.t").head()
      .getLong(0) == (0L until 20L)
        .filter(i => i % 5 != 3 && i % 5 != 1).sum)
  }

  test("compose capstone: splits + ordinal DVs + leaf blooms + " +
      "eqdeletes + compaction on ONE parquet table return bit-identical " +
      "rows before and after compaction, at any split size") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<k: BIGINT, s: STRING>)
      TBLPROPERTIES ('filekind'='parquet', 'bloomcolumns'='u.k',
        'deletionvectors'='true')""")
    def insert(lo: Long, hi: Long): Unit =
      spark.range(lo, hi).selectExpr("id",
          "named_struct('k', id * 7, 's', concat('v', id)) AS u")
        .coalesce(1).writeTo(s"$cat.t").append()
    insert(0, 400); insert(400, 800)            // gens 1-2
    spark.sql(s"DELETE FROM $cat.t WHERE id % 10 = 3") // gen 3: DVs
    import spark.implicits._
    ManifestOps.equalityDelete(s"$wh/t",
      Seq(7L, 777L, 2345L).map(_ * 7).toDF("u.k")) // gen 4: leaf keys
    insert(800, 1000); insert(1000, 1200); insert(1200, 1400) // gens 5-7
    val before = spark.table(s"$cat.t").orderBy("id").collect()
    // Pre-compaction sanity: DVs exist, blooms recorded, deletes landed.
    val pre = ManifestSink.committedEntries(s"$wh/t")
    assert(pre.count(_.dv.isDefined) == 2, pre.map(e => e.name -> e.dv))
    assert(pre.forall(_.bloomCols == Seq("u.k")))
    assert(!before.exists(r => Set(7L, 777L).contains(r.getLong(0))))
    assert(before.exists(r => r.getLong(0) == 1173L)) // %97 irrelevant here
    // Compaction merges exactly the three delete-free post-tombstone
    // files; the DV'd tombstone-predating pair carries over untouched.
    assert(ManifestSink.compact(s"$wh/t", 10L * 1000 * 1000) == 3)
    val post = ManifestSink.committedEntries(s"$wh/t")
    assert(post.size == 3, post.map(_.name))
    assert(post.count(_.dv.isDefined) == 2)
    assert(post.count(_.name.startsWith("compact-")) == 1)
    // Bit-identical read-back across split granularities: the merged
    // file holds one row group per member, so an 8 KB split cap fans
    // it out and each split re-derives its ordinal base; DV'd files
    // split too, ordinals staying exact.
    val schema = spark.table(s"$cat.t").schema
    Seq(8192L, 1L << 20).foreach { cap =>
      val got = spark.read.format("graft.sources.ManifestSink")
        .schema(schema).option("path", s"$wh/t")
        .option("maxsplitbytes", cap.toString).load()
      if (cap == 8192L)
        assert(got.rdd.getNumPartitions > post.size,
          s"expected split fan-out at cap=$cap, got " +
            s"${got.rdd.getNumPartitions} partitions for ${post.size} files")
      assert(got.orderBy("id").collect().toSeq == before.toSeq,
        s"rows diverged at maxsplitbytes=$cap")
    }
  }

  test("byte-range splits: one parquet file fans out across tasks by " +
      "the midpoint rule; ordinal-keyed DVs stay exact under splitting") {
    val (cat, wh) = catalog()
    // blockbytes sizes the ROW GROUPS, so the single file has many
    // seek points; the read option then plans multiple byte ranges.
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('filekind'='parquet', 'blockbytes'='65536',
        'deletionvectors'='true')""")
    // v = 3*id + 1: distinct per-column sums, so a swapped column
    // index in the ranged reader's projection mapping cannot cancel.
    spark.range(300000).selectExpr("id", "id * 3 + 1 AS v").coalesce(1)
      .writeTo(s"$cat.t").append()
    assert(ManifestSink.committedEntries(s"$wh/t").size == 1)
    spark.sql(s"DELETE FROM $cat.t WHERE id % 1000 = 7") // DV, 300 rows
    def ranged = spark.read.format("graft.sources.ManifestSink")
      .option("path", s"$wh/t").option("maxsplitbytes", 128 * 1024).load()
    val parts = ranged.rdd.getNumPartitions
    assert(parts > 3, s"expected multiple byte-range splits, got $parts")
    // Every row exactly once (midpoint rule), DV ordinals exact in
    // every split (a wrong ordinal base would resurrect or over-delete
    // rows in later splits).
    assert(ranged.count() == 300000L - 300L)
    val ids = (0L until 300000L).filter(_ % 1000 != 7)
    val expectId = ids.sum
    val expectV = ids.map(i => i * 3 + 1).sum
    val sums = ranged.selectExpr("CAST(sum(id) AS BIGINT)",
      "CAST(sum(v) AS BIGINT)").head()
    assert(sums.getLong(0) == expectId && sums.getLong(1) == expectV)
    // The whole-file route agrees.
    assert(spark.sql(s"SELECT CAST(sum(v) AS BIGINT) FROM $cat.t").head()
      .getLong(0) == expectV)
  }

  test("parquet compaction: row-group append merges small delete-free " +
      "files; DV'd and schema-mismatched entries carry over untouched") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('filekind'='parquet', 'deletionvectors'='true')""")
    (0 until 4).foreach(i =>
      spark.range(i * 25L, i * 25L + 25).selectExpr("id", "id AS v")
        .coalesce(1).writeTo(s"$cat.t").append())
    assert(ManifestSink.committedEntries(s"$wh/t").size == 4)
    val nMerged = ManifestSink.compact(s"$wh/t", 1000L)
    assert(nMerged == 4, s"all four small parquet files must merge: $nMerged")
    val e = ManifestSink.committedEntries(s"$wh/t")
    assert(e.size == 1 && e.head.name.endsWith(".parquet"), e.map(_.name))
    assert(e.head.rows == 100L)
    // Stats folded across members; null counts exact (delete-free).
    assert(e.head.stats.exists(s => s.col == "id" && s.min == "0" &&
      s.max == "99"), e.head.stats.toString)
    assert(e.head.nullCounts.get("id").contains(0L))
    assert(spark.sql(s"SELECT CAST(sum(v) AS BIGINT) FROM $cat.t").head()
      .getLong(0) == (0L until 100L).sum)
    // A DV'd parquet entry is NOT a merge candidate: it carries over.
    spark.sql(s"DELETE FROM $cat.t WHERE id % 10 = 7") // DV on the merged file
    spark.range(100, 125).selectExpr("id", "id AS v").coalesce(1)
      .writeTo(s"$cat.t").append()
    spark.range(125, 150).selectExpr("id", "id AS v").coalesce(1)
      .writeTo(s"$cat.t").append()
    val n2 = ManifestSink.compact(s"$wh/t", 1000L)
    assert(n2 == 2, s"only the two new delete-free files merge: $n2")
    val e2 = ManifestSink.committedEntries(s"$wh/t")
    assert(e2.size == 2 && e2.exists(_.dv.isDefined), e2.toString)
    assert(spark.table(s"$cat.t").count() == 140L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE id = 7").head()
      .getLong(0) == 0L, "the DV must survive compaction untouched")
  }

  test("nested-leaf stats and bloom sidecars on parquet entries: leaf " +
      "predicates prune files, leaf min/max folds, point lookups skip") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (row_id BIGINT,
      u STRUCT<name: STRING, geo: STRUCT<lat: DOUBLE>>)
      TBLPROPERTIES ('filekind'='parquet', 'bloomcolumns'='u.name')""")
    // Two files with DISJOINT leaf ranges; names hash-distribute so
    // only the bloom can skip on a name point lookup.
    Seq(0L, 1000L).foreach(base =>
      spark.range(base, base + 100).selectExpr("id AS row_id",
          """named_struct('name', concat('n', id),
            'geo', named_struct('lat', id * 1.0)) AS u""")
        .coalesce(1).writeTo(s"$cat.t").append())
    val e = ManifestSink.committedEntries(s"$wh/t")
    assert(e.size == 2 && e.forall(_.name.endsWith(".parquet")))
    // Dotted leaf bounds recorded per file; bloom sidecars built.
    assert(e.forall(_.stats.exists(_.col == "u.geo.lat")), e.toString)
    assert(e.forall(_.bloomCols == Seq("u.name")), e.toString)
    // Leaf range predicate prunes one file of two.
    val q = spark.sql(s"SELECT row_id FROM $cat.t WHERE u.geo.lat >= 1050.0")
    assert(q.rdd.getNumPartitions == 1, "leaf bounds must prune a file")
    assert(q.collect().map(_.getLong(0)).toSet == (1050L until 1100L).toSet)
    // Leaf metadata aggregate folds from manifest bounds, zero bytes.
    val agg = spark.sql(
      s"SELECT min(u.geo.lat) AS lo, max(u.geo.lat) AS hi FROM $cat.t")
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      agg.queryExecution.executedPlan.toString)
    assert(agg.head() == Row(0.0, 1099.0))
    // Leaf bloom point lookup plans ONE file (ranges don't help: the
    // string name domain spans both); a miss plans zero.
    val hit = spark.sql(s"SELECT row_id FROM $cat.t WHERE u.name = 'n1060'")
    assert(hit.rdd.getNumPartitions == 1, "leaf bloom must skip a file")
    assert(hit.head().getLong(0) == 1060L)
    val miss = spark.sql(s"SELECT row_id FROM $cat.t WHERE u.name = 'zzz'")
    assert(miss.rdd.getNumPartitions == 0, "bloom miss must plan no files")
  }

  test("partitioned parquet writes: per-tuple parquet files, exact " +
      "partition pruning off recorded partValues") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.p (id BIGINT, lang STRING)
      PARTITIONED BY (lang) TBLPROPERTIES ('filekind'='parquet')""")
    spark.range(90).selectExpr("id",
        "CASE id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'fr' ELSE 'de' END AS lang")
      .repartition(org.apache.spark.sql.functions.col("lang"))
      .writeTo(s"$cat.p").append()
    val e = ManifestSink.committedEntries(s"$wh/p")
    assert(e.forall(_.name.endsWith(".parquet")), e.map(_.name))
    assert(e.forall(_.partValues.contains("lang")), e.toString)
    // One partition tuple per file; the 'en' scan plans only en files.
    val q = spark.sql(s"SELECT CAST(sum(id) AS BIGINT) FROM $cat.p WHERE lang = 'en'")
    val enFiles = e.count(_.partValues("lang") == "\"en\"")
    assert(q.rdd.getNumPartitions == enFiles,
      s"partition pruning must plan only the en files ($enFiles of ${e.size})")
    assert(q.head().getLong(0) == (0L until 90L).filter(_ % 3 == 0).sum)
  }

  test("streaming epoch writes land parquet files with epoch-" +
      "deterministic names; the table reads across epochs") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.s (id BIGINT)
      TBLPROPERTIES ('filekind'='parquet')""")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val ck = Files.createTempDirectory("gpq_ck").toString
    def runOnce(): Unit = {
      val q = ms.toDF().selectExpr("value AS id").writeStream
        .format("graft.sources.ManifestSink")
        .option("path", s"$wh/s")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
    }
    ms.addData(1L, 2L, 3L)
    runOnce()
    ms.addData(4L, 5L)
    runOnce()
    val e = ManifestSink.committedEntries(s"$wh/s")
    assert(e.forall(f => f.name.startsWith("part-e") &&
      f.name.endsWith(".parquet")), e.map(_.name))
    assert(spark.sql(s"SELECT CAST(sum(id) AS BIGINT) FROM $cat.s")
      .head().getLong(0) == 15L)
  }
}
