package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** StagingTableCatalog on [[GraftCatalog]]: atomic CTAS / RTAS.
  * The guarantees under test are the FAILURE shapes — a failed CTAS
  * leaves no table and no junk, a failed RTAS leaves the old table
  * byte-identically readable — plus the happy paths (CTAS appears
  * complete, RTAS swaps data and schema in one commit). */
class StagingCatalogSpec extends AnyFunSuite with SparkSpec {

  private def freshCat(tag: String): (String, String) = {
    val wh = Files.createTempDirectory(s"graft_stg_$tag").toString
    val cat = s"graft_stg_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    (cat, wh)
  }

  private def stagedDirs(wh: String): Seq[String] = {
    val ls = Files.list(Paths.get(wh))
    try {
      val it = ls.iterator()
      val out = collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.contains("._staged_")) out += n
      }
      out.toSeq
    } finally ls.close()
  }

  test("CTAS lands atomically and leaves no staging residue") {
    val (cat, wh) = freshCat("ctas")
    spark.sql(s"""CREATE TABLE $cat.t AS
      SELECT id, id * 2 AS dbl FROM range(0, 100)""")
    assert(spark.sql(s"SELECT count(*), sum(dbl) FROM $cat.t")
      .head().toSeq == Seq(100L, 9900L))
    assert(stagedDirs(wh).isEmpty, "staging directory must be renamed away")
    // The created table is a full citizen: schema persisted, DML works.
    spark.sql(s"INSERT INTO $cat.t VALUES (100, 200)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 101)
  }

  test("failed CTAS leaves NO table and NO staging directory") {
    val (cat, wh) = freshCat("ctasfail")
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.t AS
        SELECT id, CAST(raise_error('boom') AS STRING) AS x FROM range(0, 10)""")
    }
    assert(!spark.catalog.tableExists(s"$cat.t"))
    assert(spark.sql(s"SHOW TABLES IN $cat").count() == 0)
    assert(stagedDirs(wh).isEmpty, "aborted staging dir must be deleted")
  }

  test("RTAS replaces data and schema in one visible step") {
    val (cat, _) = freshCat("rtas")
    spark.sql(s"""CREATE TABLE $cat.t AS
      SELECT id, CAST(id AS STRING) AS s FROM range(0, 50)""")
    spark.sql(s"""REPLACE TABLE $cat.t AS
      SELECT id * 10 AS k, id * 1.5 AS v FROM range(0, 20)""")
    val r = spark.sql(s"SELECT count(*) AS n, sum(k) AS sk FROM $cat.t").head()
    assert(r.getLong(0) == 20 && r.getLong(1) == 1900L)
    assert(spark.table(s"$cat.t").schema.fieldNames.toSeq == Seq("k", "v"),
      "RTAS must swap the persisted schema")
  }

  test("failed RTAS leaves the old table fully intact") {
    val (cat, _) = freshCat("rtasfail")
    spark.sql(s"""CREATE TABLE $cat.t AS
      SELECT id, CAST(id AS STRING) AS s FROM range(0, 50)""")
    intercept[Exception] {
      spark.sql(s"""REPLACE TABLE $cat.t AS
        SELECT id, CAST(raise_error('mid-rebuild crash') AS STRING) AS x FROM range(0, 10)""")
    }
    // The drop-then-create shape would have lost the table here.
    assert(spark.sql(s"SELECT count(*), sum(id) FROM $cat.t")
      .head().toSeq == Seq(50L, 1225L))
    assert(spark.table(s"$cat.t").schema.fieldNames.toSeq == Seq("id", "s"))
  }

  test("CREATE OR REPLACE: creates when missing, replaces when present") {
    val (cat, _) = freshCat("cor")
    spark.sql(s"""CREATE OR REPLACE TABLE $cat.t AS
      SELECT id FROM range(0, 5)""")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 5)
    spark.sql(s"""CREATE OR REPLACE TABLE $cat.t AS
      SELECT id AS renamed FROM range(0, 7)""")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 7)
    assert(spark.table(s"$cat.t").schema.fieldNames.toSeq == Seq("renamed"))
  }

  test("bare REPLACE TABLE truncates data and swaps the schema") {
    val (cat, _) = freshCat("bare")
    spark.sql(s"""CREATE TABLE $cat.t AS SELECT id FROM range(0, 9)""")
    spark.sql(s"REPLACE TABLE $cat.t (k BIGINT, v STRING)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 0)
    assert(spark.table(s"$cat.t").schema.fieldNames.toSeq == Seq("k", "v"))
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1)
  }

  test("partitioned CTAS with TBLPROPERTIES carries both through") {
    val (cat, wh) = freshCat("part")
    spark.sql(s"""CREATE TABLE $cat.t
      PARTITIONED BY (p)
      TBLPROPERTIES ('retainhistory'='true') AS
      SELECT id, id % 3 AS p FROM range(0, 30)""")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE p = 1")
      .head().getLong(0) == 10)
    val (_, partCols, props) = GraftCatalog.readMeta(Paths.get(wh, "t"))
    assert(partCols == Seq("p"))
    assert(props.get("retainhistory").contains("true"))
  }

  test("crashed-CTAS staging residue is reclaimed by the next staging op") {
    val (cat, wh) = freshCat("sweep")
    // Simulate a driver that died mid-CTAS: a staged dir with data,
    // older than the TTL (abortStagedChanges never ran).
    val stale = Paths.get(wh, ".dead._staged_deadbeef")
    Files.createDirectories(stale)
    Files.write(stale.resolve("part-0.ndjson"), "x".getBytes)
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600 * 1000))
    // A YOUNG staged dir (an in-flight CTAS) must survive the sweep.
    val live = Paths.get(wh, ".alive._staged_cafebabe")
    Files.createDirectories(live)
    spark.sql(s"CREATE TABLE $cat.t AS SELECT id FROM range(0, 4)")
    assert(!Files.exists(stale), "stale staged dir must be GC'd")
    assert(Files.exists(live), "fresh staged dir must NOT be swept")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 4)
  }

  test("a real table whose NAME contains the staged marker still lists") {
    val (cat, _) = freshCat("marker")
    spark.sql(s"CREATE TABLE $cat.`a._staged_b` AS SELECT id FROM range(0, 2)")
    val names = spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSeq
    assert(names.contains("a._staged_b"),
      "the staged-dir filter must only hide dot-prefixed staging dirs")
    assert(spark.sql(s"SELECT count(*) FROM $cat.`a._staged_b`")
      .head().getLong(0) == 2)
  }

  test("CTAS into an existing name fails loudly, target untouched") {
    val (cat, wh) = freshCat("race")
    spark.sql(s"CREATE TABLE $cat.t AS SELECT id FROM range(0, 3)")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t AS SELECT id FROM range(0, 99)")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 3)
    assert(stagedDirs(wh).isEmpty)
  }

  // ----- Round-17: the sweep keys on HEARTBEAT age, not the staged
  // dir's idle top-level mtime (tasks write into SUBdirectories, so a
  // staged CTAS outliving the TTL used to be sweepable from under its
  // own commit), and the TTL is a catalog option (`stagedttlms`).

  test("heartbeating staged dir survives the sweep past the TTL; dead one is reclaimed") {
    val wh = Files.createTempDirectory("graft_stg_hb").toString
    val cat = "graft_stg_hb"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    spark.conf.set(s"spark.sql.catalog.$cat.stagedttlms", "1500")
    val old = System.currentTimeMillis() - 10000
    // A LONG-RUNNING live CTAS: dir mtime idled past the 1.5 s TTL,
    // but its driver's heartbeat file is fresh — must NOT be swept.
    val live = Paths.get(wh, ".slow._staged_feedface")
    Files.createDirectories(live)
    Files.write(live.resolve("part-0.ndjson"), "x".getBytes)
    Files.write(live.resolve("_staging_heartbeat"), Array.empty[Byte])
    Files.setLastModifiedTime(live,
      java.nio.file.attribute.FileTime.fromMillis(old))
    // A CRASHED CTAS: dir AND heartbeat both stale — reclaimed.
    val dead = Paths.get(wh, ".dead._staged_0ddba11")
    Files.createDirectories(dead)
    Files.write(dead.resolve("_staging_heartbeat"), Array.empty[Byte])
    for (p <- Seq(dead, dead.resolve("_staging_heartbeat")))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(old))
    spark.sql(s"CREATE TABLE $cat.t AS SELECT id FROM range(0, 4)")
    assert(Files.exists(live),
      "idle-mtime dir with a fresh heartbeat is a LIVE write — not swept")
    assert(!Files.exists(dead), "stale heartbeat means a dead driver")
    // The committed table carries no heartbeat residue.
    assert(!Files.exists(Paths.get(wh, "t", "_staging_heartbeat")),
      "heartbeat file must be removed before the commit rename")
  }
}
