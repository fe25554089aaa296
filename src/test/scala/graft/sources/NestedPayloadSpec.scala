package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Nested STRUCT payloads in the manifest format: struct columns render
  * as nested JSON objects (the reference's natural payload IS nested
  * user JSON — `dags/users_etl.py:100-111` user→address→geo), round-trip
  * exactly, prune to the projected nested leaves, and compose with the
  * row-identity machinery. Stats/pruning/bloom stay top-level-scalar
  * (statOrdering(struct) = None — nothing ever claims a bound over a
  * struct); arrays/maps refuse loudly at the write builder. */
class NestedPayloadSpec extends AnyFunSuite with SparkSpec {

  private var n = 0
  private def catalog(): (String, String) = {
    n += 1
    val cat = s"gnp$n"
    val wh = Files.createTempDirectory(s"graft_$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    (cat, wh)
  }

  test("user→address→geo round trip: values, nulls at every level, escaping") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.users (id BIGINT,
      address STRUCT<street: STRING, geo: STRUCT<lat: DOUBLE, lng: DOUBLE>>)""")
    spark.sql(s"""INSERT INTO $cat.users VALUES
      (1, named_struct('street', 'a "quoted"\nstreet',
          'geo', named_struct('lat', 1.5, 'lng', -2.25))),
      (2, named_struct('street', CAST(NULL AS STRING),
          'geo', CAST(NULL AS STRUCT<lat: DOUBLE, lng: DOUBLE>))),
      (3, CAST(NULL AS STRUCT<street: STRING,
          geo: STRUCT<lat: DOUBLE, lng: DOUBLE>>))""")
    val rows = spark.sql(s"""SELECT id, address.street AS st,
        address.geo.lat AS lat FROM $cat.users ORDER BY id""").collect()
    assert(rows(0).getString(1) == "a \"quoted\"\nstreet" &&
      rows(0).getDouble(2) == 1.5)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    // The payload really is a nested JSON object, one line per row.
    val txt = Files.list(java.nio.file.Paths.get(wh, "users")).toArray
      .map(_.toString).filter(_.contains("part-"))
      .map(p => new String(Files.readAllBytes(java.nio.file.Paths.get(p))))
      .mkString("\n")
    assert(txt.contains("\"geo\":{\"lat\":1.5,\"lng\":-2.25}"), txt.take(400))
  }

  test("nested schema pruning reaches the scan: one projected leaf " +
      "reads a one-leaf struct") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<name: STRING, geo: STRUCT<lat: DOUBLE, lng: DOUBLE>>)""")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
      named_struct('name', concat('u', id),
        'geo', named_struct('lat', id * 1.0, 'lng', id * -1.0))
      FROM range(100)""")
    val q = spark.sql(s"SELECT sum(u.geo.lat) AS s FROM $cat.t")
    val read = q.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan.readSchema()
    }.get
    // The scan's read schema carries ONLY the projected nested leaf.
    assert(read.catalogString == "struct<u:struct<geo:struct<lat:double>>>",
      read.catalogString)
    assert(q.head().getDouble(0) == (0 until 100).map(_.toDouble).sum)
    // And a pruned read still serves the right values per row.
    assert(spark.sql(s"SELECT u.geo.lng FROM $cat.t WHERE id = 7")
      .head().getDouble(0) == -7.0)
  }

  test("row identity with structs: DVs and equality deletes inside " +
      "nested payloads; compaction carries the raw lines") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<name: STRING, score: BIGINT>)
      TBLPROPERTIES ('deletionvectors'='true')""")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
      named_struct('name', concat('n', id), 'score', id * 2)
      FROM range(1000)""")
    spark.sql(s"DELETE FROM $cat.t WHERE id IN (5, 500)")
    import spark.implicits._
    ManifestOps.equalityDelete(s"$wh/t", Seq(7L, 700L).toDF("id"))
    val expect = (0L until 1000L).toSet -- Set(5L, 500L, 7L, 700L)
    def ids(): Set[Long] = spark.sql(s"SELECT id FROM $cat.t").collect()
      .map(_.getLong(0)).toSet
    assert(ids() == expect)
    assert(spark.sql(s"SELECT u.score FROM $cat.t WHERE id = 999")
      .head().getLong(0) == 1998L)
    spark.sql(s"CALL $cat.system.compact('t', 1000000)")
    assert(ids() == expect)
    assert(spark.sql(s"SELECT CAST(sum(u.score) AS BIGINT) FROM $cat.t")
      .head().getLong(0) == expect.map(_ * 2).sum)
  }

  test("structs compose with codecs and schema inference") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<name: STRING, lat: DOUBLE>) TBLPROPERTIES ('codec'='zstd')""")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
      named_struct('name', concat('z', id), 'lat', id * 0.5)
      FROM range(500)""")
    assert(spark.sql(s"SELECT sum(u.lat) FROM $cat.t").head().getDouble(0)
      == (0 until 500).map(_ * 0.5).sum)
    // Schema-less read infers the nested struct from the payload shape.
    val inferred = spark.read.format("graft.sources.ManifestSink")
      .option("path", s"$wh/t").load()
    assert(inferred.schema("u").dataType.isInstanceOf[StructType])
    assert(inferred.selectExpr("sum(u.lat)").head().getDouble(0)
      == (0 until 500).map(_ * 0.5).sum)
  }

  test("nested-leaf bounds prune files: a u.geo.lat predicate skips " +
      "the file whose leaf range excludes it") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<name: STRING, geo: STRUCT<lat: DOUBLE, lng: DOUBLE>>)""")
    // Two files with DISJOINT leaf ranges (lat 0-99 vs 1000-1099).
    Seq(0L, 1000L).foreach(base =>
      spark.range(base, base + 100).selectExpr("id",
          """named_struct('name', concat('n', id),
            'geo', named_struct('lat', id * 1.0, 'lng', -id * 1.0)) AS u""")
        .coalesce(1).writeTo(s"$cat.t").append())
    val entries = ManifestSink.committedEntries(s"$wh/t")
    assert(entries.size == 2)
    // The writer recorded dotted leaf bounds alongside top-level stats.
    val leafStats = entries.flatMap(_.stats).filter(_.col.contains("."))
    assert(leafStats.map(_.col).toSet ==
      Set("u.name", "u.geo.lat", "u.geo.lng"), leafStats.map(_.col).toSet)
    val lat0 = entries.map(e =>
      e.stats.find(_.col == "u.geo.lat").get).minBy(_.min.toDouble)
    assert(lat0.min == "0.0" && lat0.max == "99.0", lat0.toString)
    // Pruning: the nested predicate plans ONE file of two.
    val q = spark.sql(s"SELECT id FROM $cat.t WHERE u.geo.lat >= 1050.0")
    assert(q.rdd.getNumPartitions == 1, "leaf bounds must prune a file")
    assert(q.collect().map(_.getLong(0)).toSet == (1050L until 1100L).toSet)
    // RENAME of the struct column: old entries' leaf stats normalize to
    // the new prefix and keep pruning.
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN u TO profile")
    val q2 = spark.sql(
      s"SELECT id FROM $cat.t WHERE profile.geo.lat >= 1050.0")
    assert(q2.rdd.getNumPartitions == 1, "leaf pruning must survive rename")
    assert(q2.collect().length == 50)
    // Row-level DML keyed on a LEAF: mustMatch stands down (leaf null
    // counts are untracked), so the delete takes the copy-on-write
    // rewrite — and must land exactly.
    spark.sql(s"DELETE FROM $cat.t WHERE profile.geo.lat >= 1000.0")
    assert(spark.sql(s"SELECT count(*), CAST(sum(id) AS BIGINT) FROM $cat.t")
      .head() == org.apache.spark.sql.Row(100L, (0L until 100L).sum))
  }

  test("block-level leaf bounds: a leaf point lookup in ONE sorted file " +
      "plans one block, not the file") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<name: STRING, geo: STRUCT<lat: DOUBLE>>)
      TBLPROPERTIES ('blockbytes'='4096')""")
    spark.range(8000).selectExpr("id",
        """named_struct('name', concat('n', id, repeat('q', 30)),
          'geo', named_struct('lat', id * 1.0)) AS u""")
      .orderBy("id").coalesce(1).writeTo(s"$cat.t").append()
    val e = ManifestSink.committedEntries(s"$wh/t").head
    assert(e.blocks.size >= 3)
    // Every block carries the leaf's dotted-path bounds.
    assert(e.blocks.forall(_.stats.exists(_.col == "u.geo.lat")))
    val q = spark.sql(s"SELECT u.name FROM $cat.t WHERE u.geo.lat = 6100.0")
    assert(q.rdd.getNumPartitions == 1, "leaf block pruning must engage")
    assert(q.head().getString(0).startsWith("n6100"))
  }

  test("block-boundary record's leaf extremum belongs to the CLOSED " +
      "block: leaf pruning cannot skip the block holding the row") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<name: STRING, geo: STRUCT<lat: DOUBLE>>)
      TBLPROPERTIES ('blockbytes'='4096')""")
    spark.range(8000).selectExpr("id",
        """named_struct('name', concat('n', id, repeat('q', 30)),
          'geo', named_struct('lat', id * 1.0)) AS u""")
      .orderBy("id").coalesce(1).writeTo(s"$cat.t").append()
    val e = ManifestSink.committedEntries(s"$wh/t").head
    assert(e.blocks.size >= 3)
    // Rows ascend, so each block's LAST row — the record whose bytes
    // tripped the boundary — is its leaf max. That record is byte-wise
    // inside the block being closed; its bound must be in THAT block's
    // snapshot, not the next one's (leaf tracking after closeBlock
    // shifted it, letting pruning skip the block that holds the row).
    var firstRow = 0L
    e.blocks.foreach { b =>
      val st = b.stats.find(_.col == "u.geo.lat").get
      assert(st.min.toDouble == firstRow.toDouble, s"row $firstRow: $st")
      assert(st.max.toDouble == (firstRow + b.rows - 1).toDouble,
        s"boundary record leaked out of its block: row $firstRow, $st")
      firstRow += b.rows
    }
    // And the end-to-end proof: a point lookup on every block's
    // boundary value must find its row (the buggy ordering pruned the
    // only block containing it → silent empty result).
    e.blocks.scanLeft(0L)(_ + _.rows).tail.dropRight(1).foreach { cum =>
      val r = cum - 1
      val q = spark.sql(s"SELECT u.name FROM $cat.t WHERE u.geo.lat = $r.0")
      assert(q.rdd.getNumPartitions == 1)
      assert(q.collect().map(_.getString(0)).toSeq ==
        Seq(s"n$r" + "q" * 30), s"boundary row $r lost to mis-pruning")
    }
  }

  test("aggregate pushdown reaches nested leaves: min/max(u.geo.lat) " +
      "folds from leaf stats, zero data bytes") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<name: STRING, geo: STRUCT<lat: DOUBLE>>)""")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
      named_struct('name', concat('n', id),
        'geo', named_struct('lat', id * 1.0)) FROM range(100)""")
    val q = spark.sql(
      s"SELECT min(u.geo.lat) AS lo, max(u.geo.lat) AS hi FROM $cat.t")
    // Answered from the manifest's leaf bounds: the plan is a local
    // scan of the folded values — no file is ever opened.
    assert(q.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      q.queryExecution.executedPlan.toString)
    assert(q.head() == org.apache.spark.sql.Row(0.0, 99.0))
    // Stand-down case: STRING leaves truncate their bounds, so their
    // min/max must take the normal scan — and still be right.
    val s = spark.sql(s"SELECT max(u.name) AS m FROM $cat.t")
    assert(!s.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(s.head().getString(0) == "n99")
  }

  test("bloom index on a nested LEAF: point lookups skip files whose " +
      "sidecar proves the leaf value absent — through a struct rename") {
    val (cat, wh) = catalog()
    // Leaf ids INTERLEAVE across files (hash-distributed), so bounds
    // keep everything — only the leaf bloom can skip.
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<name: STRING, geo: STRUCT<docid: BIGINT>>)
      TBLPROPERTIES ('bloomcolumns'='u.geo.docid')""")
    spark.range(8000).selectExpr("id",
        "named_struct('name', concat('n', id), " +
          "'geo', named_struct('docid', id)) AS u")
      .repartition(8, org.apache.spark.sql.functions.col("id"))
      .writeTo(s"$cat.t").append()
    val entries = ManifestSink.committedEntries(s"$wh/t")
    assert(entries.size == 8)
    assert(entries.forall(_.bloomCols == Seq("u.geo.docid")))
    // Leaf KMV rides the same buffer: distinct-count sketch per file.
    assert(entries.forall(_.kmv.contains("u.geo.docid")))
    def planned(sql: String): Int = spark.sql(sql).rdd.getNumPartitions
    // A present value lives in exactly one file; an absent one in none.
    assert(planned(s"SELECT u.name FROM $cat.t WHERE u.geo.docid = 4321") == 1)
    assert(spark.sql(s"SELECT u.name FROM $cat.t WHERE u.geo.docid = 4321")
      .head().getString(0) == "n4321")
    assert(planned(
      s"SELECT u.name FROM $cat.t WHERE u.geo.docid = 999999") == 0)
    // Struct RENAME: entries' dotted bloom names normalize by prefix,
    // the property follows, and pre-rename sidecars resolve through the
    // vintage spelling — the lookup still plans one file.
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN u TO profile")
    assert(planned(
      s"SELECT profile.name FROM $cat.t WHERE profile.geo.docid = 4321") == 1)
    // And new writes keep indexing under the new spelling.
    spark.range(8000, 8100).selectExpr("id",
        "named_struct('name', concat('n', id), " +
          "'geo', named_struct('docid', id)) AS profile")
      .coalesce(1).writeTo(s"$cat.t").append()
    assert(planned(
      s"SELECT profile.name FROM $cat.t WHERE profile.geo.docid = 8050") == 1)
  }

  test("equality delete keyed on a STRUCT column: rendered raw text is " +
      "the canonical key") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      k STRUCT<a: BIGINT, b: STRING>)""")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
      named_struct('a', id % 10, 'b', concat('x', id % 10)) FROM range(100)""")
    import org.apache.spark.sql.functions._
    // Tombstone the composite struct key (a=3, b='x3'): both sides were
    // rendered by the same typed writer, so the raw text matches.
    ManifestOps.equalityDelete(s"$wh/t",
      spark.range(1).select(
        struct(lit(3L).as("a"), lit("x3").as("b")).as("k")))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 90L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE k.a = 3")
      .head().getLong(0) == 0L)
    // Compaction materializes the struct-keyed tombstone exactly once.
    spark.sql(s"CALL $cat.system.compact('t', 1000000)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 90L)
    assert(ManifestSink.committedEqDeleteNames(s"$wh/t").isEmpty)
  }

  test("stats stay top-level-scalar; nested map keys refuse loudly") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      u STRUCT<name: STRING, score: BIGINT>)""")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
      named_struct('name', concat('n', id), 'score', id)
      FROM range(100)""")
    val e = ManifestSink.committedEntries(s"$wh/t").head
    // No bound is ever claimed over the struct ITSELF; its orderable
    // LEAVES record dotted-path bounds (u.name, u.score).
    assert(e.stats.map(_.col).toSet == Set("id", "u.name", "u.score"),
      e.stats.map(_.col).toString)
    assert(e.nullCounts.get("u").contains(0L)) // top-level nulls still count
    assert(!e.nullCounts.contains("u.score")) // leaf nulls untracked
    // Arrays/maps round-trip since round 15 (ArrayMapPayloadSpec); the
    // remaining refusal is a NESTED map key, which has no unambiguous
    // JSON object-key spelling — loud at the write builder.
    val ex = intercept[Exception] {
      spark.range(1).selectExpr("id", "map(array(id), 'x') AS m").write
        .format("graft.sources.ManifestSink")
        .option("path", Files.createTempDirectory("gnp_arr").toString)
        .mode("append").save()
    }
    assert(ex.getMessage.contains("unsupported"), ex.getMessage)
    // Dotted TOP-LEVEL names share the manifest stat key space with
    // nested-leaf paths ('u.score') — refused at the builder so a
    // literal "a.b" column can never consult a leaf's bounds.
    val ex2 = intercept[Exception] {
      spark.range(1).selectExpr("id", "id AS `a.b`").write
        .format("graft.sources.ManifestSink")
        .option("path", Files.createTempDirectory("gnp_dot").toString)
        .mode("append").save()
    }
    assert(ex2.getMessage.contains("may not contain '.'"), ex2.getMessage)
  }
}
