package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SchemaEvolution]] unit invariants plus the end-to-end behavior:
  * RENAME COLUMN and widening ALTER COLUMN TYPE over manifest tables
  * never rewrite data, and every name-keyed machinery — payload reads,
  * stats pruning, bloom sidecars, equality deletes, sort stamps,
  * partition pruning, time travel, compaction — resolves vintage names
  * through the rename log. */
class SchemaEvolutionSpec extends AnyFunSuite with SparkSpec {

  test("rename log: chain collapse, aliases, render round trip") {
    val log = Seq("a" -> "b", "c" -> "d", "b" -> "e")
    val cur = SchemaEvolution.currentNames(log)
    assert(cur == Map("a" -> "e", "b" -> "e", "c" -> "d"))
    assert(SchemaEvolution.aliases(cur) ==
      Map("e" -> Seq("a", "b"), "d" -> Seq("c")))
    val rendered = SchemaEvolution.renderLog(log)
    assert(SchemaEvolution.parseLog(
      Map(SchemaEvolution.PropKey -> rendered)) == log)
    // a -> b -> a collapses to identity (no mapping survives).
    assert(SchemaEvolution.currentNames(Seq("a" -> "b", "b" -> "a")) ==
      Map("b" -> "a"))
    assert(SchemaEvolution.logNames(log) == Set("a", "b", "c", "d", "e"))
  }

  test("widening matrix: int-family upcasts and float->double only") {
    assert(SchemaEvolution.canWiden(IntegerType, LongType))
    assert(SchemaEvolution.canWiden(ShortType, IntegerType))
    assert(SchemaEvolution.canWiden(ByteType, LongType))
    assert(SchemaEvolution.canWiden(FloatType, DoubleType))
    assert(!SchemaEvolution.canWiden(LongType, IntegerType)) // narrowing
    assert(!SchemaEvolution.canWiden(LongType, DoubleType))  // lossy
    assert(!SchemaEvolution.canWiden(StringType, LongType))
    assert(!SchemaEvolution.canWiden(IntegerType, IntegerType))
  }

  test("renameSpec: identity and bucket transform specs follow the rename") {
    val cur = Map("old_id" -> "doc_id")
    assert(SchemaEvolution.renameSpec("old_id", cur) == "doc_id")
    assert(SchemaEvolution.renameSpec("bucket(8,old_id)", cur) ==
      "bucket(8,doc_id)")
    assert(SchemaEvolution.renameSpec("lang", cur) == "lang")
  }

  private def catalog(name: String): String = {
    val wh = Files.createTempDirectory(s"graft_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.base", wh)
    wh
  }

  private def scanMetrics(sql: String): (Long, Long) = {
    val q = spark.sql(sql)
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    (scan.metrics("filesRead").value, scan.metrics("filesSkipped").value)
  }

  test("rename end to end: both vintages read, stats prune, " +
      "time travel serves the current name") {
    catalog("gse1")
    spark.sql("CREATE TABLE gse1.t (uid BIGINT, v BIGINT)")
    // Batch 1 under the ORIGINAL name, value-clustered so bounds prune
    // (retained: the time-travel read below needs the snapshot).
    spark.range(0, 1000).selectExpr("id AS uid", "id * 2 AS v")
      .orderBy("uid").coalesce(1).writeTo("gse1.t")
      .option("retainHistory", "true").append()
    spark.sql("ALTER TABLE gse1.t RENAME COLUMN uid TO user_id")
    // Batch 2 under the NEW name.
    spark.range(1000, 2000).selectExpr("id AS user_id", "id * 2 AS v")
      .orderBy("user_id").coalesce(1).writeTo("gse1.t")
      .option("retainHistory", "true").append()
    // Both vintages serve the renamed column.
    assert(spark.sql("SELECT count(*), sum(user_id) FROM gse1.t").head() ==
      org.apache.spark.sql.Row(2000L, (0L until 2000L).sum))
    assert(spark.sql(
      "SELECT count(*) FROM gse1.t WHERE user_id < 1000").head().getLong(0)
      == 1000L)
    // Stats pruning works across the rename: a predicate on the NEW
    // name prunes the OLD file via its (vintage-keyed) bounds — either
    // at entry level (counted in filesSkipped) or wholesale at its
    // segment summary (never examined at all); both leave exactly one
    // file read.
    val (read, skipped) = scanMetrics(
      "SELECT v FROM gse1.t WHERE user_id >= 1500")
    assert(read == 1 && skipped <= 1, s"($read, $skipped)")
    // Time travel to the pre-rename snapshot serves the CURRENT name
    // (the schema is not versioned; the log maps the old payload key).
    val tt = spark.sql("SELECT sum(user_id) AS s FROM gse1.t VERSION AS OF 1")
    assert(tt.head().getLong(0) == (0L until 1000L).sum)
    // Retired names stay retired.
    intercept[Exception](
      spark.sql("ALTER TABLE gse1.t ADD COLUMN uid BIGINT"))
    intercept[Exception](
      spark.sql("ALTER TABLE gse1.t RENAME COLUMN v TO uid"))
    spark.sql("DROP TABLE gse1.t")
  }

  test("rename x equality deletes: tombstones apply across vintages " +
      "in both directions") {
    val wh = catalog("gse2")
    spark.sql("CREATE TABLE gse2.t (k BIGINT, v STRING)")
    spark.range(0, 100).selectExpr("id AS k", "concat('a', id) AS v")
      .coalesce(1).writeTo("gse2.t").append()
    // PRE-rename tombstone (key file written under the old name).
    import spark.implicits._
    ManifestOps.equalityDelete(s"$wh/t", Seq(3L, 7L).toDF("k"))
    spark.sql("ALTER TABLE gse2.t RENAME COLUMN k TO key_id")
    // Post-rename append + POST-rename tombstone hitting BOTH vintages.
    spark.range(100, 200).selectExpr("id AS key_id", "concat('b', id) AS v")
      .coalesce(1).writeTo("gse2.t").append()
    ManifestOps.equalityDelete(s"$wh/t", Seq(11L, 150L).toDF("key_id"))
    val left = spark.sql("SELECT key_id FROM gse2.t").collect()
      .map(_.getLong(0)).toSet
    assert(left.size == 196 && !left(3L) && !left(7L) && !left(11L) &&
      !left(150L), s"survivors=${left.size}")
    // Compaction materializes the tombstones across vintages too.
    spark.sql("CALL gse2.system.compact('t', 1000000)")
    val after = spark.sql("SELECT key_id FROM gse2.t").collect()
      .map(_.getLong(0)).toSet
    assert(after == left)
    assert(ManifestSink.committedEqDeleteNames(s"$wh/t").isEmpty,
      "compaction should retire materialized tombstones")
    spark.sql("DROP TABLE gse2.t")
  }

  test("rename x bloom index: pre-rename sidecars keep skipping " +
      "under the new name") {
    catalog("gse3")
    import org.apache.spark.sql.functions.col
    spark.sql("""CREATE TABLE gse3.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('bloomcolumns'='id')""")
    spark.range(0, 4000).selectExpr("id", "id * 7 AS v")
      .repartition(4, col("id")).writeTo("gse3.t").append()
    spark.sql("ALTER TABLE gse3.t RENAME COLUMN id TO doc_id")
    // The 4 sidecars were written under 'id'; a point lookup on the
    // NEW name must still open exactly the holding file.
    val (read, skipped) = scanMetrics(
      "SELECT v FROM gse3.t WHERE doc_id = 1234")
    assert(read == 1 && skipped == 3, s"($read, $skipped)")
    // And post-rename appends index under the new declaration.
    spark.range(4000, 8000).selectExpr("id AS doc_id", "id * 7 AS v")
      .repartition(4, col("doc_id")).writeTo("gse3.t").append()
    val (read2, _) = scanMetrics("SELECT v FROM gse3.t WHERE doc_id = 6001")
    assert(read2 == 1, s"read2=$read2")
    spark.sql("DROP TABLE gse3.t")
  }

  test("rename of a partition column: old files keep pruning and " +
      "metadata-only DELETE still proves") {
    catalog("gse4")
    spark.sql("""CREATE TABLE gse4.t (id BIGINT, lng STRING)
      PARTITIONED BY (lng)""")
    spark.createDataFrame(Seq((1L, "en"), (2L, "fr"), (3L, "en"), (4L, "de")))
      .toDF("id", "lng").writeTo("gse4.t").append()
    spark.sql("ALTER TABLE gse4.t RENAME COLUMN lng TO lang")
    spark.createDataFrame(Seq((5L, "en"), (6L, "fr")))
      .toDF("id", "lang").writeTo("gse4.t").append()
    assert(spark.sql("SELECT count(*) FROM gse4.t WHERE lang = 'en'")
      .head().getLong(0) == 3L)
    // Old partition files prune under the new name.
    val (read, skipped) = scanMetrics(
      "SELECT id FROM gse4.t WHERE lang = 'de'")
    assert(read == 1 && skipped >= 3, s"($read, $skipped)")
    // Metadata-only DELETE on the renamed partition column: the old
    // 'de' file's partition tuple proves all-match.
    spark.sql("DELETE FROM gse4.t WHERE lang = 'de'")
    assert(spark.sql("SELECT count(*) FROM gse4.t").head().getLong(0) == 5L)
    spark.sql("DROP TABLE gse4.t")
  }

  test("widen int->long and float->double: old tokens re-parse; " +
      "bucket-source widen refused") {
    catalog("gse5")
    spark.sql("CREATE TABLE gse5.t (n INT, x FLOAT)")
    spark.sql("INSERT INTO gse5.t VALUES (1, 1.5), (2147483647, 2.25)")
    spark.sql("ALTER TABLE gse5.t ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE gse5.t ALTER COLUMN x TYPE DOUBLE")
    val t = spark.table("gse5.t")
    assert(t.schema("n").dataType == LongType)
    assert(t.schema("x").dataType == DoubleType)
    // Old-file tokens re-parse under the wider types; arithmetic past
    // the old width works.
    spark.sql("INSERT INTO gse5.t VALUES (9223372036854775807, 0.125)")
    assert(spark.sql("SELECT sum(x) FROM gse5.t").head().getDouble(0)
      == 1.5 + 2.25 + 0.125)
    assert(spark.sql("SELECT max(n) FROM gse5.t").head().getLong(0)
      == Long.MaxValue)
    // Narrowing and lossy changes refuse.
    intercept[Exception](
      spark.sql("ALTER TABLE gse5.t ALTER COLUMN n TYPE INT"))
    intercept[Exception](
      spark.sql("ALTER TABLE gse5.t ALTER COLUMN n TYPE DOUBLE"))
    // Bucket-source columns refuse widening (hash is width-sensitive).
    spark.sql("""CREATE TABLE gse5.b (id INT, v STRING)
      PARTITIONED BY (bucket(4, id))""")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gse5.b ALTER COLUMN id TYPE BIGINT"))
    assert(e.getMessage.contains("bucket"), e.getMessage)
    spark.sql("DROP TABLE gse5.t")
    spark.sql("DROP TABLE gse5.b")
  }

  test("rename x sorted stamps: sorted-merge compaction keys through " +
      "aliases and the merged table stays ordered") {
    val wh = catalog("gse6")
    spark.sql("CREATE TABLE gse6.t (ts BIGINT, v BIGINT)")
    // Two sort-stamped files under the OLD name...
    spark.range(0, 100).selectExpr("id * 2 AS ts", "id AS v")
      .coalesce(1).sortWithinPartitions("ts")
      .writeTo("gse6.t").option("sortBy", "ts").append()
    spark.range(0, 100).selectExpr("id * 2 + 1 AS ts", "id AS v")
      .coalesce(1).sortWithinPartitions("ts")
      .writeTo("gse6.t").option("sortBy", "ts").append()
    spark.sql("ALTER TABLE gse6.t RENAME COLUMN ts TO event_ts")
    // ...merged AFTER the rename: the stamp normalizes to the new name
    // and the k-way merge sort-keys vintage lines through the alias.
    spark.sql("CALL gse6.system.compact('t', 1000000)")
    val entries = ManifestSink.committedEntries(s"$wh/t")
    assert(entries.size == 1 && entries.head.sorted == Seq("event_ts"),
      s"${entries.map(e => e.name -> e.sorted)}")
    // The merged file is PHYSICALLY interleaved-sorted: re-reading in
    // file order yields ascending event_ts.
    val got = spark.sql("SELECT event_ts FROM gse6.t").collect()
      .map(_.getLong(0)).toSeq
    assert(got == (0L until 200L), "merged file lost the sort order")
    spark.sql("DROP TABLE gse6.t")
  }
}
