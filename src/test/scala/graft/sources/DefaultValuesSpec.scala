package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Column DEFAULT values (Iceberg v3 initial-defaults): CREATE/ADD
  * COLUMN with DEFAULT, CURRENT_DEFAULT filling omitted INSERT
  * columns, EXISTS_DEFAULT served for rows written before the column
  * existed — all without rewriting a byte of data. */
class DefaultValuesSpec extends AnyFunSuite with SparkSpec {

  private def catalog(name: String): String = {
    val wh = Files.createTempDirectory(s"graft_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.base", wh)
    wh
  }

  test("CREATE TABLE with DEFAULT: omitted INSERT columns fill; " +
      "explicit NULL stays null") {
    catalog("gdv1")
    spark.sql("""CREATE TABLE gdv1.t (
      id BIGINT, score BIGINT DEFAULT 42, tag STRING DEFAULT 'none')""")
    spark.sql("INSERT INTO gdv1.t (id) VALUES (1)")
    spark.sql("INSERT INTO gdv1.t VALUES (2, 7, 'set')")
    spark.sql("INSERT INTO gdv1.t VALUES (3, NULL, NULL)")
    spark.sql("INSERT INTO gdv1.t (id, score) VALUES (4, DEFAULT)")
    val rows = spark.sql("SELECT id, score, tag FROM gdv1.t ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(rows == Seq((1L, 42L, "none"), (2L, 7L, "set"),
      (3L, null, null), (4L, 42L, "none")), rows.toString)
    spark.sql("DROP TABLE gdv1.t")
  }

  test("ADD COLUMN DEFAULT: pre-ADD rows read the initial default; " +
      "SET DEFAULT changes only future inserts") {
    catalog("gdv2")
    spark.sql("CREATE TABLE gdv2.t (id BIGINT)")
    spark.range(0, 3).writeTo("gdv2.t").append() // pre-ADD rows
    spark.sql("ALTER TABLE gdv2.t ADD COLUMN lang STRING DEFAULT 'en'")
    spark.sql("INSERT INTO gdv2.t (id) VALUES (10)")     // current default
    spark.sql("INSERT INTO gdv2.t VALUES (11, 'fr')")     // explicit
    spark.sql("INSERT INTO gdv2.t VALUES (12, NULL)")     // explicit null
    // Initial default is immutable; changing the CURRENT default must
    // not rewrite what pre-ADD rows read.
    spark.sql("ALTER TABLE gdv2.t ALTER COLUMN lang SET DEFAULT 'de'")
    spark.sql("INSERT INTO gdv2.t (id) VALUES (13)")
    val rows = spark.sql("SELECT id, lang FROM gdv2.t ORDER BY id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(rows == Seq(0L -> "en", 1L -> "en", 2L -> "en",
      10L -> "en", 11L -> "fr", 12L -> null, 13L -> "de"), rows.toString)
    // Filters and aggregates see the served defaults.
    assert(spark.sql("SELECT count(*) FROM gdv2.t WHERE lang = 'en'")
      .head().getLong(0) == 4L)
    assert(spark.sql("SELECT count(*) FROM gdv2.t WHERE lang IS NULL")
      .head().getLong(0) == 1L)
    spark.sql("DROP TABLE gdv2.t")
  }

  test("defaults survive compaction, DV deletes, and a rename") {
    val wh = catalog("gdv3")
    spark.sql("""CREATE TABLE gdv3.t (id BIGINT)
      TBLPROPERTIES ('deletionvectors'='true')""")
    spark.range(0, 100).coalesce(1).writeTo("gdv3.t").append()
    spark.sql("ALTER TABLE gdv3.t ADD COLUMN w BIGINT DEFAULT 5")
    spark.range(100, 200).selectExpr("id", "id AS w").coalesce(1)
      .writeTo("gdv3.t").append()
    spark.sql("DELETE FROM gdv3.t WHERE id = 7")
    assert(spark.sql("SELECT sum(w) FROM gdv3.t").head().getLong(0)
      == 99L * 5 + (100L until 200L).sum)
    // Compaction CONCATENATES raw lines: pre-ADD lines still lack the
    // key inside the merged file, and keep serving the default.
    spark.sql("CALL gdv3.system.compact('t', 1000000)")
    assert(ManifestSink.committedEntries(s"$wh/t").size == 1)
    assert(spark.sql("SELECT count(*) FROM gdv3.t WHERE w = 5")
      .head().getLong(0) == 99L)
    // Rename the defaulted column: the alias lookup still misses on
    // pre-ADD lines (key never existed) and the default still serves.
    spark.sql("ALTER TABLE gdv3.t RENAME COLUMN w TO weight")
    assert(spark.sql("SELECT count(*) FROM gdv3.t WHERE weight = 5")
      .head().getLong(0) == 99L)
    spark.sql("DROP TABLE gdv3.t")
  }

  test("equality deletes refuse initial-defaulted key columns") {
    val wh = catalog("gdv4")
    spark.sql("CREATE TABLE gdv4.t (id BIGINT)")
    spark.range(0, 10).writeTo("gdv4.t").append()
    spark.sql("ALTER TABLE gdv4.t ADD COLUMN k BIGINT DEFAULT 3")
    import spark.implicits._
    val e = intercept[Exception](
      ManifestOps.equalityDelete(s"$wh/t", Seq(3L).toDF("k")))
    assert(e.getMessage.contains("DEFAULT"), e.getMessage)
    // A plain column still works.
    ManifestOps.equalityDelete(s"$wh/t", Seq(4L).toDF("id"))
    assert(spark.sql("SELECT count(*) FROM gdv4.t").head().getLong(0) == 9L)
    spark.sql("DROP TABLE gdv4.t")
  }
}
