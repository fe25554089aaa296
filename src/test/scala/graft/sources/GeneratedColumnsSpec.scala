package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** GENERATED ALWAYS AS columns ([[GraftGeneratedColumns]]): the
  * expression persists through `_table.json`, omitted columns compute
  * on every insert shape, explicit assignment is refused, and
  * identity columns stay loudly unsupported. */
class GeneratedColumnsSpec extends AnyFunSuite with SparkSpec {

  private def freshCat(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft_gen_$tag").toString
    val cat = s"graft_gen_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    cat
  }

  test("omitted generated column computes from the row's other columns") {
    val cat = freshCat("basic")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, s STRING,
      dbl BIGINT GENERATED ALWAYS AS (id * 2),
      tag STRING GENERATED ALWAYS AS (concat(s, '_', CAST(id AS STRING))))""")
    spark.sql(s"INSERT INTO $cat.t (id, s) VALUES (5, 'a'), (7, 'b')")
    val rows = spark.sql(s"SELECT id, s, dbl, tag FROM $cat.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(rows == Seq((5L, "a", 10L, "a_5"), (7L, "b", 14L, "b_7")))
    // The computed value is STORED (plain physical column): a reader
    // that never heard of generation metadata sees it.
    val raw = spark.read.format("graft.sources.ManifestSink")
      .schema("id BIGINT, s STRING, dbl BIGINT, tag STRING")
      .option("path", spark.conf.get(s"spark.sql.catalog.$cat.base") + "/t")
      .load()
    assert(raw.selectExpr("sum(dbl)").head().getLong(0) == 24L)
  }

  test("explicit assignment of a generated column is refused") {
    val cat = freshCat("refuse")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      dbl BIGINT GENERATED ALWAYS AS (id * 2))""")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t (id, dbl) VALUES (1, 999)")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 0)
    // Explicit NULL and DEFAULT are data too (a VALUES row
    // materializes into the local relation before the write resolves),
    // so naming the column is refused in every spelling — OMITTING it
    // is the contract, and computes.
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t (id, dbl) VALUES (3, NULL)")
    }
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t (id, dbl) VALUES (3, DEFAULT)")
    }
    spark.sql(s"INSERT INTO $cat.t (id) VALUES (3)")
    assert(spark.sql(s"SELECT dbl FROM $cat.t").head().getLong(0) == 6L)
  }

  test("INSERT OVERWRITE computes too; expression survives catalog reload") {
    val cat = freshCat("ovw")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      neg BIGINT GENERATED ALWAYS AS (0 - id))""")
    spark.sql(s"INSERT INTO $cat.t (id) VALUES (1)")
    spark.sql(s"INSERT OVERWRITE $cat.t (id) SELECT id FROM range(10, 12)")
    val rows = spark.sql(s"SELECT id, neg FROM $cat.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((10L, -10L), (11L, -11L)))
  }

  test("identity columns are refused loudly at CREATE") {
    val cat = freshCat("ident")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t (id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)")
    }
    assert(e.getMessage.toLowerCase.contains("identity"), e.getMessage)
  }
}
