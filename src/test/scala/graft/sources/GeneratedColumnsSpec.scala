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

  test("SELECT-NULL and DataFrame lit(null) compute; REPLACE carries the expression") {
    val cat = freshCat("paths")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      dbl BIGINT GENERATED ALWAYS AS (id * 2))""")
    // SELECT projection null-literal: indistinguishable from the
    // analyzer's omitted fill -- computes (documented boundary).
    spark.sql(s"INSERT INTO $cat.t SELECT 4, NULL")
    // The DataFrame API cannot omit a no-default column; the typed
    // null-literal column is its addressing of a generated column.
    import org.apache.spark.sql.functions._
    spark.range(6, 7).toDF("id")
      .withColumn("dbl", lit(null).cast("bigint"))
      .writeTo(s"$cat.t").append()
    val rows = spark.sql(s"SELECT id, dbl FROM $cat.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((4L, 8L), (6L, 12L)))
    // Staged REPLACE (TableInfo path) keeps generation semantics.
    spark.sql(s"""REPLACE TABLE $cat.t (id BIGINT,
      tri BIGINT GENERATED ALWAYS AS (id * 3))""")
    spark.sql(s"INSERT INTO $cat.t (id) VALUES (2)")
    assert(spark.sql(s"SELECT tri FROM $cat.t").head().getLong(0) == 6L)
  }

  test("invalid generation expressions are refused at CREATE, not at insert") {
    val cat = freshCat("valid")
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.bad1 (id BIGINT,
        x BIGINT GENERATED ALWAYS AS (nosuch + 1))""")
    }
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.bad2 (a BIGINT,
        b BIGINT GENERATED ALWAYS AS (a + 1),
        c BIGINT GENERATED ALWAYS AS (b * 2))""")
    }
    // Dropping/renaming a SOURCE column of a generation expression is
    // refused while the generated column stands; dropping the
    // generated column itself releases it.
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, n BIGINT,
      dbl BIGINT GENERATED ALWAYS AS (n * 2))""")
    intercept[Exception] { spark.sql(s"ALTER TABLE $cat.t DROP COLUMN n") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN n TO m")
    }
    spark.sql(s"ALTER TABLE $cat.t DROP COLUMN dbl")
    spark.sql(s"ALTER TABLE $cat.t DROP COLUMN n")
    spark.sql(s"INSERT INTO $cat.t VALUES (1)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1)
  }

  // ----- Round-17: UPDATE / MERGE semantics. Explicit assignment
  // refuses, updating a SOURCE column recomputes the dependent (stored
  // values never go stale), a MERGE INSERT's omitted column computes.
  // Both physical shapes are pinned — copy-on-write and deletion-
  // vector — because the two interception points differ (the
  // resolved-unaligned command when the fixpoint exposes one; the
  // rewritten ReplaceData/WriteDelta value rows as the deterministic
  // backstop, which fast-resolving merges hit exclusively).

  for (dv <- Seq(false, true))
    test(s"row-level ops refuse/recompute/compute (deletionvectors=$dv)") {
      val cat = freshCat(if (dv) "rldv" else "rlcow")
      val props = if (dv) " TBLPROPERTIES ('deletionvectors'='true')" else ""
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, s STRING,
        dbl BIGINT GENERATED ALWAYS AS (id * 2))$props""")
      spark.sql(s"INSERT INTO $cat.t (id, s) VALUES (1, 'a'), (2, 'b')")
      spark.sql(s"CREATE TABLE $cat.src (id BIGINT, s STRING)")
      spark.sql(s"INSERT INTO $cat.src VALUES (2, 'B'), (3, 'C')")
      def rows(): Seq[(Long, Long)] =
        spark.sql(s"SELECT id, dbl FROM $cat.t ORDER BY id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq

      // Explicit assignment refuses in every row-level spelling.
      intercept[Exception] { spark.sql(s"UPDATE $cat.t SET dbl = 42") }
      intercept[Exception] {
        spark.sql(s"""MERGE INTO $cat.t z USING $cat.src ON z.id = src.id
          WHEN MATCHED THEN UPDATE SET dbl = 777""")
      }
      intercept[Exception] {
        spark.sql(s"""MERGE INTO $cat.t z USING $cat.src ON z.id = src.id
          WHEN MATCHED THEN UPDATE SET s = src.s
          WHEN NOT MATCHED THEN INSERT (id, s, dbl) VALUES (src.id, src.s, 9)""")
      }
      assert(rows() == Seq((1L, 2L), (2L, 4L)), "refused ops changed nothing")

      // UPDATE of a source column recomputes the dependent.
      spark.sql(s"UPDATE $cat.t SET id = id + 10 WHERE id = 1")
      assert(rows() == Seq((2L, 4L), (11L, 22L)))

      // Mixed MERGE: matched update recomputes, not-matched insert
      // computes the omitted column.
      spark.sql(s"""MERGE INTO $cat.t z USING $cat.src ON z.id = src.id
        WHEN MATCHED THEN UPDATE SET id = src.id + 100, s = src.s
        WHEN NOT MATCHED THEN INSERT (id, s) VALUES (src.id, src.s)""")
      assert(rows() == Seq((3L, 6L), (11L, 22L), (102L, 204L)))

      // NOT MATCHED BY SOURCE update recomputes too.
      spark.sql(s"""MERGE INTO $cat.t z USING $cat.src ON z.id = src.id
        WHEN MATCHED AND src.id = 999 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET id = z.id + 1000""")
      assert(rows() == Seq((3L, 6L), (1011L, 2022L), (1102L, 2204L)))

      // Updating a NON-source column leaves the stored value; DELETE
      // is untouched by the rule.
      spark.sql(s"UPDATE $cat.t SET s = 'q' WHERE id = 3")
      assert(rows().head == (3L, 6L))
      spark.sql(s"DELETE FROM $cat.t WHERE id = 3 AND s = 'q'")
      assert(rows() == Seq((1011L, 2022L), (1102L, 2204L)))
    }

  // ----- Round-17: computation parity across payload kind and write
  // shape — the parquet kind computes identically, and the STREAMING
  // epoch sink (where the batch resolution rule never fires) computes
  // through the writer-side [[RowGuards]]: null in = computed value
  // stored, explicit value in = loud refusal.

  test("parquet kind computes generated columns identically") {
    val cat = freshCat("pqgen")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      dbl BIGINT GENERATED ALWAYS AS (id * 2))
      TBLPROPERTIES ('filekind'='parquet')""")
    spark.sql(s"INSERT INTO $cat.t (id) VALUES (5), (7)")
    assert(spark.sql(s"SELECT sum(dbl) FROM $cat.t").head().getLong(0) == 24L)
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t (id, dbl) VALUES (1, 999)")
    }
  }

  test("streaming epoch sink computes generated columns; explicit refuses") {
    val cat = freshCat("stgen")
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.base")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      dbl BIGINT GENERATED ALWAYS AS (id * 2))""")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long](spark)
    src.addData(7L, 9L)
    src.toDF().select(col("value").as("id"),
        lit(null).cast("bigint").as("dbl"))
      .writeStream
      .option("checkpointLocation", s"$wh/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"$cat.t").awaitTermination()
    val rows = spark.sql(s"SELECT id, dbl FROM $cat.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((7L, 14L), (9L, 18L)),
      "the sink computes from the row when the incoming value is null")
    // Explicit values through the stream refuse — same posture as batch.
    val src2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long](spark)
    src2.addData(1L)
    val q = src2.toDF().select(col("value").as("id"),
        lit(42L).as("dbl"))
      .writeStream
      .option("checkpointLocation", s"$wh/ckpt2")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"$cat.t")
    val e = intercept[Exception] { q.awaitTermination() }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("GENERATED ALWAYS"), chain(e))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 2)
  }

  test("identity columns are SUPPORTED since round 17 (see IdentityColumnsSpec)") {
    // Round-16 refused identity at CREATE (analysis-time minting would
    // collide under queued concurrent appends); round-17 lands the
    // commit-time allocation design instead — IdentityColumnsSpec owns
    // the full pin suite. This spec keeps one smoke check so the two
    // generated-column flavors are visibly coherent side by side.
    val cat = freshCat("ident")
    spark.sql(s"""CREATE TABLE $cat.t (
      id BIGINT GENERATED ALWAYS AS IDENTITY,
      n BIGINT,
      dbl BIGINT GENERATED ALWAYS AS (n * 2))""")
    spark.sql(s"INSERT INTO $cat.t (n) VALUES (5), (6)")
    val rows = spark.sql(s"SELECT id, n, dbl FROM $cat.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 5L, 10L), (2L, 6L, 12L)),
      "identity mints and generation computes in the same insert")
  }
}
