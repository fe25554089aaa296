package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ANSI table constraints on GraftCatalog tables (Spark 4's connector
  * constraint API): enforced CHECK constraints are applied by Spark's
  * analyzer on every write — the table only has to persist and REPORT
  * them — while PRIMARY KEY / UNIQUE / FOREIGN KEY are informational
  * catalog metadata. The pins here: persistence round-trips through
  * `_table.json` properties, a violating INSERT fails and leaves the
  * table unchanged, ALTER ADD validates existing rows, and DROP
  * restores unconstrained writes. */
class ConstraintSpec extends AnyFunSuite with SparkSpec {

  private def freshCat(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft_con_$tag").toString
    val cat = s"graft_con_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    cat
  }

  test("enforced CHECK: valid rows land, violating insert fails atomically") {
    val cat = freshCat("check")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, n BIGINT,
      CONSTRAINT n_nonneg CHECK (n >= 0))""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10), (2, 0)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 2)
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (3, 5), (4, -1)")
    }
    assert(e.getMessage.toLowerCase.contains("n_nonneg") ||
      e.getMessage.toLowerCase.contains("check"), e.getMessage)
    // The failed job staged nothing: the two-phase committer never
    // published, so even the VALID row of the violating batch is absent.
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 2)
  }

  test("constraints round-trip the catalog (loadTable reports them)") {
    val cat = freshCat("rt")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, n BIGINT,
      CONSTRAINT n_pos CHECK (n > 0))""")
    val table = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "t"))
    val cons = table.constraints()
    assert(cons.length == 1)
    assert(cons(0).name() == "n_pos" && cons(0).enforced())
    assert(cons(0).asInstanceOf[
      org.apache.spark.sql.connector.catalog.constraints.Check]
      .predicateSql().contains("n > 0"))
  }

  test("ALTER ADD CONSTRAINT validates existing rows; DROP lifts the gate") {
    val cat = freshCat("alter")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, n BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 5), (2, -3)")
    // Existing data violates: the ALTER itself must fail.
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT n_nonneg CHECK (n >= 0)")
    }
    // Clean the violating row, then the constraint lands and enforces.
    spark.sql(s"DELETE FROM $cat.t WHERE n < 0")
    spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT n_nonneg CHECK (n >= 0)")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (3, -1)")
    }
    spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT n_nonneg")
    spark.sql(s"INSERT INTO $cat.t VALUES (3, -1)") // unconstrained again
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 2)
  }

  test("informational PRIMARY KEY and FOREIGN KEY persist and report") {
    val cat = freshCat("pkfk")
    spark.sql(s"""CREATE TABLE $cat.dim (id BIGINT,
      CONSTRAINT dim_pk PRIMARY KEY (id) RELY)""")
    spark.sql(s"""CREATE TABLE $cat.fact (fid BIGINT, dim_id BIGINT,
      CONSTRAINT fact_fk FOREIGN KEY (dim_id) REFERENCES $cat.dim (id))""")
    def consOf(t: String) = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, t)).constraints()
    val pk = consOf("dim")
    assert(pk.length == 1 && pk(0).name() == "dim_pk" && pk(0).rely())
    assert(pk(0).asInstanceOf[
      org.apache.spark.sql.connector.catalog.constraints.PrimaryKey]
      .columns().map(_.fieldNames().mkString(".")).toSeq == Seq("id"))
    val fk = consOf("fact")
    assert(fk.length == 1 && fk(0).name() == "fact_fk")
    val f = fk(0).asInstanceOf[
      org.apache.spark.sql.connector.catalog.constraints.ForeignKey]
    assert(f.columns().map(_.fieldNames().mkString(".")).toSeq == Seq("dim_id"))
    assert(f.referencedTable().name() == "dim")
    assert(f.referencedColumns().map(_.fieldNames().mkString(".")).toSeq ==
      Seq("id"))
    // Informational only: writes are not gated.
    spark.sql(s"INSERT INTO $cat.fact VALUES (1, 999)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.fact").head().getLong(0) == 1)
  }

  test("REPLACE TABLE carries constraints (TableInfo staging path)") {
    val cat = freshCat("rtascon")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"""REPLACE TABLE $cat.t (id BIGINT, n BIGINT,
      CONSTRAINT n_nonneg CHECK (n >= 0))""")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (1, -5)")
    }
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 5)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1)
  }

  test("drop/rename of a constrained column refuses; TBLPROPERTIES namespace is guarded") {
    val cat = freshCat("guards")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, n BIGINT,
      CONSTRAINT n_nonneg CHECK (n >= 0))""")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t DROP COLUMN n")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN n TO m")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t UNSET TBLPROPERTIES ('graft.constraint.n_nonneg')")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('graft.constraint.x'='{}')")
    }
    // The enforced check must still be live after all four refusals.
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (1, -1)")
    }
    // Dropping via the front door lifts both the gate and the guard.
    spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT n_nonneg")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN n TO m")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, -1)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1)
  }

  test("staged tables report constraints (write validation sees them)") {
    // The SQL grammar cannot spell a constraint-carrying RTAS, but the
    // connector API can: the staged table must forward constraints()
    // or Spark's analyzer would plant no validation on the staged
    // write and violating data would land under an "enforced" check.
    val cat = freshCat("staged")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    val catalog = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.StagingTableCatalog]
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    import org.apache.spark.sql.connector.expressions.Expressions
    val con = Constraint.check("n_nonneg").predicateSql("n >= 0")
      .enforced(true).build()
    val info = new org.apache.spark.sql.connector.catalog.TableInfo.Builder()
      .withColumns(Array(
        org.apache.spark.sql.connector.catalog.Column.create("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.connector.catalog.Column.create("n",
          org.apache.spark.sql.types.LongType)))
      .withConstraints(Array(con))
      .withProperties(java.util.Collections.emptyMap[String, String]())
      .withPartitions(Array.empty[org.apache.spark.sql.connector.expressions.Transform])
      .build()
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty, "t")
    val staged = catalog.stageReplace(ident, info)
    try {
      assert(staged.constraints().map(_.name()).toSeq == Seq("n_nonneg"),
        "staged table must forward its constraints to the analyzer")
    } finally staged.abortStagedChanges()
    val staged2 = catalog.stageCreateOrReplace(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "t2"), info)
    try {
      assert(staged2.constraints().map(_.name()).toSeq == Seq("n_nonneg"))
    } finally staged2.abortStagedChanges()
  }

  test("CHECK survives ALTER of unrelated properties and renders in DESCRIBE") {
    val cat = freshCat("desc")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, lang STRING,
      CONSTRAINT lang_set CHECK (lang IN ('en', 'de', 'fr')))""")
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('owner_team'='data')")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (1, 'xx')")
    }
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'en')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1)
  }

  // ----- Round-17: the ADD CONSTRAINT / concurrent-writer race, both
  // halves. ManifestTable.version() reports the manifest generation;
  // Spark stamps the generation its validation scan read into
  // TableChange.AddConstraint.validatedTableVersion and alterTable
  // refuses a stale one (ALTER side). A write PLANNED before the
  // constraint landed carries no validation for it, so its COMMIT
  // refuses (writer side — requireNoConstraintDrift).

  test("table version is the manifest generation; stale validatedTableVersion refuses the swap") {
    val cat = freshCat("ver")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, n BIGINT)")
    val catalog = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty, "t")
    assert(catalog.loadTable(ident).version() == "0")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10)")
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 20)")
    assert(catalog.loadTable(ident).version() == "2",
      "each commit bumps the reported table version")
    val con = org.apache.spark.sql.connector.catalog.constraints.Constraint
      .check("n_nonneg").predicateSql("n >= 0").enforced(true)
      .validationStatus(org.apache.spark.sql.connector.catalog.constraints
        .Constraint.ValidationStatus.VALID)
      .build()
    // Validated against generation 1, but the table is at 2: the row
    // committed in between was never scanned — refuse.
    val stale = intercept[Exception] {
      catalog.alterTable(ident,
        org.apache.spark.sql.connector.catalog.TableChange
          .addConstraint(con, "1"))
    }
    assert(stale.getMessage.contains("validated against table version"),
      stale.getMessage)
    assert(catalog.loadTable(ident).constraints().isEmpty,
      "refused constraint must not persist")
    // Matching version: lands.
    catalog.alterTable(ident,
      org.apache.spark.sql.connector.catalog.TableChange
        .addConstraint(con, "2"))
    assert(catalog.loadTable(ident).constraints().map(_.name()).toSeq ==
      Seq("n_nonneg"))
    // And the SQL front door still works end-to-end (Spark supplies the
    // version its own validation scan actually read).
    spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT n_nonneg")
    spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT n_small CHECK (n < 1000)")
    assert(catalog.loadTable(ident).constraints().map(_.name()).toSeq ==
      Seq("n_small"))
  }

  test("a write planned without the table's CHECK cannot publish (commit-side drift check)") {
    val wh = Files.createTempDirectory("graft_con_drift").toString
    val cat = "graft_con_drift"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, n BIGINT, " +
      "CONSTRAINT n_nonneg CHECK (n >= 0))")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10)")
    // A PATH-routed append into the same directory resolves a table
    // object with no catalog properties: the analyzer sees no
    // constraints and plants no validation — before round-17 this was
    // a silent enforcement bypass; now the commit refuses, even for
    // rows that happen to satisfy the predicate (they were never
    // CHECKED, which is what the constraint's VALID status asserts).
    import spark.implicits._
    val dir = java.nio.file.Paths.get(wh, "t").toString
    val e = intercept[Exception] {
      Seq((9L, -5L)).toDF("id", "n").write
        .format("graft.sources.ManifestSink").option("path", dir)
        .mode("append").save()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("after this write was planned"), chain(e))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1,
      "refused write must publish nothing")
    // The catalog route (analysis sees the constraint) still lands.
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 5)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 2)
  }

  // ----- Round-17: enforcement parity across payload kind and write
  // shape. a67 minted CHECK on the default NDJSON kind via batch
  // writes; these pin the parquet kind and the STREAMING epoch sink —
  // where Spark's analyzer plants nothing and the writer-side
  // [[RowGuards]] enforce instead.

  test("parquet kind: violating batch publishes nothing") {
    val cat = freshCat("pq")
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, n BIGINT,
      CONSTRAINT n_nonneg CHECK (n >= 0))
      TBLPROPERTIES ('filekind'='parquet')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10)")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (2, 5), (3, -1)")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1,
      "the valid row of a violating parquet batch must not land either")
  }

  for ((kind, props) <- Seq(
      ("ndjson", ""),
      ("parquet", " TBLPROPERTIES ('filekind'='parquet')")))
    test(s"streaming epoch sink: a violating micro-batch publishes nothing ($kind)") {
      val cat = freshCat(s"st$kind")
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.base")
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, n BIGINT,
        CONSTRAINT n_small CHECK (n < 100))$props""")
      import spark.implicits._
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)](spark)
      src.addData((1L, 5L), (2L, 500L)) // 500 violates
      val q = src.toDF().toDF("id", "n").writeStream
        .option("checkpointLocation", s"$wh/ckpt_$kind")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$cat.t")
      val e = intercept[Exception] { q.awaitTermination() }
      def chain(t: Throwable): String =
        if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
      assert(chain(e).contains("CHECK_CONSTRAINT_VIOLATION"), chain(e))
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 0,
        "the violating epoch must publish NOTHING — not even its valid row")
      // A clean stream into the same table lands (the guard is not a
      // blanket refusal).
      val src2 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)](spark)
      src2.addData((1L, 5L), (2L, 50L))
      src2.toDF().toDF("id", "n").writeStream
        .option("checkpointLocation", s"$wh/ckpt2_$kind")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$cat.t").awaitTermination()
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 2)
    }
}
