package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Write-side schema evolution (`mergeschema`): a table that declares
  * TBLPROPERTIES('mergeschema'='true') takes ACCEPT_ANY_SCHEMA, the
  * connector re-resolves every write ([[SchemaEvolution.resolveWrite]]),
  * and appends that ADD or WIDEN columns evolve the table schema inside
  * the same publish-lock critical section as the data commit. The
  * reference's everyday hazard is exactly this (`dags/users_etl.py:143`
  * derives its columns from the first row's keys — upstream payloads
  * shift weekly); these tests pin the acceptance paths, the refusal
  * paths, and the analyzer-stand-down shapes (positional INSERT VALUES,
  * column lists) that ACCEPT_ANY_SCHEMA would otherwise silently break. */
class MergeSchemaSpec extends AnyFunSuite with SparkSpec {

  private var n = 0
  /** Fresh catalog per test — catalog confs are session-global. */
  private def catalog(): (String, String) = {
    n += 1
    val cat = s"gms$n"
    val wh = Files.createTempDirectory(s"graft_$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    (cat, wh)
  }

  // ---------- resolveWrite unit invariants ----------

  test("tokenCompatible: identity, upcasts, integral->float/double, nothing else") {
    val se = SchemaEvolution
    assert(se.tokenCompatible(IntegerType, IntegerType))
    assert(se.tokenCompatible(IntegerType, LongType))
    assert(se.tokenCompatible(LongType, DoubleType))
    assert(se.tokenCompatible(ByteType, FloatType))
    assert(se.tokenCompatible(FloatType, DoubleType))
    assert(!se.tokenCompatible(LongType, IntegerType))   // narrowing
    assert(!se.tokenCompatible(DoubleType, FloatType))   // narrowing
    assert(!se.tokenCompatible(DoubleType, LongType))    // lossy
    assert(!se.tokenCompatible(StringType, LongType))
    assert(!se.tokenCompatible(LongType, StringType))    // token would parse,
    // but accepting it would hide real mistakes — casts must be explicit
  }

  test("resolveWrite: by-name with evolution, positional, and the error shapes") {
    val table = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType)))
    def resolve(q: StructType, merge: Boolean = true,
        retired: Set[String] = Set.empty) =
      SchemaEvolution.resolveWrite(q, table, retired, merge, Set.empty, "t")

    // By-name, extra column -> new column, order-free.
    val r1 = resolve(StructType(Seq(StructField("grade", LongType),
      StructField("doc_id", LongType), StructField("lang", StringType))))
    assert(r1.writeSchema.fieldNames.toSeq == Seq("grade", "doc_id", "lang"))
    assert(r1.newCols.map(_.name) == Seq("grade"))
    assert(r1.newCols.head.nullable) // added nullable regardless of query
    // Positional: no name matches, equal arity -> table names, no evolution.
    val r2 = resolve(StructType(Seq(StructField("col1", LongType),
      StructField("col2", StringType))))
    assert(r2.writeSchema.fieldNames.toSeq == Seq("doc_id", "lang"))
    assert(r2.newCols.isEmpty && r2.widens.isEmpty)
    // Case-insensitive unique match resolves to the table's spelling.
    val r3 = resolve(StructType(Seq(StructField("DOC_ID", LongType),
      StructField("lang", StringType))))
    assert(r3.writeSchema.fieldNames.toSeq == Seq("doc_id", "lang"))
    // NullType adopts the matched table type (INSERT ... VALUES (1, NULL)).
    val r4 = resolve(StructType(Seq(StructField("col1", LongType),
      StructField("col2", NullType))))
    assert(r4.writeSchema("lang").dataType == StringType)
    // Widen: query LONG over table INT.
    val intTable = StructType(Seq(StructField("a", IntegerType)))
    val r5 = SchemaEvolution.resolveWrite(
      StructType(Seq(StructField("a", LongType))), intTable,
      Set.empty, true, Set.empty, "t")
    assert(r5.widens == Map("a" -> LongType))
    // ...but refused without mergeschema.
    assertThrows[IllegalArgumentException](SchemaEvolution.resolveWrite(
      StructType(Seq(StructField("a", LongType))), intTable,
      Set.empty, false, Set.empty, "t"))
    // ...and refused on a bucket-source column even with it.
    assertThrows[IllegalArgumentException](SchemaEvolution.resolveWrite(
      StructType(Seq(StructField("a", LongType))), intTable,
      Set.empty, true, Set("a"), "t"))
    // New column without mergeschema -> loud, actionable.
    val e1 = intercept[IllegalArgumentException](
      resolve(StructType(Seq(StructField("doc_id", LongType),
        StructField("grade", LongType))), merge = false))
    assert(e1.getMessage.contains("mergeschema"))
    // Retired rename-log name -> refused even with mergeschema.
    val e2 = intercept[IllegalArgumentException](
      resolve(StructType(Seq(StructField("doc_id", LongType),
        StructField("old_lang", StringType))), retired = Set("old_lang")))
    assert(e2.getMessage.contains("retired"))
    // No match, wrong arity -> alias guidance.
    val e3 = intercept[IllegalArgumentException](
      resolve(StructType(Seq(StructField("x", LongType)))))
    assert(e3.getMessage.contains("alias"))
    // Untyped NULL as a NEW column -> refused (cannot type it).
    assertThrows[IllegalArgumentException](
      resolve(StructType(Seq(StructField("doc_id", LongType),
        StructField("mystery", NullType)))))
    // TWO query columns resolving to the SAME table column ('DOC_ID'
    // case-insensitive alongside 'doc_id') -> refused: both would render
    // the same payload key and the reader's last-wins parse would
    // silently drop one value.
    val e4 = intercept[IllegalArgumentException](
      resolve(StructType(Seq(StructField("doc_id", LongType),
        StructField("DOC_ID", LongType), StructField("lang", StringType)))))
    assert(e4.getMessage.contains("resolve to table column 'doc_id'") &&
      e4.getMessage.contains("'DOC_ID'"), e4.getMessage)
  }

  // ---------- end-to-end: the acceptance paths ----------

  test("append with a new column evolves the schema in the same commit") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (doc_id BIGINT, lang STRING)
      TBLPROPERTIES ('mergeschema'='true')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'en'), (2, 'fr')") // positional
    spark.sql(s"""INSERT INTO $cat.t
      SELECT CAST(3 AS BIGINT) AS doc_id, 'de' AS lang,
             CAST(7 AS BIGINT) AS grade""")
    // Schema evolved; pre-evolution rows read null (absent payload key).
    assert(spark.table(s"$cat.t").schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "grade"))
    val rows = spark.sql(s"SELECT doc_id, grade FROM $cat.t ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq == Seq((1L, -1L), (2L, -1L), (3L, 7L)))
    // The old files were NOT rewritten: still exactly the first commit's
    // payload bytes (no 'grade' key anywhere in them).
    val dataFiles = Files.list(Paths.get(wh, "t")).toArray.map(_.toString)
      .filter(p => p.contains("part-") && !p.contains("manifest"))
    assert(dataFiles.nonEmpty)
    val firstCommit = dataFiles.filter(p =>
      new String(Files.readAllBytes(Paths.get(p))).contains("\"en\""))
    assert(firstCommit.nonEmpty &&
      firstCommit.forall(p => !new String(Files.readAllBytes(Paths.get(p)))
        .contains("grade")))
  }

  test("DataFrame writeTo append evolves; subset append reads null") {
    val (cat, _) = catalog()
    import spark.implicits._
    spark.sql(s"""CREATE TABLE $cat.t (doc_id BIGINT, lang STRING)
      TBLPROPERTIES ('mergeschema'='true')""")
    Seq((1L, "en", 5L)).toDF("doc_id", "lang", "grade").writeTo(s"$cat.t").append()
    // Subset append: 'grade' and 'lang' omitted entirely.
    Seq(2L).toDF("doc_id").writeTo(s"$cat.t").append()
    val rows = spark.sql(
      s"SELECT doc_id, lang, grade FROM $cat.t ORDER BY doc_id").collect()
    assert(rows(0).getLong(2) == 5L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("widen on write: INT table column takes LONG appends, pre-widen rows intact") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (doc_id INT, n INT)
      TBLPROPERTIES ('mergeschema'='true')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10)")
    spark.sql(s"""INSERT INTO $cat.t
      SELECT CAST(2 AS BIGINT) AS doc_id, CAST(4000000000 AS BIGINT) AS n""")
    val sch = spark.table(s"$cat.t").schema
    assert(sch("doc_id").dataType == LongType && sch("n").dataType == LongType)
    assert(spark.sql(s"SELECT CAST(sum(n) AS BIGINT) FROM $cat.t")
      .collect()(0).getLong(0) == 4000000010L)
    // Narrower write after the widen: accepted, no further evolution
    // (int tokens re-parse under the bigint reader).
    spark.sql(s"INSERT INTO $cat.t SELECT CAST(3 AS INT), CAST(5 AS INT)")
    assert(spark.table(s"$cat.t").schema("n").dataType == LongType)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE n = 5")
      .collect()(0).getLong(0) == 1L)
  }

  test("analyzer-stand-down shapes: column list, names-differ SELECT *") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (doc_id BIGINT, lang STRING)
      TBLPROPERTIES ('mergeschema'='true')""")
    // INSERT with a column list (subset) — absent column reads null.
    spark.sql(s"INSERT INTO $cat.t (doc_id) VALUES (5)")
    val r = spark.sql(s"SELECT doc_id, lang FROM $cat.t").collect()(0)
    assert(r.getLong(0) == 5L && r.isNullAt(1))
    // SELECT * with foreign names and matching arity -> positional.
    spark.range(1).selectExpr("CAST(9 AS BIGINT) AS a", "'it' AS b")
      .createOrReplaceTempView("gms_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM gms_src")
    assert(spark.sql(s"SELECT lang FROM $cat.t WHERE doc_id = 9")
      .collect()(0).getString(0) == "it")
  }

  test("evolution composes with RENAME: new name evolves, retired name refuses") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, lang STRING)
      TBLPROPERTIES ('mergeschema'='true')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'en')")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN id TO doc_id")
    // Append under the CURRENT name with a new column: fine.
    spark.sql(s"""INSERT INTO $cat.t
      SELECT CAST(2 AS BIGINT) AS doc_id, 'fr' AS lang, CAST(1 AS BIGINT) AS g""")
    assert(spark.sql(s"SELECT sum(doc_id) FROM $cat.t")
      .collect()(0).getLong(0) == 3L)
    // A write whose unmatched column is the RETIRED vintage name must
    // refuse — old files still carry the 'id' payload key, which would
    // leak into the "new" column.
    val e = intercept[Exception](spark.sql(s"""INSERT INTO $cat.t
      SELECT CAST(3 AS BIGINT) AS doc_id, 'de' AS lang, CAST(9 AS BIGINT) AS id"""))
    assert(e.getMessage.contains("retired"))
  }

  test("partitioned mergeschema table: evolution keeps pruning exact") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (doc_id BIGINT, lang STRING)
      PARTITIONED BY (lang) TBLPROPERTIES ('mergeschema'='true')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'en'), (2, 'fr')")
    spark.sql(s"""INSERT INTO $cat.t
      SELECT CAST(3 AS BIGINT) AS doc_id, 'en' AS lang, CAST(7 AS BIGINT) AS g""")
    assert(spark.sql(s"SELECT CAST(sum(doc_id) AS BIGINT) FROM $cat.t WHERE lang = 'en'")
      .collect()(0).getLong(0) == 4L)
    // A write MISSING the partition column still refuses loudly.
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.t (doc_id) VALUES (4)"))
    assert(e.getMessage.contains("partitionBy column 'lang'"))
  }

  // ---------- refusal paths ----------

  test("without mergeschema nothing changed: extra column still refuses") {
    val (cat, _) = catalog()
    spark.sql(s"CREATE TABLE $cat.t (doc_id BIGINT, lang STRING)")
    // No ACCEPT_ANY_SCHEMA -> Spark's own analysis-time error.
    val e = intercept[Exception](spark.sql(s"""INSERT INTO $cat.t
      SELECT CAST(1 AS BIGINT) AS doc_id, 'en' AS lang, CAST(2 AS BIGINT) AS g"""))
    assert(e.getMessage.toLowerCase.contains("column"))
    assert(spark.table(s"$cat.t").schema.length == 2) // schema untouched
  }

  test("type conflict and lossy widen refuse loudly") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (doc_id BIGINT, lang STRING)
      TBLPROPERTIES ('mergeschema'='true')""")
    val e1 = intercept[Exception](spark.sql(
      s"INSERT INTO $cat.t SELECT 'oops' AS doc_id, 'en' AS lang"))
    assert(e1.getMessage.contains("no lossless"))
    // DOUBLE over BIGINT is lossy in both directions -> refuse.
    val e2 = intercept[Exception](spark.sql(
      s"INSERT INTO $cat.t SELECT CAST(1.5 AS DOUBLE) AS doc_id, 'en' AS lang"))
    assert(e2.getMessage.contains("no lossless"))
  }

  test("diverged CURRENT default refuses subset appends") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (doc_id BIGINT, lang STRING)
      TBLPROPERTIES ('mergeschema'='true')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'en')")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN grade BIGINT DEFAULT 2")
    // CURRENT == EXISTS: omitting grade is fine, absent keys read 2.
    spark.sql(s"INSERT INTO $cat.t (doc_id, lang) VALUES (2, 'fr')")
    assert(spark.sql(s"SELECT CAST(sum(grade) AS BIGINT) FROM $cat.t")
      .collect()(0).getLong(0) == 4L)
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN grade SET DEFAULT 5")
    // CURRENT (5) now differs from what an absent key reads back (2):
    // omitting the column would silently write the wrong default.
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.t (doc_id, lang) VALUES (3, 'de')"))
    assert(e.getMessage.contains("CURRENT"))
    // Supplying it explicitly still works.
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 'de', 5)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").collect()(0).getLong(0) == 3L)
  }

  test("path-based write: mergeschema option allows the schema drift") {
    val dir = Files.createTempDirectory("graft_gms_path").toString
    import spark.implicits._
    Seq((1L, "en")).toDF("doc_id", "lang").write
      .format("graft.sources.ManifestSink").option("path", dir)
      .mode("append").save()
    // Appending a drifted frame: new key just lands in the new file's
    // payloads (path tables have no persisted schema to evolve).
    Seq((2L, "fr", 7L)).toDF("doc_id", "lang", "grade").write
      .format("graft.sources.ManifestSink").option("path", dir)
      .option("mergeschema", "true").mode("append").save()
    val sch = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("grade", LongType)))
    val rows = spark.read.format("graft.sources.ManifestSink").schema(sch)
      .option("path", dir).load().orderBy("doc_id").collect()
    assert(rows(0).isNullAt(2) && rows(1).getLong(2) == 7L)
  }

  test("streaming epoch writes evolve too: a drifted stream adds the column") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, lang STRING)
      TBLPROPERTIES ('mergeschema'='true')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'en')")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Long]
    src.addData(2L, 3L)
    // The drifted upstream arrives THROUGH the stream: one more column,
    // no ALTER — the first epoch commit evolves the table metadata
    // inside its publish-lock critical section.
    val q = src.toDF()
      .selectExpr("value AS id", "'fr' AS lang", "value * 10 AS grade")
      .writeStream.format("graft.sources.ManifestSink")
      .option("path", s"$wh/t").option("mergeschema", "true")
      .option("checkpointLocation",
        Files.createTempDirectory("gms_st_ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table(s"$cat.t").schema.fieldNames.toSeq ==
      Seq("id", "lang", "grade"))
    val rows = spark.sql(s"SELECT id, grade FROM $cat.t ORDER BY id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq == Seq((1L, -1L), (2L, 20L), (3L, 30L)))
  }

  test("incremental MV refresh crosses a schema evolution: the delta " +
      "fold stays exact") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.base (g STRING, v BIGINT)
      TBLPROPERTIES ('mergeschema'='true', 'retainHistory'='true')""")
    spark.sql(s"""INSERT INTO $cat.base
      SELECT CASE id % 2 WHEN 0 THEN 'a' ELSE 'b' END, id
      FROM range(100)""")
    MaterializedViews.createAvg(spark, cat, "stats", "base", "base_mv",
      "g", "v")
    // The delta WINDOW contains a schema evolution: the drifted append
    // adds a column mid-window. The refresh projects the MV's own
    // columns; pre/post-evolution files both serve them.
    spark.sql(s"""INSERT INTO $cat.base
      SELECT CASE id % 2 WHEN 0 THEN 'a' ELSE 'b' END AS g,
             id AS v, id * 3 AS extra
      FROM range(100, 200)""")
    MaterializedViews.refresh(spark, cat, "base_mv")
    val got = spark.sql(s"SELECT g, sum_v, cnt_v FROM $cat.stats")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val truth = spark.sql(
      s"SELECT g, sum(v), count(v) FROM $cat.base GROUP BY g")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == truth, s"$got vs $truth")
    // And the evolved column reads through: old rows null, new rows set.
    assert(spark.sql(s"SELECT CAST(sum(extra) AS BIGINT) FROM $cat.base")
      .head().getLong(0) == (100L until 200L).map(_ * 3).sum)
  }

  test("oracle parity: evolved table hash-matches a never-evolved control") {
    val (cat, _) = catalog()
    import spark.implicits._
    val docs = (1L to 100L).map(i =>
      (i, if (i % 3 == 0) "en" else "fr", i * 10))
    spark.sql(s"""CREATE TABLE $cat.evolved (doc_id BIGINT, lang STRING)
      TBLPROPERTIES ('mergeschema'='true')""")
    docs.filter(_._1 % 2 == 0).map(d => (d._1, d._2)).toDF("doc_id", "lang")
      .writeTo(s"$cat.evolved").append()
    docs.filter(_._1 % 2 == 1).toDF("doc_id", "lang", "n")
      .writeTo(s"$cat.evolved").append()
    spark.sql(s"CREATE TABLE $cat.control (doc_id BIGINT, lang STRING, n BIGINT)")
    docs.map(d => (d._1, d._2, if (d._1 % 2 == 0) None else Some(d._3)))
      .toDF("doc_id", "lang", "n").writeTo(s"$cat.control").append()
    val a = spark.table(s"$cat.evolved").orderBy("doc_id").collect().toSeq
    val b = spark.table(s"$cat.control").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  // ----- Round-17: MERGE INTO ... WITH SCHEMA EVOLUTION — the CDC
  // shape where the upstream adds a field mid-stream. Spark's own
  // ResolveMergeIntoSchemaEvolution consults the table's
  // AUTOMATIC_SCHEMA_EVOLUTION capability, routes the source's
  // new/widened columns through GraftCatalog.alterTable (the a51/a55
  // machinery), and re-resolves against the evolved table. Pinned on
  // both payload kinds plus the widen path. Deliberately DISJOINT from
  // `mergeschema`: ACCEPT_ANY_SCHEMA makes Spark skip merge resolution
  // entirely, so SQL MERGE on such tables fails loudly instead
  // (GraftMergeGuard, pinned below).

  for ((kind, props) <- Seq(
      ("ndjson", ""),
      ("parquet", " TBLPROPERTIES ('filekind'='parquet')")))
    test(s"MERGE WITH SCHEMA EVOLUTION adds source columns ($kind kind)") {
      val (cat, _) = catalog()
      spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v STRING)$props")
      spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a'), (2, 'b')")
      spark.sql(s"CREATE TABLE $cat.src (id BIGINT, v STRING, extra BIGINT)")
      spark.sql(s"INSERT INTO $cat.src VALUES (2, 'B', 20), (3, 'C', 30)")
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t z USING $cat.src
        ON z.id = src.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val rows = spark.sql(s"SELECT id, v, extra FROM $cat.t ORDER BY id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
      // Pre-evolution row 1 reads the new column as null; matched row 2
      // took the update; row 3 inserted with the new column.
      assert(rows == Seq((1L, "a", -1L), (2L, "B", 20L), (3L, "C", 30L)))
      assert(spark.table(s"$cat.t").schema.fieldNames.toSeq ==
        Seq("id", "v", "extra"), "the schema itself must evolve")
      // A plain MERGE (no clause) must NOT evolve: unknown columns err.
      intercept[Exception] {
        spark.sql(s"""MERGE INTO $cat.t z USING $cat.src ON z.id = src.id
          WHEN MATCHED THEN UPDATE SET nope = src.extra""")
      }
    }

  test("evolving MERGE widens INT to the source's BIGINT") {
    val (cat, _) = catalog()
    spark.sql(s"CREATE TABLE $cat.w (id BIGINT, n INT)")
    spark.sql(s"INSERT INTO $cat.w VALUES (1, 5), (2, 7)")
    spark.sql(s"CREATE TABLE $cat.wsrc (id BIGINT, n BIGINT)")
    spark.sql(s"INSERT INTO $cat.wsrc VALUES (1, 6000000000)")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.w z USING $cat.wsrc
      ON z.id = wsrc.id WHEN MATCHED THEN UPDATE SET n = wsrc.n""")
    val rows = spark.sql(s"SELECT id, n FROM $cat.w ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 6000000000L), (2L, 7L)),
      "pre-widen rows re-read exactly under the wider type")
  }

  test("SQL MERGE on a mergeschema table fails with the actionable guard") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.m (id BIGINT, v STRING)
      TBLPROPERTIES ('mergeschema'='true')""")
    spark.sql(s"CREATE TABLE $cat.msrc (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.msrc VALUES (1, 'a')")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.m z USING $cat.msrc ON z.id = msrc.id
        WHEN MATCHED THEN UPDATE SET v = msrc.v""")
    }
    assert(e.getMessage.contains("mergeschema=true"),
      s"the guard must name the cause, got: ${e.getMessage.take(200)}")
  }
}
