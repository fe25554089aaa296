package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** GENERATED ALWAYS AS IDENTITY ([[GraftIdentity]]): values allocated
  * at COMMIT time under the publish lock — writers store negative
  * local placeholders, the commit assigns per-file bases against the
  * persisted `_idhwm` high-water mark, readers resolve placeholders
  * through the manifest's `idbase`. The design exists for exactly one
  * reason, pinned here: QUEUED CONCURRENT APPENDS (a63 semantics) must
  * allocate disjoint ranges without re-planning, which analysis-time
  * minting cannot do. */
class IdentityColumnsSpec extends AnyFunSuite with SparkSpec {

  private def freshCat(tag: String): (String, String) = {
    val wh = Files.createTempDirectory(s"graft_idc_$tag").toString
    val cat = s"graft_idc_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    (cat, wh)
  }

  private def rows(cat: String, t: String): Seq[(Long, String)] =
    spark.sql(s"SELECT id, v FROM $cat.$t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("sequential inserts mint dense continuing ids; start/step honored") {
    val (cat, _) = freshCat("seq")
    spark.sql(s"""CREATE TABLE $cat.t (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('a'), ('b'), ('c')")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('d'), ('e')")
    assert(rows(cat, "t") ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    spark.sql(s"""CREATE TABLE $cat.t2 (
      id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 10),
      v STRING)""")
    spark.sql(s"INSERT INTO $cat.t2 (v) VALUES ('a'), ('b')")
    assert(rows(cat, "t2") == Seq((100L, "a"), (110L, "b")))
  }

  test("explicit assignment refuses in every write shape") {
    val (cat, _) = freshCat("refuse")
    spark.sql(s"""CREATE TABLE $cat.t (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('a')")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t (id, v) VALUES (999, 'x')")
    }
    intercept[Exception] { spark.sql(s"UPDATE $cat.t SET id = 7") }
    spark.sql(s"CREATE TABLE $cat.src (k STRING)")
    spark.sql(s"INSERT INTO $cat.src VALUES ('a')")
    intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.t USING $cat.src ON t.v = src.k
        WHEN MATCHED THEN UPDATE SET id = 5""")
    }
    assert(rows(cat, "t") == Seq((1L, "a")), "refused ops changed nothing")
  }

  test("ids never reuse after DELETE; UPDATE/MERGE carry values through") {
    val (cat, _) = freshCat("carry")
    spark.sql(s"""CREATE TABLE $cat.t (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('a'), ('b'), ('c')")
    spark.sql(s"DELETE FROM $cat.t WHERE id = 3")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('d')") // takes 4, never 3
    spark.sql(s"UPDATE $cat.t SET v = 'bb' WHERE id = 2") // CoW rewrite
    assert(rows(cat, "t") == Seq((1L, "a"), (2L, "bb"), (4L, "d")))
    // MERGE: matched update carries the id, not-matched insert MINTS.
    spark.sql(s"CREATE TABLE $cat.src (k STRING)")
    spark.sql(s"INSERT INTO $cat.src VALUES ('a'), ('zz')")
    spark.sql(s"""MERGE INTO $cat.t USING $cat.src ON t.v = src.k
      WHEN MATCHED THEN UPDATE SET v = concat(t.v, '!')
      WHEN NOT MATCHED THEN INSERT (v) VALUES (src.k)""")
    assert(rows(cat, "t") ==
      Seq((1L, "a!"), (2L, "bb"), (4L, "d"), (5L, "zz")))
  }

  test("QUEUED CONCURRENT APPENDS allocate disjoint dense ranges") {
    val (cat, _) = freshCat("conc")
    spark.sql(s"""CREATE TABLE $cat.c (
      id BIGINT GENERATED ALWAYS AS IDENTITY, w STRING)""")
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = (1 to 4).map { k =>
      Future {
        spark.sql(
          s"INSERT INTO $cat.c (w) SELECT concat('w$k-', id) FROM range(0, 250)")
      }
    }
    Await.result(Future.sequence(fs), 120.seconds)
    val ids = spark.sql(s"SELECT id FROM $cat.c").collect().map(_.getLong(0))
    assert(ids.length == 1000 && ids.distinct.length == 1000,
      "concurrent appends must never collide")
    assert(ids.min == 1 && ids.max == 1000,
      "lock-serialized allocation leaves no gaps when nothing crashes")
  }

  test("minted files skip concat compaction; CoW materializes and re-opens it") {
    val (cat, wh) = freshCat("compact")
    spark.sql(s"""CREATE TABLE $cat.c (
      id BIGINT GENERATED ALWAYS AS IDENTITY, w STRING)""")
    for (k <- 1 to 3)
      spark.sql(s"INSERT INTO $cat.c (w) SELECT concat('x', id) FROM range(0, 20)")
    assert(ManifestSink.compact(s"$wh/c", 100000) == 0,
      "placeholder-bearing files are not concat candidates")
    spark.sql(s"UPDATE $cat.c SET w = concat(w, '.')") // materializes ids
    assert(ManifestSink.compact(s"$wh/c", 100000) > 0,
      "materialized files compact normally")
    val ids = spark.sql(s"SELECT id FROM $cat.c").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == (1L to 60L), "ids survive CoW + compaction")
  }

  test("parquet kind mints and resolves identically") {
    val (cat, _) = freshCat("pq")
    spark.sql(s"""CREATE TABLE $cat.t (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)
      TBLPROPERTIES ('filekind'='parquet')""")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('a'), ('b')")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('c')")
    assert(rows(cat, "t") == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t (id, v) VALUES (9, 'x')")
    }
  }

  test("commit-fixed stats make id point lookups prune files") {
    val (cat, wh) = freshCat("prune")
    spark.sql(s"""CREATE TABLE $cat.t (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    for (_ <- 1 to 4)
      spark.sql(s"INSERT INTO $cat.t (v) SELECT concat('v', id) FROM range(0, 100)")
    // Every committed file carries ABSOLUTE id bounds (the commit's
    // range fix — writer-side stats would be relative placeholders),
    // disjoint and jointly covering 1..400 exactly: a point lookup
    // proves all but one file away.
    val entries = ManifestSink.committedEntries(s"$wh/t")
    val idStats = entries.flatMap(_.stats.filter(_.col == "id"))
    assert(idStats.size == entries.size,
      "every file carries absolute id bounds")
    val ranges = idStats.map(s => (s.min.toLong, s.max.toLong)).sorted
    assert(ranges.head._1 == 1L && ranges.last._2 == 400L)
    ranges.sliding(2).foreach {
      case Seq((_, aHi), (bLo, _)) =>
        assert(bLo == aHi + 1, s"ranges must be disjoint+dense: $ranges")
      case _ => ()
    }
    val hit = spark.sql(s"SELECT count(*) FROM $cat.t WHERE id = 150")
      .head.getLong(0)
    assert(hit == 1L)
  }

  test("unsupported identity spellings refuse loudly at CREATE") {
    val (cat, _) = freshCat("bad")
    // BY DEFAULT: explicit values cannot reconcile with commit-time
    // allocation.
    val e1 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.t (
        id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING)""")
    }
    assert(e1.getMessage.contains("GENERATED BY DEFAULT"), e1.getMessage)
    // Non-BIGINT type.
    val e2 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.t (
        id INT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    }
    assert(e2.getMessage.contains("BIGINT"), e2.getMessage)
    // Negative start/step (placeholder encoding needs the sign bit).
    val e3 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.t (
        id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH -5 INCREMENT BY 1),
        v STRING)""")
    }
    assert(e3.getMessage.contains("start >= 0"), e3.getMessage)
    // Identity as partition column / value-consuming surfaces.
    val e4 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.t (
        id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)
        PARTITIONED BY (bucket(4, id))""")
    }
    assert(e4.getMessage.contains("partition"), e4.getMessage)
    val e5 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.t (
        id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING,
        CONSTRAINT idpos CHECK (id > 0))""")
    }
    assert(e5.getMessage.contains("IDENTITY"), e5.getMessage)
  }

  test("TRUNCATE keeps the high-water mark: identity never rewinds") {
    val (cat, _) = freshCat("trunc")
    spark.sql(s"""CREATE TABLE $cat.t (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('a'), ('b')")
    spark.sql(s"TRUNCATE TABLE $cat.t")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('c')")
    assert(rows(cat, "t") == Seq((3L, "c")),
      "post-truncate ids continue (a restored old snapshot must never " +
        "collide with new rows)")
  }

  test("equality-delete keyed on the identity column refuses") {
    val (cat, wh) = freshCat("eqd")
    spark.sql(s"""CREATE TABLE $cat.t (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('a')")
    import spark.implicits._
    val e = intercept[Exception] {
      ManifestOps.equalityDelete(s"$wh/t", Seq(1L).toDF("id"))
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
  }
}
