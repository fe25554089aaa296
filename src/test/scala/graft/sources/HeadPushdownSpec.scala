package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** LIMIT / TOP-N pushdown on the manifest scan
  * ([[ManifestScanBuilder.pushLimit]]/[[ManifestScanBuilder.pushTopN]]):
  * an unordered LIMIT plans only the file prefix covering the asked-for
  * rows, an `ORDER BY k LIMIT n` over bounded files plans only the
  * files that may hold a top-n row (the coverage-cutoff argument — no
  * non-overlap assumption), and every unprovable shape stands down to
  * the full plan. Pushdown is always PARTIAL: Spark keeps its own
  * Sort/Limit, so each pin here also re-checks exact values against
  * what a full scan would return. */
class HeadPushdownSpec extends AnyFunSuite with SparkSpec {

  private def table(name: String, df: DataFrame, files: Int,
      range: Boolean): String = {
    val out = Files.createTempDirectory(s"graft_$name").toString
    val shaped =
      if (range) df.repartitionByRange(files, col("id"))
      else df.repartition(files)
    shaped.write.format("graft.sources.ManifestSink")
      .option("path", out).mode("overwrite").save()
    out
  }

  private def read(out: String): DataFrame =
    spark.read.format("graft.sources.ManifestSink")
      .schema("id BIGINT, v DOUBLE, s STRING")
      .option("path", out).load()

  private def docs(n: Int): DataFrame =
    spark.range(0, n.toLong).toDF("id")
      .withColumn("v", col("id") * 3.5 - 100.0)
      .withColumn("s", concat(lit("row_"), col("id")))

  private def plannedParts(q: DataFrame): Int = {
    q.collect()
    q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.getNumPartitions
    }.get
  }

  private def ids(q: DataFrame): Seq[Long] =
    q.select("id").collect().map(_.getLong(0)).toSeq

  test("unordered LIMIT plans a file prefix, not the table") {
    val out = table("hp_limit", docs(4000), 8, range = true)
    val q = read(out).limit(5)
    assert(q.count() == 5)
    assert(plannedParts(q) == 1,
      "a 5-row limit over 8 x 500-row files must plan exactly one file")
    // A limit past the table keeps every file and yields every row.
    val all = read(out).limit(100000)
    assert(all.count() == 4000)
    assert(plannedParts(all) == 8)
  }

  test("ORDER BY ASC/DESC LIMIT plans only boundary files, exact rows") {
    val out = table("hp_topn", docs(4000), 8, range = true)
    val asc = read(out).orderBy(col("id")).limit(3)
    assert(ids(asc) == Seq(0L, 1L, 2L))
    assert(plannedParts(asc) == 1, "top-3 ascending lives in file 1 of 8")
    val desc = read(out).orderBy(col("id").desc).limit(3)
    assert(ids(desc) == Seq(3999L, 3998L, 3997L))
    assert(plannedParts(desc) == 1, "top-3 descending lives in file 8 of 8")
    // Secondary sort keys don't block pruning on the primary key.
    val multi = read(out).orderBy(col("id"), col("v").desc).limit(3)
    assert(ids(multi) == Seq(0L, 1L, 2L))
    assert(plannedParts(multi) == 1)
    // DOUBLE primary key prunes too (exact-bound numeric type).
    val dbl = read(out).orderBy(col("v")).limit(2)
    assert(ids(dbl) == Seq(0L, 1L))
    assert(plannedParts(dbl) == 1)
  }

  test("overlapping file bounds: coverage keeps every candidate, result exact") {
    // Round-robin layout: every file's id range spans the whole table,
    // so the coverage cutoff keeps everything — stands down to the
    // full plan but MUST still return the exact global top-n.
    val out = table("hp_overlap", docs(1000), 5, range = false)
    val q = read(out).orderBy(col("id")).limit(4)
    assert(ids(q) == Seq(0L, 1L, 2L, 3L))
    assert(plannedParts(q) == 5, "fully-overlapping bounds cannot prune")
  }

  test("string sort key stands down (truncated bounds are not values)") {
    val out = table("hp_str", docs(1000), 4, range = true)
    val q = read(out).orderBy(col("s")).limit(3)
    assert(q.select("s").collect().map(_.getString(0)).toSeq ==
      Seq("row_0", "row_1", "row_10"))
    assert(plannedParts(q) == 4, "string bounds must not prune top-n")
  }

  test("deletion vectors: liveRows coverage stays exact under a DV") {
    val wh = Files.createTempDirectory("graft_hp_dv").toString
    val cat = "graft_hp_dv"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, v DOUBLE, s STRING)
      TBLPROPERTIES ('deletionVectors'='true')""")
    docs(400).repartitionByRange(4, col("id"))
      .createOrReplaceTempView("hp_dv_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM hp_dv_src")
    // Kill file 1 entirely (ids 0-99) and a slice of file 2: the top-3
    // now starts at id 110 — the plan must cover file 2 and the
    // returned rows must reflect the vector, not physical bounds.
    spark.sql(s"DELETE FROM $cat.t WHERE id < 110")
    val q = spark.sql(s"SELECT id FROM $cat.t ORDER BY id LIMIT 3")
    assert(ids(q) == Seq(110L, 111L, 112L))
    assert(plannedParts(q) <= 2, "post-DV top-3 needs at most files 1-2")
  }

  test("parquet-kind files prune the same way (stats are kind-agnostic)") {
    val wh = Files.createTempDirectory("graft_hp_pq").toString
    val cat = "graft_hp_pq"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, v DOUBLE, s STRING)
      TBLPROPERTIES ('filekind'='parquet')""")
    docs(2000).repartitionByRange(4, col("id"))
      .createOrReplaceTempView("hp_pq_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM hp_pq_src")
    val q = spark.sql(s"SELECT id FROM $cat.t ORDER BY id DESC LIMIT 3")
    assert(ids(q) == Seq(1999L, 1998L, 1997L))
    assert(plannedParts(q) == 1,
      "parquet-kind top-3 descending lives in the last file of 4")
    val lim = spark.sql(s"SELECT id FROM $cat.t LIMIT 5")
    assert(lim.count() == 5)
    assert(plannedParts(lim) == 1)
  }

  test("pending equality delete stands down (liveRows overcounts)") {
    val out = table("hp_eq", docs(400), 4, range = true)
    ManifestOps.equalityDelete(out, spark.range(0, 2).toDF("id"))
    val q = read(out).orderBy(col("id")).limit(3)
    assert(ids(q) == Seq(2L, 3L, 4L))
    assert(plannedParts(q) == 4,
      "a pending equality delete must disable head pruning")
    // Unordered limit must not under-deliver either: 400 physical - 2
    // tombstoned = 398 live rows, every file still planned.
    val lim = read(out).limit(399)
    assert(lim.count() == 398)
    assert(plannedParts(lim) == 4)
  }
}
