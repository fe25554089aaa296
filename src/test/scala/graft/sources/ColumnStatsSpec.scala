package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** V2 column statistics ([[ManifestScan.estimateStatistics]]): per-
  * column min/max/nullCount folded from manifest bounds and reported
  * to Spark's cost-based optimizer — valid outer bounds under DVs,
  * null counts only when no merge-on-read state could falsify them. */
class ColumnStatsSpec extends AnyFunSuite with SparkSpec {

  private def statsOf(dir: String, schema: StructType)
      : (Long, Map[String, (Option[Any], Option[Any], Option[Long])]) = {
    val scan = new ManifestScanBuilder(dir, schema).build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
    val st = scan.estimateStatistics()
    val cols = scala.jdk.CollectionConverters.MapHasAsScala(st.columnStats())
      .asScala.map { case (ref, cs) =>
        ref.fieldNames()(0) -> ((
          if (cs.min().isPresent) Some(cs.min().get) else None,
          if (cs.max().isPresent) Some(cs.max().get) else None,
          if (cs.nullCount().isPresent) Some(cs.nullCount().getAsLong)
          else None))
      }.toMap
    (st.numRows().getAsLong, cols)
  }

  test("min/max/nullCount fold across files; NaN voids max; strings in " +
      "UTF8 domain") {
    val wh = Files.createTempDirectory("graft_colstats").toString
    spark.conf.set("spark.sql.catalog.gcs1", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcs1.base", wh)
    spark.sql("CREATE TABLE gcs1.t (id BIGINT, s STRING, x DOUBLE)")
    spark.sql("INSERT INTO gcs1.t VALUES (5, 'm', 1.5), (9, 'zz', 2.5)")
    spark.sql("INSERT INTO gcs1.t VALUES (1, 'aa', 0.5), (3, NULL, 3.5)")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("x", DoubleType)))
    val (rows, cols) = statsOf(s"$wh/t", schema)
    assert(rows == 4L)
    assert(cols("id") == ((Some(1L), Some(9L), Some(0L))), cols("id").toString)
    assert(cols("x") == ((Some(0.5), Some(3.5), Some(0L))))
    val (sMin, sMax, sNulls) = cols("s")
    assert(sMin.contains(UTF8String.fromString("aa")) && sNulls.contains(1L))
    assert(sMax.exists(_.asInstanceOf[UTF8String]
      .compareTo(UTF8String.fromString("zz")) >= 0)) // truncUpper >= real max
    // NaN voids the max but keeps the min (the NaN file still records
    // bounds from its non-NaN values plus the hasNan flag).
    spark.sql("INSERT INTO gcs1.t SELECT /*+ COALESCE(1) */ 2, 'b', " +
      "CASE WHEN id = 0 THEN 0.25 ELSE cast('NaN' AS DOUBLE) END " +
      "FROM range(2)")
    val (_, cols2) = statsOf(s"$wh/t", schema)
    assert(cols2("x")._1.contains(0.25) && cols2("x")._2.isEmpty,
      cols2("x").toString)
    spark.sql("DROP TABLE gcs1.t")
  }

  test("KMV distinct counts: exact below k, ~accurate above, merged " +
      "across files, only on bloom-indexed columns") {
    val wh = Files.createTempDirectory("graft_colstats3").toString
    spark.conf.set("spark.sql.catalog.gcs3", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcs3.base", wh)
    spark.sql("""CREATE TABLE gcs3.t (id BIGINT, k BIGINT, v BIGINT)
      TBLPROPERTIES ('bloomcolumns'='id,k')""")
    // Two files; `id` has 20k distincts split across them (overlap
    // 5k), `k` has 40 distincts, `v` is not indexed (no sketch).
    spark.range(0, 15000).selectExpr("id", "id % 40 AS k", "id AS v")
      .coalesce(1).writeTo("gcs3.t").append()
    spark.range(10000, 25000).selectExpr("id", "id % 40 AS k", "id AS v")
      .coalesce(1).writeTo("gcs3.t").append()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("k", LongType), StructField("v", LongType)))
    val scan = new ManifestScanBuilder(s"$wh/t", schema).build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
    val cs = scala.jdk.CollectionConverters.MapHasAsScala(
      scan.estimateStatistics().columnStats()).asScala.map {
        case (ref, c) => ref.fieldNames()(0) ->
          (if (c.distinctCount().isPresent)
            Some(c.distinctCount().getAsLong) else None)
      }.toMap
    assert(cs("k").contains(40L), cs("k").toString) // below k=64: exact
    val idNdv = cs("id").get
    assert(math.abs(idNdv - 25000L) < 25000 * 0.3,
      s"NDV estimate off: $idNdv vs 25000") // KMV k=64 => ~12% rel. error
    assert(cs("v").isEmpty, "unindexed column must carry no NDV")
    spark.sql("DROP TABLE gcs3.t")
  }

  test("merge-on-read state silences null counts but keeps outer bounds") {
    val wh = Files.createTempDirectory("graft_colstats2").toString
    spark.conf.set("spark.sql.catalog.gcs2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcs2.base", wh)
    spark.sql("""CREATE TABLE gcs2.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('deletionvectors'='true')""")
    spark.range(0, 100).selectExpr("id", "id AS v").coalesce(1)
      .writeTo("gcs2.t").append()
    spark.sql("DELETE FROM gcs2.t WHERE id = 99")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType)))
    val (rows, cols) = statsOf(s"$wh/t", schema)
    assert(rows == 99L) // live rows
    // Bounds stay (valid outer bounds: the deleted row only shrinks the
    // true range); null counts silence (the deleted row may have been
    // the null).
    assert(cols("id") == ((Some(0L), Some(99L), None)), cols("id").toString)
    spark.sql("DROP TABLE gcs2.t")
  }
}
