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

  test("CBO consumes the V2 column stats: the filtered dim's estimate " +
      "shrinks by ndv and flips the join to broadcast") {
    val wh = Files.createTempDirectory("graft_cbo").toString
    spark.conf.set("spark.sql.catalog.gcbo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcbo.base", wh)
    spark.sql("""CREATE TABLE gcbo.dim (k BIGINT, grp BIGINT, pad STRING)
      TBLPROPERTIES ('bloomcolumns'='k,grp')""")
    // 200k x ~220B rows: the UNFILTERED dim is ~20 MB — far above the
    // 1 MB broadcast threshold set below. grp has 1000 distincts, so
    // `grp = 7` keeps ~200 rows (~40 KB) — far below it. Only an
    // optimizer that actually READS the reported distinctCount can tell
    // the difference at plan time.
    spark.range(200000)
      .selectExpr("id AS k", "id % 1000 AS grp", "repeat('x', 200) AS pad")
      .coalesce(2).writeTo("gcbo.dim").append()
    spark.sql("CREATE TABLE gcbo.fact (k BIGINT, v BIGINT)")
    spark.range(400000).selectExpr("id % 200000 AS k", "id AS v")
      .coalesce(2).writeTo("gcbo.fact").append()
    def joinNodes(cbo: Boolean): String = {
      Seq("spark.sql.cbo.enabled" -> cbo.toString,
        "spark.sql.cbo.planStats.enabled" -> cbo.toString,
        // AQE off: the pin is about the STATIC decision the stats
        // enable (AQE could rescue the plan at runtime from observed
        // sizes, which is not what this test is about).
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> (1L << 20).toString)
        .foreach { case (k, v) => spark.conf.set(k, v) }
      try spark.sql("""SELECT count(*) FROM gcbo.fact f
          JOIN gcbo.dim d ON f.k = d.k WHERE d.grp = 7""")
        .queryExecution.executedPlan.toString
      finally Seq("spark.sql.cbo.enabled", "spark.sql.cbo.planStats.enabled",
        "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
        .foreach(spark.conf.unset)
    }
    val off = joinNodes(cbo = false)
    val on = joinNodes(cbo = true)
    // Without column stats the filter does not shrink the estimate:
    // the dim stays over-threshold and the join sorts-and-merges.
    assert(off.contains("SortMergeJoin") && !off.contains("BroadcastHashJoin"),
      s"expected SMJ without CBO:\n$off")
    // With CBO + the scan's distinctCount, FilterEstimation prices
    // `grp = 7` at rows/ndv and the dim broadcasts.
    assert(on.contains("BroadcastHashJoin"), s"expected BHJ with CBO:\n$on")
    // The logical side: attributeStats actually carry the scan's stats.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try {
      val st = spark.table("gcbo.dim").queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(200000)))
      val byName = st.attributeStats.map { case (a, cs) => a.name -> cs }
      // KMV NDV on the bloom-indexed columns (grp: 1000 exact below...
      // k=64 sketch => estimate; both must be present and sane).
      assert(byName("grp").distinctCount.exists(n =>
        (n - 1000).abs <= 300), byName("grp").toString)
      assert(byName("k").distinctCount.exists(n =>
        (n - BigInt(200000)).abs < BigInt(60000)), byName("k").toString)
      assert(byName("k").min.contains(0L) && byName("k").max.contains(199999L))
      assert(byName("pad").distinctCount.isEmpty) // unindexed: no NDV
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.planStats.enabled")
    }
    spark.sql("DROP TABLE gcbo.dim")
    spark.sql("DROP TABLE gcbo.fact")
  }

  test("CBO join REORDER attributes to distinctCount: equal-size dims, " +
      "only the filter columns' NDV differs, the cheap dim joins first") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    val wh = Files.createTempDirectory("graft_cboreorder").toString
    spark.conf.set("spark.sql.catalog.gcbr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcbr.base", wh)
    // CONTROL: dima and dimb are row-for-row the same size and width —
    // identical rowCount (50k), identical byte size, identical key
    // column. The ONLY statistical difference is the filter column's
    // NDV: dima.sel has 10000 distincts (an equality keeps ~5 rows),
    // dimb.sel has 2 (an equality keeps ~25k rows). Any plan change
    // between the two runs is therefore attributable to the scan's
    // reported distinctCount, not to rowCount or sizeInBytes.
    spark.sql("""CREATE TABLE gcbr.dima (k BIGINT, sel BIGINT)
      TBLPROPERTIES ('bloomcolumns'='k,sel')""")
    spark.sql("""CREATE TABLE gcbr.dimb (k BIGINT, sel BIGINT)
      TBLPROPERTIES ('bloomcolumns'='k,sel')""")
    // sel values share one text WIDTH (10000..10001 vs 10000..19999) so
    // the rendered payloads are byte-identical in size — the control
    // below would otherwise be off by the token length difference.
    spark.range(50000).selectExpr("id AS k", "10000 + id % 10000 AS sel")
      .coalesce(2).writeTo("gcbr.dima").append()
    spark.range(50000).selectExpr("id AS k", "10000 + id % 2 AS sel")
      .coalesce(2).writeTo("gcbr.dimb").append()
    spark.sql("""CREATE TABLE gcbr.fact (ka BIGINT, kb BIGINT)
      TBLPROPERTIES ('bloomcolumns'='ka,kb')""")
    spark.range(200000).selectExpr("id % 50000 AS ka", "id % 50000 AS kb")
      .coalesce(2).writeTo("gcbr.fact").append()
    // The query JOINS THE EXPENSIVE DIM FIRST as written. The heuristic
    // ReorderJoin keeps conditioned joins in written order, so without
    // CBO the innermost join is fact x dimb; CostBasedJoinReorder can
    // only flip it by PRICING the filtered dims — rows/ndv — off the
    // connector's column statistics.
    def innermostDim(cbo: Boolean): String = {
      Seq("spark.sql.cbo.enabled" -> cbo.toString,
        "spark.sql.cbo.planStats.enabled" -> cbo.toString,
        "spark.sql.cbo.joinReorder.enabled" -> cbo.toString,
        "spark.sql.adaptive.enabled" -> "false")
        .foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val plan = spark.sql("""SELECT count(*) FROM gcbr.fact f
            JOIN gcbr.dimb b ON f.kb = b.k
            JOIN gcbr.dima a ON f.ka = a.k
            WHERE b.sel = 10001 AND a.sel = 10007""")
          .queryExecution.optimizedPlan
        def hasJoin(p: LogicalPlan): Boolean =
          p.collectFirst { case j: Join => j }.isDefined
        val innermost = plan.collect { case j: Join => j }
          .find(j => !hasJoin(j.left) && !hasJoin(j.right))
          .getOrElse(fail("no innermost join in\n" + plan.toString))
        val leaves = innermost.collectLeaves().map(_.toString).mkString
        if (leaves.contains("dima")) "dima"
        else if (leaves.contains("dimb")) "dimb"
        else fail(s"no dim in innermost join leaves:\n$leaves")
      } finally Seq("spark.sql.cbo.enabled", "spark.sql.cbo.planStats.enabled",
        "spark.sql.cbo.joinReorder.enabled", "spark.sql.adaptive.enabled")
        .foreach(spark.conf.unset)
    }
    assert(innermostDim(cbo = false) == "dimb",
      "heuristic baseline must keep the written (expensive-first) order")
    assert(innermostDim(cbo = true) == "dima",
      "CBO + the scan's distinctCount must join the ndv-cheap dim first")
    // The control really holds: same rowCount, same (close) byte size.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try {
      val sa = spark.table("gcbr.dima").queryExecution.optimizedPlan.stats
      val sb = spark.table("gcbr.dimb").queryExecution.optimizedPlan.stats
      assert(sa.rowCount == sb.rowCount)
      val (ba, bb) = (sa.sizeInBytes.toDouble, sb.sizeInBytes.toDouble)
      assert((ba - bb).abs / math.max(ba, bb) < 0.05,
        s"dim byte sizes must match: $ba vs $bb")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.planStats.enabled")
    }
    Seq("dima", "dimb", "fact").foreach(t => spark.sql(s"DROP TABLE gcbr.$t"))
  }

  test("equiHeightHistogram: boundaries monotone, mass balanced, " +
      "ndv apportioned, degenerate shapes stand down") {
    val eh = ManifestSink.equiHeightHistogram _
    // Skew: 90% of rows in [0,10), 10% in [10,1000).
    val triples = Seq((0.0, 10.0, 9000L), (10.0, 1000.0, 1000L))
    val (h, bins) = eh(triples, 1000L, 10).get
    assert(h == 5000.0 && bins.size == 2) // binCount capped at triples.size
    assert(bins.head._1 == 0.0 && bins.last._2 == 1000.0)
    assert(bins.sliding(2).forall { case Seq(a, b) => a._2 == b._1 })
    // The 50% boundary sits in the dense head, far left of the
    // uniform midpoint 500.
    assert(bins.head._2 < 20.0, s"boundary ${bins.head._2}")
    assert(bins.forall(_._3 >= 1L))
    // Degenerate: single triple, zero rows, a point = None.
    assert(eh(Seq((0.0, 10.0, 100L)), 10L, 32).isEmpty)
    assert(eh(Seq((0.0, 10.0, 0L), (1.0, 2.0, 0L)), 10L, 32).isEmpty)
    assert(eh(Seq((5.0, 5.0, 10L), (5.0, 5.0, 10L)), 1L, 32).isEmpty)
  }

  test("histogram corrects a skewed range estimate the uniform " +
      "assumption gets >=10x wrong") {
    val wh = Files.createTempDirectory("graft_hist").toString
    spark.conf.set("spark.sql.catalog.ghist", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ghist.base", wh)
    // Heavy head: 99k rows with v < 100; a 1k-row tail stretching to
    // 10100. Sorted single file with small blocks -> the manifest's
    // block bounds capture the density.
    def mk(name: String, props: String): Unit = {
      spark.sql(s"CREATE TABLE ghist.$name (id BIGINT, v BIGINT) $props")
      spark.range(100000).selectExpr("id",
        "CASE WHEN id < 99000 THEN id % 100 " +
          "ELSE (id - 99000) * 10 + 100 END AS v")
        .orderBy("v").coalesce(1).writeTo(s"ghist.$name").append()
    }
    mk("skew", "TBLPROPERTIES ('bloomcolumns'='v', 'blockbytes'='16384')")
    mk("plain", "") // no NDV sketch -> no histogram: the uniform control
    Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.planStats.enabled" -> "true")
      .foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def estimate(t: String): BigInt =
        spark.sql(s"SELECT * FROM ghist.$t WHERE v > 5000")
          .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
      val hist = spark.table("ghist.skew").queryExecution
        .optimizedPlan.stats.attributeStats.collectFirst {
          case (a, cs) if a.name == "v" => cs.histogram
        }.flatten
      assert(hist.isDefined, "histogram must reach Catalyst attributeStats")
      assert(hist.get.bins.length > 8)
      val uniform = estimate("plain")
      val histEst = estimate("skew")
      val truth = 510L // rows with v > 5000
      assert(uniform > truth * 10,
        s"control must be badly wrong for the test to mean anything: $uniform")
      assert(histEst >= 0 && histEst * 10 <= uniform,
        s"histogram estimate $histEst not >=10x closer than uniform $uniform")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.planStats.enabled")
    }
    spark.sql("DROP TABLE ghist.skew")
    spark.sql("DROP TABLE ghist.plain")
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
