package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[BloomIndex]] unit invariants plus the end-to-end bloom-skipping /
  * dynamic-file-pruning behavior over manifest tables. */
class BloomIndexSpec extends AnyFunSuite with SparkSpec {

  test("bloom round trip: every inserted key found; absent keys mostly not") {
    val n = 10000
    val hashes = Array.tabulate(n)(i =>
      BloomIndex.hashPair(LongType, java.lang.Long.valueOf(i.toLong)))
    val bloom = BloomIndex.build(hashes, n).get
    assert(bloom.m >= n * BloomIndex.BitsPerKey / 2, s"m=${bloom.m}")
    hashes.foreach(h => assert(bloom.mightContain(h)))
    // Serialize → parse → same answers.
    val txt = BloomIndex.renderSidecar(Seq("id" -> bloom))
    val back = BloomIndex.parseSidecar(txt)("id")
    hashes.foreach(h => assert(back.mightContain(h)))
    // fpp on 10k absent keys stays near the designed ~1%.
    val falsePos = (n until 2 * n).count(i => back.mightContain(
      BloomIndex.hashPair(LongType, java.lang.Long.valueOf(i.toLong))))
    assert(falsePos < n / 20, s"false positives: $falsePos / $n")
  }

  test("hash normalization: integral widths and temporal externals agree") {
    // An INT column's written value and a LONG-typed literal must hash
    // identically — the read side widens everything to 8 bytes.
    val asInt = BloomIndex.hashPair(IntegerType, java.lang.Integer.valueOf(42))
    val asLong = BloomIndex.hashPair(LongType, java.lang.Long.valueOf(42L))
    assert(asInt == asLong)
    assert(BloomIndex.hashPairExternal(IntegerType,
      java.lang.Long.valueOf(42L)).contains(asInt))
    // Fractional literals that cannot equal any integral row: no hash.
    assert(BloomIndex.hashPairExternal(LongType,
      java.lang.Double.valueOf(3.5)).isEmpty)
    assert(BloomIndex.hashPairExternal(LongType,
      java.lang.Double.valueOf(3.0)).contains(
      BloomIndex.hashPair(LongType, java.lang.Long.valueOf(3L))))
    // String external vs catalyst UTF8String.
    assert(BloomIndex.hashPairExternal(StringType, "doc-7").contains(
      BloomIndex.hashPair(StringType, UTF8String.fromString("doc-7"))))
    // Date: external java.sql.Date / LocalDate vs catalyst epoch days.
    val d = java.time.LocalDate.of(2026, 1, 15)
    val cat = BloomIndex.hashPair(DateType,
      java.lang.Long.valueOf(d.toEpochDay))
    assert(BloomIndex.hashPairExternal(DateType, d).contains(cat))
    assert(BloomIndex.hashPairExternal(DateType,
      java.sql.Date.valueOf("2026-01-15")).contains(cat))
  }

  test("malformed sidecar lines parse as absent, never throw") {
    val good = BloomIndex.renderSidecar(Seq("ok" ->
      BloomIndex.build(Array(BloomIndex.hashPair(LongType,
        java.lang.Long.valueOf(1L))), 1).get))
    val mangled = good +
      "not json at all\n" +
      """{"col":"bad","m":100,"k":7,"bits":"AAAA"}""" + "\n" + // m not pow2
      """{"col":"short","m":1024,"k":7,"bits":"AAAA"}""" + "\n" // bits != m
    val parsed = BloomIndex.parseSidecar(mangled)
    assert(parsed.keySet == Set("ok"))
  }

  test("bloom skipping end to end: point lookup opens one file; " +
      "no index reads all; sidecar survives vacuum") {
    import org.apache.spark.sql.functions._
    val wh = Files.createTempDirectory("graft_bloom").toString
    spark.conf.set("spark.sql.catalog.gbl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbl.base", wh)
    // Hash-distribute by id: every file holds ~1000 ids INTERLEAVED
    // across the whole domain, so bounds prune NOTHING and no shuffle
    // partition is empty — isolates the bloom.
    spark.sql("""CREATE TABLE gbl.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('bloomcolumns'='id')""")
    spark.range(0, 4000).selectExpr("id", "id * 7 AS v")
      .repartition(4, col("id")).writeTo("gbl.t").append()
    spark.sql("CREATE TABLE gbl.u (id BIGINT, v BIGINT)")
    spark.range(0, 4000).selectExpr("id", "id * 7 AS v")
      .repartition(4, col("id")).writeTo("gbl.u").append()

    def metrics(sql: String): (Long, Long, Long) = {
      val q = spark.sql(sql)
      val n = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.get
      (n, scan.metrics("filesRead").value, scan.metrics("filesSkipped").value)
    }
    // Indexed: the bloom proves id=1234 absent from 3 of 4 files.
    val (n1, read1, skip1) = metrics("SELECT v FROM gbl.t WHERE id = 1234")
    assert(n1 == 1 && read1 == 1 && skip1 == 3, s"($n1, $read1, $skip1)")
    // IN across two values: only the holding files (plus at most the
    // designed ~1% false-positive tail) survive — never the full scan.
    val holding = spark.sql(
      "SELECT count(DISTINCT _file) FROM gbl.u WHERE id IN (1234, 1235)")
      .head().getLong(0)
    val (n2, read2, _) =
      metrics("SELECT v FROM gbl.t WHERE id IN (1234, 1235)")
    assert(n2 == 2 && read2 >= holding && read2 < 4,
      s"($n2, $read2, holding=$holding)")
    // Unindexed twin: bounds keep everything.
    val (n3, read3, _) = metrics("SELECT v FROM gbl.u WHERE id = 1234")
    assert(n3 == 1 && read3 == 4, s"($n3, $read3)")
    // A miss on the indexed table opens nothing at all.
    val (n4, read4, _) = metrics("SELECT v FROM gbl.t WHERE id = 999999")
    assert(n4 == 0 && read4 == 0, s"($n4, $read4)")
    // Sidecars are reachable files: vacuum must keep them.
    val dir = Paths.get(wh, "t")
    val before = Files.list(dir).iterator()
    val sidecars = new java.util.ArrayList[String]()
    before.forEachRemaining(p =>
      if (p.getFileName.toString.endsWith(".bloom"))
        sidecars.add(p.getFileName.toString))
    assert(sidecars.size() == 4, s"$sidecars")
    spark.sql("CALL gbl.system.vacuum('t', 0)")
    sidecars.forEach(s0 => assert(Files.exists(dir.resolve(s0)),
      s"vacuum deleted live bloom sidecar $s0"))
    val (n5, read5, _) = metrics("SELECT v FROM gbl.t WHERE id = 1234")
    assert(n5 == 1 && read5 == 1, s"post-vacuum ($n5, $read5)")
    spark.sql("DROP TABLE gbl.t")
    spark.sql("DROP TABLE gbl.u")
  }

  test("dynamic file pruning: a selective dim filter prunes fact files " +
      "at runtime through the bloom index") {
    import org.apache.spark.sql.functions._
    val wh = Files.createTempDirectory("graft_dpp").toString
    spark.conf.set("spark.sql.catalog.gdp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdp.base", wh)
    spark.sql("""CREATE TABLE gdp.fact (k BIGINT, amount BIGINT)
      TBLPROPERTIES ('bloomcolumns'='k')""")
    // Cluster by key (each k in ONE file) while the k-ranges of the 8
    // hash-routed files fully interleave: static bounds prune nothing,
    // only the bloom can prove a key absent.
    spark.range(0, 8000).selectExpr("id % 1000 AS k", "id AS amount")
      .repartition(8, col("k")).writeTo("gdp.fact").append()
    spark.sql("CREATE TABLE gdp.dim (k BIGINT, name STRING)")
    spark.range(0, 1000).selectExpr("id AS k", "concat('n', id) AS name")
      .coalesce(1).writeTo("gdp.dim").append()
    val q = spark.sql("""
      SELECT f.k, sum(f.amount) AS s
      FROM gdp.fact f JOIN gdp.dim d ON f.k = d.k
      WHERE d.name = 'n7'
      GROUP BY f.k""")
    assert(q.collect().map(_.getLong(1)).sum > 0)
    // Scans hide under AQE query stages post-execution.
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.collect {
        case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(st.plan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
      }.flatten
    val all = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case p => scans(p)
    }
    val factScan = all.find(_.runtimeFilters.nonEmpty)
    // The dim's surviving key arrives at runtime; the bloom then
    // proves absence per file. k=7 lives only in file 7 (see layout
    // comment), so at most a false-positive file survives beyond it.
    assert(factScan.isDefined,
      s"no runtime filter planned on the fact scan: ${all.size} scans")
    assert(factScan.get.metrics("filesRead").value <= 2,
      s"filesRead=${factScan.get.metrics("filesRead").value}")
    spark.sql("DROP TABLE gdp.fact")
    spark.sql("DROP TABLE gdp.dim")
  }
}
