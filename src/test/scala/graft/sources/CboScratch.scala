package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CboScratch extends AnyFunSuite with SparkSpec {

  test("scratch: does Spark consume V2 columnStats?") {
    val wh = Files.createTempDirectory("graft_cbo").toString
    spark.conf.set("spark.sql.catalog.gcbo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcbo.base", wh)
    spark.sql("""CREATE TABLE gcbo.dim (k BIGINT, grp BIGINT, pad STRING)
      TBLPROPERTIES ('bloomcolumns'='k,grp')""")
    // 200k rows, grp has 1000 distincts -> a grp = x filter keeps ~200
    // rows. Pad makes sizeInBytes big.
    spark.range(200000)
      .selectExpr("id AS k", "id % 1000 AS grp",
        "repeat('x', 200) AS pad")
      .coalesce(2).writeTo("gcbo.dim").append()
    spark.sql("CREATE TABLE gcbo.fact (k BIGINT, v BIGINT)")
    spark.range(400000).selectExpr("id % 200000 AS k", "id AS v")
      .coalesce(2).writeTo("gcbo.fact").append()

    def plansOf(cbo: Boolean): (String, String) = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.cbo.planStats.enabled", cbo.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (1L << 20).toString)
      try {
        val q = spark.sql("""SELECT count(*) FROM gcbo.fact f
          JOIN gcbo.dim d ON f.k = d.k WHERE d.grp = 7""")
        val opt = q.queryExecution.optimizedPlan
        val statsStr = opt.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
            s"join-stats: ${j.left.stats.sizeInBytes}/${j.left.stats.rowCount} vs ${j.right.stats.sizeInBytes}/${j.right.stats.rowCount}"
        }.mkString("; ")
        (statsStr, q.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join")).mkString(" | "))
      } finally {
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.planStats.enabled", "false")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    val (sOff, pOff) = plansOf(false)
    val (sOn, pOn) = plansOf(true)
    println(s"CBO OFF: $sOff\n  plan: $pOff")
    println(s"CBO ON : $sOn\n  plan: $pOn")

    // Also dump attributeStats visibility.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    val rel = spark.table("gcbo.dim").queryExecution.optimizedPlan
    println("ATTR STATS: " + rel.stats.attributeStats.map {
      case (a, cs) => s"${a.name}: ndv=${cs.distinctCount} min=${cs.min} max=${cs.max} nulls=${cs.nullCount}"
    }.mkString("; "))
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "false")
    spark.sql("DROP TABLE gcbo.dim")
    spark.sql("DROP TABLE gcbo.fact")
  }
}
