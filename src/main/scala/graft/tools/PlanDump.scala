package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named registered queries to files —
  * the plans/rNN artifacts the round judges check plan claims against.
  *
  *   sbt "runMain graft.tools.PlanDump plans/r18 _before q116_assoc_rules q148_item_cooccurrence"
  *
  * Streaming specs are excluded (building one runs the stream); batch
  * specs plan only, nothing executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        // GRAFT_PLAN_EXEC=1: execute first so the dump shows the FINAL
        // adaptive plan (AQE's runtime exchange reuse / join rewrites
        // are invisible in the initial isFinalPlan=false dump).
        // Drive THIS Dataset's own QueryExecution (count()/write would
        // wrap it in a new one and leave this dump isFinalPlan=false).
        if (sys.env.contains("GRAFT_PLAN_EXEC"))
          df.queryExecution.toRdd.count()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $outDir/$name$suffix.txt (${txt.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally graft.operators.Dedup.releaseCaches()
    }
    spark.stop()
  }
}
