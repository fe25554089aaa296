package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JVM warm-up at the smallest SF: EVERY query runs once at
    // sf0.001 before timing starts. A query's first execution pays
    // analysis + whole-stage codegen + JIT + (for streaming) state-store
    // machinery init — measured at 0.5–5 s per query, none of it a
    // per-row cost, and all of it reused at the timed SF (the plan shape
    // is identical, so the codegen cache hits). Timing steady-state is
    // what makes per-query numbers comparable across runs and SFs.
    // Set SPARK_GRAFT_NO_WARMUP=1 to time cold runs instead.
    // Optional first arg: comma-separated name prefixes — bench only
    // matching queries (local iteration on a hot spot; the driver
    // passes no args and benches the full registry).
    val only: Option[Seq[String]] =
      args.headOption.map(_.split(",").toSeq)
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    val warmDir = "/root/testdata/sf0.001"
    if (!sys.env.contains("SPARK_GRAFT_NO_WARMUP") &&
        new java.io.File(warmDir).isDirectory) {
      picked.foreach { case (_, fn) =>
        try fn(spark, warmDir).count()
        catch { case _: Throwable => () }
        finally graft.operators.Dedup.releaseCaches()
      }
    }
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    // Name-sorted: Map iteration order varies per JVM, which lands the
    // residual warm-up cost on different queries each run and inflates
    // run-to-run variance of per-query numbers. A fixed order makes
    // successive bench runs comparable query-by-query.
    val results = picked.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      finally graft.operators.Dedup.releaseCaches()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // Headline fields LAST: the harness archives only the tail of this
    // line, and per-query maps grow left of wherever the total sits —
    // tail-side placement keeps "value"/"failed" recoverable at any
    // registry size. The full line also lands in bench_last.json so the
    // complete per-query map survives regardless of capture size.
    val line = s"""{"queries":$qs,"sf":"$sfDir","n":${results.size},"failed":$failedJson,"metric":"total","unit":"sec","value":$total}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_last.json"),
      line.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
