package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Phase breakdown of one streaming spec run (guide §1, measure first):
  * where the wall OUTSIDE `triggerExecution` goes — source construction
  * (schema probe), `start()`, `awaitTermination()`, result fetch. Run a
  * few reps so codegen/JIT warm-up separates from the steady-state floor.
  *
  *   sbt "runMain graft.tools.StBreak"
  */
object StBreak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"    $label%-34s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    (1 to 4).foreach { rep =>
      println(s"--- rep $rep (tumbling, complete)")
      val total0 = System.nanoTime()
      val ev = t("eventsStream (probe+readStream)")(
        graft.streaming.Streams.eventsStream(spark, sfDir))
      val agg = t("build agg plan")(graft.streaming.Streams.tumblingCounts(ev))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", 4)
      val q = t("start()")(agg.writeStream.format("memory")
        .queryName(s"b$rep").outputMode("complete")
        .trigger(Trigger.AvailableNow()).start())
      t("awaitTermination")(q.awaitTermination())
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      t("table+count")(spark.table(s"b$rep").count())
      println(f"    TOTAL ${(System.nanoTime() - total0) / 1e9}%6.3f s")
    }
    spark.stop()
  }
}
