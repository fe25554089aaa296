package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Long-tail fixed-cost attribution (guide §1, measure first): run one
  * registered query N times and split each rep's wall into scheduler
  * facts — jobs, stages, tasks, summed task runtime — so driver-side
  * constants (analysis, AQE re-planning, job launch) separate from
  * executor compute. wall >> sum(task)/cores means the driver, not the
  * data, is the cost.
  *
  *   sbt "runMain graft.tools.QProbe q18_date_daily_agg /root/testdata/sf0.1 5"
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
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
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = e.stageInfo
        val tm = si.taskMetrics
        if (tm != null && sys.env.contains("GRAFT_QPROBE_STAGES"))
          println(f"[qprobe-stage] ${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"run=${tm.executorRunTime}%6dms cpu=${tm.executorCpuTime / 1000000}%6dms " +
            f"deser=${tm.executorDeserializeTime}%5dms gc=${tm.jvmGCTime}%5dms " +
            s"| ${si.name.take(90)}")
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
      }
    })
    name.split(",").foreach { one =>
    val fn = graft.SparkEntry.queries(one)
    (1 to reps).foreach { i =>
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = System.nanoTime()
      df.queryExecution.executedPlan // force analyze+optimize+plan
      val tPlan = System.nanoTime()
      val n = df.count()
      val tCount = System.nanoTime()
      graft.operators.Dedup.releaseCaches()
      // Listener bus is async; give it a beat before reading counters.
      Thread.sleep(150)
      val phases = df.queryExecution.tracker.phases
        .map { case (p, s) => s"$p=${s.endTimeMs - s.startTimeMs}ms" }
        .mkString(" ")
      println(f"[qprobe] $one rep$i: build=${(tBuild - t0) / 1e3}%.0fus " +
        f"plan=${(tPlan - tBuild) / 1e6}%.1fms " +
        f"count=${(tCount - tPlan) / 1e6}%.1fms total=${(tCount - t0) / 1e6}%.1fms " +
        s"rows=$n jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
        f"taskSum=${taskMs.get}%dms | $phases")
    }
    }
    spark.stop()
  }
}
