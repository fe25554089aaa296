package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable

/** Per-micro-batch breakdown for the streaming (st*) specs — guide §1
  * (measure first): for each spec, how many micro-batches ran and where
  * the per-batch wall went (`durationMs`: triggerExecution split into
  * latestOffset / queryPlanning / walCommit / addBatch / commitOffsets).
  * This attributes the st-family floor to specific machinery instead of
  * "state stores" by inference.
  *
  *   sbt "runMain graft.tools.StProfile /root/testdata/sf0.1 st1 st5 st8"
  */
object StProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = if (args.length > 1) args.drop(1).toSeq else Seq("st")
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

    // One progress record per micro-batch, in arrival order.
    case class Batch(query: String, durations: Map[String, Long], rows: Long)
    val batches = mutable.ArrayBuffer[Batch]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized {
          import scala.jdk.CollectionConverters._
          batches += Batch(e.progress.name,
            e.progress.durationMs.asScala.map { case (k, v) => k -> v.longValue }.toMap,
            e.progress.numInputRows)
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val picked = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
    picked.foreach { case (name, fn) =>
      batches.synchronized(batches.clear())
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
      finally graft.operators.Dedup.releaseCaches()
      val wall = (System.nanoTime() - t0) / 1e9
      val bs = batches.synchronized(batches.toList)
      val keys = bs.flatMap(_.durations.keys).distinct.sorted
      val agg = keys.map(k => s"$k=${bs.map(_.durations.getOrElse(k, 0L)).sum}")
        .mkString(" ")
      println(f"$name%-28s wall=$wall%6.2f batches=${bs.size}%2d " +
        s"rows=${bs.map(_.rows).mkString("+")} | $agg")
    }
    spark.stop()
  }
}
