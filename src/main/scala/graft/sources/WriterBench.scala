package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Writer micro-bench (driver-side, no Spark session — isolates the
  * data writer's CPU from job scheduling and input-plan noise): 300k
  * 22-column wide rows (2 keys + 20 ~70-byte strings) through
  * [[NdjsonDataWriter]]. The round-13 byte-level render (UTF8String
  * bytes escaped straight into the buffered output, no per-row String)
  * measured 1.7-2.1 s vs the StringBuilder-then-BufferedWriter path's
  * 4.5-5.5 s — ~2.6x; at 100 TB ingest the writer IS the hot path.
  * `runMain graft.sources.WriterBench`. */
object WriterBench {
  def main(args: Array[String]): Unit = {
    val n = 300000
    val fields = StructField("id", LongType) +: StructField("k", LongType) +:
      (0 until 20).map(j => StructField(s"w$j", StringType))
    val schema = StructType(fields)
    val rows = (0 until 1000).map { i =>
      val vals = new Array[Any](22)
      vals(0) = i.toLong; vals(1) = (i % 97).toLong
      (0 until 20).foreach(j => vals(j + 2) =
        UTF8String.fromString(s"w$j-$i-" + "x" * 60))
      new GenericInternalRow(vals)
    }.toArray
    (0 until 3).foreach { round =>
      val dir = Files.createTempDirectory("wbench").toString
      Files.createDirectories(java.nio.file.Paths.get(dir, ".staging-q"))
      val w = new NdjsonDataWriter(dir, "q", schema, 0, round.toLong)
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { w.write(rows(i % 1000)); i += 1 }
      val msg = w.commit()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"round $round: $ms%.0f ms, ${msg.asInstanceOf[StagedFile].rows} rows")
    }
  }
}
