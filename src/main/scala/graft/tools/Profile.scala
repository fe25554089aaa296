package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev harness: time one registered query N times and print its physical
  * plan — used to chase bench hotspots (first run includes codegen +
  * scan-planning warm-up; steady-state is what the driver's 2× budget is
  * really measuring against).
  *
  * Usage: runMain graft.tools.Profile <queryName> <sfDir> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev knob: GRAFT_CONF="k=v;k=v" sets arbitrary session confs for
    // an A/B without recompiling.
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    // Dev knob: GRAFT_ROCKSDB=1 times the query against the RocksDB
    // state-store provider (off-heap state, the production backend).
    if (sys.env.contains("GRAFT_ROCKSDB")) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    }
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
