package graft

import org.apache.spark.sql.{Observation, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pipeline observability: `Observation` metrics (data-quality counters
  * that piggyback on an existing action — zero extra pass over the
  * data) and the Spark 4 state-store reader (`statestore` data source —
  * inspecting a streaming job's keyed state from batch, the ops tool
  * for debugging watermark/state bugs at scale).
  *
  * The reference's only runtime observability is the HTTP sensor +
  * Airflow retry counters (`/root/reference/dags/users_etl.py:41-42,
  * 184-189`); these are the engine-native equivalents.
  */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("Observation: quality counters ride the write action, no second job") {
    val df = Seq(
      (1L, Some(10.0), "a"), (2L, None, "b"), (3L, Some(-5.0), "c"),
      (4L, Some(99.0), null.asInstanceOf[String]), (5L, None, "e"))
      .toDF("id", "value", "tag")
    val obs = Observation("quality")
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col("value").isNull.cast("long")).as("null_values"),
      sum(col("tag").isNull.cast("long")).as("null_tags"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("negatives"),
      min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    // One action drives BOTH the result and the metrics.
    val out = observed.where(col("value").isNotNull).count()
    assert(out == 3L)
    val m = obs.get
    // Metrics observe the FULL pre-filter stream at the observe point.
    assert(m("n_rows") == 5L)
    assert(m("null_values") == 2L)
    assert(m("null_tags") == 1L)
    assert(m("negatives") == 1L)
    assert(m("min_id") == 1L && m("max_id") == 5L)
  }

  test("statestore reader: streaming aggregation state is queryable from batch") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_state_ckpt").toString
    val src = java.nio.file.Files
      .createTempDirectory("graft_state_src").toString
    Seq(("u1", 1L), ("u2", 2L), ("u1", 3L), ("u3", 4L), ("u1", 5L))
      .toDF("user", "v").write.parquet(s"$src/batch0")
    val stream = spark.readStream
      .schema("user STRING, v BIGINT")
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$src/batch0")
      .groupBy("user").agg(count(lit(1)).as("n"), sum("v").as("total"))
    val q = stream.writeStream
      .format("memory").queryName("obs_state_mem").outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // Read the aggregation operator's keyed state directly — the
    // debugging window into a production job's checkpoint.
    // The state value schema carries the AGGREGATION BUFFER's field
    // names (count, sum), not the query's output aliases.
    val state = spark.read.format("statestore").load(ckpt)
      .select(col("key.user").as("user"),
        col("value.count").as("n"), col("value.sum").as("total"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(state.toSeq == Seq(("u1", 3L, 9L), ("u2", 1L, 2L), ("u3", 1L, 4L)))
    // state-metadata companion source names the stateful operator.
    val meta = spark.read.format("state-metadata").load(ckpt)
      .select("operatorName").as[String].collect()
    assert(meta.nonEmpty && meta.head.nonEmpty)
  }
}
