package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Spark 4 feature semantics: VARIANT extraction typing, collated
  * comparisons, HLL sketch error bounds, transformWithState parity with
  * the flatMapGroupsWithState formulation it replaces. */
class Spark4Spec extends SparkSpec {
  import spark.implicits._

  test("variant: typed path extraction, missing paths null, cast failure modes") {
    val row = Seq("""{"a": 1, "s": "x", "nested": {"b": [10, 20]}}""").toDF("j")
      .select(parse_json(col("j")).as("v"))
      .select(
        variant_get(col("v"), "$.a", "bigint").as("a"),
        variant_get(col("v"), "$.s", "string").as("s"),
        variant_get(col("v"), "$.nested.b[1]", "bigint").as("b1"),
        try_variant_get(col("v"), "$.missing", "bigint").as("m"),
        try_variant_get(col("v"), "$.s", "bigint").as("bad"))
    val r = row.collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getString(1) == "x")
    assert(r.getLong(2) == 20L)
    assert(r.isNullAt(3))
    assert(r.isNullAt(4)) // try_: type mismatch -> null, not error
  }

  test("collation: UTF8_LCASE equality and ordering ignore case") {
    val out = Seq(("Apple", "APPLE"), ("Apple", "apple"), ("Apple", "Banana"))
      .toDF("x", "y")
      .select((collate(col("x"), "UTF8_LCASE") === collate(col("y"), "UTF8_LCASE")).as("eq"))
      .as[Boolean].collect().toSeq
    assert(out == Seq(true, true, false))
  }

  test("count-min sketch: overestimates only, within eps*N (frequency family)") {
    // The heavy-hitter frequency sketch next to HLL (distinct), t-digest
    // (quantiles) and bloom (membership): mergeable, fixed memory, and
    // one-sided error — estimates never undercount.
    val df = spark.range(20000).select(pmod(col("id"), lit(100)).as("k"))
    val cms = df.stat.countMinSketch("k", eps = 0.001, confidence = 0.99, seed = 42)
    val trueCount = 200L // each key appears 20000/100 times
    (0L until 100L by 7L).foreach { k =>
      val est = cms.estimateCount(k)
      assert(est >= trueCount, s"CMS undercounted k=$k: $est")
      assert(est <= trueCount + (0.001 * 20000).toLong + 1, s"CMS err too big k=$k: $est")
    }
  }

  test("hll sketches: union estimate within 5% of exact distinct") {
    val df = spark.range(10000).select((col("id") % 5).as("shard"), col("id"))
    val perShard = df.groupBy("shard").agg(hll_sketch_agg(col("id")).as("sk"))
    val est = perShard.agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].head()
    assert(math.abs(est - 10000L) <= 500)
  }

  test("transformWithState timers: sessions emit once on expiry, live sessions stay silent") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ev(id: Long, user: Long, minute: Int) = StreamingSpec.Ev(
      id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), user, "a", 1.0, "{}")
    val mem = MemoryStream[StreamingSpec.Ev]
    // user 1: events at 00:01/00:03 then nothing -> closes when watermark
    // passes 00:03+5min. user 2: event at 00:40 keeps its session OPEN at
    // the final watermark (00:40 - 1min delay < 00:40+5min) -> no emission.
    mem.addData(Seq(ev(1, 1, 1), ev(2, 1, 3), ev(3, 2, 40)))
    val out = Streams.runToTableRocksDB(
      Streams.sessionCountsByTimer(
        mem.toDF().withWatermark("ts", "1 minute"), gapMs = 5 * 60 * 1000L),
      "t_timer_sess", "append")
    val rows = out.as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 2L))) // user 1's closed session only, exactly once
  }

  test("transformWithState MapState: per-type sub-keys accumulate across batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ev(id: Long, user: Long, t: String) = StreamingSpec.Ev(
      id, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), user, t, 1.0, "{}")
    val mem = MemoryStream[StreamingSpec.Ev]
    mem.addData(Seq(ev(1, 1, "view"), ev(2, 1, "view"), ev(3, 1, "click"),
      ev(4, 2, "view")))
    val out = Streams.runToTableRocksDB(
        Streams.eventTypeCountsTws(mem.toDF()), "t_map_state", "update")
      .groupBy("user_id", "event_type").agg(max("n").as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "view", 2L), (1L, "click", 1L), (2L, "view", 1L)))
  }

  test("transformWithState ListState: bounded recency buffer keeps the last 3") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ev(id: Long, user: Long) = StreamingSpec.Ev(
      id, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), user, "a", 1.0, "{}")
    val mem = MemoryStream[StreamingSpec.Ev]
    mem.addData(Seq(ev(10, 1), ev(11, 1), ev(12, 1), ev(13, 1), ev(20, 2)))
    val out = Streams.runToTableRocksDB(
        Streams.recentEventsTws(mem.toDF(), k = 3), "t_list_state", "update")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "11,12,13") // 10 truncated out of the k=3 buffer
    assert(out(2L) == "20")
  }

  test("transformWithState totals equal flatMapGroupsWithState totals (batch parity)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[StreamingSpec.Ev]
    def ev(id: Long, user: Long, v: Double) = StreamingSpec.Ev(
      id, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), user, "a", v, "{}")
    mem.addData(Seq(ev(1, 1, 1.5), ev(2, 1, 2.5), ev(3, 2, 10.0)))
    val out = Streams.runToTableRocksDB(
        Streams.runningUserTotalsTws(mem.toDF()), "t_tws", "update")
      .groupBy("user_id").agg(max("n").as("n"), max_by(col("sum_v"), col("n")).as("s"))
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 4.0), (2L, 1L, 10.0)))
  }
}
