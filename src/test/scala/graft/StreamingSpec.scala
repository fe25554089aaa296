package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Structured Streaming semantics: windowed aggregation over a stream
  * equals the batch result (parity), watermarks drop late data in append
  * mode, session windows merge by gap, streaming dedup collapses
  * duplicate ids. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  import StreamingSpec.Ev

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private def ev(id: Long, minute: Int, user: Long = 1L, typ: String = "a",
      value: Double = 1.0) = Ev(id, ts(minute), user, typ, value, "{}")

  test("stream tumbling counts equal the batch aggregation (parity)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = Seq(ev(1, 1), ev(2, 5), ev(3, 12), ev(4, 59), ev(5, 61 % 60))
    mem.addData(events)
    val streamed = Streams.runToTable(
      Streams.tumblingCounts(mem.toDF(),
        "10 minutes"),
      "t_parity", "complete")
    val batch = Streams.tumblingCounts(
      events.toDF(), "10 minutes")
    assert(streamed.collect().toSet == batch.collect().toSet)
  }

  test("watermark drops events later than the delay in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("timestamp").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("t_late")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // Batch 1: events in window [0,10) and [20,30) -> watermark 25-5=20.
      mem.addData(Seq(ev(1, 1), ev(2, 25)))
      q.processAllAvailable()
      // Batch 2: late event for closed window [0,10) must be DROPPED;
      // event at 27 keeps window [20,30) open.
      mem.addData(Seq(ev(3, 2), ev(4, 27)))
      q.processAllAvailable()
      // Batch 3: advance watermark past 30 to close/emit [20,30).
      mem.addData(Seq(ev(5, 41)))
      q.processAllAvailable()
      val rows = spark.table("t_late").as[(Timestamp, Long)].collect().toMap
      assert(rows(ts(0)) == 1L) // late ev(3) not counted
      assert(rows(ts(20)) == 2L) // both on-time events counted
    } finally q.stop()
  }

  test("session windows merge events within gap, split beyond it") {
    val events = Seq(
      ev(1, 0), ev(2, 4), ev(3, 8), // one session 00:00-08:00(+5)
      ev(4, 20), // second session (gap 12 > 5)
      ev(5, 0, user = 2), // separate user
      // Boundary semantics (pins the oracle's strict-> condition): an
      // event EXACTLY one gap after the previous one still merges.
      ev(6, 0, user = 3), ev(7, 5, user = 3)
    ).toDF()
    val out = Streams.sessionCounts(events, "5 minutes")
      .select(col("user_id"), col("session_start").cast("timestamp"),
        col("session_end").cast("timestamp"), col("n"))
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(out == Set(
      (1L, ts(0), ts(13), 3L), // end = last(8) + gap(5)
      (1L, ts(20), ts(25), 1L),
      (2L, ts(0), ts(5), 1L),
      (3L, ts(0), ts(10), 2L))) // exact-gap adjacency merges
  }

  test("streaming session windows merge across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = Streams.sessionCounts(
      mem.toDF().withWatermark("ts", "1 hour"), "5 minutes")
    val q = agg.writeStream.format("memory").queryName("t_sess")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Seq(ev(1, 0), ev(2, 4)))
      q.processAllAvailable()
      // Batch 2 extends the open session (8 within gap of 4) and starts
      // a new one at 30 — state merged across micro-batches.
      mem.addData(Seq(ev(3, 8), ev(4, 30)))
      q.processAllAvailable()
      val out = spark.table("t_sess")
        .select(col("session_start").cast("timestamp"), col("n"))
        .as[(Timestamp, Long)].collect().toSet
      assert(out == Set((ts(0), 3L), (ts(30), 1L)))
    } finally q.stop()
  }

  test("custom state via flatMapGroupsWithState: running count per user") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val counts = mem.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + evs.size
          state.update(total)
          Iterator((user, total))
      }.toDF("user_id", "running_n")
    val q = counts.writeStream.format("memory").queryName("t_state")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Seq(ev(1, 0), ev(2, 1), ev(3, 2, user = 2)))
      q.processAllAvailable()
      mem.addData(Seq(ev(4, 3), ev(5, 4, user = 3)))
      q.processAllAvailable()
      val rows = spark.table("t_state").as[(Long, Long)].collect().toSeq
      // Batch 1: user1 -> 2, user2 -> 1; batch 2: user1 -> 3 (state
      // carried), user3 -> 1.
      assert(rows.toSet == Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)))
    } finally q.stop()
  }

  test("RocksDB state store provider yields identical results to default") {
    // The 100 TB state story: the default HDFS-backed provider keeps all
    // state on the JVM heap; RocksDB keeps it off-heap/on-disk, which is
    // what a production-scale stateful job runs. Same plan, same results.
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val mem = MemoryStream[Ev]
      val events = Seq(ev(1, 1), ev(2, 5), ev(3, 12), ev(4, 59))
      mem.addData(events)
      val streamed = Streams.runToTable(
        Streams.tumblingCounts(mem.toDF(), "10 minutes"),
        "t_rocksdb", "complete")
      val batch = Streams.tumblingCounts(events.toDF(), "10 minutes")
      assert(streamed.collect().toSet == batch.collect().toSet)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("RocksDB changelog checkpointing yields identical results") {
    // Changelog checkpointing uploads per-batch DELTAS instead of full
    // RocksDB snapshots — the knob that makes commit cost proportional
    // to state CHANGE rather than state SIZE, i.e. the production
    // configuration once state is GB-scale. Pure performance knob: the
    // emitted rows must be identical to the snapshot-checkpoint run.
    implicit val sqlCtx = spark.sqlContext
    val keys = Seq("spark.sql.streaming.stateStore.providerClass",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0),
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(keys(1), "true")
      val mem = MemoryStream[Ev]
      val events = Seq(ev(1, 1), ev(2, 5), ev(3, 12), ev(4, 59),
        ev(5, 2, user = 2L), ev(6, 30, user = 2L))
      mem.addData(events)
      val streamed = Streams.runToTable(
        Streams.sessionCounts(mem.toDF(), "10 minutes"),
        "t_changelog", "complete")
      val batch = Streams.sessionCounts(events.toDF(), "10 minutes")
      assert(streamed.collect().toSet == batch.collect().toSet)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("foreachBatch sink: per-batch exactly-once style handoff") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (batchId, rows)
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // The standard sink escape hatch: batch is a static DataFrame a
        // JDBC/Delta writer would consume transactionally, keyed by
        // batch id for idempotent retries.
        seen.synchronized { seen += ((id, batch.count())) }
        ()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Seq(ev(1, 1), ev(2, 2)))
      q.processAllAvailable()
      mem.addData(Seq(ev(3, 3)))
      q.processAllAvailable()
      assert(seen.sortBy(_._1).map(_._2).toSeq == Seq(2L, 1L))
    } finally q.stop()
  }

  test("streaming dedup emits each id once within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(Seq(ev(1, 1), ev(1, 1), ev(2, 2), ev(1, 1), ev(3, 3)))
    val out = Streams.runToTable(
      Streams.dedupStream(mem.toDF(),
        "1 hour"),
      "t_dedup", "append")
    assert(out.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("maxFilesPerTrigger bounds each micro-batch under AvailableNow") {
    // Backfill-safety: pointing a stream at a directory with history must
    // not load everything into one giant batch — the per-trigger cap
    // paces ingestion, and AvailableNow still drains to completion.
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_paced").toString
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"f$i")).toDF("id", "tag")
        .write.parquet(s"$dir/file_$i.parquet")
    }
    val stream = spark.readStream
      .schema("id BIGINT, tag STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*.parquet")
    val q = stream.writeStream.format("memory").queryName("paced_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // All data arrived, across at least 4 data batches of ≤1 file each.
    assert(spark.table("paced_mem").count() == 4)
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    assert(dataBatches.length >= 4,
      s"expected >=4 paced batches, got ${dataBatches.length}")
    assert(dataBatches.forall(_.numInputRows == 1))
  }

  test("file-source stream over harness events.parquet matches the batch read") {
    // Guards eventsStream's on-disk type probe: the harness generator has
    // switched the `ts` physical type between TIMESTAMP(NANOS) and
    // TIMESTAMP(MICROS) across rounds, and a hard-coded read schema
    // silently compresses the 30-day event timeline 1000× while
    // MemoryStream-only tests stay green. This test reads the REAL
    // harness parquet through both paths and requires equality.
    val dir = "/root/testdata/sf0.001"
    val streamed = Streams.runToTable(
      Streams.tumblingCounts(Streams.eventsStream(spark, dir), "1 hour"),
      "t_file_parity", "complete")
    val batch = Streams.tumblingCounts(Tables.events(spark, dir), "1 hour")
    // A 30-day timeline yields hundreds of hourly windows; the nanos/micros
    // confusion collapses this to ~2 and fails here before the set compare.
    assert(streamed.count() > 100,
      s"suspicious window count ${streamed.count()} — timestamp unit bug?")
    assert(streamed.collect().toSet == batch.collect().toSet)
  }

  test("pitFeatureState carries counters and the 7-day buffer across batches") {
    // The st24 state machine's risky parts are exactly what a
    // single-batch AvailableNow run can't exercise: counters resuming
    // from state, and the trailing-week buffer surviving one batch and
    // being EVICTED by event-time in a later one. Three in-order slices
    // over 20 days; the day-20 purchase must see the day-19 spend but
    // not day-1's (evicted), on top of counters from every prior batch.
    implicit val sqlCtx = spark.sqlContext
    def at(day: Int, hour: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")
    def e(id: Long, day: Int, hour: Int, typ: String, v: Double) =
      Ev(id, at(day, hour), 1L, typ, v, "{}")
    val b1 = Seq(e(1, 1, 1, "view", 5.0), e(2, 1, 2, "purchase", 10.0))
    val b2 = Seq(e(3, 12, 1, "click", 7.0))
    val b3 = Seq(e(4, 19, 1, "view", 3.0), e(5, 20, 1, "purchase", 9.0))
    val mem = MemoryStream[Ev]
    val proj = mem.toDF().select(
      col("user_id"),
      concat(
        lpad(unix_micros(col("ts").cast("timestamp")).cast("string"), 16, "0"),
        lpad(col("event_id").cast("string"), 12, "0")).as("sk"),
      col("event_id"), col("event_type"),
      expr("unix_micros(cast(ts as timestamp)) DIV 1000000").as("es"),
      floor(col("value") * 100 + 0.5).cast("long").as("val_c"))
    val q = Streams.pitFeatureState(proj)
      .writeStream.format("memory").queryName("t_pit").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      Seq(b1, b2, b3).foreach { b => mem.addData(b); q.processAllAvailable() }
      val rows = spark.table("t_pit")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
      // Purchase 2 (day 1): one prior event (the view), 500c inside 7d.
      // Purchase 5 (day 20): four prior events, one prior purchase, and
      // ONLY day-19's 300c in the window — day 1 and day 12 evicted.
      assert(rows == Seq(
        (1L, 2L, 1L, 0L, 500L),
        (1L, 5L, 4L, 1L, 300L)), s"streamed features: $rows")
    } finally q.stop()
  }
}

object StreamingSpec {
  /** Top-level so the Dataset encoder needs no outer instance. */
  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
}
