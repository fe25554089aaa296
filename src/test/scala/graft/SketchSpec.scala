package graft

import graft.functions.KMinValues
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** KMV + DDSketch family (q188–q190): aggregator set semantics,
  * mergeability, estimator error bounds, plan shape, and
  * partition-count independence. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("KMinValues keeps the k smallest DISTINCT values, sorted") {
    val agg = new KMinValues(4)
    val buf = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 7L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq(1L, 2L, 3L, 7L))
    // Values worse than the current k-th are rejected without growth.
    assert(agg.reduce(buf, 100L) == Seq(1L, 2L, 3L, 7L))
    // A better value displaces the tail.
    assert(agg.reduce(buf, 0L) == Seq(0L, 1L, 2L, 3L))
  }

  test("KMinValues merge is a capped sorted SET union (idempotent)") {
    val agg = new KMinValues(4)
    val a = Seq(1L, 3L, 5L, 7L)
    val b = Seq(2L, 3L, 6L, 9L)
    assert(agg.merge(a, b) == Seq(1L, 2L, 3L, 5L))
    assert(agg.merge(a, a) == a) // self-merge: no duplicate inflation
    assert(agg.merge(a, Nil) == a)
  }

  test("KMV mergeability: sketch(A union B) == merge(sketch(A), sketch(B))") {
    // The cross-shard contract a 100 TB pipeline relies on: per-day KMV
    // shards merge into exactly the sketch of the concatenated stream.
    val agg = new KMinValues(64)
    def hash(i: Long): Long = graft.expressions.Hashing.splitmix64(i) >>> 4
    val skA = (0L until 5000L).map(hash).foldLeft(agg.zero)(agg.reduce)
    val skB = (3000L until 9000L).map(hash).foldLeft(agg.zero)(agg.reduce)
    val skAll = (0L until 9000L).map(hash).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(skA, skB) == skAll)
  }

  test("KMV estimator: within 20% of a 100k-distinct synthetic truth") {
    // (k-1)·M/h_k with k=256 has rel std-error ~1/sqrt(254) ≈ 6.3 %;
    // 20 % is a fixed-hash 3-sigma bound (deterministic, not flaky).
    val k = 256
    val kmv = udaf(new KMinValues(k), Encoders.scalaLong)
    val est = spark.range(100000)
      .select(conv(substring(md5(col("id").cast("string").cast("binary")),
        1, 15), 16, 10).cast("long").as("hv"))
      .agg(kmv(col("hv")).as("sk"))
      .select(floor(lit((k - 1).toDouble) * lit(1.152921504606846976e18) /
        element_at(col("sk"), -1).cast("double")).cast("long"))
      .as[Long].head()
    assert(math.abs(est - 100000.0) / 100000.0 < 0.20,
      s"KMV estimate $est off by more than 20% from 100000")
  }

  test("q188 plan: one shuffle exchange total — the bounded sketch agg") {
    // Same contract as q183's register build: the KMV aggregation must
    // be ONE map-side-combining aggregate — a <=k array per partition
    // over the wire, never a distinct shuffle of the keyspace.
    val df = SparkEntry.queries("q188_kmv_sketch")(spark, dir)
    val exchanges = df.queryExecution.executedPlan.toString
      .linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Broadcast"))
    assert(exchanges == 1,
      s"expected exactly 1 shuffle exchange, got $exchanges:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("q189 algebraic invariants: intersection within union, J in [0,1]") {
    val row = SparkEntry.queries("q189_kmv_jaccard")(spark, dir)
      .select("k_union", "n_common", "est_union", "est_intersect",
        "jaccard_permille").as[(Long, Long, Long, Long, Long)].head()
    val (kU, nC, estU, estI, jac) = row
    assert(nC >= 0 && nC <= kU)
    assert(estI >= 0 && estI <= estU)
    assert(jac >= 0 && jac <= 1000)
    // Identical inputs must give J = 1 exactly (sketch == union sketch).
    val agg = new KMinValues(16)
    val sk = (1L to 100L).map(i =>
      graft.expressions.Hashing.splitmix64(i) >>> 4)
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(sk, sk) == sk)
  }

  test("q190 bucket invariant: est_mid within 12.5% of the exact quantile") {
    // Bucket width is 2^s with lower bound idx·2^s, idx in [4,8) — so
    // width/lo <= 1/4 and the midpoint is within 1/8 of ANY member of
    // the bucket, including the exact target-rank value. True for any
    // data (regeneration-proof).
    val out = SparkEntry.queries("q190_dds_quantiles")(spark, dir)
      .select("q_permille", "target_rank", "est_mid")
      .as[(Long, Long, Long)].collect().toSeq
    val exact = Tables.lineitem(spark, dir)
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
      .orderBy("v").as[Long].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, rank, mid) =>
      val truth = exact((rank - 1).toInt)
      assert(math.abs(mid - truth).toDouble / truth <= 0.125,
        s"q=$q: est_mid $mid vs exact $truth exceeds 12.5%")
    }
  }

  test("q191 difference algebra: disjoint slices partition the union sketch") {
    val row = SparkEntry.queries("q191_kmv_difference")(spark, dir)
      .select("k_union", "n_only_a", "n_only_b", "est_union", "est_only_a",
        "est_only_b", "est_symdiff")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val (kU, onlyA, onlyB, estU, estA, estB, symdiff) = row
    // only-A, only-B, and common are disjoint slices of the union sketch.
    assert(onlyA >= 0 && onlyB >= 0 && onlyA + onlyB <= kU)
    assert(estA <= estU && estB <= estU)
    assert(symdiff == estA + estB)
  }

  test("st20 stream/batch parity: streamed KMV equals the batch sketch") {
    // The complete-mode aggregation buffer IS the sketch — one row of
    // <=k longs of state — and must finish value-identical to q188's
    // batch aggregation over the same events.
    val streamed = SparkEntry.queries("st20_stream_kmv")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("q188_kmv_sketch")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("q192 plan: one shuffle exchange — grouped sketch combines map-side") {
    // The grouped form must keep the same contract as the global one:
    // partial <=k arrays per (task, day) merge map-side, ONE exchange
    // carries them — never a distinct shuffle of the user keyspace.
    val df = SparkEntry.queries("q192_kmv_daily")(spark, dir)
    val exchanges = df.queryExecution.executedPlan.toString
      .linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Broadcast"))
    assert(exchanges == 1,
      s"expected exactly 1 shuffle exchange, got $exchanges:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("q192 grouped KMV: per-day sketches bounded, exact below k") {
    val rows = SparkEntry.queries("q192_kmv_daily")(spark, dir)
      .select("n_k", "est_users").as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (nK, est) =>
      assert(nK >= 1 && nK <= 256)
      // Below the sketch bound the estimate IS the exact per-day count.
      if (nK < 256) assert(est == nK)
      assert(est >= 1)
    }
  }

  test("st21 stream/batch parity: streamed histogram equals batch buckets") {
    val streamed = SparkEntry.queries("st21_stream_dds")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val batch = Tables.events(spark, dir)
      .select(floor(col("value") * 100 + 0.5).cast("long").as("v"))
      .withColumn("s", expr("cast(greatest(length(bin(v)), 3) - 3 as int)"))
      .select(expr("shiftleft(v div shiftleft(1L, s), s)").as("lo"))
      .groupBy("lo").agg(count(lit(1)).as("cnt"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    // Bounded-state claim: the histogram is a fixed grid, not a keyspace.
    assert(streamed.size < 256, s"histogram unexpectedly wide: ${streamed.size}")
  }

  test("q195 generalization: released classes reach k or are suppressed") {
    // The enforcement contract: at the chosen ladder level every
    // released equivalence class has size >= 10, except classes the
    // terminal level explicitly marks suppressed — and the chosen level
    // is minimal (a single level appears in the output).
    val rows = SparkEntry.queries("q195_k_anon_generalize")(spark, dir)
      .select("lvl", "class_size", "suppressed")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.size == 1, "multiple levels released")
    rows.foreach { case (lvl, size, sup) =>
      assert(size >= 10 || sup == 1,
        s"class of size $size at level $lvl released unsuppressed")
      if (sup == 1) assert(lvl == 3 && size < 10)
    }
  }

  test("q202 bitmap metrics agree with a day-set recompute") {
    // The erosion fold (x &= x<<1 until zero) and the bm & bm>>7
    // retention mask are easy to get off by one; recompute all three
    // metrics naively from each user's day SET and compare user by user.
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q202_activity_bitmaps")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val t0 = Tables.events(spark, dir).agg(min(col("ts")).cast("date"))
      .head().getDate(0).toLocalDate
    val days = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct().collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r =>
        java.time.temporal.ChronoUnit.DAYS.between(
          t0, r.getDate(1).toLocalDate).toInt).toSet).toMap
    assert(out.keySet == days.keySet)
    days.foreach { case (u, ds) =>
      val nActive = ds.size.toLong
      val ret7 = ds.count(d => ds.contains(d + 7)).toLong
      val streak = (0 to 63).map(start =>
        Iterator.from(start).takeWhile(ds.contains).length).max.toLong
      assert(out(u) == ((nActive, ret7, streak)),
        s"user $u: bitmap metrics ${out(u)} != set recompute " +
          s"(${(nActive, ret7, streak)})")
    }
  }

  test("q202 bitmap guard: a corpus spanning >= 64 days fails loudly, never wraps") {
    // JVM shiftleft wraps its shift amount mod 64 (day 64 aliases day
    // 0) while DuckDB's << does not — so instead of silently diverging
    // from the oracle, out-of-word days must raise. Synthesize an
    // events table spanning 100 days and drive the REGISTERED query.
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm_guard").toString
    val wide = (0 until 100).map { d =>
      (d.toLong, 1L, "view", 1.0,
        Timestamp.valueOf(f"2024-01-01 12:00:00").toInstant
          .plus(java.time.Duration.ofDays(d.toLong)))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    wide.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val ex = intercept[Exception] {
      SparkEntry.queries("q202_activity_bitmaps")(spark, tmp).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(ex).exists(m =>
      m != null && m.contains("activity bitmap day outside")),
      s"expected the 64-day guard to fire, got: ${causes(ex).mkString(" | ")}")
  }

  test("partition-count independence: sketch results identical at width 5") {
    // Sketch state derives from row CONTENT (portable hashes, integer
    // bucketing), never partition layout — byte-identical results under
    // any shuffle width (retries, AQE re-plans, cluster resizing).
    val names = Seq("q188_kmv_sketch", "q189_kmv_jaccard",
      "q190_dds_quantiles", "q191_kmv_difference", "q192_kmv_daily")
    def rowsOf(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val baseline = names.map(n => n -> rowsOf(n)).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      names.foreach { n =>
        assert(rowsOf(n) == baseline(n), s"$n diverged at width 5")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
