package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Scale patterns: SCD2 merge semantics (versioning, idempotency) and
  * bloom-filter semi-join pruning (the shuffle-free alternative to a
  * distributed semi join when the key set fits a sketch). */
class ScalePatternSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dim = Seq(
    (1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C")
  ).toDF("k", "bal", "seg")

  test("scd2Merge: changed keys version, unchanged keys pass, new keys insert") {
    val updates = Seq(
      (1L, 99.0, "A"), // changed balance -> close v1, open v2
      (2L, 20.0, "B"), // no-op update -> nothing new
      (9L, 1.0, "N")   // brand-new key -> v1 current
    ).toDF("k", "bal", "seg")
    val out = Relational.scd2Merge(dim, updates, "k", Seq("bal", "seg"))
      .as[(Long, Double, String, Int, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 10.0, "A", 1, false), (1L, 99.0, "A", 2, true),
      (2L, 20.0, "B", 1, true),
      (3L, 30.0, "C", 1, true),
      (9L, 1.0, "N", 1, true)))
  }

  test("scd2Merge is idempotent: an all-no-op batch creates no versions") {
    val out = Relational.scd2Merge(dim, dim, "k", Seq("bal", "seg"))
    assert(out.count() == 3)
    assert(out.where(col("version") =!= 1 || !col("is_current")).count() == 0)
  }

  test("foreachBatch upsert: newest wins, retries idempotent, target swap atomic") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    val dir = java.nio.file.Files.createTempDirectory("upsert").toFile
    val target = new java.io.File(dir, "t").getAbsolutePath
    def ev(id: Long, user: Long, v: Double, min: Int) = StreamingSpec.Ev(
      id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), user, "a", v, "{}")
    val mem = MemoryStream[StreamingSpec.Ev]
    mem.addData(Seq(ev(1, 1, 1.0, 1), ev(2, 2, 2.0, 2), ev(3, 1, 9.0, 9)))
    Streams.foreachBatchUpsert(mem.toDF(), target, "user_id", "ts")
    def snapshot() = spark.read.parquet(target)
      .select("user_id", "value").as[(Long, Double)].collect().toSet
    assert(snapshot() == Set((1L, 9.0), (2L, 2.0))) // newest ts wins per user
    // Second stream run: a late-arriving older row must NOT win; a newer
    // one must. (New stream instance = a retry/extension of the feed.)
    val mem2 = MemoryStream[StreamingSpec.Ev]
    mem2.addData(Seq(ev(4, 1, 0.5, 3), ev(5, 2, 7.0, 30)))
    Streams.foreachBatchUpsert(mem2.toDF(), target, "user_id", "ts")
    assert(snapshot() == Set((1L, 9.0), (2L, 7.0)))
    // Idempotency: re-applying an already-merged batch changes nothing.
    Streams.upsertInto(
      Seq(ev(5, 2, 7.0, 30)).toDF(), target, "user_id", "ts")
    assert(snapshot() == Set((1L, 9.0), (2L, 7.0)))
  }

  test("partitionStats surfaces skew that a keyed repartition fixes") {
    import graft.operators.Relational
    val skewed = spark.range(10000).select(lit(1).as("k"), col("id"))
      .repartition(8, col("k")) // all rows hash to one partition
    val stats = Relational.partitionStats(skewed)
      .as[(Int, Long)].collect().toMap
    assert(stats.values.max == 10000L) // one hot partition holds everything
    val even = Relational.partitionStats(
        spark.range(10000).select(col("id")).repartition(8, col("id")))
      .as[(Int, Long)].collect()
    assert(even.map(_._2).sum == 10000L && even.map(_._2).max < 2500L)
  }

  test("bloom-filter pruning: zero false negatives, most non-members dropped") {
    // Big side: 20k rows, keys 0..1999; member set: 50 keys (multiples
    // of 40). At 100 TB the sketch replaces shuffling the big side for a
    // semi join: build once (aggregate), broadcast ~KBs, filter at scan.
    val big = spark.range(20000).select(col("id"), pmod(col("id"), lit(2000)).as("k"))
    val members = spark.range(50).select((col("id") * 40).as("k"))
    val bf = members.stat.bloomFilter("k", 50, 0.03)
    val mightContain = udf((k: Long) => bf.mightContain(k))
    val pruned = big.where(mightContain(col("k"))).select("id", "k")
    val exact = big.join(members, "k").select("id", "k")
    // No false negatives: every true member row survives pruning.
    assert(exact.exceptAll(pruned).count() == 0)
    // Effective: false-positive rate holds well under 10x the target.
    val kept = pruned.count().toDouble
    assert(kept >= exact.count())
    assert(kept <= big.count() * (50.0 / 2000 + 0.3))
  }
}
