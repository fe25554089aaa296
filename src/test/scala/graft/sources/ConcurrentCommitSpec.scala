package graft.sources

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Multi-writer commits: append commits are OPTIMISTIC — they compose
  * against whatever manifest they find once inside the publish lock
  * (the re-read under the lock is the re-validate, and an append
  * always validates clean), so concurrent appenders QUEUE up to the
  * holder's lease instead of failing at the short wait. Conflict-
  * DETECTING commits (copy-on-write replacement) keep the loud
  * precise failure: their file-level plans go stale while queued.
  * In the sources package to drive ManifestBatchWrite and the lock
  * directly. */
class ConcurrentCommitSpec extends graft.SparkSpec {

  private val pool = ExecutionContext.fromExecutorService(
    java.util.concurrent.Executors.newCachedThreadPool())

  private def append(dir: String, from: Long, until: Long): Unit =
    spark.range(from, until).selectExpr("id", "id * 2 AS v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", dir).mode("append").save()

  test("two concurrent appends both land: disjoint backfills commit " +
      "in either order, one generation each, no torn manifest") {
    val dir = Files.createTempDirectory("graft_ccommit").toString
    val start = new CountDownLatch(1)
    val fs = Seq((0L, 500L), (500L, 1000L)).map { case (a, b) =>
      Future {
        start.await(10, TimeUnit.SECONDS)
        append(dir, a, b)
      }(pool)
    }
    start.countDown()
    fs.foreach(Await.result(_, 120.seconds))
    assert(ManifestSink.committedGeneration(dir) == 2L)
    val entries = ManifestSink.committedEntries(dir)
    assert(entries.size == 2 && entries.map(_.rows).sum == 1000L)
    val df = spark.read.format("graft.sources.ManifestSink")
      .option("path", dir).load()
    assert(df.count() == 1000L)
    assert(df.selectExpr("CAST(sum(v) AS BIGINT)").head().getLong(0) ==
      (0L until 1000L).map(_ * 2).sum)
  }

  test("an append queues past the short wait behind a live lock holder " +
      "instead of failing (the pre-round-16 behavior)") {
    val dir = Files.createTempDirectory("graft_cqueue").toString
    append(dir, 0L, 10L)
    val dirPath = Paths.get(dir)
    val holderIn = new CountDownLatch(1)
    val holdMs = ManifestSink.LockAcquireWaitMs + 2000L
    val holder = Future {
      ManifestSink.withPublishLock(dirPath) {
        holderIn.countDown()
        Thread.sleep(holdMs)
      }
    }(pool)
    assert(holderIn.await(10, TimeUnit.SECONDS), "holder never locked")
    val t0 = System.nanoTime()
    append(dir, 10L, 20L) // would throw "concurrent committer" before
    val waitedMs = (System.nanoTime() - t0) / 1e6
    Await.result(holder, 60.seconds)
    assert(waitedMs > ManifestSink.LockAcquireWaitMs.toDouble,
      s"append landed in ${waitedMs}ms — it cannot have queued behind " +
        s"the ${holdMs}ms holder")
    assert(ManifestSink.committedGeneration(dir) == 2L)
    assert(spark.read.format("graft.sources.ManifestSink")
      .option("path", dir).load().count() == 20L)
  }

  test("a queued waiter never reclaims a HEARTBEATING holder (the " +
      "compaction interplay): lease refreshes extend the wait even " +
      "when the waiter's lease is shorter than the hold") {
    val dir = Files.createTempDirectory("graft_chb").toString
    val dirPath = Paths.get(dir)
    val holderIn = new CountDownLatch(1)
    val holdMs = 3500L
    @volatile var holderDoneAt = 0L
    val holder = Future {
      ManifestSink.withPublishLock(dirPath) {
        holderIn.countDown()
        // Compaction's posture: a long critical section that refreshes
        // the lock's mtime between units of work.
        val until = System.currentTimeMillis + holdMs
        while (System.currentTimeMillis < until) {
          Thread.sleep(250L)
          ManifestSink.heartbeatLock(dirPath)
        }
        holderDoneAt = System.currentTimeMillis
      }
    }(pool)
    assert(holderIn.await(10, TimeUnit.SECONDS), "holder never locked")
    // Waiter's lease (2.5s) is shorter than the hold (3.5s) but an
    // order of magnitude above the 250ms heartbeat cadence (scheduler
    // margin — a single overshot sleep must not make the live lock
    // look stale): only the heartbeats keep it LIVE; without them the
    // waiter would judge it stale and break it mid-section.
    @volatile var waiterRanAt = 0L
    ManifestSink.withPublishLock(dirPath, leaseMs = 2500L,
        acquireWaitMs = 30000L) {
      waiterRanAt = System.currentTimeMillis
    }
    Await.result(holder, 60.seconds)
    assert(holderDoneAt > 0 && waiterRanAt >= holderDoneAt,
      s"waiter entered at $waiterRanAt before the live holder finished " +
        s"at $holderDoneAt — the heartbeated lock was broken in-flight")
  }

  test("concurrent appends land on the parquet kind too: the queueing " +
      "commit path is payload-kind-agnostic") {
    val wh = Files.createTempDirectory("graft_cpq").toString
    val cat = s"gcc_${wh.hashCode & 0x7fffffff}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('filekind'='parquet')""")
    val start = new CountDownLatch(1)
    val fs = Seq((0L, 500L), (500L, 1000L)).map { case (a, b) =>
      Future {
        start.await(10, TimeUnit.SECONDS)
        spark.range(a, b).selectExpr("id", "id * 2 AS v").coalesce(1)
          .writeTo(s"$cat.t").append()
      }(pool)
    }
    start.countDown()
    fs.foreach(Await.result(_, 120.seconds))
    val entries = ManifestSink.committedEntries(s"$wh/t")
    assert(entries.size == 2 && entries.forall(_.name.endsWith(".parquet")))
    assert(spark.sql(s"SELECT CAST(sum(v) AS BIGINT) FROM $cat.t").head()
      .getLong(0) == (0L until 1000L).map(_ * 2).sum)
  }

  test("conflicting copy-on-write replacement still fails loudly and " +
      "precisely while a concurrent append sails through") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dir = Files.createTempDirectory("graft_ccow").toString
    append(dir, 0L, 100L)
    val victim = ManifestSink.committedEntries(dir).head.name
    // A concurrent commit retires the victim (truncate rewrites the
    // table), then the planned-earlier CoW replacement must refuse.
    spark.range(100L, 200L).selectExpr("id", "id * 2 AS v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", dir).mode("overwrite").save()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val bw = new ManifestBatchWrite(dir, schema, "cow-test",
      truncate = false, retain = false,
      maxSegments = ManifestSink.DefaultMaxSegments,
      partCols = Nil, replaceFiles = Set(victim))
    val e = intercept[IllegalStateException] {
      bw.commit(Array.empty)
    }
    assert(e.getMessage.contains(victim) &&
      e.getMessage.contains("no longer committed"), e.getMessage)
    // The table is untouched by the refused commit.
    assert(spark.read.format("graft.sources.ManifestSink")
      .option("path", dir).load().count() == 100L)
  }

  test("fuzz: 8 racing appenders x 5 commits each — every commit lands, " +
      "generations are dense, the manifest never tears") {
    val dir = Files.createTempDirectory("graft_cfuzz").toString
    val writers = 8
    val rounds = 5
    val rowsEach = 50L
    val start = new CountDownLatch(1)
    val fs = (0 until writers).map { w =>
      Future {
        start.await(10, TimeUnit.SECONDS)
        (0 until rounds).foreach { r =>
          val base = (w * rounds + r) * rowsEach
          append(dir, base, base + rowsEach)
        }
      }(pool)
    }
    start.countDown()
    fs.foreach(Await.result(_, 300.seconds))
    val total = writers * rounds * rowsEach
    assert(ManifestSink.committedGeneration(dir) == (writers * rounds).toLong)
    val entries = ManifestSink.committedEntries(dir)
    assert(entries.size == writers * rounds &&
      entries.map(_.rows).sum == total)
    val df = spark.read.format("graft.sources.ManifestSink")
      .option("path", dir).load()
    assert(df.count() == total)
    // Every id exactly once: a dropped commit or a doubled entry breaks
    // the distinct count or the sum.
    assert(df.select("id").distinct().count() == total)
    assert(df.selectExpr("CAST(sum(id) AS BIGINT)").head().getLong(0) ==
      (0L until total).sum)
  }

  test("concurrent mergeInto upserts racing on the SAME file both land " +
      "through the optimistic retry loop (the loser re-plans against " +
      "the winner's generation)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cmerge").toString
    // One file holds all keys, so both merges plan the SAME replaceFiles
    // set and the loser MUST hit the no-longer-committed conflict and
    // re-plan — the contested path, not the disjoint-files easy case.
    spark.range(0, 100).selectExpr("id", "CAST(0 AS BIGINT) AS v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", dir).mode("append").save()
    val start = new CountDownLatch(1)
    val fs = Seq((0L, 50L, 111L), (50L, 100L, 222L)).map { case (lo, hi, tag) =>
      Future {
        start.await(10, TimeUnit.SECONDS)
        ManifestOps.mergeInto(spark, dir,
          spark.range(lo, hi).selectExpr("id", s"CAST($tag AS BIGINT) AS v"),
          "id", maxRetries = 8)
      }(pool)
    }
    start.countDown()
    fs.foreach(Await.result(_, 120.seconds))
    val df = spark.read.format("graft.sources.ManifestSink")
      .option("path", dir).load()
    assert(df.count() == 100L)
    // Disjoint key halves: BOTH merges' rows must survive whatever the
    // commit order — a lost update would leave v=0 rows behind.
    assert(df.where("v = 0").count() == 0L)
    assert(df.where("id < 50 AND v <> 111").count() == 0L)
    assert(df.where("id >= 50 AND v <> 222").count() == 0L)
  }

  test("concurrent equality-delete tombstones and appends interleave: " +
      "every commit lands, deletes apply only to files they postdate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ceqdel").toString
    append(dir, 0L, 1000L)
    val start = new CountDownLatch(1)
    val appender = Future {
      start.await(10, TimeUnit.SECONDS)
      (0 until 4).foreach { r =>
        append(dir, 1000L + r * 100L, 1000L + (r + 1) * 100L)
      }
    }(pool)
    val deleter = Future {
      start.await(10, TimeUnit.SECONDS)
      (0 until 4).foreach { r =>
        // Keys from the INITIAL file only: whatever interleaving wins,
        // these tombstones postdate the file carrying the keys.
        ManifestOps.equalityDelete(dir,
          Seq.range(r * 50L, (r + 1) * 50L).toDF("id"))
      }
    }(pool)
    start.countDown()
    Await.result(appender, 120.seconds)
    Await.result(deleter, 120.seconds)
    assert(ManifestSink.committedGeneration(dir) == 9L)
    val df = spark.read.format("graft.sources.ManifestSink")
      .option("path", dir).load()
    assert(df.count() == 1400L - 200L)
    assert(df.where("id < 200").count() == 0L)
  }
}
