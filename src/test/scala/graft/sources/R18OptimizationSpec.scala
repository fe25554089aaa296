package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Focused coverage of round-18's optimization internals: commit-side
  * generation-cache updates (read-your-writes under stat-invisible
  * rewrites), meta-cache invalidation on both meta writers, the
  * size-derived rank bucket count, and the size-derived streaming state
  * partitions. */
class R18OptimizationSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("version() reflects a commit immediately even when the rewrite " +
      "is stat-invisible (same size, same mtime tick)") {
    val dir = tmpDir("r18gen")
    Seq((1L, "a")).toDF("id", "v").write.mode("append")
      .format("graft.sources.ManifestSink").option("path", dir).save()
    val g1 = ManifestSink.cachedGeneration(dir)
    Seq((2L, "b")).toDF("id", "v").write.mode("append")
      .format("graft.sources.ManifestSink").option("path", dir).save()
    val g2 = ManifestSink.cachedGeneration(dir)
    assert(g2 == g1 + 1, s"append must advance the generation ($g1 -> $g2)")
    // Worst case the stat fingerprint cannot see: a rewrite that keeps
    // the BYTE SIZE (generation digit 2 -> 3) and lands within the same
    // mtime tick (mtime pinned back). A pure stat check would keep
    // serving g2 forever; the publish path's commit-side update
    // (noteCommittedGeneration) is what closes this — emulate the swap
    // + hook exactly as writePointer performs them.
    val m = Paths.get(dir, "manifest.json")
    val mtime = Files.getLastModifiedTime(m)
    val txt = new String(Files.readAllBytes(m), "UTF-8")
    val g3txt = txt.replaceFirst(
      "\"generation\":" + g2, "\"generation\":" + (g2 + 1))
    assert(g3txt.length == txt.length, "test needs a same-size rewrite")
    Files.write(m, g3txt.getBytes("UTF-8"))
    Files.setLastModifiedTime(m, mtime) // stat-identical to the g2 state
    ManifestSink.noteCommittedGeneration(Paths.get(dir), g2 + 1)
    assert(ManifestSink.cachedGeneration(dir) == g2 + 1,
      "committer must read its own same-tick rewrite")
    // And the same-fingerprint merge guard: a racing reader re-reading
    // under the identical fingerprint can never REGRESS the entry.
    assert(ManifestSink.cachedGeneration(dir) == g2 + 1)
  }

  test("readMeta cache invalidates on overwriteMeta within one call") {
    val dir = Paths.get(tmpDir("r18meta"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    GraftCatalog.overwriteMeta(dir, schema, Nil, Map("k" -> "v1"))
    assert(GraftCatalog.readMeta(dir)._3("k") == "v1")
    // Immediate rewrite — possibly within the same mtime tick; the
    // write-path invalidation (not the stat fingerprint) must make the
    // next read see v2.
    GraftCatalog.overwriteMeta(dir, schema, Nil, Map("k" -> "v2"))
    assert(GraftCatalog.readMeta(dir)._3("k") == "v2")
  }

  test("globalRowNumber is exact and small inputs get few buckets") {
    val df = (1 to 1000).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    val ranked = graft.operators.Ranks.globalRowNumber(
      df, "rn", Seq(col("id")))
    // Exactness for any derived bucket count.
    val rows = ranked.select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to 1000).forall(i => rows(i.toLong) == i.toLong))
    // A kB-sized input must not fan out to the session width: the rank
    // output's partition count follows the derived bucket count.
    assert(ranked.rdd.getNumPartitions <= 2,
      s"expected a size-derived bucket count, got ${ranked.rdd.getNumPartitions}")
    graft.operators.Dedup.releaseCaches()
  }

  test("derivedStatePartitions floors small sources and honors width cap") {
    val dir = tmpDir("r18state")
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("event_id", "ts", "value")
      .write.parquet(s"$dir/part")
    // Single tiny file behind a glob — derivation must return the floor.
    val schema = spark.read.parquet(s"$dir/part").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/part")
    val got = graft.streaming.Streams.derivedStatePartitions(stream, 4)
    assert(got == 4, s"tiny source must stay at the floor, got $got")
  }
}
