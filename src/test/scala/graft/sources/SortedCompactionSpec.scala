package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sorted-merge compaction: same-stamp groups MERGE by key (the stamp
  * survives), mixed/absent stamps concatenate (the stamp drops). In
  * the sources package to inspect committed entries directly. */
class SortedCompactionSpec extends graft.SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def fileIds(dir: String, name: String): Seq[Long] =
    Files.readAllLines(Paths.get(dir, name), StandardCharsets.UTF_8)
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
      .map(l => NdjsonCodec.parseLine(l)("id") match {
        case NdjsonCodec.JsonTok(t) => t.toLong
        case other => fail(s"unexpected id token $other")
      })

  test("same-stamp groups merge by key: output physically sorted, stamp survives") {
    val dir = Files.createTempDirectory("graft_sortcompact").toString
    // Three INTERLEAVED sorted batches (id % 3 stripes): concatenation
    // would NOT be sorted, so a sorted output proves the merge ran.
    (0 until 3).foreach { r =>
      spark.range(0, 300).filter(col("id") % 3 === r)
        .selectExpr("id", "id * 2 AS v").coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .option("path", dir).option("sortBy", "id")
        .mode("append").save()
    }
    assert(ManifestSink.committedEntries(dir).forall(_.sorted == Seq("id")))
    // An equality delete composes: dropped rows, order preserved.
    import spark.implicits._
    ManifestOps.equalityDelete(dir, Seq(7L, 8L, 151L).toDF("id"))
    assert(ManifestSink.compact(dir, targetRows = 100000L) == 3)
    val entries = ManifestSink.committedEntries(dir)
    assert(entries.size == 1)
    assert(entries.head.sorted == Seq("id"),
      "same-stamp merge must keep the sort stamp")
    assert(entries.head.rows == 297L)
    val ids = fileIds(dir, entries.head.name)
    assert(ids == ids.sorted, "merged file must be physically sorted")
    assert(ids.size == 297 && !ids.contains(7L) && !ids.contains(151L))
    // And the table reads back intact.
    val got = spark.read.format("graft.sources.ManifestSink")
      .schema(schema).option("path", dir).load()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 300L).filterNot(Set(7L, 8L, 151L))
      .map(i => i -> i * 2).toMap)
  }

  test("mixed stamps concatenate and drop the claim") {
    val dir = Files.createTempDirectory("graft_sortcompact_mix").toString
    spark.range(0, 50).selectExpr("id", "id AS v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", dir).option("sortBy", "id").mode("append").save()
    spark.range(50, 100).selectExpr("id", "id AS v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", dir).mode("append").save() // unsorted batch
    assert(ManifestSink.compact(dir, targetRows = 100000L) == 2)
    val entries = ManifestSink.committedEntries(dir)
    assert(entries.size == 1 && entries.head.sorted.isEmpty,
      "a mixed-stamp merge must not claim an order")
    assert(spark.read.format("graft.sources.ManifestSink")
      .schema(schema).option("path", dir).load().count() == 100L)
  }

  test("string sort keys merge in UTF8String binary order") {
    val dir = Files.createTempDirectory("graft_sortcompact_str").toString
    val sch = StructType(Seq(StructField("k", org.apache.spark.sql.types
      .StringType), StructField("v", LongType)))
    // Two sorted batches whose keys interleave, including a
    // supplementary-plane character (UTF-16 vs UTF-8 order diverges
    // there — the merge must match Spark's binary order).
    import spark.implicits._
    Seq(("a", 1L), ("c", 3L), ("😀", 9L)).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", dir).option("sortBy", "k").mode("append").save()
    Seq(("b", 2L), ("d", 4L), ("é", 7L)).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", dir).option("sortBy", "k").mode("append").save()
    assert(ManifestSink.compact(dir, targetRows = 100000L) == 2)
    val entry = ManifestSink.committedEntries(dir).head
    assert(entry.sorted == Seq("k"))
    val ks = Files.readAllLines(Paths.get(dir, entry.name),
        StandardCharsets.UTF_8).toArray(Array.empty[String]).toSeq
      .filter(_.nonEmpty)
      .map(l => NdjsonCodec.parseLine(l)("k") match {
        case NdjsonCodec.JsonStr(s) => s
        case other => fail(s"$other")
      })
    val expected = ks.sortBy(
      org.apache.spark.unsafe.types.UTF8String.fromString)(
      Ordering.comparatorToOrdering(
        java.util.Comparator.naturalOrder[
          org.apache.spark.unsafe.types.UTF8String]()))
    assert(ks == expected, s"got $ks, want $expected")
  }
}
