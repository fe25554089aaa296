package graft

import org.apache.spark.sql.functions._

/** Harness-table schema parity: the generator regenerates the testdata
  * parquet between rounds and has already changed physical types once
  * (events.ts TIMESTAMP(MICROS) → TIMESTAMP(NANOS) between r5 and r6
  * silently broke 12 streaming specs). [[Tables.schemaDrift]] pins the
  * MATERIALIZED logical type of every column of every harness table;
  * these specs run it against every scale factor present and prove it
  * both tolerates the physical variants the loaders are built to absorb
  * and fails loudly — naming the column — on ones they are not. */
class HarnessParitySpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    .filter(d => new java.io.File(d).exists())

  test("every harness table materializes the pinned logical schema") {
    assert(sfDirs.nonEmpty, "no testdata directories found")
    sfDirs.foreach { dir =>
      val drift = Tables.schemaDrift(spark, dir)
      assert(drift.isEmpty,
        s"harness schema drift at $dir:\n  ${drift.mkString("\n  ")}")
    }
  }

  test("documents.text stays single-space tokenizable at every SF") {
    // tx41 (CDC chunking), dd18 (content fingerprints), tx14 and the
    // shingling family all tokenize with split(' '); a regenerated
    // corpus that ships double spaces, newlines, or edge whitespace
    // would silently create empty tokens and shift every boundary and
    // fingerprint. Fail loudly, naming the violation kind.
    sfDirs.foreach { dir =>
      val bad = Tables.documents(spark, dir)
        .select(
          sum(when(col("text").contains("  "), 1).otherwise(0)).as("dbl"),
          sum(when(col("text").contains("\n"), 1).otherwise(0)).as("nl"),
          sum(when(col("text") =!= trim(col("text")), 1).otherwise(0)).as("pad"))
        .head()
      assert(bad.getLong(0) == 0, s"$dir: ${bad.getLong(0)} docs with double spaces")
      assert(bad.getLong(1) == 0, s"$dir: ${bad.getLong(1)} docs with newlines")
      assert(bad.getLong(2) == 0, s"$dir: ${bad.getLong(2)} docs with edge whitespace")
    }
  }

  test("nanos-physical events fixture still materializes TIMESTAMP_NTZ " +
      "with identical values (the r5->r6 regeneration, synthesized)") {
    val dir = sfDirs.head
    val tmp = java.nio.file.Files.createTempDirectory("graft-nanos-fixture")
      .toString
    // Rewrite events with ts as raw int64 nanoseconds — exactly what the
    // loaders observe when the generator emits TIMESTAMP(NANOS) and
    // `nanosAsLong` maps it to LongType (Spark cannot WRITE nanos
    // parquet, but the post-read representation is identical).
    val orig = Tables.events(spark, dir)
    orig.withColumn("ts",
        expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    assert(Tables.schemaDrift(spark, tmp, Seq("events")).isEmpty,
      "loader failed to absorb the nanos physical variant")
    // Value parity, not just type parity: a wrong-unit divide would keep
    // the type while compressing the 30-day timeline 1000x.
    def digest(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Row =
      df.agg(count(lit(1)), sum(hash(col("event_id"), col("ts"))),
        min(col("ts")), max(col("ts"))).head()
    assert(digest(Tables.events(spark, tmp)) == digest(orig))
  }

  test("an unabsorbable physical change fails naming the exact column") {
    val dir = sfDirs.head
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift-fixture")
      .toString
    Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast("string"))
      .limit(100)
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val drift = Tables.schemaDrift(spark, tmp, Seq("events"))
    assert(drift == Seq("events.ts: got STRING, want TIMESTAMP_NTZ"), drift)
    // A dropped column is reported as missing, not absorbed.
    val tmp2 = java.nio.file.Files.createTempDirectory("graft-drop-fixture")
      .toString
    Tables.events(spark, dir).drop("props").limit(100)
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp2/events.parquet")
    assert(Tables.schemaDrift(spark, tmp2, Seq("events"))
      == Seq("events.props: MISSING (want STRING)"))
  }

  test("er5 oracle-parity precondition: customer names are pure ASCII") {
    // The codegen JaroWinkler compares UTF-16 code units; DuckDB's
    // jaro_winkler_similarity walks bytes/codepoints. The two agree on
    // ASCII — which the harness customer names are today. If a
    // regeneration ships non-ASCII names this fails loudly instead of
    // er5 silently hash-mismatching its oracle.
    sfDirs.foreach { dir =>
      val nonAscii = Tables.customer(spark, dir)
        .where(col("c_name") =!= regexp_replace(col("c_name"),
          "[^\\x00-\\x7F]", ""))
        .count()
      assert(nonAscii == 0,
        s"$dir: $nonAscii customer names contain non-ASCII characters — " +
          "er5's JaroWinkler/DuckDB parity assumption no longer holds")
    }
  }

  test("events carry the full 5-value event_type enum at every SF") {
    // q189/q191 (KMV algebra on click vs purchase), tx23 (transition
    // matrix), tx26 (Naive Bayes priors) and friends key on event_type
    // literals. A regenerated dataset that drops a type would not error
    // — those specs would silently compute over empty slices (and
    // q189/q191's division-by-k_union parity would be exercised on a
    // degenerate shape no oracle run has covered). Fail loudly instead.
    val want = Set("click", "error", "purchase", "signup", "view")
    sfDirs.foreach { dir =>
      val got = Tables.events(spark, dir).select("event_type").distinct()
        .collect().map(_.getString(0)).toSet
      assert(got == want, s"$dir: event_type enum drifted: $got")
    }
  }
}
