package graft

import org.apache.spark.sql.functions._

/** Invariants of the incremental-maintenance family
  * (`queries/IncrementalQueries.scala`) that the DuckDB hash compare
  * can't express: the CDC merge algebra's self-check, the bloom
  * filter's no-false-negative contract, and the reservoir's exact
  * per-group size. */
class IncrementalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q197 CDC merge: incremental state ≡ full recompute, both branches hit") {
    val out = SparkEntry.queries("q197_cdc_merge")(spark, dir).cache()
    try {
      assert(out.where(col("recompute_match") =!= 1L).count() == 0,
        "merged state diverged from the ground-truth recompute")
      // Both merge branches must be exercised: untouched base rows carry
      // forward AND delta rows upsert (else the full-outer join is
      // vacuously testing one side).
      val srcs = out.select("src").distinct().collect().map(_.getString(0)).toSet
      assert(srcs == Set("base", "delta"), s"merge branches exercised: $srcs")
      // Tombstones actually delete: fewer final rows than live users.
      val users = Tables.events(spark, dir).select("user_id").distinct().count()
      assert(out.count() < users,
        s"no user was tombstoned (${out.count()} rows vs $users users)")
    } finally out.unpersist()
  }

  test("dd18 bloom prefilter: no false negatives, and the filter pays") {
    val out = SparkEntry.queries("dd18_bloom_incremental")(spark, dir).cache()
    try {
      val row = out.select("n_hist_probed", "n_bloom_pass", "n_true_member",
        "n_bloom_fp").head()
      val (probed, pass, truth, fp) =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      // Bloom contract: every true member passes (pass ≥ truth ⇔ fp ≥ 0),
      // and the filter prunes the vast majority of history before the
      // exact join — the property that makes the pattern worth running.
      assert(fp >= 0L, "bloom false-positive count went negative")
      assert(pass >= truth, "bloom dropped a true member (false negative)")
      assert(pass < probed / 2,
        s"filter pruned nothing: $pass of $probed history rows passed")
      // The synthetic corpus must exercise the dup path, else the exact
      // join is never tested against a non-empty candidate set.
      assert(out.where(col("is_dup") === 1L).count() > 0,
        "no increment doc duplicated history — degenerate fixture")
      // Per-doc verdicts agree with a bloom-free exact recompute.
      val dupIds = out.where(col("is_dup") === 1L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val fpCol = md5(array_join(
        slice(array_sort(array_distinct(split(col("text"), " "))), 1, 20), " ")
        .cast("binary"))
      val doc = Tables.documents(spark, dir)
        .select(col("doc_id"), fpCol.as("f"))
      val exact = doc.where(col("doc_id") % 20 === 0).as("n")
        .join(doc.where(col("doc_id") % 20 =!= 0).as("h"), "f")
        .select(col("n.doc_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(dupIds == exact,
        s"bloom-prefiltered verdicts diverge from exact: ${dupIds.diff(exact)} / ${exact.diff(dupIds)}")
    } finally out.unpersist()
  }

  test("tx41 chunking is content-defined: a prefix edit shifts only the head") {
    // The property that justifies variable boundaries over tx32's fixed
    // windows: prepending tokens to a document leaves every chunk after
    // the first re-synchronized boundary byte-identical (a fixed stride
    // would shift every window downstream). The rolling 3-token window
    // re-synchronizes as soon as it no longer overlaps the edit, so
    // every ORIGINAL boundary survives (shifted) and only the head
    // chunk(s) can differ.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chunkFps(text: String): Vector[String] = {
      val toks = text.split(" ").toVector
      val n = toks.length
      // 1-based j, window toks[j-2..j] — the spec's exact recipe.
      val bnd = (3 to n).filter { j =>
        val h = java.lang.Long.parseLong(
          md5hex(s"${toks(j - 3)} ${toks(j - 2)} ${toks(j - 1)}").take(8), 16)
        Math.floorMod(h, 2147483647L) % 16 == 0
      }.toVector
      val cuts = (0L +: bnd.map(_.toLong)) ++
        (if (bnd.nonEmpty && bnd.last == n) Nil else Seq(n.toLong))
      cuts.sliding(2).map { case Seq(a, b) =>
        md5hex(toks.slice(a.toInt, b.toInt).mkString(" "))
      }.toVector
    }
    val original = (1 to 400).map(i => s"w${i % 37}x$i").mkString(" ")
    val edited = "zz0 zz1 " + original
    val oc = chunkFps(original)
    val ec = chunkFps(edited)
    assert(oc.size > 10, s"fixture degenerate: ${oc.size} chunks")
    val common = oc.reverse.zip(ec.reverse).takeWhile { case (a, b) => a == b }
    assert(common.size >= oc.size - 1,
      s"prefix edit desynchronized the chunker: only ${common.size} of " +
        s"${oc.size} suffix chunks survived")
    assert(ec.size <= oc.size + 2, "edit created more than head-local chunks")
  }

  test("q206 features are leakage-free: label's own row never counted") {
    // The contract the op exists for: every feature of a label event
    // derives from STRICTLY earlier rows. Recompute from raw events for
    // a sample of labels and compare — including that the label
    // purchase's own value is absent from its trailing spend.
    import spark.implicits._
    val out = SparkEntry.queries("q206_pit_features")(spark, dir)
      .orderBy("label_event_id").limit(50).collect()
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("eu"),
        floor(col("value") * 100 + 0.5).cast("long").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val byId = ev.map(e => e._2 -> e).toMap
    out.foreach { r =>
      val (u, id) = (r.getLong(0), r.getLong(1))
      val label = byId(id)
      val mine = ev.filter(_._1 == u)
      def key(e: (Long, Long, String, Long, Long)) = (e._4, e._2)
      val prior = mine.filter(e => key(e)._1 < key(label)._1 ||
        (key(e)._1 == key(label)._1 && key(e)._2 < key(label)._2))
      assert(r.getLong(2) == prior.length, s"label $id prior_events")
      assert(r.getLong(3) == prior.count(_._3 == "purchase"),
        s"label $id prior_purchases")
      val es = label._4 / 1000000L
      val spend = mine.filter { e =>
        val s = e._4 / 1000000L
        s >= es - 604800L && s <= es - 1L
      }.map(_._5).sum
      assert(r.getLong(4) == spend, s"label $id spend_7d_c")
    }
  }

  test("q201 reservoir: exactly k per group, ranked by the draw order") {
    val out = SparkEntry.queries("q201_grouped_reservoir")(spark, dir)
    val perGroup = out.groupBy("c_mktsegment").count().collect()
    assert(perGroup.nonEmpty && perGroup.forall(_.getLong(1) == 10L),
      "a segment sample is not exactly k=10 rows")
    // Ranks are 1..10 with no gaps in every group.
    val ranks = out.groupBy("c_mktsegment")
      .agg(sort_array(collect_list(col("rank"))).as("r"))
      .collect().map(_.getSeq[Long](1))
    assert(ranks.forall(_ == (1L to 10L)), "rank sequence has gaps")
  }
}
