package graft.queries

import graft.{QuerySpec, Tables}
import graft.functions.KMinValues
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Round-8 sketch algebra beyond HLL: KMV (k-minimum-values) distinct
  * sketches — whose set-operation support (union / intersection /
  * Jaccard) is exactly what the register-only HLL family can't do
  * without inclusion–exclusion error stacking — and a DDSketch-style
  * log-bucketed quantile summary, upgrading the approx-percentile
  * pattern (q57, rows-only: Spark's KLL binary is engine-specific) to a
  * fully-DuckDB-oracled mergeable sketch.
  *
  * Shared discipline with the q183–q187 HLL family: every piece of
  * sketch state is exact integer math both engines derive identically
  * (md5-prefix 60-bit hashes, `length(bin(x))` bit-lengths, shifts and
  * integer division); the only floating steps are single IEEE
  * multiply/divides floored into BIGINT — bit-identical across engines.
  *
  * Reference anchor: the reference's analytics layer delegates distinct
  * counts and percentiles to Postgres over full data
  * (`sql/blog_post_queries.sql:4-38`); at 100 TB those become bounded
  * sketch state with map-side combine — the operators this file
  * registers.
  */
object SketchQueries {

  /** Sketch size: rel. std-error ≈ 1/sqrt(k-2) ≈ 6.3 %. */
  private val K = 256

  /** Hash space: hashes are uniform 60-bit md5 prefixes in [0, 2^60). */
  private val M = 1152921504606846976L // 2^60, exactly representable

  /** Portable 60-bit hash of a string column — same recipe as the HLL
    * family (q183): md5 hex prefix, identical in Spark and DuckDB. */
  private def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Corpus day bounds for the bitmap family (q202/q205/st23): `d0` =
    * min event date (the day origin — no calendar literal to go stale)
    * and `span` = number of distinct calendar days covered, from which
    * every probe/erosion window below is DERIVED (no duplicated `30`
    * literal to drift if the harness window changes). One row →
    * broadcast attach. */
  private def dayBounds(ev: DataFrame): DataFrame =
    ev.agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .select(col("t0").cast("date").as("d0"),
        (datediff(col("t1").cast("date"), col("t0").cast("date")) + 1)
          .cast("long").as("span"))

  /** (user_id, day) with day = days since the corpus min — GUARDED to
    * one 64-bit word: JVM/Spark `shiftleft` wraps its shift amount
    * mod 64 while DuckDB's `<<` does not, so a corpus spanning ≥ 64
    * days would silently alias days onto wrong bits and diverge from
    * the oracle. Out-of-range days fail loudly instead (raise_error),
    * which is the contract a (user, month) keying would restore. */
  private def guardedDays(ev: DataFrame): DataFrame =
    ev.crossJoin(broadcast(dayBounds(ev)))
      .select(col("user_id"), col("span"),
        datediff(col("ts").cast("date"), col("d0")).cast("int").as("rawday"))
      .select(col("user_id"), col("span"), guardDay(col("rawday")).as("day"))

  /** The 64-bit-word guard itself — shared with the streaming twin. */
  private def guardDay(rawday: Column): Column =
    when(rawday.between(0, 63), rawday)
      .otherwise(raise_error(concat(
        lit("activity bitmap day outside [0, 64): "),
        rawday.cast("string"))).cast("int"))

  /** KMV estimate from a sorted sketch array: exact count below k
    * (the sketch IS the distinct set), else (k-1)·M / h_k floored —
    * one IEEE multiply+divide, deterministic across engines. */
  private def kmvEstimate(sk: Column): Column =
    when(size(sk) < K, size(sk).cast("long"))
      .otherwise(floor((size(sk) - 1).cast("double") * lit(M.toDouble) /
        element_at(sk, -1).cast("double")).cast("long"))

  val specs: Seq[QuerySpec] = Seq(

    // KMV distinct sketch over the event user stream. The oracle is the
    // relational spec (DISTINCT → ORDER BY → LIMIT k); the engine plan
    // is the scalable one: a typed Aggregator whose partial state is a
    // sorted ≤ k array per partition — map-side combine, one bounded
    // array per partition over the wire, NO distinct shuffle (the exact
    // cost the r7 q183 finding flagged). Harness SFs exercise both
    // estimator branches: 15/150 distinct users (< k → exact path) at
    // sf0.001/0.01, 1500 (> k → (k-1)·M/h_k path) at sf0.1.
    QuerySpec(
      "q188_kmv_sketch",
      s"""WITH h AS (
         |  SELECT DISTINCT CAST('0x' ||
         |    substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
         |  FROM events),
         |k AS (SELECT hv FROM h ORDER BY hv LIMIT $K),
         |r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rank FROM k),
         |s AS (SELECT max(hv) AS h_k, CAST(count(*) AS BIGINT) AS n_k FROM k)
         |SELECT CAST(r.rank AS BIGINT) AS rank, r.hv,
         |  CASE WHEN s.n_k < $K THEN s.n_k
         |       ELSE CAST(floor(CAST(s.n_k - 1 AS DOUBLE) * ${M}e0
         |         / CAST(s.h_k AS DOUBLE)) AS BIGINT) END AS est_distinct
         |FROM r CROSS JOIN s""".stripMargin) { (s, dir) =>
      val kmv = udaf(new KMinValues(K), Encoders.scalaLong)
      Tables.events(s, dir)
        .select(hash60(col("user_id").cast("string")).as("hv"))
        .agg(kmv(col("hv")).as("sk"))
        .select(col("sk"), posexplode(col("sk")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col").as("hv"), kmvEstimate(col("sk")).as("est_distinct"))
    },

    // KMV SET ALGEBRA — the operation HLL registers cannot express
    // without stacking inclusion–exclusion error (q185): estimated
    // union, intersection, and Jaccard of two key sets from two bounded
    // sketches. Keys are user-days; sets are "days a user clicked" vs
    // "days a user purchased", so the intersection is a real
    // same-day-conversion overlap, not a degenerate all-users match.
    // Union sketch = k smallest of the two sketch SETS (array_sort ∘
    // array_union ∘ slice — in-row array ops on two ≤ k arrays);
    // J ≈ |union sketch ∩ A ∩ B| / |union sketch|; every output is
    // integer (permille for J, integer-division estimates) so both
    // engines agree bit-for-bit.
    QuerySpec(
      "q189_kmv_jaccard",
      s"""WITH a AS (
         |  SELECT DISTINCT CAST('0x' || substr(md5(
         |      CAST(user_id AS VARCHAR) || '-' ||
         |      CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15) AS BIGINT) AS hv
         |  FROM events WHERE event_type = 'click'),
         |b AS (
         |  SELECT DISTINCT CAST('0x' || substr(md5(
         |      CAST(user_id AS VARCHAR) || '-' ||
         |      CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15) AS BIGINT) AS hv
         |  FROM events WHERE event_type = 'purchase'),
         |ka AS (SELECT hv FROM a ORDER BY hv LIMIT $K),
         |kb AS (SELECT hv FROM b ORDER BY hv LIMIT $K),
         |u AS (SELECT hv FROM (
         |    SELECT hv FROM ka UNION SELECT hv FROM kb)
         |  ORDER BY hv LIMIT $K),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS k_union, max(hv) AS h_k
         |      FROM u),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n_common
         |      FROM u JOIN ka USING (hv) JOIN kb USING (hv)),
         |e AS (SELECT s.k_union, s.h_k, c.n_common,
         |    CASE WHEN s.k_union < $K THEN s.k_union
         |         ELSE CAST(floor(CAST(s.k_union - 1 AS DOUBLE) * ${M}e0
         |           / CAST(s.h_k AS DOUBLE)) AS BIGINT) END AS est_union
         |  FROM s CROSS JOIN c)
         |SELECT k_union, h_k, n_common, est_union,
         |  (est_union * n_common) // k_union AS est_intersect,
         |  (n_common * 1000) // k_union AS jaccard_permille
         |FROM e""".stripMargin) { (s, dir) =>
      val kmv = udaf(new KMinValues(K), Encoders.scalaLong)
      val ev = Tables.events(s, dir)
      def sketch(t: String, as: String): DataFrame =
        ev.where(col("event_type") === t)
          .select(hash60(concat(col("user_id").cast("string"), lit("-"),
            to_date(col("ts")).cast("string"))).as("hv"))
          .agg(kmv(col("hv")).as(as)) // 1 row: maxRows-bounded attach
      sketch("click", "sa").crossJoin(sketch("purchase", "sb"))
        .withColumn("u", slice(array_sort(array_union(col("sa"), col("sb"))),
          1, K))
        .select(size(col("u")).cast("long").as("k_union"),
          element_at(col("u"), -1).as("h_k"),
          size(array_intersect(array_intersect(col("u"), col("sa")),
            col("sb"))).cast("long").as("n_common"),
          kmvEstimate(col("u")).as("est_union"))
        .select(col("k_union"), col("h_k"), col("n_common"), col("est_union"),
          expr("(est_union * n_common) div k_union").as("est_intersect"),
          expr("(n_common * 1000) div k_union").as("jaccard_permille"))
    },

    // DDSketch-style log-bucketed quantile summary over line-item price
    // cents — the fully-oracled mergeable upgrade of the q57
    // approx-percentile pattern (Spark's KLL binary is engine-specific
    // and rows-only by design). Bucket = value truncated to 3
    // significand bits: s = bitlen(v)-3, lo = (v >> s) << s — pure
    // integer both engines, relative bucket width ≤ 1/4 so the midpoint
    // estimate is within 12.5 % of any value in the bucket (pinned vs
    // exact percentiles in SketchSpec). The histogram is built as
    // per-ship-year SHARDS then merged by per-bucket SUM — the
    // mergeability a 100 TB pipeline needs is in the oracled path
    // itself, not just a scalatest. State is ~32 buckets; the quantile
    // walk is a bounded-grid self-join (no global window, no sort of
    // the data).
    QuerySpec(
      "q190_dds_quantiles",
      """WITH v AS (
        |  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM lineitem),
        |buck AS (
        |  SELECT yr, ((v // (CAST(1 AS BIGINT) << s)) << s) AS lo FROM (
        |    SELECT yr, v, greatest(length(bin(v)), 3) - 3 AS s FROM v)),
        |shards AS (
        |  SELECT yr, lo, CAST(count(*) AS BIGINT) AS cnt
        |  FROM buck GROUP BY yr, lo),
        |merged AS (
        |  SELECT lo, CAST(sum(cnt) AS BIGINT) AS cnt FROM shards GROUP BY lo),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM merged),
        |cum AS (
        |  SELECT a.lo, CAST(sum(b.cnt) AS BIGINT) AS cum
        |  FROM merged a JOIN merged b ON b.lo <= a.lo GROUP BY a.lo),
        |q(q_permille) AS (VALUES (250), (500), (750), (900), (990)),
        |t AS (
        |  SELECT CAST(q_permille AS BIGINT) AS q_permille,
        |    CAST((q_permille * n + 999) // 1000 AS BIGINT) AS target_rank
        |  FROM q CROSS JOIN tot),
        |ans AS (
        |  SELECT t.q_permille, t.target_rank, min(c.lo) AS est_lo
        |  FROM t JOIN cum c ON c.cum >= t.target_rank GROUP BY 1, 2),
        |w AS (
        |  SELECT q_permille, target_rank, est_lo,
        |    CASE WHEN est_lo < 4 THEN CAST(1 AS BIGINT)
        |         ELSE CAST(1 AS BIGINT) << (length(bin(est_lo)) - 3)
        |    END AS bucket_width
        |  FROM ans)
        |SELECT q_permille, target_rank, est_lo, bucket_width,
        |  est_lo + bucket_width // 2 AS est_mid
        |FROM w""".stripMargin) { (s, dir) =>
      import s.implicits._
      val v = Tables.lineitem(s, dir).select(
        year(col("l_shipdate")).cast("long").as("yr"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
      val buck = v
        .withColumn("s", expr("cast(greatest(length(bin(v)), 3) - 3 as int)"))
        .select(col("yr"),
          expr("shiftleft(v div shiftleft(1L, s), s)").as("lo"))
      // Per-year shards (what each partition's job persists), merged by
      // per-bucket sum — both aggregations combine map-side; the shuffle
      // carries ~32 rows per year.
      val shards = buck.groupBy("yr", "lo").agg(count(lit(1)).as("cnt"))
      val merged = shards.groupBy("lo").agg(sum(col("cnt")).as("cnt"))
      val tot = merged.agg(sum(col("cnt")).as("n"))
      val cum = merged.select(col("lo").as("lo_b"), col("cnt").as("cnt_b"))
        .join(merged, col("lo_b") <= col("lo"))
        .groupBy("lo").agg(sum(col("cnt_b")).as("cum"))
      val targets = Seq(250L, 500L, 750L, 900L, 990L).toDF("q_permille")
        .crossJoin(broadcast(tot)) // 1-row aggregate: maxRows-bounded
        .select(col("q_permille"),
          expr("(q_permille * n + 999) div 1000").as("target_rank"))
      targets.join(cum, col("cum") >= col("target_rank"))
        .groupBy("q_permille", "target_rank").agg(min(col("lo")).as("est_lo"))
        .withColumn("bucket_width", when(col("est_lo") < 4, 1L)
          .otherwise(expr("shiftleft(1L, cast(length(bin(est_lo)) - 3 as int))")))
        .select(col("q_permille"), col("target_rank"), col("est_lo"),
          col("bucket_width"),
          (col("est_lo") + expr("bucket_width div 2")).as("est_mid"))
    },

    // KMV set DIFFERENCE — completes the q189 algebra: estimated
    // |A\B|, |B\A|, and the symmetric difference from the same two
    // bounded sketches. Membership tests are in-row array ops on the
    // union sketch (element of u in A's sketch but not B's); the same
    // integer-division estimate discipline keeps both engines
    // bit-identical. At 100 TB this is "users who clicked but never
    // purchased that day" from 2×k longs of state, no user set stored.
    QuerySpec(
      "q191_kmv_difference",
      s"""WITH a AS (
         |  SELECT DISTINCT CAST('0x' || substr(md5(
         |      CAST(user_id AS VARCHAR) || '-' ||
         |      CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15) AS BIGINT) AS hv
         |  FROM events WHERE event_type = 'click'),
         |b AS (
         |  SELECT DISTINCT CAST('0x' || substr(md5(
         |      CAST(user_id AS VARCHAR) || '-' ||
         |      CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15) AS BIGINT) AS hv
         |  FROM events WHERE event_type = 'purchase'),
         |ka AS (SELECT hv FROM a ORDER BY hv LIMIT $K),
         |kb AS (SELECT hv FROM b ORDER BY hv LIMIT $K),
         |u AS (SELECT hv FROM (
         |    SELECT hv FROM ka UNION SELECT hv FROM kb)
         |  ORDER BY hv LIMIT $K),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS k_union, max(hv) AS h_k
         |      FROM u),
         |oa AS (SELECT CAST(count(*) AS BIGINT) AS n_only_a
         |       FROM u JOIN ka USING (hv)
         |       WHERE hv NOT IN (SELECT hv FROM kb)),
         |ob AS (SELECT CAST(count(*) AS BIGINT) AS n_only_b
         |       FROM u JOIN kb USING (hv)
         |       WHERE hv NOT IN (SELECT hv FROM ka)),
         |e AS (SELECT s.k_union, oa.n_only_a, ob.n_only_b,
         |    CASE WHEN s.k_union < $K THEN s.k_union
         |         ELSE CAST(floor(CAST(s.k_union - 1 AS DOUBLE) * ${M}e0
         |           / CAST(s.h_k AS DOUBLE)) AS BIGINT) END AS est_union
         |  FROM s CROSS JOIN oa CROSS JOIN ob)
         |SELECT k_union, n_only_a, n_only_b, est_union,
         |  (est_union * n_only_a) // k_union AS est_only_a,
         |  (est_union * n_only_b) // k_union AS est_only_b,
         |  (est_union * n_only_a) // k_union
         |    + (est_union * n_only_b) // k_union AS est_symdiff
         |FROM e""".stripMargin) { (s, dir) =>
      val kmv = udaf(new KMinValues(K), Encoders.scalaLong)
      val ev = Tables.events(s, dir)
      def sketch(t: String, as: String): DataFrame =
        ev.where(col("event_type") === t)
          .select(hash60(concat(col("user_id").cast("string"), lit("-"),
            to_date(col("ts")).cast("string"))).as("hv"))
          .agg(kmv(col("hv")).as(as)) // 1 row: maxRows-bounded attach
      sketch("click", "sa").crossJoin(sketch("purchase", "sb"))
        .withColumn("u", slice(array_sort(array_union(col("sa"), col("sb"))),
          1, K))
        .select(size(col("u")).cast("long").as("k_union"),
          size(array_except(array_intersect(col("u"), col("sa")), col("sb")))
            .cast("long").as("n_only_a"),
          size(array_except(array_intersect(col("u"), col("sb")), col("sa")))
            .cast("long").as("n_only_b"),
          kmvEstimate(col("u")).as("est_union"))
        .select(col("k_union"), col("n_only_a"), col("n_only_b"),
          col("est_union"),
          expr("(est_union * n_only_a) div k_union").as("est_only_a"),
          expr("(est_union * n_only_b) div k_union").as("est_only_b"),
          (expr("(est_union * n_only_a) div k_union") +
            expr("(est_union * n_only_b) div k_union")).as("est_symdiff"))
    },

    // Streaming KMV: q188's bounded distinct sketch maintained over the
    // event STREAM — the aggregation buffer is the sorted ≤k array, so
    // complete-mode state is ONE row of ≤k longs no matter how many
    // events flow (the streaming-cardinality pattern st19 establishes
    // for HLL registers, here with the sketch that also supports set
    // algebra). The streamed sketch equals the batch sketch
    // value-for-value, so q188's relational oracle applies verbatim;
    // rank/estimate are derived from the finished table batch-side (a
    // generator after a streaming aggregation is not a supported
    // streaming plan, and the sketch — not its presentation — is the
    // stateful part).
    QuerySpec(
      "st20_stream_kmv",
      s"""WITH h AS (
         |  SELECT DISTINCT CAST('0x' ||
         |    substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
         |  FROM events),
         |k AS (SELECT hv FROM h ORDER BY hv LIMIT $K),
         |r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rank FROM k),
         |s AS (SELECT max(hv) AS h_k, CAST(count(*) AS BIGINT) AS n_k FROM k)
         |SELECT CAST(r.rank AS BIGINT) AS rank, r.hv,
         |  CASE WHEN s.n_k < $K THEN s.n_k
         |       ELSE CAST(floor(CAST(s.n_k - 1 AS DOUBLE) * ${M}e0
         |         / CAST(s.h_k AS DOUBLE)) AS BIGINT) END AS est_distinct
         |FROM r CROSS JOIN s""".stripMargin) { (s, dir) =>
      val kmv = udaf(new KMinValues(K), Encoders.scalaLong)
      val sk = graft.streaming.Streams.eventsStream(s, dir)
        .select(hash60(col("user_id").cast("string")).as("hv"))
        .agg(kmv(col("hv")).as("sk"))
      graft.streaming.Streams.runToTable(sk, "st20_mem", "complete")
        .select(col("sk"), posexplode(col("sk")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col").as("hv"), kmvEstimate(col("sk")).as("est_distinct"))
    },

    // GROUPED KMV — the per-dimension production shape ("distinct users
    // per day"): one bounded sketch per group key, built in a single
    // map-side-combining aggregation (each map task holds one ≤k array
    // per day it sees; the shuffle carries those partials, never user
    // rows). Harness SFs exercise both estimator branches per group.
    // The relational oracle replays each day's sketch as a partitioned
    // rank (the semantic spec; the Aggregator is the scalable plan).
    QuerySpec(
      "q192_kmv_daily",
      s"""WITH h AS (
         |  SELECT DISTINCT CAST(ts AS DATE) AS day,
         |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
         |      AS BIGINT) AS hv
         |  FROM events),
         |k AS (SELECT day, hv,
         |    row_number() OVER (PARTITION BY day ORDER BY hv) AS rn FROM h),
         |s AS (SELECT day, max(hv) AS h_k, CAST(count(*) AS BIGINT) AS n_k
         |      FROM k WHERE rn <= $K GROUP BY day)
         |SELECT day, n_k,
         |  CASE WHEN n_k < $K THEN n_k
         |       ELSE CAST(floor(CAST(n_k - 1 AS DOUBLE) * ${M}e0
         |         / CAST(h_k AS DOUBLE)) AS BIGINT) END AS est_users
         |FROM s""".stripMargin) { (s, dir) =>
      val kmv = udaf(new KMinValues(K), Encoders.scalaLong)
      Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"),
          hash60(col("user_id").cast("string")).as("hv"))
        .groupBy("day")
        .agg(kmv(col("hv")).as("sk"))
        .select(col("day"), size(col("sk")).cast("long").as("n_k"),
          kmvEstimate(col("sk")).as("est_users"))
    },

    // Privacy-delete RETRACTION — the right-to-be-forgotten pattern at
    // aggregate scale: instead of rescanning the corpus after a delete
    // request, subtract the deleted users' CONTRIBUTIONS (a delta
    // aggregate over only their rows) from the standing daily rollup.
    // The spec is self-checking: it emits both the delta-corrected
    // aggregate and a `recompute_match` flag proving it equals the
    // ground-truth recompute without the deleted users — on both
    // engines, so the retraction algebra itself is oracled. Sums are
    // exact integer cents; the delete set (user_id % 97 = 0) is the
    // planted request.
    QuerySpec(
      "q196_retraction_delta",
      """WITH base AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sum_c
        |  FROM events GROUP BY 1),
        |delta AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_del,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sum_del_c
        |  FROM events WHERE user_id % 97 = 0 GROUP BY 1),
        |truth AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sum_c
        |  FROM events WHERE user_id % 97 <> 0 GROUP BY 1)
        |SELECT b.day, b.n AS n_before, coalesce(d.n_del, 0) AS n_deleted,
        |  b.n - coalesce(d.n_del, 0) AS n_after,
        |  b.sum_c - coalesce(d.sum_del_c, 0) AS sum_after_c,
        |  CAST(CASE WHEN b.n - coalesce(d.n_del, 0) = t.n
        |    AND b.sum_c - coalesce(d.sum_del_c, 0) = t.sum_c
        |    THEN 1 ELSE 0 END AS BIGINT) AS recompute_match
        |FROM base b
        |LEFT JOIN delta d ON b.day = d.day
        |JOIN truth t ON b.day = t.day""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).select(to_date(col("ts")).as("day"),
        col("user_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("v"))
      def roll(df: DataFrame, n: String, sc: String) = df.groupBy("day")
        .agg(count(lit(1)).as(n), sum(col("v")).as(sc))
      val base = roll(ev, "n", "sum_c")
      val delta = roll(ev.where(pmod(col("user_id"), lit(97)) === 0),
        "n_del", "sum_del_c")
      val truth = roll(ev.where(pmod(col("user_id"), lit(97)) =!= 0),
        "n_t", "sum_t_c")
      base.join(delta, Seq("day"), "left").join(truth, "day")
        .select(col("day"), col("n").as("n_before"),
          coalesce(col("n_del"), lit(0L)).as("n_deleted"),
          (col("n") - coalesce(col("n_del"), lit(0L))).as("n_after"),
          (col("sum_c") - coalesce(col("sum_del_c"), lit(0L)))
            .as("sum_after_c"),
          when((col("n") - coalesce(col("n_del"), lit(0L))) === col("n_t") &&
            (col("sum_c") - coalesce(col("sum_del_c"), lit(0L)))
              === col("sum_t_c"), 1L).otherwise(0L).as("recompute_match"))
    },

    // Streaming DDSketch histogram — completes the streaming sketch trio
    // (st19 HLL registers, st20 KMV, here the quantile summary): event
    // values log-bucket into q190's integer grid, so complete-mode state
    // is the bounded bucket histogram (~60 rows for this value range)
    // no matter how many events flow, and any quantile is answerable
    // from it at read time. The streamed histogram equals the batch
    // bucketing count-for-count — the oracle is the batch replay of the
    // same pure-integer bucket math.
    QuerySpec(
      "st21_stream_dds",
      """WITH v AS (
        |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
        |buck AS (
        |  SELECT ((v // (CAST(1 AS BIGINT) << s)) << s) AS lo FROM (
        |    SELECT v, greatest(length(bin(v)), 3) - 3 AS s FROM v))
        |SELECT lo, CAST(count(*) AS BIGINT) AS cnt
        |FROM buck GROUP BY lo""".stripMargin) { (s, dir) =>
      val hist = graft.streaming.Streams.eventsStream(s, dir)
        .select(floor(col("value") * 100 + 0.5).cast("long").as("v"))
        .withColumn("s", expr("cast(greatest(length(bin(v)), 3) - 3 as int)"))
        .select(expr("shiftleft(v div shiftleft(1L, s), s)").as("lo"))
        .groupBy("lo")
        .agg(count(lit(1)).as("cnt"))
      graft.streaming.Streams.runToTable(hist, "st21_mem", "complete")
    },

    // Activity BITMAPS — the bitmap-index rollup OLAP engines use for
    // cohort/retention math: each user's month compresses to ONE 64-bit
    // word (bit d = active on day d, days indexed from the corpus min —
    // no calendar literal to go stale), built by a single bit_or
    // aggregation; every downstream metric is then word-local bit math,
    // no re-scan: active days (bit_count), day-7 retention pairs
    // (bm & bm>>7), longest streak (the x &= x<<1 erosion fold — each
    // pass erodes runs by one; the iteration count to zero IS the run
    // length). At 100 TB the shuffle carries one long per (user,
    // partition) and month-over-month rollups are bit_or merges of the
    // stored words — the mergeable-sketch contract with EXACT semantics
    // on a bounded time grid. All-integer → full oracle.
    QuerySpec(
      "q202_activity_bitmaps",
      """WITH b AS (
        |  SELECT CAST(min(ts) AS DATE) AS d0,
        |    date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) + 1
        |      AS span
        |  FROM events),
        |d AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', (SELECT d0 FROM b),
        |      CAST(ts AS DATE)) AS BIGINT) AS day
        |  FROM events),
        |bm AS (
        |  SELECT user_id, bit_or(CAST(1 AS BIGINT) << day::INT) AS bm
        |  FROM d GROUP BY 1)
        |SELECT user_id, bm,
        |  CAST(bit_count(bm) AS BIGINT) AS n_active_days,
        |  CAST(bit_count(bm & (bm >> 7)) AS BIGINT) AS retained_7_pairs,
        |  list_reduce(
        |    list_prepend([bm, 0::BIGINT],
        |      list_transform(range(1, (SELECT span FROM b) + 1),
        |        i -> [0::BIGINT, 0::BIGINT])),
        |    (acc, x) -> CASE WHEN acc[1] <> 0
        |      THEN [acc[1] & (acc[1] << 1), acc[2] + 1] ELSE acc END)[2]
        |    AS longest_streak
        |FROM bm""".stripMargin) { (s, dir) =>
      // Erosion iteration count = the corpus day span (derived, not a
      // literal): a streak can never exceed the covered days.
      val bm = guardedDays(Tables.events(s, dir))
        .groupBy("user_id")
        .agg(bit_or(call_function("shiftleft", lit(1L), col("day"))).as("bm"),
          max(col("span")).as("span"))
      bm.select(col("user_id"), col("bm"),
        bit_count(col("bm")).cast("long").as("n_active_days"),
        bit_count(col("bm").bitwiseAND(call_function("shiftright",
          col("bm"), lit(7)))).cast("long").as("retained_7_pairs"),
        aggregate(sequence(lit(1L), col("span")),
          struct(col("bm").as("s"), lit(0L).as("len")),
          (acc, _) => when(acc.getField("s") =!= 0L,
            struct(acc.getField("s")
              .bitwiseAND(shiftleft(acc.getField("s"), 1)).as("s"),
              (acc.getField("len") + 1).as("len"))).otherwise(acc),
          acc => acc.getField("len")).as("longest_streak"))
    },

    // Serving analytics FROM the bitmap store: the daily-active-users
    // curve derived from q202's per-user words — 30 bit probes per user
    // row — instead of rescanning the event log. This is the payoff of
    // the bitmap rollup: the fact table is visited once (to build bm);
    // every cohort/DAU/retention question afterwards reads |users| words.
    // The probe explodes a bounded 30-day grid per user (rows = 30·|users|,
    // tiny next to the event log) into one aggregation.
    QuerySpec(
      "q205_dau_from_bitmaps",
      """WITH b AS (
        |  SELECT CAST(min(ts) AS DATE) AS d0,
        |    date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) + 1
        |      AS span
        |  FROM events),
        |d AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', (SELECT d0 FROM b),
        |      CAST(ts AS DATE)) AS BIGINT) AS day
        |  FROM events),
        |bm AS (
        |  SELECT user_id, bit_or(CAST(1 AS BIGINT) << day::INT) AS bm
        |  FROM d GROUP BY 1),
        |probe AS (
        |  SELECT unnest(range(0, (SELECT span FROM b))) AS day, bm FROM bm)
        |SELECT day, CAST(sum((bm >> day::INT) & 1) AS BIGINT) AS dau
        |FROM probe GROUP BY 1 HAVING sum((bm >> day::INT) & 1) > 0""".stripMargin) {
      (s, dir) =>
      // Probe window = the corpus day span (derived with the bitmap, no
      // duplicated literal).
      val bm = guardedDays(Tables.events(s, dir))
        .groupBy("user_id")
        .agg(bit_or(call_function("shiftleft", lit(1L), col("day"))).as("bm"),
          max(col("span")).as("span"))
      bm.select(explode(sequence(lit(0L), col("span") - 1)).as("day"), col("bm"))
        .groupBy("day")
        .agg(sum(call_function("shiftright", col("bm"), col("day").cast("int"))
          .bitwiseAND(lit(1L))).as("dau"))
        .where(col("dau") > 0)
    },

    // Streaming bitmap maintenance — q202's word store lifted onto the
    // event stream (the st17/st19/st20/st21 pattern: an associative,
    // commutative sketch in complete mode): each micro-batch bit_ors its
    // days into the per-user word, so streaming state IS the bitmap
    // table (one long per user) and the streamed words equal the batch
    // words bit-for-bit — which is what the batch oracle asserts. The
    // day origin is pinned to the BATCH min(ts) (a 1-row broadcast the
    // stream reads per batch) so stream and batch index days identically.
    QuerySpec(
      "st23_stream_bitmaps",
      """WITH d0 AS (SELECT min(ts) AS t0 FROM events),
        |d AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', (SELECT CAST(t0 AS DATE) FROM d0),
        |      CAST(ts AS DATE)) AS BIGINT) AS day
        |  FROM events)
        |SELECT user_id, bit_or(CAST(1 AS BIGINT) << day::INT) AS bm,
        |  CAST(bit_count(bit_or(CAST(1 AS BIGINT) << day::INT)) AS BIGINT)
        |    AS n_active_days
        |FROM d GROUP BY 1""".stripMargin) { (s, dir) =>
      val bounds = dayBounds(Tables.events(s, dir))
      val stream = graft.streaming.Streams.eventsStream(s, dir)
        .select(col("user_id"), col("ts"))
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          guardDay(datediff(col("ts").cast("date"), col("d0")).cast("int"))
            .as("day"))
        .groupBy("user_id")
        .agg(bit_or(call_function("shiftleft", lit(1L), col("day"))).as("bm"))
        .select(col("user_id"), col("bm"),
          bit_count(col("bm")).cast("long").as("n_active_days"))
      graft.streaming.Streams.runToTable(stream, "st23_mem", "complete")
    }
  )
}
