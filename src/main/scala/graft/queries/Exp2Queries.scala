package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 expansion surface: classical-statistics and sketch operators a
  * production warehouse runs that earlier surfaces didn't cover —
  * autocorrelation (seasonality detection), Kaplan–Meier survival (churn
  * curves), count-min sketches and Bloom filters (the two workhorse
  * streaming/summary sketches, built engine-portably so DuckDB replays
  * them cell-for-cell).
  *
  * Reference tie-in: the reference's analytics stop at three aggregate
  * queries over the comment graph
  * (`/root/reference/sql/blog_post_queries.sql:1-38`); these specs are
  * the next layer a production deployment of that pipeline would ask for
  * (retention of commenters, posting seasonality, approximate heavy
  * hitters over unbounded comment streams).
  *
  * Determinism contract (same as ExpQueries): every double that feeds a
  * hashed output is either (a) derived from exact integer sums, or (b)
  * produced by an ordered fold both engines replay in the same order —
  * never a float aggregation whose partial-merge order Spark controls.
  */
object Exp2Queries {

  def specs: Seq[QuerySpec] = Seq(

    // Autocorrelation function of the daily-revenue series at lags 1–7
    // (the seasonality probe run before picking a forecast model). The
    // series aggregates to one row per day — BOUNDED (a few thousand
    // values at any corpus size), so collecting it into one ordered
    // array and folding is the right distributed shape: the heavy
    // groupBy(day) is map-side combinable, and the O(n·lags) fold runs
    // on a single executor row. Per-term products fix-point to micros
    // BEFORE the sum, so the numerator/denominator are exact integers
    // (order-free); day revenue is summed in integer cents (exact).
    QuerySpec(
      "q141_acf",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |), ser AS (
        |  SELECT list(cents ORDER BY d) AS xs, count(*)::BIGINT AS n,
        |    CAST(sum(cents) AS BIGINT) AS tot
        |  FROM daily
        |), lags AS (SELECT unnest(range(1, 8)) AS lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
        |  CAST(floor(
        |    CAST(list_sum(list_transform(range(1, (n - lag + 1)::INT), i ->
        |      CAST(floor(((xs[i] / 100000.0 - tot / 100000.0 / n)
        |        * (xs[i + lag] / 100000.0 - tot / 100000.0 / n)) * 1000000.0)
        |        AS BIGINT))) AS DOUBLE)
        |    / list_sum(list_transform(range(1, (n + 1)::INT), i ->
        |      CAST(floor(((xs[i] / 100000.0 - tot / 100000.0 / n)
        |        * (xs[i] / 100000.0 - tot / 100000.0 / n)) * 1000000.0)
        |        AS BIGINT)))
        |    * 1000000.0) AS BIGINT) AS acf_micro
        |FROM ser, lags""".stripMargin) { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val ser = daily.agg(
        transform(sort_array(collect_list(struct(col("d"), col("cents")))),
          e => e.getField("cents")).as("xs"),
        count(lit(1)).as("n"), sum(col("cents")).as("tot"))
      // mu re-derives from the exact integer (tot, n) pair on both sides —
      // identical doubles by IEEE division.
      def mu = col("tot") / 100000.0 / col("n")
      def x(i: org.apache.spark.sql.Column) =
        element_at(col("xs"), i.cast("int")) / 100000.0
      def sq(lagTerm: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
             upTo: org.apache.spark.sql.Column) =
        aggregate(sequence(lit(1), upTo.cast("int")), lit(0L),
          (acc, i) => acc + floor(((x(i) - mu) * (lagTerm(i) - mu)) * 1000000.0)
            .cast("long"))
      val lags = s.range(1, 8).select(col("id").cast("int").as("lag"))
      ser.crossJoin(lags)
        .select(col("lag").cast("long").as("lag"), col("n").as("n_days"),
          floor(sq(i => x(i + col("lag")), col("n") - col("lag")).cast("double")
            / sq(i => x(i), col("n")) * 1000000.0).cast("long").as("acf_micro"))
    },

    // Kaplan–Meier survival estimator over customer "lifetimes" (days
    // between first and last order; churned = last order >180 days
    // before the corpus end, else right-censored). The survival curve
    // S(t) = Π_{u≤t}(1 − d_u/n_u) over event times — the standard churn
    // readout. The life table (distinct lifetime → deaths/censored) is
    // BOUNDED by the day range, so the per-position running products
    // fold over one ordered array; each factor divides exact integers,
    // and both engines left-fold the identical factor list. At 100 TB
    // the per-customer min/max is the only fact-table pass (map-side
    // combinable); everything after runs on a few-thousand-row table.
    QuerySpec(
      "q142_kaplan_meier",
      """WITH maxd AS (SELECT max(CAST(o_orderdate AS DATE)) AS m FROM orders),
        |life AS (
        |  SELECT o_custkey,
        |    date_diff('day', min(CAST(o_orderdate AS DATE)),
        |      max(CAST(o_orderdate AS DATE)))::BIGINT AS t,
        |    CASE WHEN max(CAST(o_orderdate AS DATE)) < max(m) - 180
        |      THEN 1 ELSE 0 END AS ev
        |  FROM orders CROSS JOIN maxd GROUP BY 1
        |), lt AS (
        |  SELECT t, CAST(sum(ev) AS BIGINT) AS d, count(*)::BIGINT AS c
        |  FROM life GROUP BY 1
        |), ser AS (
        |  SELECT list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
        |    list(c ORDER BY t) AS cs, count(*)::INT AS k,
        |    CAST(sum(c) AS BIGINT) AS total
        |  FROM lt
        |), pos AS (
        |  SELECT ts, ds, cs, total, unnest(range(1, k + 1)) AS i FROM ser
        |)
        |SELECT ts[i] AS t, ds[i] AS d_events,
        |  total - CAST(coalesce(list_sum(list_slice(cs, 1, (i - 1)::INT)), 0)
        |    AS BIGINT) AS n_at_risk,
        |  CAST(floor(list_reduce(list_prepend(1.0::DOUBLE,
        |    list_transform(range(1, i + 1), j ->
        |      CASE WHEN ds[j] = 0 THEN 1.0::DOUBLE
        |        ELSE 1.0 - CAST(ds[j] AS DOUBLE) /
        |          (total - CAST(coalesce(list_sum(list_slice(cs, 1, (j - 1)::INT)),
        |            0) AS BIGINT)) END)),
        |    (acc, f) -> acc * f) * 1000000.0) AS BIGINT) AS surv_micro
        |FROM pos WHERE ds[i] > 0""".stripMargin) { (s, dir) =>
      val day = to_date(col("o_orderdate"))
      val maxd = Tables.orders(s, dir).agg(max(day).as("m"))
      val life = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(datediff(max(day), min(day)).cast("long").as("t"),
          max(day).as("last"))
        .crossJoin(broadcast(maxd))
        .select(col("t"),
          when(col("last") < date_sub(col("m"), 180), 1L).otherwise(0L).as("ev"))
      val lt = life.groupBy("t")
        .agg(sum(col("ev")).as("d"), count(lit(1)).as("c"))
      val ser = lt.agg(
        transform(sort_array(collect_list(struct(col("t"), col("d"), col("c")))),
          e => e.getField("t")).as("ts"),
        transform(sort_array(collect_list(struct(col("t"), col("d"), col("c")))),
          e => e.getField("d")).as("ds"),
        transform(sort_array(collect_list(struct(col("t"), col("d"), col("c")))),
          e => e.getField("c")).as("cs"),
        count(lit(1)).cast("int").as("k"), sum(col("c")).as("total"))
      def atRisk(i: org.apache.spark.sql.Column) =
        col("total") - coalesce(
          aggregate(slice(col("cs"), lit(1), (i - 1).cast("int")), lit(0L),
            (acc, x) => acc + x), lit(0L))
      val pos = ser
        .select(col("ts"), col("ds"), col("cs"), col("total"),
          explode(sequence(lit(1), col("k"))).as("i"))
        .select(
          element_at(col("ts"), col("i")).as("t"),
          element_at(col("ds"), col("i")).as("d_events"),
          atRisk(col("i")).as("n_at_risk"),
          floor(aggregate(sequence(lit(1), col("i")), lit(1.0),
            (acc, j) => acc * when(element_at(col("ds"), j) === 0L, lit(1.0))
              .otherwise(lit(1.0) -
                element_at(col("ds"), j).cast("double") / atRisk(j)))
            * 1000000.0).cast("long").as("surv_micro"))
      pos.where(col("d_events") > 0)
    },

    // Count-min sketch over lineitem part keys: d=4 rows × w=256
    // buckets, every hash md5-derived so DuckDB rebuilds the identical
    // cell matrix. The build is the sketch's whole point at scale: a
    // 4-way explode + groupBy over a FIXED 1024-cell key space — partial
    // aggregation collapses each executor's contribution to ≤1024 rows,
    // so the shuffle is constant-size regardless of corpus size (vs the
    // unbounded distinct-key shuffle of an exact count). Probes (the 25
    // smallest part keys) read the broadcast cell table; est ≥ true by
    // construction, and the overestimate column shows the collision
    // inflation at w=256 ≪ 2000 distinct keys.
    QuerySpec(
      "q143_count_min_sketch",
      """WITH cells AS (
        |  SELECT hs.i AS ci, CAST('0x' || substr(md5(hs.i || ':' || l_partkey), 1, 8)
        |      AS BIGINT) % 256 AS b, count(*)::BIGINT AS cnt
        |  FROM lineitem CROSS JOIN (SELECT unnest(range(0, 4)) AS i) hs
        |  GROUP BY 1, 2
        |), probes AS (
        |  SELECT p_partkey FROM part WHERE p_partkey <= 25
        |), truth AS (
        |  SELECT l_partkey, count(*)::BIGINT AS true_cnt FROM lineitem GROUP BY 1
        |), est AS (
        |  SELECT p_partkey,
        |    min(coalesce(cnt, 0))::BIGINT AS est_cnt
        |  FROM probes CROSS JOIN (SELECT unnest(range(0, 4)) AS i) hs
        |  LEFT JOIN cells ON ci = hs.i
        |    AND b = CAST('0x' || substr(md5(hs.i || ':' || p_partkey), 1, 8)
        |      AS BIGINT) % 256
        |  GROUP BY 1
        |)
        |SELECT p_partkey, coalesce(true_cnt, 0) AS true_cnt, est_cnt,
        |  est_cnt - coalesce(true_cnt, 0) AS over_cnt
        |FROM est LEFT JOIN truth ON l_partkey = p_partkey""".stripMargin) { (s, dir) =>
      def h(i: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(i.cast("string"), lit(":"),
          key.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long") % 256
      val rows = explode(sequence(lit(0), lit(3))).as("i")
      val cells = Tables.lineitem(s, dir).select(col("l_partkey"), rows)
        .groupBy(col("i").as("ci"), h(col("i"), col("l_partkey")).as("b"))
        .agg(count(lit(1)).as("cnt"))
      val probes = Tables.part(s, dir)
        .where(col("p_partkey") <= 25).select("p_partkey")
      val truth = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("true_cnt"))
      val est = probes.select(col("p_partkey"), rows)
        .join(broadcast(cells),
          col("ci") === col("i") && col("b") === h(col("i"), col("p_partkey")),
          "left")
        .groupBy("p_partkey")
        .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
      est.join(truth, col("l_partkey") === col("p_partkey"), "left")
        .select(col("p_partkey"), coalesce(col("true_cnt"), lit(0L)).as("true_cnt"),
          col("est_cnt"),
          (col("est_cnt") - coalesce(col("true_cnt"), lit(0L))).as("over_cnt"))
    },

    // Bloom-filter join pre-filter: 4096-bit / 4-hash filter built over
    // BUILDING-segment customer keys, probed by every distinct orders
    // customer — the runtime-filter pattern (Spark's own
    // spark.sql.optimizer.runtimeFilter does exactly this shape) made
    // explicit and engine-portable. The filter materializes as 66
    // (word → bits) rows via bit_or aggregation (63-bit words — DuckDB
    // range-checks `1 << 63`, so bit 63 is never used) — constant-size
    // state,
    // broadcast to the probe side, so the expensive join's input shrinks
    // by the filter's selectivity while shuffling nothing. Output is the
    // accounting row a pre-filter earns its keep with: probe count,
    // true members, sketch positives, false positives, FP basis points.
    QuerySpec(
      "q144_bloom_filter",
      """WITH members AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |), pts AS (
        |  SELECT CAST('0x' || substr(md5(hs.i || ':' || c_custkey), 1, 8) AS BIGINT)
        |      % 4096 AS p
        |  FROM members CROSS JOIN (SELECT unnest(range(0, 4)) AS i) hs
        |), bits AS (
        |  SELECT p // 63 AS word, bit_or(1::BIGINT << (p % 63)::INT) AS mask
        |  FROM pts GROUP BY 1
        |), probes AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |), ppts AS (
        |  SELECT o_custkey,
        |    CAST('0x' || substr(md5(hs.i || ':' || o_custkey), 1, 8) AS BIGINT)
        |      % 4096 AS p
        |  FROM probes CROSS JOIN (SELECT unnest(range(0, 4)) AS i) hs
        |), checked AS (
        |  SELECT o_custkey,
        |    min(CASE WHEN (coalesce(mask, 0) & (1::BIGINT << (p % 63)::INT)) <> 0
        |      THEN 1 ELSE 0 END) AS hit
        |  FROM ppts LEFT JOIN bits ON word = p // 63
        |  GROUP BY 1
        |), labeled AS (
        |  SELECT o_custkey, hit,
        |    CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_member
        |  FROM checked LEFT JOIN members ON c_custkey = o_custkey
        |)
        |SELECT count(*)::BIGINT AS n_probe,
        |  CAST(sum(is_member) AS BIGINT) AS n_member,
        |  CAST(sum(hit) AS BIGINT) AS n_positive,
        |  CAST(sum(CASE WHEN hit = 1 AND is_member = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_false_pos,
        |  CAST(floor(10000.0 * sum(CASE WHEN hit = 1 AND is_member = 0
        |      THEN 1 ELSE 0 END) / greatest(count(*) - sum(is_member), 1))
        |    AS BIGINT) AS fp_bp
        |FROM labeled""".stripMargin) { (s, dir) =>
      def pos(i: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(i.cast("string"), lit(":"),
          key.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long") % 4096
      val rows = explode(sequence(lit(0), lit(3))).as("i")
      val members = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val bits = members.select(col("c_custkey"), rows)
        .select(pos(col("i"), col("c_custkey")).as("p"))
        .select(floor(col("p") / 63).cast("long").as("word"),
          call_function("shiftleft", lit(1L), (col("p") % 63).cast("int")).as("m"))
        .groupBy("word").agg(bit_or(col("m")).as("mask"))
      val probes = Tables.orders(s, dir).select("o_custkey").distinct()
      val checked = probes.select(col("o_custkey"), rows)
        .select(col("o_custkey"), pos(col("i"), col("o_custkey")).as("p"))
        .join(broadcast(bits),
          col("word") === floor(col("p") / 63).cast("long"), "left")
        .select(col("o_custkey"),
          when(coalesce(col("mask"), lit(0L))
            .bitwiseAND(call_function("shiftleft", lit(1L),
              (col("p") % 63).cast("int"))) =!= 0L, 1L).otherwise(0L).as("h"))
        .groupBy("o_custkey").agg(min(col("h")).as("hit"))
      val labeled = checked
        .join(members.withColumnRenamed("c_custkey", "mk"),
          col("mk") === col("o_custkey"), "left")
        .select(col("hit"),
          when(col("mk").isNotNull, 1L).otherwise(0L).as("is_member"))
      labeled.agg(
        count(lit(1)).as("n_probe"),
        sum(col("is_member")).as("n_member"),
        sum(col("hit")).as("n_positive"),
        sum(when(col("hit") === 1L && col("is_member") === 0L, 1L).otherwise(0L))
          .as("n_false_pos"),
        floor(lit(10000.0)
          * sum(when(col("hit") === 1L && col("is_member") === 0L, 1L)
            .otherwise(0L))
          / greatest(count(lit(1)) - sum(col("is_member")), lit(1L)))
          .cast("long").as("fp_bp"))
    },

    // Multivariate OLS by normal equations: price ~ quantity + discount,
    // solved in closed form via Cramer's rule over NINE exact integer
    // sums (features fix-pointed to units/basis-points/cents first, so
    // every Σ is a BIGINT no matter the aggregation order). The fit plus
    // an R² residual pass is two scans total — the distributed-regression
    // shape that needs no iteration (vs q140's GD): at 100 TB both
    // passes are map-side-combinable aggregations, and the 3×3 solve is
    // constant work on the driver-sized row. Residuals fix-point to
    // micros in k$ units so SSE/SST stay inside BIGINT at any SF.
    QuerySpec(
      "q145_ols_normal_equations",
      """WITH f AS (
        |  SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
        |    CAST(floor(l_discount * 100) AS BIGINT) AS d,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS p
        |  FROM lineitem
        |), s AS (
        |  SELECT count(*)::BIGINT AS n, CAST(sum(q) AS BIGINT) AS sq,
        |    CAST(sum(d) AS BIGINT) AS sd, CAST(sum(p) AS BIGINT) AS sp,
        |    CAST(sum(q * q) AS BIGINT) AS sqq, CAST(sum(q * d) AS BIGINT) AS sqd,
        |    CAST(sum(d * d) AS BIGINT) AS sdd, CAST(sum(q * p) AS BIGINT) AS sqp,
        |    CAST(sum(d * p) AS BIGINT) AS sdp
        |  FROM f
        |), c AS (
        |  SELECT n,
        |    ((CAST(sqq AS DOUBLE) * sdd - CAST(sqd AS DOUBLE) * sqd) * sp
        |      - (CAST(sq AS DOUBLE) * sdd - CAST(sqd AS DOUBLE) * sd) * sqp
        |      + (CAST(sq AS DOUBLE) * sqd - CAST(sqq AS DOUBLE) * sd) * sdp)
        |    / (CAST(n AS DOUBLE) * (CAST(sqq AS DOUBLE) * sdd
        |        - CAST(sqd AS DOUBLE) * sqd)
        |      - CAST(sq AS DOUBLE) * (CAST(sq AS DOUBLE) * sdd
        |        - CAST(sqd AS DOUBLE) * sd)
        |      + CAST(sd AS DOUBLE) * (CAST(sq AS DOUBLE) * sqd
        |        - CAST(sqq AS DOUBLE) * sd)) AS b0,
        |    ((CAST(sq AS DOUBLE) * sdp - CAST(sd AS DOUBLE) * sqp) * sd
        |      - (CAST(n AS DOUBLE) * sdp - CAST(sd AS DOUBLE) * sp) * sqd
        |      + (CAST(n AS DOUBLE) * sqp - CAST(sq AS DOUBLE) * sp) * sdd)
        |    / (CAST(n AS DOUBLE) * (CAST(sqq AS DOUBLE) * sdd
        |        - CAST(sqd AS DOUBLE) * sqd)
        |      - CAST(sq AS DOUBLE) * (CAST(sq AS DOUBLE) * sdd
        |        - CAST(sqd AS DOUBLE) * sd)
        |      + CAST(sd AS DOUBLE) * (CAST(sq AS DOUBLE) * sqd
        |        - CAST(sqq AS DOUBLE) * sd)) AS b1,
        |    ((CAST(n AS DOUBLE) * (CAST(sqq AS DOUBLE) * sdp
        |        - CAST(sqd AS DOUBLE) * sqp)
        |      - CAST(sq AS DOUBLE) * (CAST(sq AS DOUBLE) * sdp
        |        - CAST(sd AS DOUBLE) * sqp)
        |      + CAST(sp AS DOUBLE) * (CAST(sq AS DOUBLE) * sqd
        |        - CAST(sqq AS DOUBLE) * sd)))
        |    / (CAST(n AS DOUBLE) * (CAST(sqq AS DOUBLE) * sdd
        |        - CAST(sqd AS DOUBLE) * sqd)
        |      - CAST(sq AS DOUBLE) * (CAST(sq AS DOUBLE) * sdd
        |        - CAST(sqd AS DOUBLE) * sd)
        |      + CAST(sd AS DOUBLE) * (CAST(sq AS DOUBLE) * sqd
        |        - CAST(sqq AS DOUBLE) * sd)) AS b2,
        |    CAST(sp AS DOUBLE) / n AS pbar
        |  FROM s
        |), r AS (
        |  SELECT max(n) AS n, max(b0) AS b0, max(b1) AS b1, max(b2) AS b2,
        |    CAST(sum(CAST(floor(
        |      ((p - (b0 + b1 * q + b2 * d)) / 100000.0)
        |      * ((p - (b0 + b1 * q + b2 * d)) / 100000.0) * 1000000.0)
        |      AS BIGINT)) AS BIGINT) AS sse,
        |    CAST(sum(CAST(floor(
        |      ((p - pbar) / 100000.0) * ((p - pbar) / 100000.0) * 1000000.0)
        |      AS BIGINT)) AS BIGINT) AS sst
        |  FROM f CROSS JOIN c
        |)
        |SELECT n, CAST(floor(b0 * 1000000) AS BIGINT) AS b0_micro,
        |  CAST(floor(b1 * 1000000) AS BIGINT) AS b1_micro,
        |  CAST(floor(b2 * 1000000) AS BIGINT) AS b2_micro,
        |  CAST(floor((1.0 - CAST(sse AS DOUBLE) / sst) * 1000000) AS BIGINT)
        |    AS r2_micro
        |FROM r""".stripMargin) { (s, dir) =>
      val f = Tables.lineitem(s, dir).select(
        floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_discount") * 100).cast("long").as("d"),
        floor(col("l_extendedprice") * 100).cast("long").as("p"))
      val sums = f.agg(
        count(lit(1)).as("n"), sum(col("q")).as("sq"), sum(col("d")).as("sd"),
        sum(col("p")).as("sp"), sum(col("q") * col("q")).as("sqq"),
        sum(col("q") * col("d")).as("sqd"), sum(col("d") * col("d")).as("sdd"),
        sum(col("q") * col("p")).as("sqp"), sum(col("d") * col("p")).as("sdp"))
      // Mirror the oracle's expression tree exactly: every product casts
      // its first factor to double, det is shared syntactically.
      def D(c: String) = col(c).cast("double")
      val det = D("n") * (D("sqq") * col("sdd") - D("sqd") * col("sqd")) -
        D("sq") * (D("sq") * col("sdd") - D("sqd") * col("sd")) +
        D("sd") * (D("sq") * col("sqd") - D("sqq") * col("sd"))
      val b0 = ((D("sqq") * col("sdd") - D("sqd") * col("sqd")) * col("sp") -
        (D("sq") * col("sdd") - D("sqd") * col("sd")) * col("sqp") +
        (D("sq") * col("sqd") - D("sqq") * col("sd")) * col("sdp")) / det
      val b1 = ((D("sq") * col("sdp") - D("sd") * col("sqp")) * col("sd") -
        (D("n") * col("sdp") - D("sd") * col("sp")) * col("sqd") +
        (D("n") * col("sqp") - D("sq") * col("sp")) * col("sdd")) / det
      val b2 = (D("n") * (D("sqq") * col("sdp") - D("sqd") * col("sqp")) -
        D("sq") * (D("sq") * col("sdp") - D("sd") * col("sqp")) +
        D("sp") * (D("sq") * col("sqd") - D("sqq") * col("sd"))) / det
      val coefs = sums.select(col("n"), b0.as("b0"), b1.as("b1"), b2.as("b2"),
        (col("sp").cast("double") / col("n")).as("pbar"))
      def sqMicro(e: org.apache.spark.sql.Column) =
        sum(floor((e / 100000.0) * (e / 100000.0) * 1000000.0).cast("long"))
      val resid = f.crossJoin(broadcast(coefs)).agg(
        max(col("n")).as("n"), max(col("b0")).as("b0"), max(col("b1")).as("b1"),
        max(col("b2")).as("b2"),
        sqMicro(col("p") - (col("b0") + col("b1") * col("q")
          + col("b2") * col("d"))).as("sse"),
        sqMicro(col("p") - col("pbar")).as("sst"))
      resid.select(col("n"),
        floor(col("b0") * 1000000).cast("long").as("b0_micro"),
        floor(col("b1") * 1000000).cast("long").as("b1_micro"),
        floor(col("b2") * 1000000).cast("long").as("b2_micro"),
        floor((lit(1.0) - col("sse").cast("double") / col("sst")) * 1000000)
          .cast("long").as("r2_micro"))
    },

    // Distribution-drift monitor: per-day KL and reverse-KL divergence of
    // the event-type mix against the global mix. Probabilities are exact
    // count ratios; each p·ln(p/q) term fix-points to nanos BEFORE the
    // per-day sum, so partial-aggregation order can't move the hash (the
    // ln itself matches DuckDB's — proven by the q128/tx17 libm parity).
    // Shape at 100 TB: two bounded aggregations (day×type, type) joined
    // through a broadcast — the fact table is scanned once.
    QuerySpec(
      "q146_kl_divergence",
      """WITH dt AS (
        |  SELECT CAST(ts AS DATE) AS d, event_type, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2
        |), day_tot AS (
        |  SELECT d, CAST(sum(c) AS BIGINT) AS cd FROM dt GROUP BY 1
        |), g AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS cg FROM dt GROUP BY 1
        |), tot AS (SELECT CAST(sum(c) AS BIGINT) AS ct FROM dt)
        |SELECT d, max(cd) AS n_events,
        |  CAST(sum(CAST(floor((CAST(c AS DOUBLE) / cd)
        |    * ln((CAST(c AS DOUBLE) / cd) / (CAST(cg AS DOUBLE) / ct))
        |    * 1000000000.0) AS BIGINT)) AS BIGINT) AS kl_nano,
        |  CAST(sum(CAST(floor((CAST(cg AS DOUBLE) / ct)
        |    * ln((CAST(cg AS DOUBLE) / ct) / (CAST(c AS DOUBLE) / cd))
        |    * 1000000000.0) AS BIGINT)) AS BIGINT) AS rkl_nano
        |FROM dt JOIN day_tot USING (d) JOIN g USING (event_type) CROSS JOIN tot
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val dt = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val dayTot = dt.groupBy("d").agg(sum(col("c")).as("cd"))
      val glob = dt.groupBy("event_type").agg(sum(col("c")).as("cg"))
      val tot = dt.agg(sum(col("c")).as("ct"))
      def p = col("c").cast("double") / col("cd")
      def q = col("cg").cast("double") / col("ct")
      def term(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        sum(floor(a * log(a / b) * 1000000000.0).cast("long"))
      dt.join(dayTot, "d").join(broadcast(glob), "event_type")
        .crossJoin(broadcast(tot))
        .groupBy("d")
        .agg(max(col("cd")).as("n_events"),
          term(p, q).as("kl_nano"), term(q, p).as("rkl_nano"))
    },

    // Grid-bucketed geo radius self-join: all customer pairs within
    // 50 km, found by hashing points into a 0.5°×0.5° lat/lng grid and
    // joining only same-or-adjacent cells (the spatial analog of LSH
    // banding — candidates shrink from n² to Σ|cell|², then exact
    // haversine verifies). Coverage proof: the synthetic points live in
    // |lat| ≤ 6.3 where cos(lat) ≥ 0.993, so 50 km ≤ 0.453° lng and
    // ≤ 0.450° lat — both under one 0.5° cell, making the 3×3
    // neighborhood a superset of every qualifying pair (the oracle
    // brute-forces n² to prove no candidate is missed). At 100 TB the
    // explode-by-9 probe side shuffles on (cell) like any equi-join; no
    // cross join exists, and hot cells are ordinary AQE skew work.
    QuerySpec(
      "q147_geo_radius_join",
      """WITH pts AS (
        |  SELECT c_custkey AS id,
        |    (c_custkey % 83) * 0.15 - 6.2 AS lat,
        |    ((c_custkey * 13) % 157) * 0.15 - 11.8 AS lng
        |  FROM customer
        |)
        |SELECT a.id AS id1, b.id AS id2,
        |  round(2 * 6371.0 * asin(sqrt(
        |    sin(radians((b.lat - a.lat) / 2)) * sin(radians((b.lat - a.lat) / 2))
        |    + cos(radians(a.lat)) * cos(radians(b.lat))
        |      * sin(radians((b.lng - a.lng) / 2)) * sin(radians((b.lng - a.lng) / 2))
        |  )), 3) AS dist_km
        |FROM pts a JOIN pts b ON a.id < b.id
        |WHERE round(2 * 6371.0 * asin(sqrt(
        |    sin(radians((b.lat - a.lat) / 2)) * sin(radians((b.lat - a.lat) / 2))
        |    + cos(radians(a.lat)) * cos(radians(b.lat))
        |      * sin(radians((b.lng - a.lng) / 2)) * sin(radians((b.lng - a.lng) / 2))
        |  )), 3) <= 50.0""".stripMargin) { (s, dir) =>
      val pts = Tables.customer(s, dir).select(
        col("c_custkey").as("id"),
        ((col("c_custkey") % 83) * 0.15 - 6.2).as("lat"),
        (((col("c_custkey") * 13) % 157) * 0.15 - 11.8).as("lng"))
      // Home cell per point; probe side explodes to its 3×3 neighborhood
      // so candidates need only a plain equi-join on the cell key.
      val celled = pts.select(col("id"), col("lat"), col("lng"),
        floor((col("lat") + 90) / 0.5).cast("long").as("cy"),
        floor((col("lng") + 180) / 0.5).cast("long").as("cx"))
      val probe = celled.select(col("id").as("id1"), col("lat").as("lat1"),
          col("lng").as("lng1"),
          explode(sequence(lit(-1), lit(1))).as("dy"), col("cy"), col("cx"))
        .select(col("id1"), col("lat1"), col("lng1"),
          (col("cy") + col("dy")).as("cy"),
          explode(sequence(lit(-1), lit(1))).as("dx"), col("cx"))
        .select(col("id1"), col("lat1"), col("lng1"), col("cy"),
          (col("cx") + col("dx")).as("cx"))
      val build = celled.select(col("id").as("id2"), col("lat").as("lat2"),
        col("lng").as("lng2"), col("cy"), col("cx"))
      def sin2(x: org.apache.spark.sql.Column) = sin(radians(x)) * sin(radians(x))
      val dist = round(lit(2 * 6371.0) * asin(sqrt(
        sin2((col("lat2") - col("lat1")) / 2)
          + cos(radians(col("lat1"))) * cos(radians(col("lat2")))
            * sin2((col("lng2") - col("lng1")) / 2))), 3)
      probe.join(build, Seq("cy", "cx"))
        .where(col("id1") < col("id2"))
        .select(col("id1"), col("id2"), dist.as("dist_km"))
        .where(col("dist_km") <= 50.0)
        .distinct()
    },

    // Item-item co-occurrence similarity (the collaborative-filtering /
    // "frequently bought together" kernel): parts appearing in the same
    // order, scored by cosine over order-occurrence vectors — all from
    // integer counts, cosine = co/√(na·nb) with IEEE-exact sqrt. The
    // (order, part) dedup and the self-join both shuffle on orderkey
    // (co-partitioned — one exchange feeds both sides); baskets are
    // bounded (≤7 lines), so the per-order pair fan-out is O(k²) with
    // tiny k, and the co ≥ 2 support floor prunes the pair table before
    // the similarity math.
    QuerySpec(
      "q148_item_cooccurrence",
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |), freq AS (
        |  SELECT l_partkey, count(*)::BIGINT AS nf FROM op GROUP BY 1
        |), co AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    count(*)::BIGINT AS co
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT part_a, part_b, co,
        |  CAST(floor(CAST(co AS DOUBLE) / sqrt(CAST(fa.nf * fb.nf AS DOUBLE))
        |    * 1000000) AS BIGINT) AS cos_micro
        |FROM co
        |JOIN freq fa ON fa.l_partkey = part_a
        |JOIN freq fb ON fb.l_partkey = part_b""".stripMargin) { (s, dir) =>
      val op = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey").distinct()
      val freq = op.groupBy("l_partkey").agg(count(lit(1)).as("nf"))
      val co = op.select(col("l_orderkey"), col("l_partkey").as("part_a"))
        .join(op.select(col("l_orderkey"), col("l_partkey").as("part_b")),
          "l_orderkey")
        .where(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(count(lit(1)).as("co"))
        .where(col("co") >= 2)
      // freq is O(#parts) — it grows with scale factor, so it is NOT a
      // broadcast-able dimension at 100×; plain shuffle joins co-partition
      // on the part key (and AQE still picks broadcast when it fits).
      co.join(freq.withColumnRenamed("nf", "na"),
          col("l_partkey") === col("part_a")).drop("l_partkey")
        .join(freq.withColumnRenamed("nf", "nb"),
          col("l_partkey") === col("part_b")).drop("l_partkey")
        .select(col("part_a"), col("part_b"), col("co"),
          floor(col("co").cast("double")
            / sqrt((col("na") * col("nb")).cast("double")) * 1000000)
            .cast("long").as("cos_micro"))
    },

    // Reciprocal-rank fusion of two customer rankings (by total spend
    // and by order count) — the standard hybrid-search result merger:
    // score = Σ 1/(60+rank). Ranks come from tie-broken total orders
    // (deterministic), the score is a two-term sum of identical doubles.
    // Both global ranks are minted by the range-bucketed
    // Ranks.globalRowNumber (negated range key for the descending
    // heads), so the customer dimension never funnels through one
    // task's sort — the oracle's global windows are the semantic spec
    // only.
    QuerySpec(
      "q150_rrf",
      """WITH agg AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS spend_c,
        |    count(*)::BIGINT AS n_orders
        |  FROM orders GROUP BY 1
        |), ranked AS (
        |  SELECT o_custkey, spend_c, n_orders,
        |    row_number() OVER (ORDER BY spend_c DESC, o_custkey)::BIGINT AS r_spend,
        |    row_number() OVER (ORDER BY n_orders DESC, o_custkey)::BIGINT AS r_freq
        |  FROM agg
        |)
        |SELECT o_custkey, r_spend, r_freq,
        |  CAST(floor((1.0 / (60 + r_spend) + 1.0 / (60 + r_freq)) * 1000000000.0)
        |    AS BIGINT) AS rrf_nano
        |FROM ranked""".stripMargin) { (s, dir) =>
      import graft.operators.{Dedup, Ranks}
      val agg = Dedup.stage(Tables.orders(s, dir).groupBy("o_custkey")
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("spend_c"),
          count(lit(1)).as("n_orders")))
      val ranked = Ranks.globalRowNumber(
        Ranks.globalRowNumber(agg, "r_spend",
          Seq(col("spend_c").desc, col("o_custkey"))),
        "r_freq", Seq(col("n_orders").desc, col("o_custkey")))
      ranked.select(col("o_custkey"), col("r_spend"), col("r_freq"),
        floor((lit(1.0) / (lit(60) + col("r_spend"))
          + lit(1.0) / (lit(60) + col("r_freq"))) * 1000000000.0)
          .cast("long").as("rrf_nano"))
    },

    // Holt–Winters triple exponential smoothing (additive, season=7)
    // over the daily-revenue series, plus a 7-day forecast. The state
    // (level, trend, 7 seasonals) rides ONE ordered-array fold as a
    // 9-slot double array — the q118/q129 sequential-fold machinery
    // widened to vector state (Spark's `aggregate` allows array
    // accumulators; DuckDB's list_reduce does not, so the oracle replays
    // the identical recurrence in a recursive CTE — different engine
    // mechanism, bit-identical arithmetic order). Day revenue sums in
    // integer cents; the recurrence's doubles match because both engines
    // evaluate the same expression tree over the same ordered xs.
    QuerySpec(
      "q149_holt_winters",
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |), ser AS (
        |  SELECT list(cents / 100000.0 ORDER BY d) AS xs, count(*)::INT AS n
        |  FROM daily
        |), init AS (
        |  SELECT xs, n,
        |    list_reduce(list_prepend(0.0::DOUBLE, xs[1:7]), (a, x) -> a + x) / 7.0
        |      AS lvl0,
        |    (list_reduce(list_prepend(0.0::DOUBLE, xs[8:14]), (a, x) -> a + x) / 7.0
        |      - list_reduce(list_prepend(0.0::DOUBLE, xs[1:7]), (a, x) -> a + x)
        |        / 7.0) / 7.0 AS tr0
        |  FROM ser
        |), hw AS (
        |  SELECT 7 AS t, lvl0 AS lvl, tr0 AS tr,
        |    list_transform(xs[1:7], x -> x - lvl0) AS s
        |  FROM init
        |  UNION ALL
        |  SELECT t + 1,
        |    0.3 * (xs[t + 1] - s[1]) + 0.7 * (lvl + tr),
        |    0.1 * ((0.3 * (xs[t + 1] - s[1]) + 0.7 * (lvl + tr)) - lvl) + 0.9 * tr,
        |    list_append(s[2:7],
        |      0.2 * (xs[t + 1] - (0.3 * (xs[t + 1] - s[1]) + 0.7 * (lvl + tr)))
        |        + 0.8 * s[1])
        |  FROM hw, ser WHERE t < n
        |), fin AS (SELECT lvl, tr, s FROM hw, ser WHERE t = n)
        |SELECT (SELECT n::BIGINT FROM ser) AS n_days,
        |  CAST(floor(lvl * 1000000) AS BIGINT) AS lvl_micro,
        |  CAST(floor(tr * 1000000) AS BIGINT) AS tr_micro,
        |  CAST(floor((lvl + 1 * tr + s[1]) * 1000000) AS BIGINT) AS f1_micro,
        |  CAST(floor((lvl + 2 * tr + s[2]) * 1000000) AS BIGINT) AS f2_micro,
        |  CAST(floor((lvl + 3 * tr + s[3]) * 1000000) AS BIGINT) AS f3_micro,
        |  CAST(floor((lvl + 4 * tr + s[4]) * 1000000) AS BIGINT) AS f4_micro,
        |  CAST(floor((lvl + 5 * tr + s[5]) * 1000000) AS BIGINT) AS f5_micro,
        |  CAST(floor((lvl + 6 * tr + s[6]) * 1000000) AS BIGINT) AS f6_micro,
        |  CAST(floor((lvl + 7 * tr + s[7]) * 1000000) AS BIGINT) AS f7_micro
        |FROM fin""".stripMargin) { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val ser = daily.agg(
        transform(sort_array(collect_list(struct(col("d"), col("cents")))),
          e => e.getField("cents") / 100000.0).as("xs"),
        count(lit(1)).cast("int").as("n"))
      def meanOf(from: Int) =
        aggregate(slice(col("xs"), from, 7), lit(0.0), (a, x) => a + x) / 7.0
      val staged = ser.select(col("xs"), col("n"),
        meanOf(1).as("lvl0"), ((meanOf(8) - meanOf(1)) / 7.0).as("tr0"))
      // Accumulator layout: [1]=level, [2]=trend, [3..9]=seasonals with
      // [3] always the next to consume (rotates each step).
      val init = concat(array(col("lvl0"), col("tr0")),
        transform(slice(col("xs"), 1, 7), x => x - col("lvl0")))
      val folded = staged.select(col("n"),
        aggregate(
          slice(col("xs"), lit(8), col("n") - 7), init,
          (acc, xv) => {
            val lvl = element_at(acc, 1)
            val tr = element_at(acc, 2)
            val s1 = element_at(acc, 3)
            // newlvl/news re-inline the same sub-expression — identical
            // doubles by construction, mirroring the oracle's inlining.
            val newlvl = lit(0.3) * (xv - s1) + lit(0.7) * (lvl + tr)
            val newtr = lit(0.1) * (newlvl - lvl) + lit(0.9) * tr
            val news = lit(0.2) * (xv - newlvl) + lit(0.8) * s1
            concat(array(newlvl, newtr), slice(acc, 4, 6), array(news))
          }).as("st"))
      val f = (1 to 7).map(h =>
        floor((element_at(col("st"), 1) + lit(h) * element_at(col("st"), 2)
          + element_at(col("st"), 2 + h)) * 1000000.0)
          .cast("long").as(s"f${h}_micro"))
      folded.select(Seq(col("n").cast("long").as("n_days"),
        floor(element_at(col("st"), 1) * 1000000.0).cast("long").as("lvl_micro"),
        floor(element_at(col("st"), 2) * 1000000.0).cast("long").as("tr_micro"))
        ++ f: _*)
    },

    // PCA by power iteration: the dominant eigenvector of the 4×4
    // covariance matrix of (quantity, discount, tax, price) — covariance
    // from ONE pass of exact integer sums (the only distributed work; at
    // 100 TB it's a map-side-combinable aggregation), then 8 mat-vec
    // iterations on the driver (constant work, the canonical shape for
    // low-dimensional spectra on Spark). The oracle replays the identical
    // iteration in a recursive CTE carrying the vector; sqrt is
    // IEEE-exact so normalization matches bit-for-bit.
    QuerySpec(
      "q151_pca_power", {
        val w = (1 to 4).map { i =>
          (1 to 4).map { j =>
            s"c${math.min(i, j)}${math.max(i, j)} * v[$j]"
          }.mkString("(", " + ", ")")
        }
        val norm = s"sqrt(${w.map(e => s"$e * $e").mkString(" + ")})"
        val comps = w.map(e => s"$e / $norm").mkString(",\n        |    ")
        val lam = (1 to 4).map(i => s"v[$i] * ${w(i - 1)}").mkString(" + ")
        s"""WITH RECURSIVE f AS (
        |  SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
        |    CAST(floor(l_discount * 100) AS BIGINT) AS d,
        |    CAST(floor(l_tax * 100) AS BIGINT) AS t,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS p
        |  FROM lineitem
        |), s AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(q) AS BIGINT) AS s1, CAST(sum(d) AS BIGINT) AS s2,
        |    CAST(sum(t) AS BIGINT) AS s3, CAST(sum(p) AS BIGINT) AS s4,
        |    CAST(sum(q * q) AS BIGINT) AS s11, CAST(sum(q * d) AS BIGINT) AS s12,
        |    CAST(sum(q * t) AS BIGINT) AS s13, CAST(sum(q * p) AS BIGINT) AS s14,
        |    CAST(sum(d * d) AS BIGINT) AS s22, CAST(sum(d * t) AS BIGINT) AS s23,
        |    CAST(sum(d * p) AS BIGINT) AS s24, CAST(sum(t * t) AS BIGINT) AS s33,
        |    CAST(sum(t * p) AS BIGINT) AS s34, CAST(sum(p * p) AS BIGINT) AS s44
        |  FROM f
        |), cov AS (
        |  SELECT n,
        |    CAST(s11 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS c11,
        |    CAST(s12 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n) AS c12,
        |    CAST(s13 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n) AS c13,
        |    CAST(s14 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s4 AS DOUBLE) / n) AS c14,
        |    CAST(s22 AS DOUBLE) / n - (CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n) AS c22,
        |    CAST(s23 AS DOUBLE) / n - (CAST(s2 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n) AS c23,
        |    CAST(s24 AS DOUBLE) / n - (CAST(s2 AS DOUBLE) / n) * (CAST(s4 AS DOUBLE) / n) AS c24,
        |    CAST(s33 AS DOUBLE) / n - (CAST(s3 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n) AS c33,
        |    CAST(s34 AS DOUBLE) / n - (CAST(s3 AS DOUBLE) / n) * (CAST(s4 AS DOUBLE) / n) AS c34,
        |    CAST(s44 AS DOUBLE) / n - (CAST(s4 AS DOUBLE) / n) * (CAST(s4 AS DOUBLE) / n) AS c44
        |  FROM s
        |), pw AS (
        |  SELECT 0 AS it,
        |    [0.5::DOUBLE, 0.5::DOUBLE, 0.5::DOUBLE, 0.5::DOUBLE] AS v
        |  FROM cov
        |  UNION ALL
        |  SELECT it + 1, [
        |    $comps
        |  ] FROM pw, cov WHERE it < 8
        |), fin AS (SELECT v FROM pw WHERE it = 8)
        |SELECT n,
        |  CAST(floor(v[1] * 1000000) AS BIGINT) AS v1_micro,
        |  CAST(floor(v[2] * 1000000) AS BIGINT) AS v2_micro,
        |  CAST(floor(v[3] * 1000000) AS BIGINT) AS v3_micro,
        |  CAST(floor(v[4] * 1000000) AS BIGINT) AS v4_micro,
        |  CAST(floor(($lam) * 1000000) AS BIGINT) AS lambda_micro
        |FROM fin, cov""".stripMargin
      }) { (s, dir) =>
      val f = Tables.lineitem(s, dir).select(
        floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_discount") * 100).cast("long").as("d"),
        floor(col("l_tax") * 100).cast("long").as("t"),
        floor(col("l_extendedprice")).cast("long").as("p"))
      val r = f.agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("s1"), sum(col("d")).as("s2"),
        sum(col("t")).as("s3"), sum(col("p")).as("s4"),
        sum(col("q") * col("q")).as("s11"), sum(col("q") * col("d")).as("s12"),
        sum(col("q") * col("t")).as("s13"), sum(col("q") * col("p")).as("s14"),
        sum(col("d") * col("d")).as("s22"), sum(col("d") * col("t")).as("s23"),
        sum(col("d") * col("p")).as("s24"), sum(col("t") * col("t")).as("s33"),
        sum(col("t") * col("p")).as("s34"), sum(col("p") * col("p")).as("s44"))
        .collect()(0)
      val n = r.getLong(0)
      val s1 = r.getLong(1); val s2 = r.getLong(2)
      val s3 = r.getLong(3); val s4 = r.getLong(4)
      val sums2 = Map((1, 1) -> r.getLong(5), (1, 2) -> r.getLong(6),
        (1, 3) -> r.getLong(7), (1, 4) -> r.getLong(8), (2, 2) -> r.getLong(9),
        (2, 3) -> r.getLong(10), (2, 4) -> r.getLong(11), (3, 3) -> r.getLong(12),
        (3, 4) -> r.getLong(13), (4, 4) -> r.getLong(14))
      val firsts = Map(1 -> s1, 2 -> s2, 3 -> s3, 4 -> s4)
      // Same expression tree as the oracle's cov CTE.
      def cov(i: Int, j: Int): Double = {
        val (a, b) = (math.min(i, j), math.max(i, j))
        sums2((a, b)).toDouble / n -
          (firsts(a).toDouble / n) * (firsts(b).toDouble / n)
      }
      var v = Array(0.5, 0.5, 0.5, 0.5)
      def matVec(u: Array[Double]): Array[Double] =
        Array.tabulate(4)(i =>
          cov(i + 1, 1) * u(0) + cov(i + 1, 2) * u(1)
            + cov(i + 1, 3) * u(2) + cov(i + 1, 4) * u(3))
      for (_ <- 1 to 8) {
        val w = matVec(v)
        val norm = math.sqrt(w(0) * w(0) + w(1) * w(1) + w(2) * w(2) + w(3) * w(3))
        v = w.map(_ / norm)
      }
      val wf = matVec(v)
      val lam = v(0) * wf(0) + v(1) * wf(1) + v(2) * wf(2) + v(3) * wf(3)
      s.range(1).select(lit(n).as("n"),
        lit(math.floor(v(0) * 1000000).toLong).as("v1_micro"),
        lit(math.floor(v(1) * 1000000).toLong).as("v2_micro"),
        lit(math.floor(v(2) * 1000000).toLong).as("v3_micro"),
        lit(math.floor(v(3) * 1000000).toLong).as("v4_micro"),
        lit(math.floor(lam * 1000000).toLong).as("lambda_micro"))
    },

    // Grid-density clustering (DBSCAN's grid cousin) over the first two
    // embedding dimensions: points hash to 0.05-wide cells, cells with
    // ≥3 points are "dense", and touching dense cells (8-neighborhood)
    // merge into clusters via connected components — Dedup's min-label
    // propagation reused on the cell graph. The expensive stage (cell
    // histogram) is one map-side-combinable groupBy of the point table;
    // everything after runs on the bounded cell table. The oracle
    // replays the merge as exact recursive reachability (dd7's pattern),
    // so cluster ids (= min member cell id) are engine-identical.
    QuerySpec(
      "q152_dbscan_grid",
      """WITH RECURSIVE cells AS (
        |  SELECT CAST(floor(embedding[1]::DOUBLE * 20) AS BIGINT) AS cx,
        |    CAST(floor(embedding[2]::DOUBLE * 20) AS BIGINT) AS cy,
        |    count(*)::BIGINT AS n
        |  FROM embeddings GROUP BY 1, 2 HAVING count(*) >= 3
        |), ids AS (
        |  SELECT cx, cy, n, (cx + 20) * 100 + (cy + 20) AS cid FROM cells
        |), p AS (
        |  SELECT a.cid AS id1, b.cid AS id2
        |  FROM ids a JOIN ids b ON a.cid < b.cid
        |    AND abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        |), e AS (SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), lab AS (
        |  SELECT a AS cid, least(a, min(b)) AS root FROM reach GROUP BY a
        |)
        |SELECT cx, cy, n AS n_points, coalesce(root, cid) AS cluster_id
        |FROM ids LEFT JOIN lab USING (cid)""".stripMargin) { (s, dir) =>
      val cells = Tables.embeddings(s, dir).select(
        floor(element_at(col("embedding"), 1).cast("double") * 20)
          .cast("long").as("cx"),
        floor(element_at(col("embedding"), 2).cast("double") * 20)
          .cast("long").as("cy"))
        .groupBy("cx", "cy").agg(count(lit(1)).as("n"))
        .where(col("n") >= 3)
      val ids = cells.select(col("cx"), col("cy"), col("n"),
        ((col("cx") + 20) * 100 + (col("cy") + 20)).as("cid"))
      // Candidate adjacency via the 9-offset equi-join (q147's shape) —
      // no theta/cross join even though the cell table is tiny here.
      val probe = ids.select(col("cid").as("id1"),
          explode(sequence(lit(-1), lit(1))).as("dx"), col("cx"), col("cy"))
        .select(col("id1"), (col("cx") + col("dx")).as("cx"),
          explode(sequence(lit(-1), lit(1))).as("dy"), col("cy"))
        .select(col("id1"), col("cx"), (col("cy") + col("dy")).as("cy"))
      val pairs = probe
        .join(ids.select(col("cid").as("id2"), col("cx"), col("cy")),
          Seq("cx", "cy"))
        .where(col("id1") < col("id2"))
        .select("id1", "id2")
      val cc = graft.operators.Dedup.connectedComponents(pairs, "id1", "id2")
      ids.join(cc, ids("cid") === cc("doc_id"), "left")
        .select(col("cx"), col("cy"), col("n").as("n_points"),
          coalesce(col("cluster_id"), col("cid")).as("cluster_id"))
    },

    // Mann–Whitney U (rank-sum) test comparing open vs finished order
    // totals — the nonparametric companion to q122's parametric z-test.
    // Everything stays in integers: ranks are computed over the DISTINCT
    // value table (ties share an average rank, carried DOUBLED so the
    // half-integers are exact BIGINTs), so the fact table contributes
    // one bounded aggregation and the rank window runs over distinct
    // values only — never a window over raw rows.
    QuerySpec(
      "q153_mann_whitney",
      """WITH src AS (
        |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v,
        |    CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS g1
        |  FROM orders WHERE o_orderstatus IN ('O', 'F')
        |), vals AS (
        |  SELECT v, count(*)::BIGINT AS c, CAST(sum(g1) AS BIGINT) AS c1
        |  FROM src GROUP BY 1
        |), ranked AS (
        |  SELECT v, c, c1,
        |    2 * (CAST(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - c + 1) + c - 1 AS ar2
        |  FROM vals
        |), agg AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c - c1) AS BIGINT) AS n2,
        |    CAST(sum(c1 * ar2) AS BIGINT) AS r1_x2
        |  FROM ranked
        |)
        |SELECT n1, n2, r1_x2,
        |  r1_x2 - n1 * (n1 + 1) AS u1_x2,
        |  2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS u2_x2
        |FROM agg""".stripMargin) { (s, dir) =>
      import graft.operators.Ranks
      val src = Tables.orders(s, dir)
        .where(col("o_orderstatus").isin("O", "F"))
        .select(floor(col("o_totalprice")).cast("long").as("v"),
          when(col("o_orderstatus") === "O", 1L).otherwise(0L).as("g1"))
      val vals = src.groupBy("v")
        .agg(count(lit(1)).as("c"), sum(col("g1")).as("c1"))
      // Running rank-sum over the distinct-value grid WITHOUT a global
      // window (Ranks.prefixSums: range buckets + lower-bucket totals
      // broadcast) — the grid is value-domain-sized, unbounded if the
      // domain is continuous at scale.
      val ranked = Ranks.prefixSums(vals, Seq(col("v")),
          Seq((col("c"), "__cum")))
        .withColumn("ar2",
          lit(2) * (col("__cum") - col("c") + 1) + col("c") - 1)
      val agg = ranked.agg(
        sum(col("c1")).as("n1"), sum(col("c") - col("c1")).as("n2"),
        sum(col("c1") * col("ar2")).as("r1_x2"))
      agg.select(col("n1"), col("n2"), col("r1_x2"),
        (col("r1_x2") - col("n1") * (col("n1") + 1)).as("u1_x2"),
        (lit(2) * col("n1") * col("n2")
          - (col("r1_x2") - col("n1") * (col("n1") + 1))).as("u2_x2"))
    },

    // Chi-square independence test on the segment × order-priority
    // contingency table. Observed counts and marginals are exact
    // integers; each cell's (O−E)²/E term fix-points to nanos before the
    // (bounded, ~25-term) sum. The fact join is the only wide work —
    // dimension marginals broadcast back onto the cell table.
    QuerySpec(
      "q154_chi_square",
      """WITH joined AS (
        |  SELECT c_mktsegment AS seg, o_orderpriority AS pri
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), cells AS (
        |  SELECT seg, pri, count(*)::BIGINT AS o FROM joined GROUP BY 1, 2
        |), rows_t AS (SELECT seg, CAST(sum(o) AS BIGINT) AS ri FROM cells GROUP BY 1),
        |cols_t AS (SELECT pri, CAST(sum(o) AS BIGINT) AS cj FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
        |SELECT max(n) AS n,
        |  (count(DISTINCT seg) - 1) * (count(DISTINCT pri) - 1) AS dof,
        |  CAST(sum(CAST(floor(
        |    (o - CAST(ri * cj AS DOUBLE) / n) * (o - CAST(ri * cj AS DOUBLE) / n)
        |      / (CAST(ri * cj AS DOUBLE) / n) * 1000000000.0) AS BIGINT))
        |    AS BIGINT) AS chi2_nano
        |FROM cells JOIN rows_t USING (seg) JOIN cols_t USING (pri) CROSS JOIN tot""".stripMargin) { (s, dir) =>
      val joined = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      val cells = joined.groupBy("seg", "pri").agg(count(lit(1)).as("o"))
      val rowsT = cells.groupBy("seg").agg(sum(col("o")).as("ri"))
      val colsT = cells.groupBy("pri").agg(sum(col("o")).as("cj"))
      val tot = cells.agg(sum(col("o")).as("n"))
      def e = (col("ri") * col("cj")).cast("double") / col("n")
      cells.join(broadcast(rowsT), "seg").join(broadcast(colsT), "pri")
        .crossJoin(broadcast(tot))
        .agg(max(col("n")).as("n"),
          ((count_distinct(col("seg")) - 1)
            * (count_distinct(col("pri")) - 1)).as("dof"),
          sum(floor((col("o") - e) * (col("o") - e) / e * 1000000000.0)
            .cast("long")).as("chi2_nano"))
    },

    // Time-weighted average event value per user (the TWAP kernel):
    // each reading holds until the user's next event, so its weight is
    // the gap in whole seconds — lead() over (user, time) keys, then
    // exact integer Σ(value_cents · dur) / Σ(dur). The window partitions
    // by user (shuffles once on the natural key); the division happens
    // once per user on exact longs.
    QuerySpec(
      "q155_time_weighted_avg",
      """WITH t AS (
        |  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS x,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ep,
        |    lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events
        |), w AS (
        |  SELECT user_id, x, nxt - ep AS dur FROM t WHERE nxt IS NOT NULL
        |)
        |SELECT user_id, count(*)::BIGINT AS n_intervals,
        |  CAST(sum(dur) AS BIGINT) AS total_sec,
        |  CAST(floor(CAST(sum(x * dur) AS DOUBLE) / sum(dur) * 1000000.0)
        |    AS BIGINT) AS twa_c_micro
        |FROM w WHERE dur > 0 GROUP BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ep = col("ts").cast("timestamp").cast("long")
      val t = Tables.events(s, dir).select(col("user_id"),
        floor(col("value") * 100).cast("long").as("x"), ep.as("ep"),
        lead(ep, 1).over(Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))).as("nxt"))
      t.where(col("nxt").isNotNull)
        .select(col("user_id"), col("x"), (col("nxt") - col("ep")).as("dur"))
        .where(col("dur") > 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"), sum(col("dur")).as("total_sec"),
          floor(sum(col("x") * col("dur")).cast("double") / sum(col("dur"))
            * 1000000.0).cast("long").as("twa_c_micro"))
    },

    // Quantile normalization of account balances: every customer's
    // balance is replaced by the GLOBAL distribution's value at the same
    // within-segment percentile — the cross-batch feature-alignment
    // transform. Within-segment rank is a partitioned window (scales on
    // the segment key); the global distribution is a POSITION TABLE
    // (exact rank → value, minted by the range-bucketed Ranks helper)
    // and the lookup is a plain equi-join on the computed position — no
    // full-table array ever materializes on one row. Index math is all
    // integer except the percentile itself, floored identically.
    QuerySpec(
      "q156_quantile_normalization",
      """WITH v AS (
        |  SELECT c_custkey, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer
        |), ranked AS (
        |  SELECT c_custkey, seg, bal_c,
        |    row_number() OVER (PARTITION BY seg ORDER BY bal_c, c_custkey)::BIGINT
        |      AS r,
        |    count(*) OVER (PARTITION BY seg)::BIGINT AS ns
        |  FROM v
        |), g AS (
        |  SELECT list(bal_c ORDER BY bal_c, c_custkey) AS gv,
        |    count(*)::BIGINT AS n
        |  FROM v
        |)
        |SELECT c_custkey, seg, bal_c,
        |  gv[(CAST(floor(CAST(r - 1 AS DOUBLE) / greatest(ns - 1, 1) * (n - 1))
        |    AS BIGINT) + 1)::INT] AS qnorm_c
        |FROM ranked CROSS JOIN g""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.operators.{Dedup, Ranks}
      val v = Dedup.stage(Tables.customer(s, dir).select(col("c_custkey"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") * 100).cast("long").as("bal_c")))
      val ranked = v
        .withColumn("r", row_number().over(Window.partitionBy("seg")
          .orderBy(col("bal_c"), col("c_custkey"))).cast("long"))
        .withColumn("ns",
          count(lit(1)).over(Window.partitionBy("seg")).cast("long"))
      val tot = v.agg(count(lit(1)).as("n"))
      val gidx = Ranks.globalRowNumber(v, "pos",
          Seq(col("bal_c"), col("c_custkey")))
        .select(col("pos"), col("bal_c").as("qnorm_c"))
      ranked.crossJoin(broadcast(tot))
        .withColumn("__idx",
          floor((col("r") - 1).cast("double") / greatest(col("ns") - 1, lit(1L))
            * (col("n") - 1)).cast("long") + 1)
        .join(gidx, col("__idx") === col("pos"))
        .select(col("c_custkey"), col("seg"), col("bal_c"), col("qnorm_c"))
    },

    // RAKE keyword extraction: phrases are maximal stopword-free token
    // runs; a word scores degree/frequency (degree = summed length of
    // the phrases it appears in), a phrase scores the sum of its words'
    // scores, and each document reports its top phrase. Word scores
    // fix-point to nanos before the per-phrase sum. The run-id trick
    // (prefix count of stopwords) turns phrase segmentation into plain
    // gaps-and-islands grouping — token explode + two bounded
    // aggregations, no per-document iteration anywhere.
    QuerySpec(
      "tx28_rake_keywords",
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '') AS tk
        |  FROM documents
        |), pt AS (
        |  SELECT doc_id, unnest(tk) AS tok,
        |    generate_subscripts(tk, 1) AS pos
        |  FROM toks
        |), flagged AS (
        |  SELECT doc_id, tok, pos,
        |    CASE WHEN list_contains(['the','a','and','of','to','in','is','you',
        |      'that','it'], tok) THEN 1 ELSE 0 END AS st
        |  FROM pt
        |), runs AS (
        |  SELECT doc_id, tok, pos, st,
        |    CAST(sum(st) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        |  FROM flagged
        |), words AS (
        |  SELECT doc_id, run, tok, pos,
        |    count(*) OVER (PARTITION BY doc_id, run)::BIGINT AS plen
        |  FROM runs WHERE st = 0
        |), wstats AS (
        |  SELECT tok, count(*)::BIGINT AS freq, CAST(sum(plen) AS BIGINT) AS deg
        |  FROM words GROUP BY 1
        |), scored AS (
        |  SELECT w.doc_id, w.run,
        |    string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
        |    max(w.plen) AS n_words,
        |    CAST(sum(CAST(floor(CAST(ws.deg AS DOUBLE) / ws.freq * 1000000000.0)
        |      AS BIGINT)) AS BIGINT) AS score_nano
        |  FROM words w JOIN wstats ws ON ws.tok = w.tok
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT doc_id, phrase, n_words, score_nano,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score_nano DESC, phrase) AS rk
        |  FROM scored
        |)
        |SELECT doc_id, phrase, n_words, score_nano
        |FROM top WHERE rk = 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val stop = Seq("the", "a", "and", "of", "to", "in", "is", "you",
        "that", "it")
      val pt = Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
        .select(col("doc_id"),
          posexplode(graft.operators.TextAnalysis.tokens(col("text")))
            .as(Seq("pos0", "tok")))
        .select(col("doc_id"), col("tok"), (col("pos0") + 1).as("pos"))
      val flagged = pt.withColumn("st",
        when(col("tok").isInCollection(stop), 1L).otherwise(0L))
      val runs = flagged.withColumn("run",
        sum(col("st")).over(Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val words = runs.where(col("st") === 0)
        .withColumn("plen",
          count(lit(1)).over(Window.partitionBy("doc_id", "run")).cast("long"))
      val wstats = words.groupBy("tok")
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      // wstats is vocabulary-sized (grows with the corpus, Heaps' law) —
      // no broadcast hint; the tok equi-join shuffles on the token key
      // and AQE broadcasts only while the vocab actually fits.
      val scored = words
        .join(wstats.select(col("tok"), col("freq"), col("deg")), "tok")
        .groupBy("doc_id", "run")
        .agg(
          array_join(transform(
            sort_array(collect_list(struct(col("pos"), col("tok")))),
            e => e.getField("tok")), " ").as("phrase"),
          max(col("plen")).as("n_words"),
          sum(floor(col("deg").cast("double") / col("freq") * 1000000000.0)
            .cast("long")).as("score_nano"))
      scored
        .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score_nano").desc, col("phrase"))))
        .where(col("rk") === 1)
        .select("doc_id", "phrase", "n_words", "score_nano")
    },

    // Population stability index (the ML-ops drift gate) of the order-
    // price distribution, 1995–97 reference vs 1998+ current: ten fixed
    // price bins, add-one smoothing so empty bins stay finite, per-bin
    // (p−q)·ln(p/q) fix-pointed to nanos before the 10-term sum. Two
    // bounded histograms from one scan — the same shape q146 uses for
    // day-level KL, lifted to the between-period comparison a model
    // monitor actually runs.
    QuerySpec(
      "q157_psi",
      """WITH b AS (
        |  SELECT least(CAST(floor(o_totalprice / 30000) AS BIGINT), 9) AS bin,
        |    CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |      THEN 1 ELSE 0 END AS ref
        |  FROM orders
        |), h AS (
        |  SELECT bin, CAST(sum(ref) AS BIGINT) AS cr,
        |    CAST(sum(1 - ref) AS BIGINT) AS cc
        |  FROM b GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(cc) AS BIGINT) AS nc,
        |    count(*)::BIGINT AS nbins
        |  FROM h
        |)
        |SELECT max(nr) AS n_ref, max(nc) AS n_cur,
        |  CAST(sum(CAST(floor(
        |    ((CAST(cr + 1 AS DOUBLE) / (nr + nbins))
        |      - (CAST(cc + 1 AS DOUBLE) / (nc + nbins)))
        |    * ln((CAST(cr + 1 AS DOUBLE) / (nr + nbins))
        |      / (CAST(cc + 1 AS DOUBLE) / (nc + nbins)))
        |    * 1000000000.0) AS BIGINT)) AS BIGINT) AS psi_nano
        |FROM h CROSS JOIN t""".stripMargin) { (s, dir) =>
      val b = Tables.orders(s, dir).select(
        least(floor(col("o_totalprice") / 30000).cast("long"), lit(9L)).as("bin"),
        when(to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"), 1L)
          .otherwise(0L).as("ref"))
      val h = b.groupBy("bin")
        .agg(sum(col("ref")).as("cr"), sum(lit(1L) - col("ref")).as("cc"))
      val t = h.agg(sum(col("cr")).as("nr"), sum(col("cc")).as("nc"),
        count(lit(1)).as("nbins"))
      def p = (col("cr") + 1).cast("double") / (col("nr") + col("nbins"))
      def q = (col("cc") + 1).cast("double") / (col("nc") + col("nbins"))
      h.crossJoin(broadcast(t)).agg(
        max(col("nr")).as("n_ref"), max(col("nc")).as("n_cur"),
        sum(floor((p - q) * log(p / q) * 1000000000.0).cast("long"))
          .as("psi_nano"))
    },

    // RFM (recency / frequency / monetary) quintile scoring — the
    // classic CRM segmentation. Per-customer aggregates come from one
    // orders pass; each dimension gets an ntile(5) over the bounded
    // customer table with a custkey tie-break so bucket boundaries are
    // total-ordered (engine-identical). Score reads high = good
    // (recent, frequent, high-spend).
    QuerySpec(
      "q158_rfm",
      """WITH maxd AS (SELECT max(CAST(o_orderdate AS DATE)) AS m FROM orders),
        |cust AS (
        |  SELECT o_custkey,
        |    date_diff('day', max(CAST(o_orderdate AS DATE)), max(m))::BIGINT
        |      AS recency_days,
        |    count(*)::BIGINT AS frequency,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS monetary_c
        |  FROM orders CROSS JOIN maxd GROUP BY 1
        |)
        |SELECT o_custkey, recency_days, frequency, monetary_c,
        |  CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS BIGINT)
        |    AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS BIGINT)
        |    AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY monetary_c, o_custkey) AS BIGINT)
        |    AS m_score
        |FROM cust""".stripMargin) { (s, dir) =>
      import graft.operators.{Dedup, Ranks}
      val day = to_date(col("o_orderdate"))
      val maxd = Tables.orders(s, dir).agg(max(day).as("m"))
      // STAGED between rank layers: each globalRowNumber output is a
      // fresh LogicalRDD whose consumers re-run its whole upstream
      // (zipWithIndex's offset count job included), so three CHAINED
      // unstaged calls re-execute the orders aggregate 2^3 times.
      // Staging cust and each layer makes every pipeline segment run
      // exactly once — same oracle hash, linear work.
      val cust = Dedup.stage(
        Tables.orders(s, dir).crossJoin(broadcast(maxd))
          .groupBy("o_custkey")
          .agg(datediff(max(col("m")), max(day)).cast("long")
            .as("recency_days"),
            count(lit(1)).as("frequency"),
            sum(floor(col("o_totalprice") * 100).cast("long"))
              .as("monetary_c")))
      // Each ntile(5) = closed-form bucket from an EXACT global rank;
      // ranks come from the range-partitioned Ranks helper, so no
      // dimension ever funnels through a single-task sort (the oracle's
      // three global ntile windows are the semantic spec only).
      val tot = cust.agg(count(lit(1)).as("__n"))
      val r1 = Dedup.stage(Ranks.globalRowNumber(cust, "__rr",
        Seq(col("recency_days").desc, col("o_custkey"))))
      val r2 = Dedup.stage(Ranks.globalRowNumber(r1, "__rf",
        Seq(col("frequency"), col("o_custkey"))))
      val r3 = Ranks.globalRowNumber(r2, "__rm",
        Seq(col("monetary_c"), col("o_custkey")))
      r3.crossJoin(broadcast(tot)).select(col("o_custkey"),
        col("recency_days"), col("frequency"), col("monetary_c"),
        Ranks.ntileFromRank(col("__rr"), col("__n"), 5).as("r_score"),
        Ranks.ntileFromRank(col("__rf"), col("__n"), 5).as("f_score"),
        Ranks.ntileFromRank(col("__rm"), col("__n"), 5).as("m_score"))
    },

    // Cohort lifetime value: customers cohorted by first-order month,
    // revenue accumulated by month age — the subscription-analytics
    // rollup behind every retention dashboard. Month indices are pure
    // integers (y·12+m), the cumulative sum is a window over the
    // bounded (cohort × age) grid, and cohort sizes ride a broadcast.
    QuerySpec(
      "q159_cohort_ltv",
      """WITH fo AS (
        |  SELECT o_custkey,
        |    min(year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT AS cm
        |  FROM orders GROUP BY 1
        |), sz AS (
        |  SELECT cm, count(*)::BIGINT AS n_customers FROM fo GROUP BY 1
        |), cell AS (
        |  SELECT cm,
        |    (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT - cm AS age,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev_c
        |  FROM orders JOIN fo USING (o_custkey)
        |  GROUP BY 1, 2
        |)
        |SELECT cm AS cohort_month, age AS age_months, n_customers, rev_c,
        |  CAST(sum(rev_c) OVER (PARTITION BY cm ORDER BY age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_rev_c
        |FROM cell JOIN sz USING (cm)""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val mIdx = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long")
      val fo = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(min(mIdx).as("cm"))
      val sz = fo.groupBy("cm").agg(count(lit(1)).as("n_customers"))
      val cell = Tables.orders(s, dir).join(fo, "o_custkey")
        .groupBy(col("cm"), (mIdx - col("cm")).as("age"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev_c"))
      cell.join(broadcast(sz), "cm")
        .select(col("cm").as("cohort_month"), col("age").as("age_months"),
          col("n_customers"), col("rev_c"),
          sum(col("rev_c")).over(Window.partitionBy("cm").orderBy("age")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("cum_rev_c"))
    },

    // Power-law (Pareto) exponent of the user activity distribution by
    // the continuous-approximation MLE α = 1 + n / Σ ln(k / (kmin−½)) —
    // the heavy-tail diagnostic behind skew-aware partitioning choices.
    // Per-user counts are exact; each ln term fix-points to nanos, so
    // the only double work after the scan is one division.
    QuerySpec(
      "q160_powerlaw_mle",
      """WITH k AS (
        |  SELECT user_id, count(*)::BIGINT AS k FROM events GROUP BY 1
        |), f AS (
        |  SELECT k FROM k WHERE k >= 5
        |), s AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(CAST(floor(ln(CAST(k AS DOUBLE) / 4.5) * 1000000000.0)
        |      AS BIGINT)) AS BIGINT) AS lsum_nano
        |  FROM f
        |)
        |SELECT n, lsum_nano,
        |  CAST(floor((1.0 + n / (CAST(lsum_nano AS DOUBLE) / 1000000000.0))
        |    * 1000000.0) AS BIGINT) AS alpha_micro
        |FROM s""".stripMargin) { (s, dir) =>
      val k = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("k"))
        .where(col("k") >= 5)
      val sums = k.agg(count(lit(1)).as("n"),
        sum(floor(log(col("k").cast("double") / 4.5) * 1000000000.0)
          .cast("long")).as("lsum_nano"))
      sums.select(col("n"), col("lsum_nano"),
        floor((lit(1.0) + col("n")
          / (col("lsum_nano").cast("double") / 1000000000.0)) * 1000000.0)
          .cast("long").as("alpha_micro"))
    },

    // Shannon entropy of each document's token distribution — the
    // repetition/diversity quality signal (low entropy = boilerplate or
    // keyword stuffing; complements tx13's repetition ratios). Per-token
    // −(c/n)·ln(c/n) terms fix-point to nanos before the per-doc sum, so
    // the token-histogram aggregation order is free.
    QuerySpec(
      "tx29_token_entropy",
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
        |  FROM documents
        |), hist AS (
        |  SELECT doc_id, tok, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2
        |), n_t AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |    count(*)::BIGINT AS n_distinct
        |  FROM hist GROUP BY 1
        |)
        |SELECT doc_id, max(n) AS n_tokens, max(n_distinct) AS n_distinct,
        |  CAST(-sum(CAST(floor((CAST(c AS DOUBLE) / n)
        |    * ln(CAST(c AS DOUBLE) / n) * 1000000000.0) AS BIGINT))
        |    AS BIGINT) AS entropy_nano
        |FROM hist JOIN n_t USING (doc_id)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val toks = Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
        .select(col("doc_id"),
          explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
      val hist = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val nT = hist.groupBy("doc_id")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
      def p = col("c").cast("double") / col("n")
      hist.join(nT, "doc_id")
        .groupBy("doc_id")
        .agg(max(col("n")).as("n_tokens"),
          max(col("n_distinct")).as("n_distinct"),
          (-sum(floor(p * log(p) * 1000000000.0).cast("long")))
            .as("entropy_nano"))
    },

    // Product-quantization ANN (Similarity.pqTopK): 8 subspaces × 8
    // dims, 16 deterministic codebook centroids (the first 16 vectors),
    // micro-fixed L2² argmin encoding, ADC partial-dot lookup scoring,
    // exact-cosine rerank — the middle rung of the quantization ladder
    // between ss9 (int8) and ss11 (binary), and like them FULLY oracled:
    // every quantity is either exact-integer or a micro-rounded double
    // both engines compute identically.
    QuerySpec(
      "ss12_ann_pq",
      """WITH cb AS (
        |  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16
        |), js AS (SELECT unnest(range(0, 8)) AS j),
        |cents AS (
        |  SELECT j, cid,
        |    list_transform(embedding[(j*8+1):(j*8+8)], x -> x::DOUBLE) AS cv
        |  FROM cb CROSS JOIN js
        |), q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |qsub AS (
        |  SELECT j, list_transform(qe[(j*8+1):(j*8+8)], x -> x::DOUBLE) AS qs
        |  FROM q CROSS JOIN js
        |), t AS (
        |  SELECT qsub.j, cid,
        |    CAST(floor(list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(range(1, 9), d -> qs[d] * cv[d])),
        |      (a, x) -> a + x) * 1000000.0 + 0.5) AS BIGINT) AS tval
        |  FROM qsub JOIN cents ON cents.j = qsub.j
        |), dsub AS (
        |  SELECT vec_id, js.j,
        |    list_transform(embedding[(js.j*8+1):(js.j*8+8)], x -> x::DOUBLE) AS sv
        |  FROM embeddings CROSS JOIN js
        |), enc0 AS (
        |  SELECT vec_id, dsub.j, cid,
        |    CAST(floor(list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(range(1, 9), d -> (sv[d] - cv[d]) * (sv[d] - cv[d]))),
        |      (a, x) -> a + x) * 1000000.0 + 0.5) AS BIGINT) AS dm
        |  FROM dsub JOIN cents ON cents.j = dsub.j
        |), enc AS (
        |  SELECT vec_id, j, cid AS code FROM (
        |    SELECT vec_id, j, cid,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dm, cid) AS rk
        |    FROM enc0) z
        |  WHERE rk = 1
        |), approx AS (
        |  SELECT vec_id, CAST(sum(tval) AS BIGINT) AS score
        |  FROM enc JOIN t ON t.j = enc.j AND t.cid = enc.code
        |  GROUP BY 1
        |), cand AS (
        |  SELECT vec_id FROM approx ORDER BY score DESC, vec_id LIMIT 50
        |)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(
        |    list_transform(e.embedding, x -> x::DOUBLE),
        |    (SELECT list_transform(qe, x -> x::DOUBLE) FROM q)), 6) AS sim
        |FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id
        |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      graft.operators.Similarity.pqTopK(
        emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "embedding",
        emb.where(col("vec_id") < 16), "vec_id",
        k = 10, cand = 50)
    },

    // IVF+PQ composed ANN (Similarity.ivfPqTopK) — the index shape
    // production vector stores actually ship (FAISS IVFxPQy): ss3's
    // coarse probe prunes the corpus to 2 of 8 label partitions, then
    // ss12's ADC scoring + exact rerank run over only the survivors
    // with the GLOBAL codebook. The stages multiply at scale: scan
    // nProbe/nlist of the corpus at m bytes per row. Oracle = the two
    // parents' CTEs composed, restricting the PQ encode to the probed
    // partitions — every step exact-integer or micro-rounded, so the
    // whole two-stage index replays bit-for-bit.
    QuerySpec(
      "ss14_ann_ivf_pq",
      """WITH d AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings
        |), c AS (
        |  SELECT label, i, sum(CAST(floor(v[i] * 1000000 + 0.5) AS BIGINT)) AS s,
        |    count(*) AS n
        |  FROM d, range(1, 65) t(i) GROUP BY 1, 2
        |), cent AS (
        |  SELECT label, list((CAST(s AS DOUBLE) / 1000000.0) / n ORDER BY i) AS cv
        |  FROM c GROUP BY label
        |), q0 AS (SELECT v AS qv FROM d WHERE vec_id = 0),
        |probe AS (
        |  SELECT label FROM cent, q0
        |  ORDER BY list_cosine_similarity(cv, qv) DESC, label LIMIT 2),
        |r AS (
        |  SELECT e.vec_id, e.embedding FROM embeddings e JOIN probe USING (label)),
        |cb AS (
        |  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16
        |), js AS (SELECT unnest(range(0, 8)) AS j),
        |cents AS (
        |  SELECT j, cid,
        |    list_transform(embedding[(j*8+1):(j*8+8)], x -> x::DOUBLE) AS cv
        |  FROM cb CROSS JOIN js
        |), q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |qsub AS (
        |  SELECT j, list_transform(qe[(j*8+1):(j*8+8)], x -> x::DOUBLE) AS qs
        |  FROM q CROSS JOIN js
        |), t AS (
        |  SELECT qsub.j, cid,
        |    CAST(floor(list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(range(1, 9), dd -> qs[dd] * cv[dd])),
        |      (a, x) -> a + x) * 1000000.0 + 0.5) AS BIGINT) AS tval
        |  FROM qsub JOIN cents ON cents.j = qsub.j
        |), dsub AS (
        |  SELECT vec_id, js.j,
        |    list_transform(embedding[(js.j*8+1):(js.j*8+8)], x -> x::DOUBLE) AS sv
        |  FROM r CROSS JOIN js
        |), enc0 AS (
        |  SELECT vec_id, dsub.j, cid,
        |    CAST(floor(list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(range(1, 9), dd -> (sv[dd] - cv[dd]) * (sv[dd] - cv[dd]))),
        |      (a, x) -> a + x) * 1000000.0 + 0.5) AS BIGINT) AS dm
        |  FROM dsub JOIN cents ON cents.j = dsub.j
        |), enc AS (
        |  SELECT vec_id, j, cid AS code FROM (
        |    SELECT vec_id, j, cid,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dm, cid) AS rk
        |    FROM enc0) z
        |  WHERE rk = 1
        |), approx AS (
        |  SELECT vec_id, CAST(sum(tval) AS BIGINT) AS score
        |  FROM enc JOIN t ON t.j = enc.j AND t.cid = enc.code
        |  GROUP BY 1
        |), cand AS (
        |  SELECT vec_id FROM approx ORDER BY score DESC, vec_id LIMIT 50
        |)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(
        |    list_transform(e.embedding, x -> x::DOUBLE),
        |    (SELECT list_transform(qe, x -> x::DOUBLE) FROM q)), 6) AS sim
        |FROM r e JOIN cand ON cand.vec_id = e.vec_id
        |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      graft.operators.Similarity.ivfPqTopK(
        emb, "vec_id", "embedding", "label",
        emb.where(col("vec_id") === 0), "embedding",
        emb.where(col("vec_id") < 16), "vec_id",
        k = 10, nProbe = 2, cand = 50)
    },

    // Streaming count-min sketch maintenance: the q143 cell-matrix build
    // lifted onto the event stream — a complete-mode groupBy over the
    // FIXED (row, bucket) key space, so the streaming state is exactly
    // the 4×64 sketch and each micro-batch folds in map-side-combined
    // increments. CMS increments are associative/commutative, so the
    // streamed sketch equals the batch sketch cell-for-cell — which is
    // precisely what the batch oracle asserts.
    QuerySpec(
      "st17_stream_cms",
      """SELECT hs.i AS i_row,
        |  CAST('0x' || substr(md5(hs.i || ':' || user_id), 1, 8) AS BIGINT)
        |    % 64 AS bucket,
        |  count(*)::BIGINT AS cnt
        |FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS i) hs
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = graft.streaming.Streams.eventsStream(s, dir)
      val cells = ev
        .select(col("user_id"), explode(sequence(lit(0), lit(3))).as("i"))
        .select(col("i").cast("long").as("i_row"),
          (conv(substring(md5(concat(col("i").cast("string"), lit(":"),
            col("user_id").cast("string")).cast("binary")), 1, 8), 16, 10)
            .cast("long") % 64).as("bucket"))
        .groupBy("i_row", "bucket")
        .agg(count(lit(1)).as("cnt"))
      graft.streaming.Streams.runToTable(cells, "st17_mem", "complete")
    },

    // Depth-1 decision tree (decision stump) on account balance
    // predicting the BUILDING segment: candidate thresholds are the
    // bounded 500-unit balance bins, split quality is weighted Gini
    // impurity from exact integer counts (micro-rounded only for the
    // final argmin), evaluated off a windowed cumulative histogram — one
    // fact-table pass, then constant work. The one-node tree is the
    // base learner a boosted ensemble would train distributedly.
    QuerySpec(
      "q161_decision_stump",
      """WITH pts AS (
        |  SELECT CAST(floor(c_acctbal / 500) AS BIGINT) AS bin,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS y
        |  FROM customer
        |), hist AS (
        |  SELECT bin, count(*)::BIGINT AS nb, CAST(sum(y) AS BIGINT) AS pb
        |  FROM pts GROUP BY 1
        |), cum AS (
        |  SELECT bin,
        |    CAST(coalesce(sum(nb) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS nl,
        |    CAST(coalesce(sum(pb) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS pl
        |  FROM hist
        |), tot AS (
        |  SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(pb) AS BIGINT) AS pos
        |  FROM hist
        |), scored AS (
        |  SELECT bin, nl, n - nl AS nr,
        |    CAST(floor(
        |      (2.0 * pl * (nl - pl) / greatest(nl, 1)
        |        + 2.0 * (pos - pl) * ((n - nl) - (pos - pl)) / greatest(n - nl, 1))
        |      / n * 1000000.0) AS BIGINT) AS imp_micro,
        |    CAST(floor(2.0 * pos * (n - pos) / n / n * 1000000.0) AS BIGINT)
        |      AS base_micro
        |  FROM cum CROSS JOIN tot
        |)
        |SELECT bin AS threshold_bin, bin * 50000 AS threshold_c,
        |  nl AS n_left, nr AS n_right, imp_micro, base_micro
        |FROM (
        |  SELECT *, row_number() OVER (ORDER BY imp_micro, bin) AS rk
        |  FROM scored) z
        |WHERE rk = 1""".stripMargin) { (s, dir) =>
      import graft.operators.{Dedup, Ranks}
      val pts = Tables.customer(s, dir).select(
        floor(col("c_acctbal") / 500).cast("long").as("bin"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("y"))
      val hist = Dedup.stage(pts.groupBy("bin")
        .agg(count(lit(1)).as("nb"), sum(col("y")).as("pb")))
      // Strict-prefix counts = one shared inclusive Ranks.prefixSums
      // pass minus the current row — no global window over the bin grid
      // (bounded today, unbounded if the feature domain is continuous).
      val cum = Ranks.prefixSums(hist, Seq(col("bin")),
          Seq((col("nb"), "__cn"), (col("pb"), "__cp")))
        .select(col("bin"),
          (col("__cn") - col("nb")).as("nl"),
          (col("__cp") - col("pb")).as("pl"))
      val tot = hist.agg(sum(col("nb")).as("n"), sum(col("pb")).as("pos"))
      val scored = cum.crossJoin(broadcast(tot)).select(
        col("bin"), col("nl"), (col("n") - col("nl")).as("nr"),
        floor((lit(2.0) * col("pl") * (col("nl") - col("pl"))
            / greatest(col("nl"), lit(1L))
          + lit(2.0) * (col("pos") - col("pl"))
            * ((col("n") - col("nl")) - (col("pos") - col("pl")))
            / greatest(col("n") - col("nl"), lit(1L)))
          / col("n") * 1000000.0).cast("long").as("imp_micro"),
        floor(lit(2.0) * col("pos") * (col("n") - col("pos"))
          / col("n") / col("n") * 1000000.0).cast("long").as("base_micro"))
      // Global argmin via sort+limit — plans as TakeOrderedAndProject
      // (per-partition top-1, merged on the driver), not a
      // single-partition window sort.
      scored.orderBy(col("imp_micro"), col("bin")).limit(1)
        .select(col("bin").as("threshold_bin"),
          (col("bin") * 50000).as("threshold_c"),
          col("nl").as("n_left"), col("nr").as("n_right"),
          col("imp_micro"), col("base_micro"))
    },

    // Mutual information between customer segment and order priority
    // (plus both marginal entropies) — the information-theoretic
    // companion to q154's chi-square, from the same contingency
    // machinery: exact integer counts, per-cell nano fixed points, and
    // bounded (≤25-term) sums.
    QuerySpec(
      "q162_mutual_information",
      """WITH joined AS (
        |  SELECT c_mktsegment AS seg, o_orderpriority AS pri
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), cells AS (
        |  SELECT seg, pri, count(*)::BIGINT AS o FROM joined GROUP BY 1, 2
        |), rt AS (SELECT seg, CAST(sum(o) AS BIGINT) AS ri FROM cells GROUP BY 1),
        |ct AS (SELECT pri, CAST(sum(o) AS BIGINT) AS cj FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |mi AS (
        |  SELECT CAST(sum(CAST(floor((CAST(o AS DOUBLE) / n)
        |    * ln((CAST(o AS DOUBLE) / n)
        |      / ((CAST(ri AS DOUBLE) / n) * (CAST(cj AS DOUBLE) / n)))
        |    * 1000000000.0) AS BIGINT)) AS BIGINT) AS mi_nano
        |  FROM cells JOIN rt USING (seg) JOIN ct USING (pri) CROSS JOIN tot
        |), hs AS (
        |  SELECT CAST(-sum(CAST(floor((CAST(ri AS DOUBLE) / n)
        |    * ln(CAST(ri AS DOUBLE) / n) * 1000000000.0) AS BIGINT)) AS BIGINT)
        |    AS h_seg_nano
        |  FROM rt CROSS JOIN tot
        |), hp AS (
        |  SELECT CAST(-sum(CAST(floor((CAST(cj AS DOUBLE) / n)
        |    * ln(CAST(cj AS DOUBLE) / n) * 1000000000.0) AS BIGINT)) AS BIGINT)
        |    AS h_pri_nano
        |  FROM ct CROSS JOIN tot
        |)
        |SELECT (SELECT n FROM tot) AS n, mi_nano, h_seg_nano, h_pri_nano
        |FROM mi CROSS JOIN hs CROSS JOIN hp""".stripMargin) { (s, dir) =>
      val joined = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      val cells = joined.groupBy("seg", "pri").agg(count(lit(1)).as("o"))
      val rt = cells.groupBy("seg").agg(sum(col("o")).as("ri"))
      val ct = cells.groupBy("pri").agg(sum(col("o")).as("cj"))
      val tot = cells.agg(sum(col("o")).as("n"))
      def po = col("o").cast("double") / col("n")
      def pi = col("ri").cast("double") / col("n")
      def pj = col("cj").cast("double") / col("n")
      val mi = cells.join(broadcast(rt), "seg").join(broadcast(ct), "pri")
        .crossJoin(broadcast(tot))
        .agg(sum(floor(po * log(po / (pi * pj)) * 1000000000.0).cast("long"))
          .as("mi_nano"))
      val hs = rt.crossJoin(broadcast(tot))
        .agg((-sum(floor(pi * log(pi) * 1000000000.0).cast("long")))
          .as("h_seg_nano"))
      val hp = ct.crossJoin(broadcast(tot))
        .agg((-sum(floor(pj * log(pj) * 1000000000.0).cast("long")))
          .as("h_pri_nano"))
      tot.select(col("n")).crossJoin(mi).crossJoin(hs).crossJoin(hp)
    },

    // ROC AUC of "balance predicts BUILDING membership" via the
    // rank-sum identity AUC = U/(n₁n₂) — the model-evaluation metric on
    // q153's exact-integer machinery (doubled tie-average ranks over the
    // distinct-score table), so the only double is the final division.
    QuerySpec(
      "q163_roc_auc",
      """WITH src AS (
        |  SELECT CAST(floor(c_acctbal * 100) AS BIGINT) AS v,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
        |  FROM customer
        |), vals AS (
        |  SELECT v, count(*)::BIGINT AS c, CAST(sum(g1) AS BIGINT) AS c1
        |  FROM src GROUP BY 1
        |), ranked AS (
        |  SELECT v, c, c1,
        |    2 * (CAST(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - c + 1) + c - 1 AS ar2
        |  FROM vals
        |), agg AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c - c1) AS BIGINT) AS n2,
        |    CAST(sum(c1 * ar2) AS BIGINT) AS r1_x2
        |  FROM ranked
        |)
        |SELECT n1, n2,
        |  CAST(floor(CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE)
        |    / (2.0 * n1 * n2) * 1000000.0) AS BIGINT) AS auc_micro
        |FROM agg""".stripMargin) { (s, dir) =>
      import graft.operators.Ranks
      val src = Tables.customer(s, dir).select(
        floor(col("c_acctbal") * 100).cast("long").as("v"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("g1"))
      val vals = src.groupBy("v")
        .agg(count(lit(1)).as("c"), sum(col("g1")).as("c1"))
      // Rank-sum prefix via Ranks.prefixSums — no global window over
      // the distinct-score grid (q153's scale rationale).
      val ranked = Ranks.prefixSums(vals, Seq(col("v")),
          Seq((col("c"), "__cum")))
        .withColumn("ar2",
          lit(2) * (col("__cum") - col("c") + 1) + col("c") - 1)
      ranked.agg(
        sum(col("c1")).as("n1"), sum(col("c") - col("c1")).as("n2"),
        sum(col("c1") * col("ar2")).as("r1_x2"))
        .select(col("n1"), col("n2"),
          floor((col("r1_x2") - col("n1") * (col("n1") + 1)).cast("double")
            / (lit(2.0) * col("n1") * col("n2")) * 1000000.0)
            .cast("long").as("auc_micro"))
    },

    // Two-sample Kolmogorov–Smirnov statistic between view and purchase
    // event values: D = max |F₁−F₂| over the distinct-value grid,
    // computed cross-multiplied (|c₁cum·n₂ − c₂cum·n₁|) so the max runs
    // on exact integers — the distribution-shape drift test beside
    // q157's binned PSI. One fact pass, then windows over distinct
    // values only.
    QuerySpec(
      "q164_ks_test",
      """WITH src AS (
        |  SELECT CAST(floor(value * 100) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |), vals AS (
        |  SELECT v, CAST(sum(g1) AS BIGINT) AS c1,
        |    CAST(sum(1 - g1) AS BIGINT) AS c2
        |  FROM src GROUP BY 1
        |), cum AS (
        |  SELECT v,
        |    CAST(sum(c1) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
        |    CAST(sum(c2) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f2
        |  FROM vals
        |), tot AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
        |  FROM vals
        |)
        |SELECT n1, n2,
        |  CAST(max(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS d_num,
        |  CAST(floor(CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * n2) * 1000000.0) AS BIGINT) AS ks_micro
        |FROM cum CROSS JOIN tot GROUP BY n1, n2""".stripMargin) { (s, dir) =>
      import graft.operators.{Dedup, Ranks}
      val src = Tables.events(s, dir)
        .where(col("event_type").isin("view", "purchase"))
        .select(floor(col("value") * 100).cast("long").as("v"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("g1"))
      val vals = Dedup.stage(src.groupBy("v")
        .agg(sum(col("g1")).as("c1"), sum(lit(1L) - col("g1")).as("c2")))
      // Both CDFs ride ONE Ranks.prefixSums pass (shared bucketing +
      // window) — no single-partition sort over the value grid.
      val cum = Ranks.prefixSums(vals, Seq(col("v")),
          Seq((col("c1"), "f1"), (col("c2"), "f2")))
        .select(col("v"), col("f1"), col("f2"))
      val tot = vals.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      cum.crossJoin(broadcast(tot))
        .groupBy("n1", "n2")
        .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1"))).as("d_num"),
          floor(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
            .cast("double") / (col("n1").cast("double") * col("n2"))
            * 1000000.0).cast("long").as("ks_micro"))
    },

    // Classical seasonal decomposition of the daily-revenue series:
    // trend = centered 7-day moving average (full windows only),
    // detrended residual averaged per weekday = the seasonal component,
    // remainder = what's left — the pre-model diagnostic for q149's
    // Holt–Winters. Micro-cent longs end-to-end: the only doubles are
    // the /7 and per-dow mean divisions, floored identically; weekday
    // uses the portable epoch-day formula (q133) on both engines.
    QuerySpec(
      "q165_seasonal_decompose",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    (epoch(o_orderdate)::BIGINT // 86400 + 4) % 7 AS dow,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2
        |), tr AS (
        |  SELECT d, dow, cents,
        |    CASE WHEN count(*) OVER w7 = 7 THEN
        |      CAST(floor(CAST(sum(cents) OVER w7 AS DOUBLE) / 7.0 * 1000000.0)
        |        AS BIGINT)
        |    END AS trend_mc
        |  FROM daily
        |  WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), det AS (
        |  SELECT d, dow, cents, trend_mc,
        |    cents * 1000000 - trend_mc AS resid0_mc
        |  FROM tr WHERE trend_mc IS NOT NULL
        |), seas AS (
        |  SELECT dow, CAST(floor(CAST(sum(resid0_mc) AS DOUBLE) / count(*))
        |    AS BIGINT) AS seasonal_mc
        |  FROM det GROUP BY 1
        |)
        |SELECT d, cents, trend_mc, seasonal_mc,
        |  resid0_mc - seasonal_mc AS resid_mc
        |FROM det JOIN seas USING (dow)""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val days = floor(unix_micros(col("o_orderdate").cast("timestamp"))
        / 86400000000.0).cast("long")
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"),
          pmod(days + 4, lit(7L)).as("dow"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val w7 = Window.orderBy("d").rowsBetween(-3, 3)
      val tr = daily.select(col("d"), col("dow"), col("cents"),
        when(count(lit(1)).over(w7) === 7,
          floor(sum(col("cents")).over(w7).cast("double") / 7.0 * 1000000.0)
            .cast("long")).as("trend_mc"))
      val det = tr.where(col("trend_mc").isNotNull)
        .select(col("d"), col("dow"), col("cents"), col("trend_mc"),
          (col("cents") * 1000000 - col("trend_mc")).as("resid0_mc"))
      val seas = det.groupBy("dow")
        .agg(floor(sum(col("resid0_mc")).cast("double") / count(lit(1)))
          .cast("long").as("seasonal_mc"))
      det.join(broadcast(seas), "dow")
        .select(col("d"), col("cents"), col("trend_mc"), col("seasonal_mc"),
          (col("resid0_mc") - col("seasonal_mc")).as("resid_mc"))
    },

    // Deterministic negative sampling for recommender training pairs:
    // each ordering customer draws 10 md5-seeded candidate parts,
    // drops any they actually bought (anti-join against the positives),
    // and keeps the first 3 survivors by draw index — the
    // (user, item⁻) generator every contrastive trainer needs, with
    // engine-portable pseudo-randomness instead of an RNG. Positives
    // and candidates shuffle on the same (cust, part) key; the draw
    // explosion is narrow map work.
    QuerySpec(
      "q166_negative_sampling",
      """WITH pos AS (
        |  SELECT DISTINCT o_custkey, l_partkey
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), cust AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |), cand AS (
        |  SELECT o_custkey, hs.j,
        |    CAST('0x' || substr(md5(o_custkey || '#' || hs.j), 1, 8) AS BIGINT)
        |      % 2000 AS part_neg
        |  FROM cust CROSS JOIN (SELECT unnest(range(0, 10)) AS j) hs
        |), neg AS (
        |  SELECT o_custkey, j, part_neg FROM cand
        |  WHERE NOT EXISTS (SELECT 1 FROM pos
        |    WHERE pos.o_custkey = cand.o_custkey
        |      AND pos.l_partkey = cand.part_neg)
        |)
        |SELECT o_custkey, part_neg, rk FROM (
        |  SELECT o_custkey, part_neg,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY j)::BIGINT AS rk
        |  FROM neg) z
        |WHERE rk <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val pos = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select("o_custkey", "l_partkey").distinct()
      val cust = Tables.orders(s, dir).select("o_custkey").distinct()
      val cand = cust
        .select(col("o_custkey"), explode(sequence(lit(0), lit(9))).as("j"))
        .select(col("o_custkey"), col("j"),
          (conv(substring(md5(concat(col("o_custkey").cast("string"), lit("#"),
            col("j").cast("string")).cast("binary")), 1, 8), 16, 10)
            .cast("long") % 2000).as("part_neg"))
      val neg = cand.join(pos,
        cand("o_custkey") === pos("o_custkey")
          && col("part_neg") === col("l_partkey"), "left_anti")
      neg
        .withColumn("rk", row_number().over(
          Window.partitionBy("o_custkey").orderBy("j")).cast("long"))
        .where(col("rk") <= 3)
        .select("o_custkey", "part_neg", "rk")
    },

    // Target-leakage screen: Pearson correlation of every candidate
    // feature against the target in ONE unpivoted pass — the
    // pre-training sanity check that catches a feature that IS the
    // label. All five sums per feature are exact integers; the r
    // formula is the cross-multiplied one (no means), evaluated
    // identically, and |r| > 0.5 flags the leak. Quantity correlates
    // with extended price by construction — the planted leak the
    // screen must find.
    QuerySpec(
      "q167_leakage_screen",
      """WITH f AS (
        |  SELECT CAST(floor(l_extendedprice) AS BIGINT) AS y,
        |    CAST(floor(l_quantity) AS BIGINT) AS q,
        |    CAST(floor(l_discount * 100) AS BIGINT) AS d,
        |    CAST(floor(l_tax * 100) AS BIGINT) AS t
        |  FROM lineitem
        |), u AS (
        |  SELECT 'quantity' AS feature, q AS x, y FROM f
        |  UNION ALL SELECT 'discount', d, y FROM f
        |  UNION ALL SELECT 'tax', t, y FROM f
        |), s AS (
        |  SELECT feature, count(*)::BIGINT AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM u GROUP BY 1
        |)
        |SELECT feature,
        |  CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        |    * 1000000.0) AS BIGINT) AS r_micro,
        |  CAST(CASE WHEN abs((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) > 0.5
        |    THEN 1 ELSE 0 END AS BIGINT) AS leak_flag
        |FROM s""".stripMargin) { (s, dir) =>
      val f = Tables.lineitem(s, dir).select(
        floor(col("l_extendedprice")).cast("long").as("y"),
        floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_discount") * 100).cast("long").as("d"),
        floor(col("l_tax") * 100).cast("long").as("t"))
      val u = f.select(expr(
        "stack(3, 'quantity', q, 'discount', d, 'tax', t) AS (feature, x)"),
        col("y"))
      val sums = u.groupBy("feature").agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      def D(c: String) = col(c).cast("double")
      val r = (D("n") * col("sxy") - D("sx") * col("sy")) /
        sqrt((D("n") * col("sxx") - D("sx") * col("sx"))
          * (D("n") * col("syy") - D("sy") * col("sy")))
      sums.select(col("feature"),
        floor(r * 1000000.0).cast("long").as("r_micro"),
        when(abs(r) > 0.5, 1L).otherwise(0L).as("leak_flag"))
    },

    // Weighted quantiles (p25 / median / p75 of price, weighted by
    // quantity, per return flag) — the aggregate Spark lacks natively,
    // built the scale-correct way: weights collapse onto the DISTINCT
    // value grid first (map-side combinable), a cumulative window runs
    // over that bounded grid, and each quantile is the first value whose
    // cross-multiplied cumulative weight crosses the target — exact
    // integers end to end, no interpolation ambiguity.
    QuerySpec(
      "q168_weighted_median",
      """WITH v AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS p_c,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2
        |), cum AS (
        |  SELECT flag, p_c, w,
        |    CAST(sum(w) OVER (PARTITION BY flag ORDER BY p_c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cw,
        |    CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
        |  FROM v
        |)
        |SELECT flag, max(tw) AS total_w,
        |  min(CASE WHEN 4 * cw >= tw THEN p_c END) AS wp25_c,
        |  min(CASE WHEN 2 * cw >= tw THEN p_c END) AS wmedian_c,
        |  min(CASE WHEN 4 * cw >= 3 * tw THEN p_c END) AS wp75_c
        |FROM cum GROUP BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100).cast("long").as("p_c"))
        .agg(sum(floor(col("l_quantity")).cast("long")).as("w"))
      val cum = v.select(col("flag"), col("p_c"), col("w"),
        sum(col("w")).over(Window.partitionBy("flag").orderBy("p_c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cw"),
        sum(col("w")).over(Window.partitionBy("flag")).as("tw"))
      cum.groupBy("flag").agg(
        max(col("tw")).as("total_w"),
        min(when(lit(4) * col("cw") >= col("tw"), col("p_c"))).as("wp25_c"),
        min(when(lit(2) * col("cw") >= col("tw"), col("p_c"))).as("wmedian_c"),
        min(when(lit(4) * col("cw") >= lit(3) * col("tw"), col("p_c")))
          .as("wp75_c"))
    },

    // Funnel latency: for every purchase, the latest view by the same
    // user at-or-before it (Relational.asofJoin — the q29 operator
    // composed into the product-analytics question), then each user's
    // conversion count and exact lower-median view→purchase latency in
    // whole seconds. The as-of union-and-carry shuffles once on the
    // user key; the median indexes a per-user sorted latency array
    // (bounded by that user's conversions).
    QuerySpec(
      "q169_funnel_latency",
      """WITH p AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep
        |  FROM events WHERE event_type = 'purchase'
        |), v AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep
        |  FROM events WHERE event_type = 'view'
        |), j AS (
        |  SELECT p.user_id, p.ep - v.ep AS lat
        |  FROM p ASOF JOIN v ON p.user_id = v.user_id AND v.ep <= p.ep
        |), g AS (
        |  SELECT user_id, count(*)::BIGINT AS n_conv,
        |    list(lat ORDER BY lat) AS ls
        |  FROM j GROUP BY 1
        |)
        |SELECT user_id, n_conv,
        |  ls[((n_conv + 1) // 2)::INT] AS med_lat_sec
        |FROM g""".stripMargin) { (s, dir) =>
      val ep = col("ts").cast("timestamp").cast("long")
      val ev = Tables.events(s, dir)
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), ep.as("ep"))
      // The right time rides twice: once as the as-of ordering key, once
      // as a payload column (asofJoin only carries payload columns out).
      val v = ev.where(col("event_type") === "view")
        .select(col("user_id"), ep.as("vep"), ep.as("view_ep"))
      val j = graft.operators.Relational.asofJoin(
        p, "user_id", "ep", v, "user_id", "vep")
        .where(col("view_ep").isNotNull)
        .select(col("user_id"), (col("ep") - col("view_ep")).as("lat"))
      j.groupBy("user_id")
        .agg(count(lit(1)).as("n_conv"),
          sort_array(collect_list(col("lat"))).as("ls"))
        .select(col("user_id"), col("n_conv"),
          element_at(col("ls"), ((col("n_conv") + 1) / 2).cast("int"))
            .as("med_lat_sec"))
    },

    // Join-size estimation by count-min inner product (the AGMS/CMS
    // query-planner trick): the self-join size Σc(k)² of lineitem on
    // suppkey, estimated as min over hash rows of Σ_b cell[b]² from the
    // q143 sketch — two constant-size sketch scans instead of the
    // O(distinct keys) exact histogram, and the planner-grade
    // overestimate is the row-collision term the output quantifies.
    QuerySpec(
      "q170_cms_join_size",
      """WITH cells AS (
        |  SELECT hs.i AS ci,
        |    CAST('0x' || substr(md5(hs.i || ':' || l_suppkey), 1, 8) AS BIGINT)
        |      % 64 AS b, count(*)::BIGINT AS cnt
        |  FROM lineitem CROSS JOIN (SELECT unnest(range(0, 4)) AS i) hs
        |  GROUP BY 1, 2
        |), est AS (
        |  SELECT min(s)::BIGINT AS est_size FROM (
        |    SELECT ci, CAST(sum(cnt * cnt) AS BIGINT) AS s
        |    FROM cells GROUP BY 1) z
        |), truth AS (
        |  SELECT CAST(sum(c * c) AS BIGINT) AS true_size FROM (
        |    SELECT l_suppkey, count(*)::BIGINT AS c FROM lineitem GROUP BY 1) z
        |)
        |SELECT true_size, est_size, est_size - true_size AS over_size,
        |  CAST(floor(10000.0 * est_size / true_size) AS BIGINT) AS ratio_bp
        |FROM truth CROSS JOIN est""".stripMargin) { (s, dir) =>
      def h(i: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(i.cast("string"), lit(":"),
          key.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long") % 64
      val cells = Tables.lineitem(s, dir)
        .select(col("l_suppkey"), explode(sequence(lit(0), lit(3))).as("i"))
        .groupBy(col("i").as("ci"), h(col("i"), col("l_suppkey")).as("b"))
        .agg(count(lit(1)).as("cnt"))
      val est = cells.groupBy("ci").agg(sum(col("cnt") * col("cnt")).as("s"))
        .agg(min(col("s")).as("est_size"))
      val truth = Tables.lineitem(s, dir).groupBy("l_suppkey")
        .agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("true_size"))
      truth.crossJoin(est).select(col("true_size"), col("est_size"),
        (col("est_size") - col("true_size")).as("over_size"),
        floor(lit(10000.0) * col("est_size") / col("true_size"))
          .cast("long").as("ratio_bp"))
    },

    // Deterministic random walks over the user graph (the node2vec /
    // DeepWalk sequence generator): 5 md5-seeded steps from each of the
    // first 50 nodes, each step indexing into the SORTED neighbor list
    // — engine-portable pseudo-randomness in place of an RNG, so the
    // oracle replays every walk. Spark folds the walk inside one row
    // against a broadcast adjacency map (nodes are bounded; edges never
    // leave their aggregation); the oracle carries paths through a
    // recursive CTE over the same adjacency arrays.
    QuerySpec(
      "q171_random_walks",
      """WITH RECURSIVE nodes AS (
        |  SELECT row_number() OVER (ORDER BY user_id) - 1 AS r
        |  FROM (SELECT DISTINCT user_id FROM events)
        |), params AS (SELECT count(*)::BIGINT AS n FROM nodes),
        |eraw AS (
        |  SELECT r AS x, (r * 31 + 7) % n AS y FROM nodes, params
        |  UNION ALL SELECT r, (r + 1) % n FROM nodes, params
        |), e AS (SELECT DISTINCT u, v FROM (
        |  SELECT x AS u, y AS v FROM eraw WHERE x <> y
        |  UNION ALL SELECT y, x FROM eraw WHERE x <> y)
        |), adj_t AS (
        |  SELECT list(coalesce(a.vs, []) ORDER BY nd.r) AS adj
        |  FROM nodes nd LEFT JOIN (
        |    SELECT u, list(v ORDER BY v) AS vs FROM e GROUP BY u) a ON a.u = nd.r
        |), walks AS (
        |  SELECT r AS start, 0 AS t, [r] AS path FROM nodes WHERE r < 50
        |  UNION ALL
        |  SELECT start, t + 1, list_append(path,
        |    adj[(path[len(path)] + 1)::INT][
        |      (CAST('0x' || substr(md5(start || ':' || (t + 1) || ':'
        |          || path[len(path)]), 1, 8) AS BIGINT)
        |        % len(adj[(path[len(path)] + 1)::INT]) + 1)::INT])
        |  FROM walks, adj_t WHERE t < 5
        |)
        |SELECT start, array_to_string(path, '>') AS path_str,
        |  path[6] AS end_node
        |FROM walks WHERE t = 5""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val (ranked, n) = graft.operators.Graph.stagedUserNodes(s, dir)
      val eraw = ranked
        .select(col("r").as("x"), ((col("r") * 31 + 7) % n).as("y"))
        .union(ranked.select(col("r").as("x"), ((col("r") + 1) % n).as("y")))
        .where(col("x") =!= col("y"))
      val e = eraw.select(col("x").as("u"), col("y").as("v"))
        .union(eraw.select(col("y").as("u"), col("x").as("v")))
        .distinct()
      val adjMap = e.groupBy("u")
        .agg(sort_array(collect_list(col("v"))).as("vs"))
        .agg(map_from_entries(collect_list(struct(col("u"), col("vs"))))
          .as("adjmap"))
      val walk = aggregate(sequence(lit(1), lit(5)),
        array(col("start")),
        (acc, i) => {
          val u = element_at(acc, size(acc))
          val neigh = element_at(col("adjmap"), u)
          val h = conv(substring(md5(concat(
            element_at(acc, 1).cast("string"), lit(":"), i.cast("string"),
            lit(":"), u.cast("string")).cast("binary")), 1, 8), 16, 10)
            .cast("long")
          concat(acc, array(element_at(neigh,
            (pmod(h, size(neigh).cast("long")) + 1).cast("int"))))
        })
      ranked.where(col("r") < 50).select(col("r").as("start"))
        .crossJoin(broadcast(adjMap))
        .select(col("start"), walk.as("path"))
        .select(col("start"),
          array_join(transform(col("path"), x => x.cast("string")), ">")
            .as("path_str"),
          element_at(col("path"), 6).as("end_node"))
    },

    // l-diversity audit — k-anonymity's (q114) companion: within each
    // quasi-identifier class, how many DISTINCT sensitive values
    // (balance bands) appear; a class can be k-anonymous yet leak when
    // every member shares one sensitive value. One aggregation at QI
    // granularity, integer everywhere.
    QuerySpec(
      "q172_l_diversity",
      """WITH q AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sens
        |  FROM customer
        |)
        |SELECT c_nationkey, c_mktsegment,
        |  count(*)::BIGINT AS class_size,
        |  count(DISTINCT sens)::BIGINT AS l_distinct,
        |  CAST(CASE WHEN count(DISTINCT sens) < 3 THEN 1 ELSE 0 END AS BIGINT)
        |    AS violates_l3
        |FROM q GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("sens"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("class_size"),
          count_distinct(col("sens")).as("l_distinct"),
          when(count_distinct(col("sens")) < 3, 1L).otherwise(0L)
            .as("violates_l3"))
    },

    // Rolling-origin BACKTEST — the forecast-evaluation harness the
    // time-series family (q118 EWMA, q129 Holt, q149 Holt-Winters) has
    // no scorecard for: at each origin day d ≥ 7, "train" = the
    // trailing-7-day mean of daily revenue strictly before d, "test" =
    // day d's actual; emit per-origin absolute error and APE basis
    // points. The whole backtest is ONE window over the day-grain
    // aggregate (30 rows here; calendar-bounded at any SF) — the raw
    // events are touched once to build the series, never per origin.
    // Forecast floors to cents so both engines round identically.
    QuerySpec(
      "q207_rolling_backtest",
      """WITH d0 AS (SELECT min(ts) AS t0 FROM events),
        |daily AS (
        |  SELECT CAST(date_diff('day', (SELECT CAST(t0 AS DATE) FROM d0),
        |      CAST(ts AS DATE)) AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS actual_c
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT day, actual_c,
        |    CAST(sum(actual_c) OVER (ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s7,
        |    count(*) OVER (ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n7
        |  FROM daily)
        |SELECT day, actual_c,
        |  CAST(floor(CAST(s7 AS DOUBLE) / n7 + 0.5) AS BIGINT) AS forecast_c,
        |  abs(actual_c - CAST(floor(CAST(s7 AS DOUBLE) / n7 + 0.5) AS BIGINT))
        |    AS abs_err_c,
        |  CAST(floor(abs(actual_c
        |      - CAST(floor(CAST(s7 AS DOUBLE) / n7 + 0.5) AS BIGINT))
        |    * 10000.0 / actual_c + 0.5) AS BIGINT) AS ape_bp
        |FROM w WHERE n7 = 7""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val t0 = ev.agg(min(col("ts")).as("t0"))
        .select(col("t0").cast("date").as("d0"))
      val daily = ev.crossJoin(t0)
        .groupBy(datediff(col("ts").cast("date"), col("d0")).cast("long")
          .as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("actual_c"))
      val w = Window.orderBy("day").rowsBetween(-7, -1)
      val fc = floor(col("s7").cast("double") / col("n7") + 0.5).cast("long")
      daily.select(col("day"), col("actual_c"),
          sum(col("actual_c")).over(w).as("s7"),
          count(lit(1)).over(w).as("n7"))
        .where(col("n7") === 7)
        .select(col("day"), col("actual_c"), fc.as("forecast_c"),
          abs(col("actual_c") - fc).as("abs_err_c"),
          floor(abs(col("actual_c") - fc) * 10000.0 / col("actual_c") + 0.5)
            .cast("long").as("ape_bp"))
    },

    // t-closeness audit — completes the release-audit ladder (q114
    // k-anonymity: class size; q172 l-diversity: distinct sensitive
    // values; here: DISTRIBUTION distance): a class can be k-anonymous
    // AND l-diverse yet still leak when its sensitive-value distribution
    // skews far from the corpus's. Distance is the ordered-categorical
    // EMD (Σ|cumulative p−q| / (b−1)) over balance bands. Per-band
    // |cum| is fixed-pointed to 1e-7 units BEFORE the per-class sum so
    // the only cross-row double addition is over exact integers —
    // aggregation order cannot move the result. The band grid and band
    // count are derived from data (broadcast ≤ a dozen rows), the
    // cumsum window is partitioned per class over that bounded grid —
    // nothing here grows with row count except the two aggregations.
    QuerySpec(
      "q199_t_closeness",
      """WITH q AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
        |  FROM customer),
        |cc AS (SELECT c_nationkey, c_mktsegment, band, count(*)::BIGINT AS cnt
        |       FROM q GROUP BY 1, 2, 3),
        |ct AS (SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n
        |       FROM q GROUP BY 1, 2),
        |gc AS (SELECT band, count(*)::BIGINT AS g FROM q GROUP BY 1),
        |gt AS (SELECT count(*)::BIGINT AS big_n, count(DISTINCT band)::BIGINT
        |         AS nb FROM q),
        |grid AS (
        |  SELECT ct.c_nationkey, ct.c_mktsegment, ct.n, gc.band, gc.g,
        |    coalesce(cc.cnt, 0) AS cnt
        |  FROM ct CROSS JOIN gc
        |  LEFT JOIN cc ON cc.c_nationkey = ct.c_nationkey
        |    AND cc.c_mktsegment = ct.c_mktsegment AND cc.band = gc.band),
        |cum AS (
        |  SELECT c_nationkey, c_mktsegment, n,
        |    CAST(floor(abs(sum(CAST(cnt AS DOUBLE) / n
        |        - CAST(g AS DOUBLE) / (SELECT big_n FROM gt))
        |      OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY band
        |            ROWS UNBOUNDED PRECEDING)) * 10000000 + 0.5) AS BIGINT)
        |      AS icum
        |  FROM grid)
        |SELECT c_nationkey, c_mktsegment, n,
        |  CAST(floor(CAST(sum(icum) AS DOUBLE)
        |    / ((SELECT nb FROM gt) - 1) / 1000.0 + 0.5) AS BIGINT) AS emd_bp,
        |  CAST(CASE WHEN floor(CAST(sum(icum) AS DOUBLE)
        |    / ((SELECT nb FROM gt) - 1) / 1000.0 + 0.5) > 2000 THEN 1 ELSE 0 END
        |    AS BIGINT) AS violates_t02
        |FROM cum GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val q = Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
      val cc = q.groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("cnt"))
      val ct = q.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val gc = q.groupBy("band").agg(count(lit(1)).as("g"))
      val gt = q.agg(count(lit(1)).as("big_n"),
        count_distinct(col("band")).as("nb"))
      val grid = ct.crossJoin(broadcast(gc))
        .join(cc, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .crossJoin(broadcast(gt))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"), col("band"),
          col("g"), coalesce(col("cnt"), lit(0L)).as("cnt"),
          col("big_n"), col("nb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey", "c_mktsegment").orderBy("band")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cum = grid.select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        col("nb"),
        floor(abs(sum(col("cnt").cast("double") / col("n")
          - col("g").cast("double") / col("big_n")).over(w)) * 10000000 + 0.5)
          .cast("long").as("icum"))
      val emd = floor(sum(col("icum")).cast("double")
        / (max(col("nb")) - 1) / 1000.0 + 0.5).cast("long")
      cum.groupBy("c_nationkey", "c_mktsegment", "n")
        .agg(emd.as("emd_bp"),
          when(emd > 2000, 1L).otherwise(0L).as("violates_t02"))
    },

    // Differentially-private-style histogram release: per-segment
    // counts plus Laplace(b=10) noise drawn by inverse-CDF from an
    // md5-seeded uniform — the engine-portable stand-in for an RNG
    // (same portable-randomness contract as q166's sampler), so the
    // "noise" is deterministic and the oracle replays it. The pattern
    // is the real one: noise derives from the released key alone,
    // never from row data.
    QuerySpec(
      "q173_dp_noise",
      """WITH h AS (
        |  SELECT c_mktsegment AS seg, count(*)::BIGINT AS n
        |  FROM customer GROUP BY 1
        |), u AS (
        |  SELECT seg, n,
        |    (CAST('0x' || substr(md5(seg), 1, 8) AS BIGINT) % 1000000 + 0.5)
        |      / 1000000.0 AS uni
        |  FROM h
        |)
        |SELECT seg, n,
        |  CAST(floor(n + (CASE WHEN uni < 0.5 THEN 10.0 ELSE -10.0 END)
        |    * ln(1.0 - 2.0 * abs(uni - 0.5))) AS BIGINT) AS noisy_n
        |FROM u""".stripMargin) { (s, dir) =>
      val h = Tables.customer(s, dir)
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"))
      val uni = (conv(substring(md5(col("seg").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 1000000 + 0.5) / 1000000.0
      h.select(col("seg"), col("n"),
        floor(col("n") + when(uni < 0.5, lit(10.0)).otherwise(lit(-10.0))
          * log(lit(1.0) - lit(2.0) * abs(uni - 0.5)))
          .cast("long").as("noisy_n"))
    },

    // BPE tokenizer training, 5 merge rounds over the top-200 word
    // vocabulary: each round counts adjacent symbol pairs (weighted by
    // word frequency), adopts the most frequent pair (lexicographic
    // tie-break), and rewrites every word — the algorithm behind every
    // production tokenizer, expressed as groupBy + literal replace.
    // Words render as "[s][y][m]" strings so the merge is a plain
    // substring replace with no boundary sharing ("[a][b][a][b]" →
    // "[ab][ab]" — true greedy semantics, identical in both engines).
    // Spark drives the loop (one bounded aggregation per round, the
    // chosen pair collected like q140's weights); the oracle unrolls
    // all 5 rounds as generated CTEs.
    QuerySpec(
      "tx30_bpe_merges", {
        def topSel(r: Int, f: Int) = s"string_split((SELECT pr FROM top$r), ' ')[$f]"
        val rounds = (1 to 5).map { r =>
          s"""arr$r AS MATERIALIZED (
          |  SELECT freq, string_split_regex(s[2:length(s) - 1], '\\]\\[') AS arr
          |  FROM base${r - 1}
          |), px$r AS (
          |  SELECT freq, arr, unnest(range(1, len(arr))) AS i FROM arr$r
          |), pc$r AS (
          |  SELECT arr[i::INT] || ' ' || arr[(i + 1)::INT] AS pr,
          |    CAST(sum(freq) AS BIGINT) AS c
          |  FROM px$r GROUP BY 1
          |), top$r AS MATERIALIZED (
          |  SELECT pr, c FROM pc$r ORDER BY c DESC, pr LIMIT 1),
          |base$r AS MATERIALIZED (
          |  SELECT w, freq, replace(s,
          |    '[' || ${topSel(r, 1)} || '][' || ${topSel(r, 2)} || ']',
          |    '[' || ${topSel(r, 1)} || ${topSel(r, 2)} || ']') AS s
          |  FROM base${r - 1}
          |)""".stripMargin
        }.mkString(",\n")
        val out = (1 to 5).map(r =>
          s"""SELECT $r::BIGINT AS round, ${topSel(r, 1)} AS a,
          |  ${topSel(r, 2)} AS b, (SELECT c FROM top$r) AS cnt""".stripMargin)
          .mkString("\nUNION ALL ")
        s"""WITH toks AS (
        |  SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
        |  FROM documents
        |), words0 AS (
        |  SELECT w, count(*)::BIGINT AS freq FROM toks GROUP BY 1
        |  ORDER BY freq DESC, w LIMIT 200
        |), base0 AS MATERIALIZED (
        |  SELECT w, freq,
        |    '[' || array_to_string(list_transform(range(1, length(w) + 1),
        |      i -> w[i::INT]), '][') || ']' AS s
        |  FROM words0
        |),
        |$rounds
        |$out""".stripMargin
      }) { (s, dir) =>
      val toks = Tables.fanOut(Tables.documents(s, dir).select("text"))
        .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("w"))
      val words0 = toks.groupBy("w").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("w")).limit(200)
      // STAGED (round-17 optimization pass): each round's collect()
      // replays `words`' whole lineage, and un-staged that lineage began
      // at the corpus tokenization + top-200 sort — the full corpus was
      // re-tokenized once per merge round (5x). Persisting the 200-row
      // base bounds every round's recompute to the replace layers over
      // 200 rows (measured 2.5 s → 0.9 s for the spec at sf0.1).
      var words = graft.operators.Dedup.stage(
        words0.select(col("w"), col("freq"),
          concat(lit("["),
            array_join(transform(sequence(lit(1), length(col("w"))),
              i => substring(col("w"), i, lit(1))), "]["),
            lit("]")).as("s")))
      // Driver-held merge table, one bounded aggregation per round.
      val merges = (1 to 5).map { r =>
        val arr = split(expr("substring(s, 2, length(s) - 2)"), "\\]\\[")
        val top = words.select(col("freq"), arr.as("arr"))
          .where(size(col("arr")) >= 2)
          .select(col("freq"), explode(transform(
            sequence(lit(1), size(col("arr")) - 1),
            i => concat(element_at(col("arr"), i), lit(" "),
              element_at(col("arr"), i + 1)))).as("pr"))
          .groupBy("pr").agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("pr")).limit(1)
          .collect()(0)
        val parts = top.getString(0).split(" ", 2)
        val (a, b) = (parts(0), parts(1))
        val cnt = top.getLong(1)
        words = words.withColumn("s",
          call_function("replace", col("s"),
            lit(s"[$a][$b]"), lit(s"[$a$b]")))
        (r, a, b, cnt)
      }
      merges.map { case (r, a, b, cnt) =>
        s.range(1).select(lit(r.toLong).as("round"), lit(a).as("a"),
          lit(b).as("b"), lit(cnt).as("cnt"))
      }.reduce(_.unionAll(_))
    },

    // Residual-based anomaly days: q165's decomposition closed into a
    // detector — a day alarms when its remainder sits more than 4.5
    // robust deviations (MAD) from the median remainder, the
    // cross-multiplied integer rule 2·|resid − med| > 9·mad (≈3σ under
    // normality). Medians index sorted arrays of the bounded daily
    // table; no double arithmetic anywhere.
    QuerySpec(
      "q174_stl_anomaly",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |), tr AS (
        |  SELECT d, cents,
        |    CASE WHEN count(*) OVER w7 = 7 THEN
        |      CAST(floor(CAST(sum(cents) OVER w7 AS DOUBLE) / 7.0 * 1000000.0)
        |        AS BIGINT)
        |    END AS trend_mc
        |  FROM daily
        |  WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), det AS (
        |  SELECT d, cents, cents * 1000000 - trend_mc AS resid_mc
        |  FROM tr WHERE trend_mc IS NOT NULL
        |), med AS (
        |  SELECT list(resid_mc ORDER BY resid_mc)[((count(*) + 1) // 2)::INT]
        |    AS med_mc
        |  FROM det
        |), mad AS (
        |  SELECT med_mc,
        |    list(abs(resid_mc - med_mc) ORDER BY abs(resid_mc - med_mc))
        |      [((count(*) + 1) // 2)::INT] AS mad_mc
        |  FROM det CROSS JOIN med GROUP BY med_mc
        |)
        |SELECT d, cents, resid_mc, med_mc, mad_mc
        |FROM det CROSS JOIN mad
        |WHERE 2 * abs(resid_mc - med_mc) > 9 * mad_mc""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val w7 = Window.orderBy("d").rowsBetween(-3, 3)
      val det = daily.select(col("d"), col("cents"),
        when(count(lit(1)).over(w7) === 7,
          floor(sum(col("cents")).over(w7).cast("double") / 7.0 * 1000000.0)
            .cast("long")).as("trend_mc"))
        .where(col("trend_mc").isNotNull)
        .select(col("d"), col("cents"),
          (col("cents") * 1000000 - col("trend_mc")).as("resid_mc"))
      def lowerMedian(v: org.apache.spark.sql.Column) =
        element_at(sort_array(collect_list(v)),
          ((count(lit(1)) + 1) / 2).cast("int"))
      val med = det.agg(lowerMedian(col("resid_mc")).as("med_mc"))
      val mad = det.crossJoin(broadcast(med))
        .groupBy("med_mc")
        .agg(lowerMedian(abs(col("resid_mc") - col("med_mc"))).as("mad_mc"))
      det.crossJoin(broadcast(mad))
        .where(lit(2) * abs(col("resid_mc") - col("med_mc"))
          > lit(9) * col("mad_mc"))
        .select("d", "cents", "resid_mc", "med_mc", "mad_mc")
    },

    // Session bounce rate per day: q28's 10-minute gaps-and-islands
    // sessionization rolled up to the product KPI — single-event
    // sessions over total sessions, in basis points of exact integers.
    QuerySpec(
      "q175_bounce_rate",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged
        |), per AS (
        |  SELECT user_id, sid, CAST(min(ts) AS DATE) AS d,
        |    count(*)::BIGINT AS n_ev
        |  FROM sess GROUP BY 1, 2
        |)
        |SELECT d, count(*)::BIGINT AS n_sessions,
        |  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
        |  CAST(floor(10000.0 * sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)
        |    / count(*)) AS BIGINT) AS bounce_bp
        |FROM per GROUP BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val flagged = Tables.events(s, dir).select(col("user_id"), col("ts"),
        col("event_id"),
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") > lag(col("ts"), 1).over(w) + expr("INTERVAL 10 MINUTES"),
          1L).otherwise(0L).as("new_s"))
      val sess = flagged.select(col("user_id"), col("ts"),
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("sid"))
      val per = sess.groupBy("user_id", "sid")
        .agg(to_date(min(col("ts"))).as("d"), count(lit(1)).as("n_ev"))
      per.groupBy("d").agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounce"),
        floor(lit(10000.0) * sum(when(col("n_ev") === 1, 1L).otherwise(0L))
          / count(lit(1))).cast("long").as("bounce_bp"))
    },

    // Incremental view maintenance for AVG: the view splits into base
    // (most rows) and delta partials of the algebraic state (Σ, n), and
    // merging the partials must equal the full recompute — which is
    // exactly what the oracle computes directly, so the hash match IS
    // the merge-algebra proof (q138's contract, for an algebraic
    // aggregate instead of top-k). This is the property that lets a
    // 100 TB rollup absorb a day's delta without rescanning history.
    QuerySpec(
      "q176_ivm_avg",
      """SELECT l_returnflag AS flag, count(*)::BIGINT AS n,
        |  CAST(floor(CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |    AS DOUBLE) / count(*) * 1000000.0) AS BIGINT) AS avg_c_micro
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * 100).cast("long").as("p_c"),
        pmod(col("l_orderkey"), lit(5)).as("m"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("flag").agg(sum(col("p_c")).as("s"), count(lit(1)).as("c"))
      val base = partial(li.where(col("m") =!= 0))
      val delta = partial(li.where(col("m") === 0))
      base.unionAll(delta)
        .groupBy("flag")
        .agg(sum(col("s")).as("s"), sum(col("c")).as("n"))
        .select(col("flag"), col("n"),
          floor(col("s").cast("double") / col("n") * 1000000.0)
            .cast("long").as("avg_c_micro"))
    },

    // Bloom-prefiltered stream: the q144 filter built batch-side over
    // heavy users (≥80 events), materialized to a 66-word literal on
    // the driver (bounded state — the legitimate collect), and applied
    // as a stateless filter inside the stream before an hourly windowed
    // count — the streaming runtime-filter pattern: per-event work is
    // four array indexes against a broadcast-literal, no join state at
    // all. False positives are part of the contract; the oracle replays
    // the same bloom, so counts match exactly.
    QuerySpec(
      "st18_stream_bloom_prefilter",
      """WITH heavy AS (
        |  SELECT user_id FROM events GROUP BY 1 HAVING count(*) >= 80
        |), pts AS (
        |  SELECT CAST('0x' || substr(md5(hs.i || ':' || user_id), 1, 8) AS BIGINT)
        |      % 4096 AS p
        |  FROM heavy CROSS JOIN (SELECT unnest(range(0, 4)) AS i) hs
        |), bits AS (
        |  SELECT p // 63 AS word, bit_or(1::BIGINT << (p % 63)::INT) AS mask
        |  FROM pts GROUP BY 1
        |), ppts AS (
        |  SELECT event_id, ts,
        |    CAST('0x' || substr(md5(hs.i || ':' || user_id), 1, 8) AS BIGINT)
        |      % 4096 AS p
        |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS i) hs
        |), checked AS (
        |  SELECT event_id, min(ts) AS ts,
        |    min(CASE WHEN (coalesce(mask, 0) & (1::BIGINT << (p % 63)::INT)) <> 0
        |      THEN 1 ELSE 0 END) AS hit
        |  FROM ppts LEFT JOIN bits ON word = p // 63
        |  GROUP BY 1
        |)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  count(*)::BIGINT AS n_flagged
        |FROM checked WHERE hit = 1 GROUP BY 1""".stripMargin) { (s, dir) =>
      def pos(i: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(i.cast("string"), lit(":"),
          key.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long") % 4096
      val heavy = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("c")).where(col("c") >= 80)
        .select("user_id")
      val words = heavy
        .select(col("user_id"), explode(sequence(lit(0), lit(3))).as("i"))
        .select(pos(col("i"), col("user_id")).as("p"))
        .select(floor(col("p") / 63).cast("long").as("word"),
          call_function("shiftleft", lit(1L), (col("p") % 63).cast("int")).as("m"))
        .groupBy("word").agg(bit_or(col("m")).as("mask"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // 66-word literal array (index word+1); absent words are 0.
      val lut = array((0L to 65L).map(w => lit(words.getOrElse(w, 0L))): _*)
      def hit(i: Int, key: org.apache.spark.sql.Column) = {
        val p = pos(lit(i), key)
        (element_at(lut, (floor(p / 63) + 1).cast("int"))
          .bitwiseAND(call_function("shiftleft", lit(1L),
            (p % 63).cast("int"))) =!= 0L)
      }
      val ev = graft.streaming.Streams.eventsStream(s, dir)
        .where(hit(0, col("user_id")) && hit(1, col("user_id")) &&
          hit(2, col("user_id")) && hit(3, col("user_id")))
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_flagged"))
        .select(col("w.start").cast("timestamp_ntz").as("window_start"),
          col("n_flagged"))
      graft.streaming.Streams.runToTable(ev, "st18_mem", "complete")
    },

    // Streaming portable-HLL registers: q183's 64-bucket register state
    // maintained over the event STREAM — per-bucket max(rho) is
    // associative/commutative, so a complete-mode groupBy over the fixed
    // bucket grid holds EXACTLY 64 rows of state no matter how many
    // events flow (the streaming cardinality pattern that replaces an
    // unbounded distinct-user dedup state with a sketch), and the
    // streamed registers equal the batch registers register-for-register
    // — which is precisely what the q183 batch oracle asserts.
    QuerySpec(
      "st19_stream_hll",
      """WITH h AS (
        |  SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |    AS BIGINT) AS hv
        |  FROM events),
        |parts AS (
        |  SELECT hv % 64 AS bucket, hv // 64 AS tail FROM h),
        |rho AS (
        |  SELECT bucket,
        |    CASE WHEN tail = 0 THEN CAST(55 AS BIGINT)
        |         ELSE CAST(55 - length(bin(tail)) AS BIGINT) END AS r
        |  FROM parts)
        |SELECT bucket, max(r) AS max_rho
        |FROM rho GROUP BY bucket""".stripMargin) { (s, dir) =>
      val regs = graft.streaming.Streams.eventsStream(s, dir)
        .select(conv(substring(md5(col("user_id").cast("string")
          .cast("binary")), 1, 15), 16, 10).cast("long").as("hv"))
        .select(pmod(col("hv"), lit(64)).as("bucket"),
          expr("hv div 64").as("tail"))
        .select(col("bucket"),
          when(col("tail") === 0, 55L)
            .otherwise(lit(55L) - length(bin(col("tail")))).as("r"))
        .groupBy("bucket")
        .agg(max(col("r")).as("max_rho"))
      graft.streaming.Streams.runToTable(regs, "st19_mem", "complete")
    },

    // Golden-record survivorship — the step after er2's clustering: each
    // entity's member records merge field-by-field under deterministic
    // rules (name: lexicographic min; balance: max — "most complete /
    // most favorable" stand-ins; segment: mode with lexicographic
    // tie-break). Mode rides a (count desc, value) row_number over the
    // bounded per-entity value table; everything else is plain grouped
    // min/max. The oracle replays the closure and every rule.
    QuerySpec(
      "er3_golden_record",
      """WITH RECURSIVE recs AS (
        |  SELECT c_custkey AS id, c_name AS name, c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name || 'x', c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) + 1000
        |  FROM customer WHERE c_custkey % 10 = 0
        |), p AS (
        |  SELECT a.id AS id1, b.id AS id2
        |  FROM recs a JOIN recs b
        |    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
        |    AND a.id < b.id
        |  WHERE levenshtein(a.name, b.name) <= 2
        |), e AS (SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
        |lab AS (
        |  SELECT a AS record_id, least(a, min(b)) AS entity_id
        |  FROM reach GROUP BY a),
        |members AS (
        |  SELECT entity_id, name, bal_c, c_mktsegment FROM lab
        |  JOIN recs ON recs.id = lab.record_id),
        |segmode AS (
        |  SELECT entity_id, c_mktsegment AS seg FROM (
        |    SELECT entity_id, c_mktsegment,
        |      row_number() OVER (PARTITION BY entity_id
        |        ORDER BY count(*) DESC, c_mktsegment) AS rk
        |    FROM members GROUP BY entity_id, c_mktsegment) z
        |  WHERE rk = 1)
        |SELECT m.entity_id, count(*)::BIGINT AS n_records,
        |  min(m.name) AS canonical_name,
        |  CAST(max(m.bal_c) AS BIGINT) AS bal_c,
        |  max(s.seg) AS segment
        |FROM members m JOIN segmode s ON s.entity_id = m.entity_id
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // Records + blocked-match CC labels from the shared session-staged
      // resolution (EntityResolution) — er2 consumes the identical label
      // stage; this spec is the golden-record CONSUMER of it.
      val recs = EntityResolution.records(s, dir)
      val lab = EntityResolution.entityLabels(s, dir)
      val members = lab.join(recs, lab("record_id") === recs("id"))
        .select(col("entity_id"), col("name"), col("bal_c"), col("c_mktsegment"))
      val segmode = members.groupBy("entity_id", "c_mktsegment")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(Window.partitionBy("entity_id")
          .orderBy(col("cnt").desc, col("c_mktsegment"))))
        .where(col("rk") === 1)
        .select(col("entity_id"), col("c_mktsegment").as("seg"))
      // segmode is one row per resolved entity — O(#customers), not a
      // bounded dimension; a broadcast hint would pin it into every
      // executor at 100×. Plain join: both sides are already keyed on
      // entity_id, so this co-partitions with the aggregate that follows.
      members.join(segmode, "entity_id")
        .groupBy("entity_id")
        .agg(count(lit(1)).as("n_records"),
          min(col("name")).as("canonical_name"),
          max(col("bal_c")).as("bal_c"),
          max(col("seg")).as("segment"))
    },

    // OHLC resampling: the daily-revenue series downsampled to ISO
    // weeks with open/high/low/close semantics (argmin/argmax over the
    // unique day key inside each week — min_by/max_by ↔ arg_min/
    // arg_max, tie-free by construction). The time-series downsampler
    // every monitoring stack runs; one grouped aggregation over the
    // bounded daily table.
    QuerySpec(
      "q177_ohlc_resample",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    (epoch(o_orderdate)::BIGINT // 86400 + 3) // 7 AS wk,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT wk, count(*)::BIGINT AS n_days,
        |  arg_min(cents, d) AS open_c, CAST(max(cents) AS BIGINT) AS high_c,
        |  CAST(min(cents) AS BIGINT) AS low_c, arg_max(cents, d) AS close_c
        |FROM daily GROUP BY 1""".stripMargin) { (s, dir) =>
      val days = floor(unix_micros(col("o_orderdate").cast("timestamp"))
        / 86400000000.0).cast("long")
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"),
          ((days + 3) / 7).cast("long").as("wk"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      daily.groupBy("wk").agg(
        count(lit(1)).as("n_days"),
        min_by(col("cents"), col("d")).as("open_c"),
        max(col("cents")).as("high_c"), min(col("cents")).as("low_c"),
        max_by(col("cents"), col("d")).as("close_c"))
    },

    // Session path analysis: each 10-minute session's first five event
    // types joined into a path string, then the global top-10 paths —
    // the "how do users move through the product" rollup on q28's
    // sessionization. Paths truncate via slice on the ordered in-session
    // event list; the top-10 cut is tie-broken on the path string.
    QuerySpec(
      "q178_session_paths",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged
        |), paths AS (
        |  SELECT user_id, sid,
        |    array_to_string(list_slice(
        |      list(event_type ORDER BY ts, event_id), 1, 5), '>') AS path
        |  FROM sess GROUP BY 1, 2
        |)
        |SELECT path, count(*)::BIGINT AS n_sessions
        |FROM paths GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val flagged = Tables.events(s, dir).select(col("user_id"), col("ts"),
        col("event_id"), col("event_type"),
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") > lag(col("ts"), 1).over(w) + expr("INTERVAL 10 MINUTES"),
          1L).otherwise(0L).as("new_s"))
      val sess = flagged.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("sid"))
      val paths = sess.groupBy("user_id", "sid")
        .agg(array_join(slice(transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          e => e.getField("event_type")), 1, 5), ">").as("path"))
      paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(10)
    },

    // Bitemporal point-in-time lookup: a synthetic version history with
    // BOTH valid-time and transaction-time intervals (three versions
    // per order, deterministic offsets), answering "what did the system
    // believe on tx day T about validity day V" — the audit query a
    // regulator asks and SCD2 alone (q72: one time axis) cannot answer.
    // The lookup is a half-open interval filter on both axes plus an
    // argmax tie-break on version — pure filter + grouped argmax, no
    // window over the fact table.
    QuerySpec(
      "q179_bitemporal",
      """WITH versions AS (
        |  SELECT o_orderkey, v,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) + v * 100 AS price_c,
        |    epoch(o_orderdate)::BIGINT // 86400 + v * 30 AS valid_from,
        |    epoch(o_orderdate)::BIGINT // 86400 + (v + 1) * 30 AS valid_to,
        |    epoch(o_orderdate)::BIGINT // 86400 + v * 10 AS tx_from,
        |    CASE WHEN v < 2
        |      THEN epoch(o_orderdate)::BIGINT // 86400 + (v + 1) * 10
        |      ELSE 999999 END AS tx_to
        |  FROM orders CROSS JOIN (SELECT unnest(range(0, 3)) AS v)
        |  WHERE o_orderkey % 7 = 0
        |), asked AS (
        |  SELECT o_orderkey,
        |    epoch(o_orderdate)::BIGINT // 86400 + 45 AS v_day,
        |    epoch(o_orderdate)::BIGINT // 86400 + 15 AS t_day
        |  FROM orders WHERE o_orderkey % 7 = 0
        |)
        |SELECT a.o_orderkey, max(v.v) AS version,
        |  arg_max(v.price_c, v.v) AS price_c
        |FROM asked a JOIN versions v ON v.o_orderkey = a.o_orderkey
        |  AND v.valid_from <= a.v_day AND a.v_day < v.valid_to
        |  AND v.tx_from <= a.t_day AND a.t_day < v.tx_to
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val day = floor(unix_micros(col("o_orderdate").cast("timestamp"))
        / 86400000000.0).cast("long")
      val base = Tables.orders(s, dir)
        .where(pmod(col("o_orderkey"), lit(7)) === 0)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("p_c"),
          day.as("d0"))
      val versions = base
        .select(col("o_orderkey"), col("p_c"), col("d0"),
          explode(sequence(lit(0), lit(2))).as("v"))
        .select(col("o_orderkey"), col("v").cast("long").as("v"),
          (col("p_c") + col("v") * 100).as("price_c"),
          (col("d0") + col("v") * 30).as("valid_from"),
          (col("d0") + (col("v") + 1) * 30).as("valid_to"),
          (col("d0") + col("v") * 10).as("tx_from"),
          when(col("v") < 2, col("d0") + (col("v") + 1) * 10)
            .otherwise(lit(999999L)).as("tx_to"))
      val asked = base.select(col("o_orderkey").as("k"),
        (col("d0") + 45).as("v_day"), (col("d0") + 15).as("t_day"))
      asked.join(versions,
          col("o_orderkey") === col("k")
            && col("valid_from") <= col("v_day")
            && col("v_day") < col("valid_to")
            && col("tx_from") <= col("t_day")
            && col("t_day") < col("tx_to"))
        .groupBy(col("o_orderkey"))
        .agg(max(col("v")).as("version"),
          max_by(col("price_c"), col("v")).as("price_c"))
    },

    // BPE encode-apply — the inference half of tx30's training: the 5
    // learned merges apply in order to every document's bracketed
    // symbol stream (the same literal-replace greedy semantics), and
    // the output reports the per-document symbol-count compression.
    // Symbol counts read straight off the bracket count, so the whole
    // apply stage is string transforms — no explode, no state.
    QuerySpec(
      "tx31_bpe_encode", {
        def topSel(r: Int, f: Int) = s"string_split((SELECT pr FROM top$r), ' ')[$f]"
        val rounds = (1 to 5).map { r =>
          s"""arr$r AS MATERIALIZED (
          |  SELECT freq, string_split_regex(s[2:length(s) - 1], '\\]\\[') AS arr
          |  FROM base${r - 1}
          |), px$r AS (
          |  SELECT freq, arr, unnest(range(1, len(arr))) AS i FROM arr$r
          |), pc$r AS (
          |  SELECT arr[i::INT] || ' ' || arr[(i + 1)::INT] AS pr,
          |    CAST(sum(freq) AS BIGINT) AS c
          |  FROM px$r GROUP BY 1
          |), top$r AS MATERIALIZED (
          |  SELECT pr, c FROM pc$r ORDER BY c DESC, pr LIMIT 1),
          |base$r AS MATERIALIZED (
          |  SELECT w, freq, replace(s,
          |    '[' || ${topSel(r, 1)} || '][' || ${topSel(r, 2)} || ']',
          |    '[' || ${topSel(r, 1)} || ${topSel(r, 2)} || ']') AS s
          |  FROM base${r - 1}
          |)""".stripMargin
        }.mkString(",\n")
        val applied = (1 to 5).foldLeft("ds") { (acc, r) =>
          s"""replace($acc,
          |    '[' || ${topSel(r, 1)} || '][' || ${topSel(r, 2)} || ']',
          |    '[' || ${topSel(r, 1)} || ${topSel(r, 2)} || ']')""".stripMargin
        }
        s"""WITH toks AS (
        |  SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
        |  FROM documents
        |), words0 AS (
        |  SELECT w, count(*)::BIGINT AS freq FROM toks GROUP BY 1
        |  ORDER BY freq DESC, w LIMIT 200
        |), base0 AS MATERIALIZED (
        |  SELECT w, freq,
        |    '[' || array_to_string(list_transform(range(1, length(w) + 1),
        |      i -> w[i::INT]), '][') || ']' AS s
        |  FROM words0
        |),
        |$rounds,
        |docs0 AS (
        |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS ct
        |  FROM documents WHERE doc_id < 100
        |), docs AS (
        |  SELECT doc_id,
        |    '[' || array_to_string(list_transform(range(1, length(ct) + 1),
        |      i -> ct[i::INT]), '][') || ']' AS ds
        |  FROM docs0
        |), enc AS (
        |  SELECT doc_id,
        |    length(ds) - length(replace(ds, '[', '')) AS n_before,
        |    length($applied) - length(replace($applied, '[', '')) AS n_after
        |  FROM docs, top1, top2, top3, top4, top5
        |)
        |SELECT doc_id, CAST(n_before AS BIGINT) AS n_before,
        |  CAST(n_after AS BIGINT) AS n_after
        |FROM enc""".stripMargin
      }) { (s, dir) =>
      // Re-learn the merges exactly as tx30 (bounded driver loop), then
      // apply them as chained literal replaces to the document streams.
      val toks = Tables.fanOut(Tables.documents(s, dir).select("text"))
        .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("w"))
      val words0 = toks.groupBy("w").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("w")).limit(200)
      // Staged for the same reason as tx30 (round-17 optimization pass):
      // un-staged, every merge round's collect() re-tokenized the whole
      // corpus to rebuild the 200-row word table.
      var words = graft.operators.Dedup.stage(
        words0.select(col("w"), col("freq"),
          concat(lit("["),
            array_join(transform(sequence(lit(1), length(col("w"))),
              i => substring(col("w"), i, lit(1))), "]["),
            lit("]")).as("s")))
      val merges = (1 to 5).map { r =>
        val arr = split(expr("substring(s, 2, length(s) - 2)"), "\\]\\[")
        val top = words.select(col("freq"), arr.as("arr"))
          .where(size(col("arr")) >= 2)
          .select(col("freq"), explode(transform(
            sequence(lit(1), size(col("arr")) - 1),
            i => concat(element_at(col("arr"), i), lit(" "),
              element_at(col("arr"), i + 1)))).as("pr"))
          .groupBy("pr").agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("pr")).limit(1)
          .collect()(0)
        val parts = top.getString(0).split(" ", 2)
        words = words.withColumn("s",
          call_function("replace", col("s"),
            lit(s"[${parts(0)}][${parts(1)}]"), lit(s"[${parts(0)}${parts(1)}]")))
        (parts(0), parts(1))
      }
      // Stage the cleaned text, then the bracketed stream, as REAL
      // columns (select boundaries): referencing the regexp through the
      // per-character transform would re-inline it once per character —
      // the measured projection-collapse blowup (see mm9's lesson).
      val staged = Tables.documents(s, dir).where(col("doc_id") < 100)
        .select(col("doc_id"),
          regexp_replace(lower(col("text")), "[^a-z0-9]+", "").as("ct"))
        .select(col("doc_id"),
          concat(lit("["),
            array_join(transform(sequence(lit(1), length(col("ct"))),
              i => substring(col("ct"), i, lit(1))), "]["),
            lit("]")).as("ds"))
      val applied = merges.foldLeft(col("ds")) { case (acc, (a, b)) =>
        call_function("replace", acc, lit(s"[$a][$b]"), lit(s"[$a$b]"))
      }
      def nsyms(c: org.apache.spark.sql.Column) =
        (length(c) - length(call_function("replace", c, lit("["), lit(""))))
          .cast("long")
      staged.select(col("doc_id"), nsyms(col("ds")).as("n_before"),
        nsyms(applied).as("n_after"))
    },

    // Community quality: Newman modularity of q98's label-propagation
    // communities — Q = Σ_c (e_c/m − (d_c/2m)²) from exact integer
    // edge/degree counts (per-community terms floored to nanos before
    // the bounded sum). The oracle replays all five LP rounds (q98's
    // argmax-fold CTE) and then the same integer accounting, closing
    // the loop from community DETECTION to community EVALUATION.
    QuerySpec(
      "q180_modularity",
      """WITH RECURSIVE nodes AS (
        |  SELECT row_number() OVER (ORDER BY user_id) - 1 AS r
        |  FROM (SELECT DISTINCT user_id FROM events)
        |), params AS (SELECT count(*)::BIGINT AS n FROM nodes),
        |eraw AS (
        |  SELECT r AS x, r - r % 4 AS y FROM nodes
        |  UNION ALL
        |  SELECT r, r - r % 4 + (r + 1) % 4 FROM nodes, params
        |  WHERE r - r % 4 + (r + 1) % 4 < n
        |), e AS (SELECT DISTINCT u, v FROM (
        |  SELECT x AS u, y AS v FROM eraw WHERE x <> y
        |  UNION ALL SELECT y, x FROM eraw WHERE x <> y)
        |), adj_t AS (
        |  SELECT list(coalesce(a.vs, []) ORDER BY nd.r) AS adj
        |  FROM nodes nd LEFT JOIN (
        |    SELECT u, list(v) AS vs FROM e GROUP BY u) a ON a.u = nd.r
        |), lp AS (
        |  SELECT 0 AS it, list_transform(range(0, n), i -> i) AS lab
        |  FROM params
        |  UNION ALL
        |  SELECT it + 1, list_transform(range(1, n + 1), j ->
        |    CASE WHEN len(adj[j]) = 0 THEN lab[j]
        |    ELSE -((list_reduce(
        |      list_transform(
        |        list_distinct(list_transform(adj[j], x -> lab[x + 1])), l ->
        |          {'c': len(list_filter(list_transform(adj[j], x -> lab[x + 1]),
        |                                q -> q = l)),
        |           'nl': -l}),
        |      (acc, cand) -> CASE WHEN cand.c > acc.c
        |          OR (cand.c = acc.c AND cand.nl > acc.nl)
        |        THEN cand ELSE acc END)).nl)
        |    END)
        |  FROM lp, params, adj_t WHERE it < 5
        |), fin AS (
        |  SELECT r AS node, lab[(r + 1)::INT] AS label
        |  FROM lp, nodes WHERE it = 5
        |), und AS (SELECT u, v FROM e WHERE u < v),
        |m_t AS (SELECT count(*)::BIGINT AS m FROM und),
        |deg AS (SELECT u AS node, count(*)::BIGINT AS dg FROM e GROUP BY 1),
        |ec AS (
        |  SELECT l1.label, count(*)::BIGINT AS ein
        |  FROM und JOIN fin l1 ON l1.node = und.u
        |    JOIN fin l2 ON l2.node = und.v
        |  WHERE l1.label = l2.label GROUP BY 1
        |), dc AS (
        |  SELECT label, CAST(sum(dg) AS BIGINT) AS dsum
        |  FROM deg JOIN fin USING (node) GROUP BY 1
        |)
        |SELECT count(*)::BIGINT AS n_communities, max(m) AS m_edges,
        |  CAST(sum(CAST(floor(
        |    (CAST(coalesce(ein, 0) AS DOUBLE) / m
        |      - (CAST(dsum AS DOUBLE) / (2 * m)) * (CAST(dsum AS DOUBLE) / (2 * m)))
        |    * 1000000000.0) AS BIGINT)) AS BIGINT) AS q_nano
        |FROM dc LEFT JOIN ec USING (label) CROSS JOIN m_t""".stripMargin) { (s, dir) =>
      // The 5-round LP label build is the expensive stage — consume
      // q98's memoized table instead of replaying the loop.
      val edgesIn = graft.operators.Graph.communityEdges(s, dir)
      val labels = graft.operators.Graph.communityLabels(s, dir)
      // Symmetric distinct edge set (matching the oracle's `e`) — STAGED
      // (round-18, guide §2.4): it feeds the m count action, the degree
      // aggregate, and the intra-community join; un-staged each consumer
      // replayed the union+distinct mint from the node table.
      val eraw = edgesIn.where(col("src") =!= col("dst"))
      val e = graft.operators.Dedup.stage(
        eraw.select(col("src").as("u"), col("dst").as("v"))
          .union(eraw.select(col("dst").as("u"), col("src").as("v")))
          .distinct())
      val und = e.where(col("u") < col("v"))
      val m = und.count()
      val deg = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("dg"))
      val l1 = labels.select(col("node").as("u"), col("label").as("lab1"))
      val l2 = labels.select(col("node").as("v"), col("label").as("lab2"))
      val ec = und.join(broadcast(l1), "u").join(broadcast(l2), "v")
        .where(col("lab1") === col("lab2"))
        .groupBy(col("lab1").as("label")).agg(count(lit(1)).as("ein"))
      val dc = deg.join(broadcast(labels), "node")
        .groupBy("label").agg(sum(col("dg")).as("dsum"))
      dc.join(ec, Seq("label"), "left")
        .agg(count(lit(1)).as("n_communities"),
          max(lit(m)).as("m_edges"),
          sum(floor((coalesce(col("ein"), lit(0L)).cast("double") / m
            - (col("dsum").cast("double") / (2 * m))
              * (col("dsum").cast("double") / (2 * m)))
            * 1000000000.0).cast("long")).as("q_nano"))
    },

    // Calendar-gap completeness check: the full day spine between the
    // corpus's first and last order date anti-joined against observed
    // days, rolled up per month — the data-delivery monitor that
    // catches a missing partition before a consumer does. The spine is
    // a generated sequence (bounded by the date range), observed days
    // one groupBy; all counts exact integers.
    QuerySpec(
      "q181_calendar_gaps",
      """WITH bounds AS (
        |  SELECT min(CAST(o_orderdate AS DATE)) AS lo,
        |    max(CAST(o_orderdate AS DATE)) AS hi
        |  FROM orders
        |), spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        |  FROM bounds
        |), obs AS (
        |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
        |)
        |SELECT year(s.d)::BIGINT AS y, month(s.d)::BIGINT AS m,
        |  count(*)::BIGINT AS expected_days,
        |  CAST(sum(CASE WHEN o.d IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS observed_days,
        |  CAST(sum(CASE WHEN o.d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS missing_days
        |FROM spine s LEFT JOIN obs o ON o.d = s.d
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val day = to_date(col("o_orderdate"))
      val bounds = Tables.orders(s, dir).agg(min(day).as("lo"), max(day).as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      val obs = Tables.orders(s, dir).select(day.as("od")).distinct()
      spine.join(obs, col("od") === col("d"), "left")
        .groupBy(year(col("d")).cast("long").as("y"),
          month(col("d")).cast("long").as("m"))
        .agg(count(lit(1)).as("expected_days"),
          sum(when(col("od").isNull, 0L).otherwise(1L)).as("observed_days"),
          sum(when(col("od").isNull, 1L).otherwise(0L)).as("missing_days"))
    }
  )
}
