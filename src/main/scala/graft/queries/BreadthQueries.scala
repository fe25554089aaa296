package graft.queries

import graft.{QuerySpec, Tables}
import graft.operators.{Multimodal, Similarity, TextAnalysis}
import graft.streaming.Streams
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 surface widening (SURVEY §2.E continued): correlated
  * existential subqueries, the remaining window-function families,
  * unpivot, ordinal explode, date/bitwise/null scalar families,
  * higher-order array arithmetic, RANGE frames, argmax aggregates,
  * statistical aggregates, ordered string aggregation — plus
  * training-pipeline additions (bigram top-k, knn join, streaming
  * session windows, frame sampling) registered as first-class specs.
  *
  * Every oracle follows the parity rules proven in rounds 1–2: exact
  * column-name match, BIGINT casts for engine-variant integer widths,
  * round/basis-point projection for accumulated doubles, deterministic
  * tie-breaks wherever a LIMIT or rank cuts.
  */
object BreadthQueries {

  val specs: Seq[QuerySpec] = Seq(

    // Correlated EXISTS / NOT EXISTS through the SQL front door (Catalyst
    // rewrites to semi/anti joins — the declarative dual of q5/q6).
    QuerySpec(
      "q40_exists_subquery",
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("customer_x40")
      Tables.orders(s, dir).createOrReplaceTempView("orders_x40")
      s.sql(
        """SELECT c_custkey, c_mktsegment
          |FROM customer_x40 c
          |WHERE EXISTS (SELECT 1 FROM orders_x40 o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          |  AND NOT EXISTS (SELECT 1 FROM orders_x40 o
          |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin)
    },

    // Ranking-family windows not yet covered: percent_rank / cume_dist /
    // ntile. The order key is unique per partition, so ntile's row
    // placement is deterministic.
    QuerySpec(
      "q41_window_rank_family",
      """SELECT o_orderkey, o_custkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
    },

    // Value-family windows: first/nth over the running frame, last over
    // the full frame (the default-frame trap spelled out explicitly).
    QuerySpec(
      "q42_window_value_fns",
      """SELECT event_id, user_id,
        |  first_value(value) OVER w1 AS first_v,
        |  nth_value(value, 2) OVER w1 AS second_v,
        |  last_value(value) OVER w2 AS last_v
        |FROM events
        |WINDOW w1 AS (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       w2 AS (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) { (s, dir) =>
      val base = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val w1 = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w2 = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir).select(col("event_id"), col("user_id"),
        first(col("value")).over(w1).as("first_v"),
        nth_value(col("value"), 2).over(w1).as("second_v"),
        last(col("value")).over(w2).as("last_v"))
    },

    // Unpivot (wide → long reshape), the inverse of q26_pivot — same
    // counts matrix melted back to (priority, metric, n) triples.
    QuerySpec(
      "q43_unpivot",
      """SELECT o_orderpriority, status_metric, n FROM (
        |  UNPIVOT (
        |    SELECT o_orderpriority,
        |      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |      CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |      CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |    FROM orders GROUP BY o_orderpriority)
        |  ON n_f, n_o, n_p INTO NAME status_metric VALUE n)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("n_f"), col("n_o"), col("n_p")), "status_metric", "n")
    },

    // Ordinal explode: tokens with their 1-based positions. The token
    // array is staged as its own column before the generator, and
    // posexplode_outer avoids the inferred size()>0 filter that would
    // re-inline the tokenizer (see the staging notes on Dedup).
    QuerySpec(
      "q44_posexplode_ordinality",
      """SELECT doc_id,
        |  CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
        |  unnest(toks) AS tok
        |FROM (SELECT doc_id,
        |        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |      FROM documents WHERE doc_id < 50) t""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).where(col("doc_id") < 50)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), posexplode_outer(col("toks")).as(Seq("pos0", "tok")))
        .where(col("tok").isNotNull)
        .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("tok"))
    },

    // Calendar arithmetic: month addition with end-of-month clamping,
    // last_day, quarter, day deltas from an epoch date.
    QuerySpec(
      "q45_date_arith",
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  (CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH)::DATE AS plus_3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders""".stripMargin) { (s, dir) =>
      val d = to_date(col("o_orderdate"))
      Tables.orders(s, dir).select(col("o_orderkey"),
        d.as("d"),
        add_months(d, 3).as("plus_3m"),
        last_day(d).as("month_end"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        datediff(d, lit("1995-01-01")).cast("long").as("days_since"))
    },

    // Bitwise scalar family over the key columns (pure integer → exact).
    QuerySpec(
      "q46_bitwise_fns",
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_orderkey & 255 AS and_k,
        |  l_orderkey | 64 AS or_k,
        |  xor(l_orderkey, 129) AS xor_k,
        |  l_orderkey << 2 AS shl_k,
        |  l_orderkey >> 3 AS shr_k,
        |  CAST(bit_count(l_orderkey) AS BIGINT) AS nbits
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val k = col("l_orderkey")
      Tables.lineitem(s, dir).select(k, col("l_linenumber").cast("long").as("l_linenumber"),
        k.bitwiseAND(lit(255L)).as("and_k"),
        k.bitwiseOR(lit(64L)).as("or_k"),
        k.bitwiseXOR(lit(129L)).as("xor_k"),
        shiftleft(k, 2).as("shl_k"),
        shiftright(k, 3).as("shr_k"),
        bit_count(k).cast("long").as("nbits"))
    },

    // NULL-handling scalar family; the base tables carry no NULLs, so
    // nullif manufactures them and the rest of the family reacts.
    QuerySpec(
      "q47_null_fns",
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_nb,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'suppressed') AS seg_fill,
        |  CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
        |       THEN 'kept' ELSE 'suppressed' END AS seg_kept,
        |  ifnull(nullif(c_mktsegment, 'BUILDING'), c_name) AS seg_or_name
        |FROM customer""".stripMargin) { (s, dir) =>
      val nb = nullif(col("c_mktsegment"), lit("BUILDING"))
      Tables.customer(s, dir).select(col("c_custkey"),
        nb.as("seg_nb"),
        coalesce(nb, lit("suppressed")).as("seg_fill"),
        nvl2(nb, lit("kept"), lit("suppressed")).as("seg_kept"),
        ifnull(nb, col("c_name")).as("seg_or_name"))
    },

    // Higher-order array arithmetic (transform/aggregate/zip_with) on
    // integer arrays — exact on both engines; DuckDB replays the folds
    // with list_reduce (list_prepend supplies the start value).
    QuerySpec(
      "q48_hof_arith",
      """SELECT o_orderkey,
        |  list_reduce(list_prepend(0, arr), (x, y) -> x + y) AS s,
        |  list_reduce(list_prepend(0, list_transform(arr, x -> x * x)), (x, y) -> x + y) AS sq,
        |  list_reduce(list_prepend(0, list_transform(range(1, n + 1), i -> arr[i] * arr[n + 1 - i])),
        |              (x, y) -> x + y) AS dotrev
        |FROM (SELECT o_orderkey, n, range(1, n + 1) AS arr
        |      FROM (SELECT o_orderkey, o_orderkey % 5 + 1 AS n FROM orders) t) a""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          sequence(lit(1L), pmod(col("o_orderkey"), lit(5L)) + 1L).as("arr"))
        .select(col("o_orderkey"),
          aggregate(col("arr"), lit(0L), (a, x) => a + x).as("s"),
          aggregate(transform(col("arr"), x => x * x), lit(0L), (a, x) => a + x).as("sq"),
          aggregate(zip_with(col("arr"), reverse(col("arr")), (x, y) => x * y),
            lit(0L), (a, x) => a + x).as("dotrev"))
    },

    // RANGE frame (value-based, not row-based): trailing sum/count over
    // an event-id distance window. Integer sums → exact.
    QuerySpec(
      "q49_window_range_frame",
      """SELECT event_id, user_id,
        |  CAST(sum(event_id) OVER w AS BIGINT) AS trail_sum,
        |  CAST(count(*) OVER w AS BIGINT) AS trail_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rangeBetween(-1000, Window.currentRow)
      Tables.events(s, dir).select(col("event_id"), col("user_id"),
        sum(col("event_id")).over(w).cast("long").as("trail_sum"),
        count(lit(1)).over(w).cast("long").as("trail_n"))
    },

    // Argmax aggregates (max_by/min_by ↔ arg_max/arg_min). The ordering
    // argument is the unique order key, so the winner is deterministic.
    QuerySpec(
      "q50_argmax_aggregates",
      """SELECT o_orderpriority,
        |  round(arg_max(o_totalprice, o_orderkey), 2) AS price_of_latest,
        |  round(arg_min(o_totalprice, o_orderkey), 2) AS price_of_first,
        |  CAST(max(o_orderkey) AS BIGINT) AS latest_key
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).groupBy(col("o_orderpriority")).agg(
        round(max_by(col("o_totalprice"), col("o_orderkey")), 2).as("price_of_latest"),
        round(min_by(col("o_totalprice"), col("o_orderkey")), 2).as("price_of_first"),
        max(col("o_orderkey")).as("latest_key"))
    },

    // Statistical aggregates (corr/stddev/variance/covariance). Doubles
    // accumulate in engine-specific merge orders, so results project to
    // coarse fixed-point integers (the round-ties-safe floor(x·s + 0.5)
    // basis-point pattern from rounds 1–2).
    QuerySpec(
      "q51_stats_agg",
      """SELECT c_mktsegment,
        |  CAST(floor(corr(c_acctbal, c_custkey) * 10000 + 0.5) AS BIGINT) AS corr_bp,
        |  CAST(floor(stddev_samp(c_acctbal) * 100 + 0.5) AS BIGINT) AS sd_c,
        |  CAST(floor(var_samp(c_acctbal) / 1000 + 0.5) AS BIGINT) AS var_k,
        |  CAST(floor(covar_samp(c_acctbal, c_custkey) / 1000 + 0.5) AS BIGINT) AS cov_k
        |FROM customer GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).groupBy(col("c_mktsegment")).agg(
        floor(corr(col("c_acctbal"), col("c_custkey")) * 10000 + 0.5).cast("long").as("corr_bp"),
        floor(stddev_samp(col("c_acctbal")) * 100 + 0.5).cast("long").as("sd_c"),
        floor(var_samp(col("c_acctbal")) / 1000 + 0.5).cast("long").as("var_k"),
        floor(covar_samp(col("c_acctbal"), col("c_custkey")) / 1000 + 0.5).cast("long").as("cov_k"))
    },

    // Ordered string aggregation: collect → total order → join. The sort
    // inside the group makes collect_list's arrival order irrelevant.
    QuerySpec(
      "q52_string_agg",
      """SELECT c_nationkey,
        |  CAST(count(*) AS BIGINT) AS n,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names
        |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).groupBy(col("c_nationkey")).agg(
        count(lit(1)).as("n"),
        concat_ws(",", array_sort(collect_list(col("c_name")))).as("names"))
    },

    // Recursive CTE (Spark 4 UnionLoop): a dense date spine spanning the
    // event range — including zero-event days, which no plain GROUP BY
    // over the fact table can produce. The max date rides along in the
    // recursion state so the step needs no correlated subquery.
    QuerySpec(
      "q53_recursive_cte",
      """WITH RECURSIVE days(d, dmax) AS (
        |  SELECT CAST(min(ts) AS DATE), CAST(max(ts) AS DATE) FROM events
        |  UNION ALL
        |  SELECT d + 1, dmax FROM days WHERE d < dmax)
        |SELECT days.d AS d, CAST(count(e.event_id) AS BIGINT) AS n
        |FROM days LEFT JOIN events e ON CAST(e.ts AS DATE) = days.d
        |GROUP BY days.d""".stripMargin) { (s, dir) =>
      // The event range can exceed the default 100-step recursion cap.
      // Deliberately NOT set/restored: the limit must still be in effect
      // when the returned (lazy) DataFrame executes, which outlives this
      // builder. 10k bounds a ~27-year daily spine while still stopping
      // a runaway recursion 10x sooner than unbounded.
      s.conf.set("spark.sql.cteRecursionLevelLimit", "10000")
      Tables.events(s, dir).createOrReplaceTempView("events_x53")
      s.sql(
        """WITH RECURSIVE days(d, dmax) AS (
          |  SELECT CAST(min(ts) AS DATE), CAST(max(ts) AS DATE) FROM events_x53
          |  UNION ALL
          |  SELECT date_add(d, 1), dmax FROM days WHERE d < dmax)
          |SELECT days.d AS d, CAST(count(e.event_id) AS BIGINT) AS n
          |FROM days LEFT JOIN events_x53 e ON CAST(e.ts AS DATE) = days.d
          |GROUP BY days.d""".stripMargin)
    },

    // Correlated LATERAL subquery with LIMIT (decorrelated by Catalyst
    // into a ranked window): top-2 customers by balance per nation.
    QuerySpec(
      "q54_lateral_join",
      """SELECT n.n_name, c.c_custkey, c.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""".stripMargin) { (s, dir) =>
      Tables.nation(s, dir).createOrReplaceTempView("nation_x54")
      Tables.customer(s, dir).createOrReplaceTempView("customer_x54")
      s.sql(
        """SELECT n.n_name, c.c_custkey, c.c_acctbal
          |FROM nation_x54 n JOIN LATERAL (
          |  SELECT c_custkey, c_acctbal FROM customer_x54
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""".stripMargin)
    },

    // JSON construction (the write-side dual of q20/q36's extraction):
    // struct → compact JSON text, identical bytes on both engines for
    // integer/string fields.
    QuerySpec(
      "q56_to_json",
      """SELECT o_orderkey,
        |  to_json(struct_pack(k := o_orderkey, p := o_orderpriority)) AS js
        |FROM orders""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).select(col("o_orderkey"),
        to_json(struct(col("o_orderkey").as("k"), col("o_orderpriority").as("p"))).as("js"))
    },

    // t-digest approximate percentiles next to the exact answer — the
    // sketch family's quantile member (HLL distinct is q31). Like every
    // sketch, engine-specific → rows-only; the ScalaTest pins the error
    // bound against exact percentiles instead.
    QuerySpec.noOracle("q57_approx_percentile") { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          approx_percentile(col("o_totalprice"), lit(0.5), lit(1000)).as("p50_approx"),
          percentile(col("o_totalprice"), lit(0.5)).as("p50_exact"))
        .orderBy(col("o_orderstatus"))
    },

    // Multiset set ops: EXCEPT ALL / INTERSECT ALL keep multiplicities
    // (q15–q17 cover the distinct variants). Lineitem has repeated
    // partkeys per suppkey slice, so multiplicity actually matters here.
    QuerySpec(
      "q58_set_ops_all",
      """SELECT l_partkey FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_orderkey % 4 < 2
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_orderkey % 4 = 0) t""".stripMargin) { (s, dir) =>
      // Modulo predicates, not absolute key ranges: the two multisets
      // genuinely differ (and overlap) at EVERY scale factor, so a
      // broken exceptAll cannot pass on a slice where both inputs
      // happen to coincide.
      val li = Tables.lineitem(s, dir)
      li.where(pmod(col("l_orderkey"), lit(4)) < 2).select(col("l_partkey"))
        .exceptAll(li.where(pmod(col("l_orderkey"), lit(4)) === 0).select(col("l_partkey")))
    },

    // GROUP BY ALL (group on every non-aggregate select item) through
    // the SQL front door — supported by both engines.
    QuerySpec(
      "q59_group_by_all",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ALL""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders_x59")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(count(*) AS BIGINT) AS n,
          |  round(sum(o_totalprice), 2) AS total
          |FROM orders_x59 GROUP BY ALL""".stripMargin)
    },

    // Explicit cartesian product (the one join type not yet registered):
    // every (region, nation) combination with a derived flag.
    QuerySpec(
      "q60_cross_join",
      """SELECT r.r_name, n.n_name,
        |  CAST(CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS BIGINT) AS is_home
        |FROM region r CROSS JOIN nation n""".stripMargin) { (s, dir) =>
      Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
        .select(col("r_name"), col("n_name"),
          when(col("n_regionkey") === col("r_regionkey"), 1L).otherwise(0L).as("is_home"))
    },

    // Edit distance between neighboring documents (dynamic-programming
    // scalar, identical definition on both engines) — the character-level
    // member of the similarity family, bounded to first-120-chars of a
    // 50-doc slice to keep the O(n·m) kernel honest about its cost.
    QuerySpec(
      "q61_edit_distance",
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(levenshtein(substring(a.text, 1, 120), substring(b.text, 1, 120)) AS BIGINT) AS dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id < 50""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val a = docs.where(col("doc_id") < 50)
        .select(col("doc_id").as("id1"), substring(col("text"), 1, 120).as("t1"))
      val b = docs.select((col("doc_id") - 1).as("id1"),
        col("doc_id").as("id2"), substring(col("text"), 1, 120).as("t2"))
      a.join(b, "id1")
        .select(col("id1"), col("id2"),
          levenshtein(col("t1"), col("t2")).cast("long").as("dist"))
    },

    // Boolean / conditional aggregates: bool_and, bool_or, count_if,
    // every/any through the DataFrame API.
    QuerySpec(
      "q62_bool_aggs",
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 1) AS all_multi,
        |  bool_or(l_discount > 0.09) AS any_high_disc,
        |  CAST(count_if(l_tax = 0) AS BIGINT) AS n_taxfree
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
        bool_and(col("l_quantity") > 1).as("all_multi"),
        bool_or(col("l_discount") > 0.09).as("any_high_disc"),
        count_if(col("l_tax") === 0).as("n_taxfree"))
    },

    // Linear-regression aggregate family (slope/intercept/R²/count) —
    // fixed-point projected like q51 (double merge order is
    // engine-specific).
    QuerySpec(
      "q63_regression_aggs",
      """SELECT c_mktsegment,
        |  CAST(floor(regr_slope(c_acctbal, c_custkey) * 1000000 + 0.5) AS BIGINT) AS slope_ppm,
        |  CAST(floor(regr_intercept(c_acctbal, c_custkey) * 100 + 0.5) AS BIGINT) AS icept_c,
        |  CAST(floor(regr_r2(c_acctbal, c_custkey) * 10000 + 0.5) AS BIGINT) AS r2_bp,
        |  CAST(regr_count(c_acctbal, c_custkey) AS BIGINT) AS n
        |FROM customer GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).groupBy(col("c_mktsegment")).agg(
        floor(regr_slope(col("c_acctbal"), col("c_custkey")) * 1000000 + 0.5)
          .cast("long").as("slope_ppm"),
        floor(regr_intercept(col("c_acctbal"), col("c_custkey")) * 100 + 0.5)
          .cast("long").as("icept_c"),
        floor(regr_r2(col("c_acctbal"), col("c_custkey")) * 10000 + 0.5)
          .cast("long").as("r2_bp"),
        regr_count(col("c_acctbal"), col("c_custkey")).cast("long").as("n"))
    },

    // Explicit NULL placement in total orders (NULLS FIRST/LAST against
    // each direction) — nulls manufactured since the base tables carry
    // none. Total order: the null flag then the key, so the sort is
    // deterministic and the harness's row hashing sees a stable layout.
    QuerySpec(
      "q64_null_ordering",
      """SELECT seg_nb, c_custkey FROM (
        |  SELECT nullif(c_mktsegment, 'BUILDING') AS seg_nb, c_custkey
        |  FROM customer WHERE c_custkey <= 100) t
        |ORDER BY seg_nb DESC NULLS FIRST, c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).where(col("c_custkey") <= 100)
        .select(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
          col("c_custkey"))
        .orderBy(col("seg_nb").desc_nulls_first, col("c_custkey"))
    },

    // Time-series gap fill (Relational.locfInterpolate): 'click' events
    // carry readings, every other event gets a value linearly
    // interpolated between its bracketing readings (LOCF / backfill at
    // the edges). Millisecond-integer weights keep the double math
    // engine-portable; one shuffle+sort serves both window directions.
    QuerySpec(
      "q65_locf_interpolate",
      """SELECT event_id, user_id,
        |  CAST(floor(coalesce(reading,
        |    CASE WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
        |              AND date_diff('millisecond', prev_t, next_t) > 0 THEN
        |      prev_v + (next_v - prev_v) * date_diff('millisecond', prev_t, ts)
        |        / date_diff('millisecond', prev_t, next_t)
        |    END, prev_v, next_v) * 10000 + 0.5) AS BIGINT) AS filled_e4
        |FROM (
        |  SELECT event_id, user_id, ts, reading,
        |    last_value(reading IGNORE NULLS) OVER wb AS prev_v,
        |    last_value(CASE WHEN reading IS NOT NULL THEN ts END IGNORE NULLS) OVER wb AS prev_t,
        |    first_value(reading IGNORE NULLS) OVER wf AS next_v,
        |    first_value(CASE WHEN reading IS NOT NULL THEN ts END IGNORE NULLS) OVER wf AS next_t
        |  FROM (SELECT event_id, user_id, ts,
        |          CASE WHEN event_type = 'click' THEN value END AS reading
        |        FROM events) r
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) w""".stripMargin) { (s, dir) =>
      val readings = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "click", col("value")).as("reading"))
      // Basis-point projection, not round(): interpolated values are
      // derived ratios, and round()'s half-way ties diverge between
      // engines (the q51/tx2 parity rule).
      graft.operators.Relational.locfInterpolate(
          readings, "user_id", "ts", "event_id", "reading")
        .select(col("event_id"), col("user_id"),
          floor(col("filled") * 10000 + 0.5).cast("long").as("filled_e4"))
    },

    // Map higher-order functions (transform_values / map_filter /
    // map_keys / map_values) over the parsed props map — the map-lambda
    // family q36's explode left unexercised. The harness maps are
    // single-key ('k'), so the JSON projection is deterministic and the
    // oracle replays it with scalar JSON functions.
    QuerySpec(
      "q66_map_hofs",
      """SELECT event_id,
        |  json_object('k', 2 * v) AS doubled_json,
        |  CASE WHEN v % 2 = 0 THEN json_object('k', v) ELSE '{}' END AS evens_json,
        |  'k' AS only_key,
        |  v AS only_value
        |FROM (SELECT event_id,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
        |      FROM events) t
        |WHERE v IS NOT NULL""".stripMargin) { (s, dir) =>
      Tables.fanOut(Tables.events(s, dir).select("event_id", "props"))
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("m"))
        .where(element_at(col("m"), "k").isNotNull)
        .select(col("event_id"),
          to_json(transform_values(col("m"), (_, v) => v * 2)).as("doubled_json"),
          to_json(map_filter(col("m"), (_, v) => v % 2 === 0)).as("evens_json"),
          array_join(map_keys(col("m")), ",").as("only_key"),
          element_at(map_values(col("m")), 1).as("only_value"))
    },

    // Array manipulation family: position lookup, element removal,
    // null compaction — over staged token arrays.
    QuerySpec(
      "q67_array_manipulation",
      """SELECT doc_id,
        |  CAST(list_position(toks, 'data') AS BIGINT) AS pos_data,
        |  CAST(len(list_filter(toks, x -> x <> 'the')) AS BIGINT) AS n_no_the,
        |  array_to_string(list_filter(list_transform(toks, x -> nullif(x, 'a')), x -> x IS NOT NULL)[1:5], ',') AS first5_compact
        |FROM (SELECT doc_id,
        |        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |      FROM documents WHERE doc_id < 100) t""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).where(col("doc_id") < 100)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          array_position(col("toks"), "data").as("pos_data"),
          size(array_remove(col("toks"), "the")).cast("long").as("n_no_the"),
          array_join(slice(array_compact(transform(col("toks"),
            x => nullif(x, lit("a")))), 1, 5), ",").as("first5_compact"))
    },

    // String scalar family, second batch: padding, translate, reverse,
    // repeat, overlay-equivalent composition.
    QuerySpec(
      "q68_string_fns2",
      """SELECT p_partkey,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
        |  rpad(p_brand, 12, '.') AS brand_padded,
        |  translate(p_type, 'aeiou', 'AEIOU') AS type_upvowel,
        |  reverse(p_name) AS name_rev,
        |  repeat(left(p_brand, 2), 3) AS brand_echo
        |FROM part""".stripMargin) { (s, dir) =>
      Tables.part(s, dir).select(col("p_partkey"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"),
        rpad(col("p_brand"), 12, ".").as("brand_padded"),
        translate(col("p_type"), "aeiou", "AEIOU").as("type_upvowel"),
        reverse(col("p_name")).as("name_rev"),
        repeat(substring(col("p_brand"), 1, 2), 3).as("brand_echo"))
    },

    // --- training-pipeline additions ---

    // Corpus bigram top-k: adjacent-token pairs, counted and cut with a
    // deterministic (count desc, bigram asc) order. Bigrams are built
    // index-wise inside the row (no self-join) and staged before the
    // explode so the tokenizer runs once per document.
    QuerySpec(
      "tx7_bigram_topk",
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |  FROM documents),
        |big AS (
        |  SELECT unnest(list_transform(range(1, len(toks)),
        |                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        |  FROM toks WHERE len(toks) >= 2)
        |SELECT bigram, CAST(count(*) AS BIGINT) AS n
        |FROM big GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 15""".stripMargin) { (s, dir) =>
      // Inlining discipline (the measured 10× trap here): NO pre-generate
      // filter may mention toks/bigrams — a `size(toks) >= 2` filter gets
      // pushed below the staging projections and the fan-out exchange,
      // re-running the tokenizer per row on ONE partition; and a plain
      // `explode` makes Catalyst infer such a filter itself
      // (InferFiltersFromGenerate). So: short docs are handled by a
      // `when` INSIDE the bigrams projection (whose second reference to
      // toks also blocks CollapseProject), the generator is the _outer
      // variant, and the null rows it emits for empty arrays are dropped
      // by a post-generate filter on the generator's own output.
      Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
        .select(TextAnalysis.tokens(col("text")).as("toks"))
        .select(when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => concat(element_at(col("toks"), i + 1), lit(" "),
              element_at(col("toks"), i + 2))))
          .otherwise(typedLit(Seq.empty[String])).as("bigrams"))
        .select(explode_outer(col("bigrams")).as("bigram"))
        .where(col("bigram").isNotNull)
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(15)
    },

    // Batched knn retrieval: top-3 base neighbors for every query vector
    // (map-side bounded-heap top-k — see Similarity.knnJoin). The oracle
    // replays the ranking as a window over exact cosines.
    QuerySpec(
      "ss5_knn_join",
      """SELECT qid, vec_id, sim, rank FROM (
        |  SELECT q.vec_id AS qid, b.vec_id AS vec_id,
        |    round(list_cosine_similarity(b.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS sim,
        |    CAST(row_number() OVER (
        |      PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(b.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) DESC,
        |               b.vec_id) AS BIGINT) AS rank
        |  FROM embeddings q JOIN embeddings b ON b.vec_id >= 10
        |  WHERE q.vec_id < 5) t
        |WHERE rank <= 3""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.knnJoin(
        emb.where(col("vec_id") >= 10), "vec_id", "embedding",
        emb.where(col("vec_id") < 5), "vec_id", "embedding", k = 3)
    },

    // Streaming session windows (complete mode — no watermark cutoff, so
    // the streamed result equals the batch gaps-and-islands oracle;
    // append-mode + watermark is exercised in StreamingSpec).
    QuerySpec(
      "st7_stream_session",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '10 minutes' AS session_end,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM sess GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      Streams.runToTable(
        Streams.sessionCounts(Streams.eventsStream(s, dir), "10 minutes"),
        "st7_mem", "complete")
    },

    // Exact DECIMAL aggregation: money casts to DECIMAL(18,2) before the
    // sum, so the result is EXACT and order-independent — no fixed-point
    // projection needed, unlike every double aggregate in this file.
    // This is the correct type discipline for financial rollups at any
    // scale (doubles lose cents at 1e15-magnitude sums).
    QuerySpec(
      "q90_decimal_exact",
      """SELECT l_returnflag,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS total_price,
        |  min(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price,
        |  max(CAST(l_extendedprice AS DECIMAL(18,2))) AS max_price
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      val p = col("l_extendedprice").cast("decimal(18,2)")
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(sum(p).as("total_price"), min(p).as("min_price"), max(p).as("max_price"))
    },

    // Funnel analysis: ordered stage progression per user (first view →
    // first click AFTER it → first purchase after that), counted per
    // stage. Three narrow conditional aggregations + equi-joins on
    // user_id — no window over the raw log, no sort.
    QuerySpec(
      "q86_funnel",
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
        |  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
        |  CAST((SELECT count(*) FROM p) AS BIGINT) AS n_full_funnel""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.where(col("event_type") === "click").as("e")
        .join(v, Seq("user_id"))
        .where(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .where(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
    },

    // Cohort retention: of the users active in hour h, what fraction
    // returns in hour h+1? Self-join of the (user, hour) activity set
    // shifted by one — the retention-matrix kernel (daily/weekly at
    // production scale, hourly here to fit the corpus).
    QuerySpec(
      "q87_retention",
      """WITH a AS (
        |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events)
        |SELECT a.h AS cohort_hour,
        |  CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(count(r.user_id) AS BIGINT) AS n_retained
        |FROM a LEFT JOIN a r
        |  ON a.user_id = r.user_id AND r.h = a.h + INTERVAL '1 hour'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val a = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .distinct()
      val r = a.select(col("user_id"), col("h").as("rh"))
      a.join(r,
          a("user_id") === r("user_id") &&
            col("rh") === (col("h") + expr("INTERVAL 1 HOUR")), "left")
        .groupBy(col("h").as("cohort_hour"))
        .agg(count(lit(1)).as("n_active"),
          count(col("rh")).as("n_retained"))
    },

    // Rolling aggregates: 7-row trailing moving average + min/max over
    // the same ROWS frame (one window partitioning = one shuffle+sort
    // for all three). Fixed-point projection for the average (partial
    // sums merge in engine-specific order).
    QuerySpec(
      "q82_moving_avg",
      """SELECT o_orderkey,
        |  CAST(floor(avg(o_totalprice) OVER w * 100 + 0.5) AS BIGINT) AS ma7_c,
        |  min(o_totalprice) OVER w AS mn7,
        |  max(o_totalprice) OVER w AS mx7
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-6, Window.currentRow)
      Tables.orders(s, dir).select(col("o_orderkey"),
        floor(avg(col("o_totalprice")).over(w) * 100 + 0.5).cast("long").as("ma7_c"),
        min(col("o_totalprice")).over(w).as("mn7"),
        max(col("o_totalprice")).over(w).as("mx7"))
    },

    // TIME-based trailing window (RANGE over event time, not rows): how
    // many events the same user produced in the trailing hour. Spark's
    // rangeBetween is numeric, so the order key is epoch seconds — the
    // standard idiom; DuckDB's native RANGE INTERVAL frame replays it.
    QuerySpec(
      "q83_time_range_window",
      """SELECT event_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS n_trailing_1h
        |FROM events""".stripMargin) { (s, dir) =>
      // Epoch MICROseconds, not seconds: second-granularity keys widen
      // the frame for sub-second timestamps (caught by the sf0.1 oracle —
      // two events 3600.4 s apart truncate to exactly 3600).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts").cast("timestamp")))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      Tables.events(s, dir).select(col("event_id"),
        count(lit(1)).over(w).as("n_trailing_1h"))
    },

    // String part/predicate scalar family: split_part, left/right,
    // contains / startswith / endswith (boolean results cast to int so
    // both engines hash identically).
    QuerySpec(
      "q79_string_parts",
      """SELECT doc_id,
        |  split_part(source, 'c', 2) AS after_c,
        |  left(text, 8) AS l8,
        |  right(text, 8) AS r8,
        |  CASE WHEN contains(lower(text), 'the') THEN 1 ELSE 0 END AS has_the,
        |  CASE WHEN starts_with(source, 'src1') THEN 1 ELSE 0 END AS is_src1x,
        |  CASE WHEN ends_with(source, '3') THEN 1 ELSE 0 END AS ends_3
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        split_part(col("source"), lit("c"), lit(2)).as("after_c"),
        expr("left(text, 8)").as("l8"),
        expr("right(text, 8)").as("r8"),
        contains(lower(col("text")), lit("the")).cast("int").as("has_the"),
        startswith(col("source"), lit("src1")).cast("int").as("is_src1x"),
        endswith(col("source"), lit("3")).cast("int").as("ends_3"))
    },

    // Binary codec scalar family: base64 round-trip, hex, SHA-256 —
    // the content-addressing toolbox (dedup keys, cache keys, payload
    // transport). Hex is case-normalized on both sides.
    QuerySpec(
      "q78_codec_fns",
      """SELECT doc_id,
        |  base64(substr(text, 1, 24)::BLOB) AS b64,
        |  CASE WHEN from_base64(base64(substr(text, 1, 24)::BLOB)) = substr(text, 1, 24)::BLOB
        |       THEN 1 ELSE 0 END AS roundtrip_ok,
        |  upper(hex(substr(text, 1, 12))) AS hx,
        |  sha256(text) AS sha
        |FROM documents""".stripMargin) { (s, dir) =>
      val head24 = substring(col("text"), 1, 24).cast("binary")
      Tables.documents(s, dir).select(col("doc_id"),
        base64(head24).as("b64"),
        when(unbase64(base64(head24)) === head24, 1).otherwise(0).as("roundtrip_ok"),
        upper(hex(substring(col("text"), 1, 12).cast("binary"))).as("hx"),
        sha2(col("text").cast("binary"), 256).as("sha"))
    },

    // Bitwise AGGREGATES (the scalar family is q46): bit_and/bit_or/
    // bit_xor folds per group — commutative+associative, so partial
    // aggregation combines map-side like sum.
    QuerySpec(
      "q77_bit_aggs",
      """SELECT l_returnflag,
        |  bit_and(l_orderkey % 256) AS band,
        |  bit_or(l_orderkey % 256) AS bor,
        |  bit_xor(l_orderkey % 256) AS bxor
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(bit_and(pmod(col("l_orderkey"), lit(256L))).as("band"),
          bit_or(pmod(col("l_orderkey"), lit(256L))).as("bor"),
          bit_xor(pmod(col("l_orderkey"), lit(256L))).as("bxor"))
    },

    // Session windows in APPEND mode + watermark — the production shape
    // (bounded state, exactly-once emission): the emitted set is the
    // complete-mode session set minus sessions still open at the final
    // watermark (max(ts) - 30 min), which the oracle replays as a HAVING
    // over the gaps-and-islands sessions.
    QuerySpec(
      "st9_stream_session_append",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '10 minutes' AS session_end,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM sess GROUP BY user_id, sid
        |HAVING max(ts) + INTERVAL '10 minutes'
        |  <= (SELECT max(ts) - INTERVAL '30 minutes' FROM events)""".stripMargin) { (s, dir) =>
      Streams.runToTable(
        Streams.sessionCountsAppend(Streams.eventsStream(s, dir),
          "10 minutes", "30 minutes"),
        "st9_mem", "append")
    },

    // ANSI-mode safety family: Spark 4 runs ANSI by default, where a bad
    // cast or overflow ERRORS a 1000-executor job — try_* is how a
    // curation pipeline survives dirty data. The oracle mirrors each
    // null-on-failure semantic with DuckDB's TRY_CAST / nullif guards.
    QuerySpec(
      "q55_try_fns",
      """SELECT o_orderkey,
        |  round(o_totalprice / nullif(o_orderkey % 3, 0), 4) AS safe_div,
        |  CAST(TRY_CAST(o_orderpriority AS BIGINT) AS BIGINT) AS bad_cast,
        |  CAST(TRY_CAST(CAST(o_orderkey % 100 AS VARCHAR) AS BIGINT) AS BIGINT) AS good_cast,
        |  (range(1, o_orderkey % 5 + 2))[5] AS maybe_5th
        |FROM orders""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).select(col("o_orderkey"),
        round(try_divide(col("o_totalprice"), pmod(col("o_orderkey"), lit(3))), 4).as("safe_div"),
        expr("try_cast(o_orderpriority AS BIGINT)").as("bad_cast"),
        expr("try_cast(CAST(o_orderkey % 100 AS STRING) AS BIGINT)").as("good_cast"),
        try_element_at(sequence(lit(1L), pmod(col("o_orderkey"), lit(5L)) + 1L),
          lit(5)).as("maybe_5th"))
    },

    // Custom streaming state (flatMapGroupsWithState) as a driver-oracled
    // spec: per-user running (count, sum) with update-mode emissions; the
    // final state per user is read back batch-robustly (max n is the last
    // emission) and must equal the batch aggregate.
    QuerySpec(
      "st8_stream_custom_state",
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      Streams.runToTable(
          Streams.runningUserTotals(Streams.eventsStream(s, dir)),
          "st8_mem", "update")
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n"),
          round(max_by(col("sum_v"), col("n")), 2).as("total_value"))
    },

    // Deterministic train/valid/test split by content-hash bucket — the
    // scale-correct split discipline: stable under re-runs, retries, and
    // repartitioning (a seeded randomSplit is none of those), and
    // exactly reproducible by any engine that has md5. 80/10/10 on the
    // document id.
    QuerySpec(
      "tx8_hash_split",
      """SELECT doc_id,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket
        |      FROM documents) b""".stripMargin) { (s, dir) =>
      val bucket = pmod(
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(100L))
      Tables.documents(s, dir).select(col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "valid")
          .otherwise("test").as("split"))
    },

    // Frame sampling (every 7th payload byte) as a registered query: the
    // corpus is ASCII so the oracle replays the byte-stride as a
    // character-stride and digests the same sampled payload.
    QuerySpec(
      "mm3_frame_sample",
      """SELECT doc_id,
        |  CAST((length(text) + 6) // 7 AS BIGINT) AS n_frames,
        |  md5(array_to_string(list_transform(range(0, (length(text) + 6) // 7),
        |                                     i -> substring(text, i * 7 + 1, 1)), '')) AS digest
        |FROM documents""".stripMargin) { (s, dir) =>
      Multimodal.attachFakeMedia(Tables.documents(s, dir))
        .select(col("doc_id"), Multimodal.frameSample(col("media"), 7).as("frames"))
        .select(col("doc_id"),
          size(col("frames")).cast("long").as("n_frames"),
          md5(aggregate(col("frames"), lit(Array.emptyByteArray),
            (acc, b) => concat(acc, b))).as("digest"))
    },

    // Scene-cut detection over the sampled frame stream: consecutive
    // sampled frames whose byte distance exceeds the threshold mark a
    // cut — the video-shot-segmentation shape on the same stub-decode
    // plumbing as mm3 (real codec slots in behind the same columns).
    // All in-row HOF integer math: no explode, no shuffle, scan-speed.
    QuerySpec(
      "mm6_scene_cut",
      """WITH f AS (
        |  SELECT doc_id, (length(text) + 6) // 7 AS n_frames,
        |    list_transform(range(0, (length(text) + 6) // 7),
        |      i -> ascii(substring(text, (i * 7 + 1)::INT, 1))) AS codes
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, n_frames,
        |    list_filter(range(1, n_frames),
        |      i -> abs(codes[i + 1] - codes[i]) > 40) AS cuts
        |  FROM f)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        |  len(cuts)::BIGINT AS n_cuts,
        |  CAST(coalesce(list_min(cuts), 0) AS BIGINT) AS first_cut
        |FROM d""".stripMargin) { (s, dir) =>
      val staged = Tables.fanOut(
        Tables.documents(s, dir).select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          floor((length(col("text")) + 6) / 7).cast("long").as("n_frames"),
          col("text"))
        .select(col("doc_id"), col("n_frames"),
          transform(sequence(lit(0L), col("n_frames") - 1),
            i => ascii(col("text").substr((i * 7 + 1).cast("int"), lit(1))))
            .as("codes"))
      staged
        .select(col("doc_id"), col("n_frames"),
          filter(sequence(lit(1L), col("n_frames") - 1),
            i => abs(element_at(col("codes"), (i + 1).cast("int"))
              - element_at(col("codes"), i.cast("int"))) > 40).as("cuts"))
        .select(col("doc_id"), col("n_frames"),
          size(col("cuts")).cast("long").as("n_cuts"),
          coalesce(array_min(col("cuts")), lit(0L)).as("first_cut"))
    },
  )
}
