package graft.queries

import graft.{QuerySpec, Tables}
import graft.operators.Relational
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Relational extensions beyond the round-1 core (SURVEY §2.E continued):
  * pivot, exact percentiles, session windows, as-of join, range join,
  * approximate distinct — plus the Structured Streaming surface run to
  * completion with `Trigger.AvailableNow` and oracled against the
  * batch-equivalent SQL (stream/batch parity is the correctness claim).
  */
object ExtQueries {

  val specs: Seq[QuerySpec] = Seq(

    // Pivot (columnar reshape): order counts per priority × status.
    // Missing combinations are 0 on both sides (coalesce ↔ FILTER-less
    // conditional sum).
    QuerySpec(
      "q26_pivot",
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
    },

    // Exact interpolated percentiles (Spark `percentile` ↔ DuckDB
    // `quantile_cont`) — the exact baseline for approx_percentile at scale.
    QuerySpec(
      "q27_percentiles",
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 2) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(percentile(col("o_totalprice"), lit(0.5)), 2).as("p50"),
          round(percentile(col("o_totalprice"), lit(0.9)), 2).as("p90"),
          round(percentile(col("o_totalprice"), lit(0.99)), 2).as("p99"))
        .orderBy(col("o_orderstatus"))
    },

    // Batch session windows (gap 10 min) via the built-in session_window;
    // oracle is the classic gaps-and-islands rewrite. Spark merges
    // adjacent sessions INCLUSIVELY: an event exactly one gap after the
    // previous one still merges (verified empirically on 4.1.2), so a
    // new session begins only at diff > gap; session_end = last_ts + gap.
    QuerySpec(
      "q28_session_window",
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
      Streams.sessionCounts(Tables.events(s, dir), "10 minutes")
    },

    // As-of join: every event picks up the customer's latest order key as
    // of the event time (union-and-carry-forward plan; see
    // Relational.asofJoin). Right side pre-aggregated to one row per
    // (custkey, orderdate) — the determinism contract ASOF requires.
    QuerySpec(
      "q29_asof_join",
      """SELECT e.event_id AS event_id, e.user_id AS user_id,
        |  r.last_orderkey AS last_orderkey
        |FROM events e ASOF LEFT JOIN (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
        |  FROM orders GROUP BY 1, 2) r
        |ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate""".stripMargin) { (s, dir) =>
      val lastOrder = Tables.orders(s, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("last_orderkey"))
      Relational.asofJoin(
          Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
          "user_id", "ts",
          lastOrder, "o_custkey", "o_orderdate")
        .select(col("event_id"), col("user_id"), col("last_orderkey"))
    },

    // Range join: per event, how many events by the same user land in the
    // following 24 hours. Equi-join on user + range predicate — Spark
    // plans the equality as the join key and the range as a join filter,
    // so no cross product materializes.
    QuerySpec(
      "q30_range_join",
      """SELECT a.event_id AS event_id,
        |  CAST(count(b.event_id) AS BIGINT) AS n_next_24h
        |FROM events a LEFT JOIN events b
        |  ON b.user_id = a.user_id AND b.ts > a.ts
        |  AND b.ts <= a.ts + INTERVAL '24 hours'
        |GROUP BY a.event_id""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val b = e.select(col("event_id").as("b_event_id"), col("user_id").as("b_user_id"),
        col("ts").as("b_ts"))
      e.join(b,
          col("b_user_id") === col("user_id") && col("b_ts") > col("ts") &&
            col("b_ts") <= col("ts") + expr("INTERVAL 24 HOURS"),
          "left_outer")
        .groupBy(col("event_id"))
        .agg(count(col("b_event_id")).as("n_next_24h"))
    },

    // HLL++ approximate distinct next to the exact answer (no ANSI-SQL
    // oracle for the sketch — driver records the rows-only check; the
    // ScalaTest asserts the error bound instead).
    QuerySpec.noOracle("q31_approx_distinct") { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy(col("event_type"))
    },

    // --- Structured Streaming, run to completion (AvailableNow) and
    // oracled against the batch-equivalent aggregation: the stream/batch
    // parity guarantee. ---

    // Tumbling 1h windows per event type.
    QuerySpec(
      "st1_stream_tumbling",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Streams.runToTable(
        Streams.tumblingCounts(Streams.eventsStream(s, dir), "1 hour"),
        "st1_mem", "complete")
    },

    // Sliding windows (1h wide, 30min slide): every event belongs to
    // exactly two windows — the oracle unnests both bucket starts.
    QuerySpec(
      "st2_stream_sliding",
      """SELECT ws AS window_start, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
        |  FROM events) t
        |GROUP BY ws""".stripMargin) { (s, dir) =>
      Streams.runToTable(
        Streams.slidingCounts(Streams.eventsStream(s, dir), "1 hour", "30 minutes"),
        "st2_mem", "complete")
    },

    // Streaming identity dedup with watermark-bounded state; event_id is
    // unique in the harness data, so the streamed output equals the input
    // projection (the state-store plumbing is what's under test; the
    // planted-duplicate case lives in the ScalaTest).
    QuerySpec(
      "st3_stream_dedup",
      "SELECT event_id, user_id, event_type FROM events") { (s, dir) =>
      // noDataFlush=false is output-identical here: streaming dedup
      // emits a row exactly once, at its FIRST DATA arrival; the
      // watermark-advance flush batch only evicts state and can emit
      // nothing (oracle-verified).
      Streams.runToTable(
        Streams.dedupStream(Streams.eventsStream(s, dir), "1 hour"),
        "st3_mem", "append", noDataFlush = false)
    },

    // Stream-static join: the event stream enriched against the batch
    // customer dimension (broadcast per micro-batch), then aggregated —
    // the standard streaming-enrichment shape.
    QuerySpec(
      "st4_stream_static_join",
      """SELECT c.c_mktsegment AS c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(e.value), 2) AS total_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val stream = Streams.eventsStream(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      Streams.runToTable(stream, "st4_mem", "complete")
    },

    // dropDuplicatesWithinWatermark: dedup state keyed only on the id
    // columns, evictable once older than the watermark — the practical
    // streaming dedup when event-time skew between duplicates is bounded
    // (plain dropDuplicates keys state forever without event time).
    QuerySpec(
      "st6_stream_dedup_within_watermark",
      "SELECT DISTINCT event_id, user_id FROM events") { (s, dir) =>
      // noDataFlush=false: dropDuplicatesWithinWatermark emits each key's
      // first DATA arrival only; the flush batch evicts expired dedup
      // state and emits nothing (oracle-verified).
      Streams.runToTable(
        Streams.eventsStream(s, dir)
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("event_id", "user_id")
          .select(col("event_id"), col("user_id")),
        "st6_mem", "append", noDataFlush = false)
    },

    // Stream-stream inner join with watermarks and a time-range bound
    // (the join Structured Streaming requires the bound for — state on
    // both sides is evicted past the watermark). AvailableNow over the
    // static file makes the result equal the batch join the oracle runs.
    QuerySpec(
      "st5_stream_stream_join",
      """SELECT a.event_id AS event_id, b.event_id AS next_event_id
        |FROM events a JOIN events b
        |  ON b.user_id = a.user_id AND b.ts > a.ts
        |  AND b.ts <= a.ts + INTERVAL '1 hour'""".stripMargin) { (s, dir) =>
      val left = Streams.eventsStream(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withWatermark("ts", "2 hours")
      val right = Streams.eventsStream(s, dir)
        .select(col("event_id").as("next_event_id"), col("user_id").as("r_user_id"),
          col("ts").as("r_ts"))
        .withWatermark("r_ts", "2 hours")
      val joined = left.join(right,
        col("r_user_id") === col("user_id") && col("r_ts") > col("ts") &&
          col("r_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
        .select(col("event_id"), col("next_event_id"))
      // noDataFlush=false: an INNER stream-stream join emits a pair the
      // moment both sides have arrived (all within the one data batch
      // under AvailableNow); the flush batch only evicts past-watermark
      // state and emits nothing (oracle-verified).
      Streams.runToTable(joined, "st5_mem", "append", noDataFlush = false)
    },

    // Watermarked stream-stream LEFT OUTER join: every event left-joined
    // to purchases by the same user in the next 30 minutes; unmatched
    // rows emit null-extended once the watermark passes their join
    // window. Outer-row emission is watermark-gated, and the GLOBAL
    // watermark is the min across inputs — the filtered purchase side's
    // watermark tracks the last PURCHASE (Catalyst pushes a
    // non-watermark-column filter below the watermark node, so filter
    // placement cannot change this). The comparable set is therefore
    // rows whose join window is strictly inside max(purchase ts) − 2 h;
    // both sides restrict to ts ≤ that − 31 min — the 1-minute margin
    // keeps the eviction boundary's >=/> semantics out of the compared
    // set (the st9 closed-sessions recipe).
    QuerySpec(
      "st11_stream_left_outer_join",
      """SELECT a.event_id AS event_id, b.event_id AS next_purchase_id
        |FROM events a LEFT JOIN (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') b
        |  ON b.user_id = a.user_id AND b.ts > a.ts
        |  AND b.ts <= a.ts + INTERVAL '30 minutes'
        |WHERE a.ts <= (SELECT max(ts) - INTERVAL '2 hours' - INTERVAL '31 minutes'
        |               FROM events WHERE event_type = 'purchase')""".stripMargin) { (s, dir) =>
      val left = Streams.eventsStream(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withWatermark("ts", "2 hours")
      val right = Streams.eventsStream(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("next_purchase_id"),
          col("user_id").as("r_user_id"), col("ts").as("r_ts"))
        .withWatermark("r_ts", "2 hours")
      val joined = left.join(right,
        col("r_user_id") === col("user_id") && col("r_ts") > col("ts") &&
          col("r_ts") <= col("ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
        .select(col("event_id"), col("next_purchase_id"), col("ts"))
      val res = Streams.runToTable(joined, "st11_mem", "append")
      val cutoff = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .agg((max(col("ts")) - expr("INTERVAL 2 HOURS")
          - expr("INTERVAL 31 MINUTES")).as("__cutoff"))
      res.crossJoin(broadcast(cutoff))
        .where(col("ts") <= col("__cutoff"))
        .select(col("event_id"), col("next_purchase_id"))
    },

    // Streaming UNION: two independently filtered streams of the same
    // source merged before a tumbling aggregation — the multi-topic
    // ingestion shape (N sources → one pipeline). Union of streams is
    // plan-level (no state of its own); the downstream windowed agg sees
    // one stream.
    QuerySpec(
      "st12_stream_union",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events WHERE event_type IN ('view', 'purchase')
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val views = Streams.eventsStream(s, dir)
        .where(col("event_type") === "view")
      val purchases = Streams.eventsStream(s, dir)
        .where(col("event_type") === "purchase")
      val unioned = views.union(purchases)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("n"))
      Streams.runToTable(unioned, "st12_mem", "complete")
    },

    // Stream-stream FULL OUTER join — st11 plus right-side nulls
    // (purchases with no event in the preceding 30 minutes). Eviction
    // boundaries differ per side: a LEFT row closes when the watermark
    // passes ts + 30 min, a RIGHT row when it passes r_ts itself (its
    // earliest possible match is r_ts − 30 min, its latest left arrival
    // r_ts) — so each side filters to its own closed set, with the same
    // 1-minute margin. The global watermark again tracks the filtered
    // purchase side's max.
    QuerySpec(
      "st13_stream_full_outer_join",
      """WITH w AS (
        |  SELECT max(ts) - INTERVAL '2 hours' AS wm FROM events
        |  WHERE event_type = 'purchase')
        |SELECT a.event_id AS event_id, b.event_id AS next_purchase_id
        |FROM events a FULL OUTER JOIN (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') b
        |  ON b.user_id = a.user_id AND b.ts > a.ts
        |  AND b.ts <= a.ts + INTERVAL '30 minutes'
        |WHERE (a.event_id IS NULL OR a.ts <= (SELECT wm - INTERVAL '31 minutes' FROM w))
        |  AND (b.event_id IS NULL OR b.ts <= (SELECT wm - INTERVAL '1 minute' FROM w))""".stripMargin) { (s, dir) =>
      val left = Streams.eventsStream(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withWatermark("ts", "2 hours")
      val right = Streams.eventsStream(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("next_purchase_id"),
          col("user_id").as("r_user_id"), col("ts").as("r_ts"))
        .withWatermark("r_ts", "2 hours")
      val joined = left.join(right,
        col("r_user_id") === col("user_id") && col("r_ts") > col("ts") &&
          col("r_ts") <= col("ts") + expr("INTERVAL 30 MINUTES"),
        "full_outer")
        .select(col("event_id"), col("next_purchase_id"), col("ts"), col("r_ts"))
      val res = Streams.runToTable(joined, "st13_mem", "append")
      val wm = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .agg((max(col("ts")) - expr("INTERVAL 2 HOURS")).as("__wm"))
      res.crossJoin(broadcast(wm))
        .where(
          (col("event_id").isNull ||
            col("ts") <= col("__wm") - expr("INTERVAL 31 MINUTES")) &&
          (col("next_purchase_id").isNull ||
            col("r_ts") <= col("__wm") - expr("INTERVAL 1 MINUTE")))
        .select(col("event_id"), col("next_purchase_id"))
    },

    // Stream-stream LEFT SEMI join: events followed by a purchase from
    // the same user within 30 minutes, emitted once on first match —
    // matches emit as they arrive (no watermark gating of the OUTPUT;
    // the watermark only bounds join state), so the full matched set is
    // comparable with no cutoff, unlike st11/st13's outer rows.
    QuerySpec(
      "st14_stream_semi_join",
      """SELECT a.event_id, a.user_id
        |FROM events a
        |WHERE EXISTS (
        |  SELECT 1 FROM events b
        |  WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
        |    AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '30 minutes')""".stripMargin) { (s, dir) =>
      val left = Streams.eventsStream(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withWatermark("ts", "2 hours")
      val right = Streams.eventsStream(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"))
        .withWatermark("r_ts", "2 hours")
      val joined = left.join(right,
        col("r_user_id") === col("user_id") && col("r_ts") > col("ts") &&
          col("r_ts") <= col("ts") + expr("INTERVAL 30 MINUTES"),
        "left_semi")
        .select(col("event_id"), col("user_id"))
      // noDataFlush=false: a LEFT SEMI stream-stream join emits the left
      // row at its first match, which under AvailableNow happens inside
      // the one data batch; the flush batch only evicts state and emits
      // nothing (unlike st11/st13's outer rows — oracle-verified).
      Streams.runToTable(joined, "st14_mem", "append", noDataFlush = false)
    },

    // --- scalar-function breadth (§2.E: math / regexp / date / array /
    // map categories, each against the DuckDB oracle) ---

    // Math functions. sqrt/abs/ceil/floor are IEEE-exact across engines;
    // ln is rounded to 6dp (libm implementations may differ in the last
    // ULP).
    QuerySpec(
      "q32_math_fns",
      """SELECT o_orderkey,
        |  round(sqrt(o_totalprice), 6) AS sqrt_price,
        |  round(ln(o_totalprice), 6) AS ln_price,
        |  abs(o_totalprice - 100000.0) AS abs_delta,
        |  CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS ceil_k,
        |  CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS floor_k
        |FROM orders WHERE o_totalprice > 0""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).where(col("o_totalprice") > 0)
        .select(col("o_orderkey"),
          round(sqrt(col("o_totalprice")), 6).as("sqrt_price"),
          round(log(col("o_totalprice")), 6).as("ln_price"),
          abs(col("o_totalprice") - 100000.0).as("abs_delta"),
          ceil(col("o_totalprice") / 1000.0).cast("long").as("ceil_k"),
          floor(col("o_totalprice") / 1000.0).cast("long").as("floor_k"))
    },

    // Regexp extraction/matching (Java regex vs RE2 agree on this
    // conservative pattern subset).
    QuerySpec(
      "q33_regexp_fns",
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  CAST(CASE WHEN regexp_matches(p_name, '[0-9]') THEN 1 ELSE 0 END AS BIGINT) AS has_digit,
        |  regexp_replace(p_type, '[aeiou]', '_', 'g') AS devoweled
        |FROM part""".stripMargin) { (s, dir) =>
      Tables.part(s, dir).select(col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        when(col("p_name").rlike("[0-9]"), 1L).otherwise(0L).as("has_digit"),
        regexp_replace(col("p_type"), "[aeiou]", "_").as("devoweled"))
    },

    // Date/time arithmetic on the event timestamps.
    QuerySpec(
      "q34_date_fns",
      """SELECT event_id,
        |  CAST(year(ts) AS BIGINT) AS y,
        |  CAST(month(ts) AS BIGINT) AS m,
        |  CAST(day(ts) AS BIGINT) AS d,
        |  CAST(hour(ts) AS BIGINT) AS h,
        |  CAST(ts AS DATE) + INTERVAL '7 days' AS week_later,
        |  date_trunc('hour', ts) AS hour_start
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"),
        (to_date(col("ts")) + expr("INTERVAL 7 DAYS")).cast("timestamp_ntz").as("week_later"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_start"))
    },

    // Array functions over tokenized text (sort/slice/contains/distinct).
    QuerySpec(
      "q35_array_fns",
      """SELECT doc_id,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
        |  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3,
        |  CAST(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END AS BIGINT) AS has_spark
        |FROM (SELECT doc_id,
        |        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |      FROM documents) t""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
          array_join(slice(array_sort(array_distinct(col("toks"))), 1, 3), ",").as("first3"),
          when(array_contains(col("toks"), "spark"), 1L).otherwise(0L).as("has_spark"))
    },

    // Explicit GROUPING SETS (beyond rollup/cube) through the SQL front
    // door, with grouping() flags disambiguating NULL-as-total from
    // NULL-as-value.
    QuerySpec(
      "q37_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    },

    // IN / NOT IN subqueries (rewritten by Catalyst to semi/anti joins —
    // the SQL-form counterpart of q5/q6).
    QuerySpec(
      "q38_in_subquery",
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
        |  AND s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_discount > 0.09)""".stripMargin) { (s, dir) =>
      Tables.supplier(s, dir).createOrReplaceTempView("supplier_in")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_in")
      s.sql(
        """SELECT s_suppkey, s_name FROM supplier_in
          |WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem_in WHERE l_quantity > 49)
          |  AND s_suppkey NOT IN (SELECT l_suppkey FROM lineitem_in WHERE l_discount > 0.09)""".stripMargin)
    },

    // Salted skew join: events (hot side, salted on event_id) x customer
    // (build side, replicated per salt) — result provably identical to
    // the plain join the oracle runs. The technique for power-law keys
    // when AQE's skew split doesn't apply.
    QuerySpec(
      "q39_salted_join",
      """SELECT c.c_mktsegment AS c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(e.value), 2) AS total_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      Relational.saltedJoin(
          Tables.events(s, dir).select(col("event_id"), col("user_id"), col("value")),
          "user_id", "event_id",
          Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
          "c_custkey", saltFactor = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    },

    // Map column: parse the JSON props into map<string,long>, explode
    // entries. (DuckDB side reads the same entries through its JSON
    // functions — the harness props objects carry the single key "k".)
    QuerySpec(
      "q36_map_fns",
      """SELECT event_id, 'k' AS map_key,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS map_value
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL""".stripMargin) { (s, dir) =>
      Tables.fanOut(Tables.events(s, dir).select("event_id", "props"))
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("m"))
        .select(col("event_id"), explode(col("m")).as(Seq("map_key", "map_value")))
        .where(col("map_value").isNotNull)
    }
  )
}
