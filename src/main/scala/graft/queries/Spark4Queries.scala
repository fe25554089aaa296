package graft.queries

import graft.{QuerySpec, Tables}
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Spark 4 feature surface: the VARIANT semi-structured type, string
  * collations, mergeable Datasketches HLL, and the `transformWithState`
  * arbitrary-state API — each registered as a first-class engine spec so
  * a user migrating from the reference gets the modern forms, not just
  * the classic ones.
  */
object Spark4Queries {

  val specs: Seq[QuerySpec] = Seq(

    // --- VARIANT type ----------------------------------------------------
    // Semi-structured ingestion without a schema: parse once to VARIANT,
    // extract typed paths lazily. At 100 TB this is the schema-on-read
    // path for ragged JSON (the reference's comments payloads) — VARIANT
    // keeps a compact binary encoding in parquet instead of re-parsing
    // strings per query. The oracle replays extraction + minification
    // with DuckDB's JSON type.
    QuerySpec(
      "q76_variant",
      """SELECT event_id,
        |  json_extract(props, '$.k')::BIGINT AS k,
        |  json_extract(props, '$.missing')::BIGINT AS k_missing,
        |  json(props)::VARCHAR AS vj
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "bigint").as("k"),
        try_variant_get(parse_json(col("props")), "$.missing", "bigint").as("k_missing"),
        to_json(parse_json(col("props"))).as("vj"))
    },

    // --- collations ------------------------------------------------------
    // Spark 4 collated comparison (UTF8_LCASE) doing a case-insensitive
    // GROUP BY natively — no lower() projection of the key — over a
    // deterministically case-mangled segment column. The representative
    // is min(original) so the output is deterministic; the oracle gets
    // the same groups via lower().
    QuerySpec(
      "q75_collation",
      """WITH mangled AS (
        |  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
        |              ELSE lower(c_mktsegment) END AS seg
        |  FROM customer)
        |SELECT min(seg) AS rep_seg, CAST(count(*) AS BIGINT) AS n
        |FROM mangled GROUP BY lower(seg)""".stripMargin) { (s, dir) =>
      val seg = when(pmod(col("c_custkey"), lit(2)) === 0, upper(col("c_mktsegment")))
        .otherwise(lower(col("c_mktsegment")))
      Tables.customer(s, dir).select(seg.as("seg"))
        .groupBy(collate(col("seg"), "UTF8_LCASE"))
        .agg(min(col("seg")).as("rep_seg"), count(lit(1)).as("n"))
        .select(col("rep_seg"), col("n"))
    },

    // --- mergeable HLL sketches ------------------------------------------
    // The scale pattern behind approx_count_distinct: build a Datasketches
    // HLL per shard (here: per source), persist/merge them, estimate from
    // the union — how a 100 TB pipeline keeps daily distinct-user counts
    // mergeable across days without re-scanning. Deterministic estimates
    // (rows-only check; Spark4Spec asserts the error bound vs exact).
    QuerySpec.noOracle("q74_hll_mergeable") { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val perSource = docs.groupBy(col("source"))
        .agg(hll_sketch_agg(col("doc_id")).as("sk"),
          count_distinct(col("doc_id")).as("exact_per_source"))
      perSource.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_distinct"),
        sum(col("exact_per_source")).as("exact_distinct"),
        count(lit(1)).as("n_sketches"))
    },

    // --- lateral column aliases ------------------------------------------
    // Spark 4 lateral column aliases: a SELECT item referencing an alias
    // defined earlier in the SAME select list (including aggregate
    // aliases) — the ergonomic form of chained derivations without a
    // wrapping subquery. All-integer math so the chain hash-matches; the
    // oracle states the same semantics with an explicit CTE (the
    // pre-lateral spelling).
    QuerySpec(
      "q193_lateral_alias",
      """WITH a AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev_c
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n, rev_c,
        |  rev_c // n AS avg_rev_c,
        |  ((rev_c // n) * 7) // 100 AS est_tax_c
        |FROM a""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders_lca_v")
      s.sql(
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
          |  sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS rev_c,
          |  rev_c div n AS avg_rev_c,
          |  (avg_rev_c * 7) div 100 AS est_tax_c
          |FROM orders_lca_v GROUP BY o_orderpriority""".stripMargin)
    },

    // --- SQL session variables -------------------------------------------
    // Spark 4 session variables (DECLARE / SET VAR): the SQL-native way
    // to parameterize a templated query per run — the engine twin of
    // q131's named parameter markers, but stateful across statements
    // (a scheduler sets the run's variables once, every statement reads
    // them). DECLARE OR REPLACE keeps the spec idempotent per session;
    // Verify's per-worker `newSession` clones isolate the variables
    // under concurrency. The oracle inlines the post-SET values.
    QuerySpec(
      "q194_sql_variables",
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 2000.0
        |GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      s.sql("DECLARE OR REPLACE VARIABLE graft_seg STRING DEFAULT 'BUILDING'")
      s.sql("DECLARE OR REPLACE VARIABLE graft_minbal DOUBLE DEFAULT 1000.0")
      s.sql("SET VAR graft_minbal = 2000.0") // the per-run override
      Tables.customer(s, dir).createOrReplaceTempView("customer_var_v")
      s.sql(
        """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
          |  sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS bal_c
          |FROM customer_var_v
          |WHERE c_mktsegment = graft_seg AND c_acctbal > graft_minbal
          |GROUP BY c_nationkey""".stripMargin)
    },

    // --- transformWithState ----------------------------------------------
    // The Spark 4 successor to flatMapGroupsWithState (typed state
    // handles, TTL, timers, state-schema evolution), running the same
    // per-user totals as st8 under the RocksDB provider the API
    // requires — and checked against the same batch oracle.
    QuerySpec(
      "st10_transform_with_state",
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      Streams.runToTableRocksDB(
          Streams.runningUserTotalsTws(Streams.eventsStream(s, dir)),
          "st10_mem", "update")
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n"),
          round(max_by(col("sum_v"), col("n")), 2).as("total_value"))
    },

    // --- Spark 4.1 SQL conveniences in one statement ---------------------
    // `GROUP BY ALL` (infer grouping keys), `listagg(DISTINCT …) WITHIN
    // GROUP (ORDER BY …)` (the ANSI ordered string aggregate), `SELECT *
    // EXCEPT (…)` (drop a helper column without re-listing the
    // projection), and `ORDER BY ALL` — the query-authoring surface a
    // migrating user expects to keep. The oracle states the same
    // semantics in portable spellings (explicit GROUP BY, string_agg
    // with ORDER BY, explicit projection), proving the sugar desugars
    // to the exact same rows.
    QuerySpec(
      "q198_sql_sugar",
      """SELECT l_linestatus,
        |  string_agg(DISTINCT l_returnflag, '|' ORDER BY l_returnflag) AS flags,
        |  count(*)::BIGINT AS n,
        |  CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS qty
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_sugar_v")
      s.sql(
        """SELECT * EXCEPT (qty_raw) FROM (
          |  SELECT l_linestatus,
          |    listagg(DISTINCT l_returnflag, '|')
          |      WITHIN GROUP (ORDER BY l_returnflag) AS flags,
          |    CAST(count(*) AS BIGINT) AS n,
          |    sum(l_quantity) AS qty_raw,
          |    CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS qty
          |  FROM lineitem_sugar_v GROUP BY ALL)
          |ORDER BY ALL""".stripMargin)
    },

    // Spark 4.1 `approx_top_k` (Datasketches frequent-items under the
    // hood): heavy-hitter counts with bounded state — the built-in twin
    // of q143's hand-rolled count-min and tx16's top-k-plus-other. On a
    // column whose cardinality fits maxItemsTracked the sketch is EXACT
    // (no item ever evicts), so unlike q31/q57/q74 this
    // engine-specific-sketch spec carries a FULL oracle: k spans the
    // whole enum, making the result the exact frequency table
    // regardless of tie order at any boundary.
    QuerySpec(
      "q204_approx_top_k",
      """SELECT event_type, count(*)::BIGINT AS cnt
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .agg(expr("approx_top_k(event_type, 5)").as("t"))
        .select(explode(col("t")).as("e"))
        .select(col("e.item").as("event_type"), col("e.count").as("cnt"))
    }
  )
}
