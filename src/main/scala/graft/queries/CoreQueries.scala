package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational breadth over the harness tables (SURVEY §2.E): every
  * standard operator category the reference lacks, expressed
  * declaratively so Catalyst plans it (pushdown, partial aggregation,
  * broadcast joins, `TakeOrderedAndProjectExec`, AQE).
  *
  * Scale conventions, applied throughout:
  *  - dimension tables (region/nation/supplier) joined via `broadcast()`;
  *  - no un-partitioned windows over full tables;
  *  - double aggregates rounded identically in Spark and the DuckDB
  *    oracle, so floating-point partial-agg order can't flip the hash;
  *  - `count(*)`-style outputs cast to BIGINT on both sides.
  */
object CoreQueries {

  val specs: Seq[QuerySpec] = Seq(

    // TPC-H Q1-shaped scan → filter → hash aggregate → sort (R1/R2/R7).
    QuerySpec(
      "q1_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= lit("2000-09-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Fact ⋈ dim ⋈ dim with broadcast dimensions (R5 family).
    QuerySpec(
      "q2_join_revenue_by_nation",
      """SELECT n.n_name AS n_name, r.r_name AS r_name,
        |  round(sum(o.o_totalprice), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY n.n_name, r.r_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"), col("r_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    },

    // Left outer join preserving order-less customers.
    QuerySpec(
      "q3_join_left_outer",
      """SELECT c.c_custkey AS c_custkey,
        |  CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
        |  round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spend
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0)), 2).as("total_spend"))
    },

    // Full outer join of two aggregates.
    QuerySpec(
      "q4_join_full_outer",
      """WITH sc AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers
        |            FROM supplier GROUP BY s_nationkey),
        |     cc AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
        |            FROM customer GROUP BY c_nationkey)
        |SELECT coalesce(sc.s_nationkey, cc.c_nationkey) AS nationkey,
        |       sc.n_suppliers AS n_suppliers, cc.n_customers AS n_customers
        |FROM sc FULL OUTER JOIN cc ON sc.s_nationkey = cc.c_nationkey""".stripMargin) { (s, dir) =>
      val sc = Tables.supplier(s, dir).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cc = Tables.customer(s, dir).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      sc.join(cc, col("s_nationkey") === col("c_nationkey"), "full_outer")
        .select(coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          col("n_suppliers"), col("n_customers"))
    },

    // Left-semi (EXISTS) and left-anti (NOT EXISTS).
    QuerySpec(
      "q5_join_semi",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },
    QuerySpec(
      "q6_join_anti",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // Distinct aggregation (shuffle-twice shape Catalyst plans itself).
    QuerySpec(
      "q7_agg_distinct",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },

    // ROLLUP / CUBE grouping sets.
    QuerySpec(
      "q8_agg_rollup",
      """SELECT n.n_name AS n_name, c.c_mktsegment AS c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_cust,
        |  round(sum(c.c_acctbal), 2) AS sum_bal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY ROLLUP (n.n_name, c.c_mktsegment)""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
    },
    QuerySpec(
      "q9_agg_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
    },

    // Ranking window, partitioned (never global) — top-3 orders/customer.
    QuerySpec(
      "q10_window_topn_per_key",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .where(col("rn") <= 3)
    },

    // lag/lead analytics over a deterministic per-user order.
    QuerySpec(
      "q11_window_lag_lead",
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
    },

    // Running-sum frame (ROWS UNBOUNDED PRECEDING).
    QuerySpec(
      "q12_window_running_sum",
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 2).as("running_value"))
    },

    // Top-K with deterministic tiebreak → TakeOrderedAndProjectExec.
    QuerySpec(
      "q13_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // Total sort (range-partitioned SortExec).
    QuerySpec(
      "q14_sort_total",
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |ORDER BY s_acctbal DESC, s_suppkey""".stripMargin) { (s, dir) =>
      Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    },

    // Set operations (set semantics on both sides).
    QuerySpec(
      "q15_set_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersect(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
    },
    QuerySpec(
      "q16_set_except",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
        .except(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
    },
    QuerySpec(
      "q17_set_union",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
        .union(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
        .distinct()
    },

    // Date truncation + daily aggregate over the event stream table.
    QuerySpec(
      "q18_date_daily_agg",
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("day"), col("event_type"))
    },

    // String scalar functions.
    QuerySpec(
      "q19_string_fns",
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substr(p_name, 1, 8) AS name_prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || '|' || p_type AS brand_type
        |FROM part""".stripMargin) { (s, dir) =>
      Tables.part(s, dir).select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        // concat (not concat_ws): `||` propagates NULL, concat_ws skips
        // NULL args — must match the oracle's NULL semantics exactly.
        concat(col("p_brand"), lit("|"), col("p_type")).as("brand_type"))
    },

    // JSON scalar extraction from events.props (JSON text column).
    QuerySpec(
      "q20_json_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    },

    // Array explode + word count (generator + agg).
    QuerySpec(
      "q21_explode_wordcount",
      """SELECT w AS word, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> x <> '')) AS w
        |  FROM documents) t
        |GROUP BY w ORDER BY word""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("word"))
    },

    // Scalar subquery in WHERE (Catalyst rewrites to broadcast).
    QuerySpec(
      "q22_scalar_subquery",
      """SELECT p_partkey, p_retailprice FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir)
      val avgPrice = p.agg(avg(col("p_retailprice")).as("__avg_price"))
      p.join(broadcast(avgPrice), col("p_retailprice") > col("__avg_price"), "inner")
        .select(col("p_partkey"), col("p_retailprice"))
    },

    // HAVING (filter above aggregate).
    QuerySpec(
      "q23_having",
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 600""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"))
        .where(col("n_items") > 600)
    },

    // Conditional aggregation (CASE WHEN inside agg).
    QuerySpec(
      "q24_conditional_agg",
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("long").as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).cast("long").as("n_p"))
        .orderBy(col("o_orderpriority"))
    },

    // The engine's SQL front door: the same CTE/WITH shape as the
    // reference's query (a), executed via spark.sql over temp views (R6).
    QuerySpec(
      "q25_sql_cte",
      """WITH spend AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT c.c_mktsegment AS c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  round(max(s.spend), 2) AS max_spend
        |FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
        |GROUP BY c.c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      s.sql(
        """WITH spend AS (
          |  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
          |  FROM orders_v GROUP BY o_custkey)
          |SELECT c.c_mktsegment AS c_mktsegment,
          |  CAST(count(*) AS BIGINT) AS n_customers,
          |  round(max(s.spend), 2) AS max_spend
          |FROM customer_v c JOIN spend s ON c.c_custkey = s.o_custkey
          |GROUP BY c.c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }
  )
}
