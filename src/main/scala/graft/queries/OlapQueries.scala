package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 OLAP extras: skyline (Pareto-front) extraction, Benford
  * first-digit screening, and deterministic pagination — three query
  * shapes the relational breadth surface (§2.E) didn't yet cover, each
  * with a complete DuckDB hash oracle.
  */
object OlapQueries {

  def specs: Seq[QuerySpec] = Seq(

    // Skyline / Pareto front of parts: minimize price, maximize size.
    // Strict dominance (at least one strictly better, none worse). The
    // scale plan contracts the fact table to (distinct price → max size)
    // first — skyline membership only depends on that contraction — then
    // one window over the DIMENSION-sized contraction computes the best
    // size at any strictly lower price, and a broadcast join back tags
    // survivors. The oracle is the independent quadratic NOT EXISTS
    // formulation, so the contraction's correctness is itself verified.
    QuerySpec(
      "q102_skyline",
      """SELECT b.p_partkey, b.p_retailprice, b.p_size
        |FROM part b
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part a
        |  WHERE a.p_retailprice <= b.p_retailprice AND a.p_size >= b.p_size
        |    AND (a.p_retailprice < b.p_retailprice OR a.p_size > b.p_size))""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir)
        .select("p_partkey", "p_retailprice", "p_size")
      val ms = p.groupBy("p_retailprice").agg(max(col("p_size")).as("__ms"))
      // Window over distinct prices only (dimension-sized — the fact
      // table never funnels through one task).
      val w = Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
      val front = ms.withColumn("__cum", max(col("__ms")).over(w))
      p.join(broadcast(front), "p_retailprice")
        .where(col("p_size") === col("__ms") &&
          (col("__cum").isNull || col("p_size") > col("__cum")))
        .select("p_partkey", "p_retailprice", "p_size")
    },

    // Benford's-law first-digit screening of order totals — the
    // fraud/synthetic-data smell test. Leading digit comes from the
    // integer part's decimal string (integer→string is engine-identical,
    // unlike double formatting); expected shares and the chi-square
    // terms are fixed-pointed after one ln call per digit.
    QuerySpec(
      "q103_benford",
      """WITH counts AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    count(*)::BIGINT AS n
        |  FROM orders GROUP BY 1
        |), tot AS (SELECT sum(n)::DOUBLE AS t FROM counts)
        |SELECT digit, n,
        |  CAST(floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 10000 + 0.5) AS BIGINT) AS exp_bp,
        |  CAST(floor(
        |    (n - t * (ln(1.0 + 1.0 / digit) / ln(10.0)))
        |      * (n - t * (ln(1.0 + 1.0 / digit) / ln(10.0)))
        |      / (t * (ln(1.0 + 1.0 / digit) / ln(10.0))) * 10000 + 0.5) AS BIGINT) AS chi_bp
        |FROM counts, tot""".stripMargin) { (s, dir) =>
      val counts = Tables.orders(s, dir)
        .groupBy(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).cast("double").as("t"))
      val expP = log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))
      counts.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          floor(expP * 10000 + 0.5).cast("long").as("exp_bp"),
          floor((col("n") - col("t") * expP) * (col("n") - col("t") * expP)
            / (col("t") * expP) * 10000 + 0.5).cast("long").as("chi_bp"))
    },

    // Deterministic pagination: total order + LIMIT/OFFSET (page 3 of
    // 20). Spark plans offset+limit as a single CollectLimit with skip —
    // no full materialization; the total order must be tie-free
    // (orderkey tiebreak) for pages to be stable across engines.
    QuerySpec(
      "q104_page_offset",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 40""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(40).limit(20)
    },
  )
}
