package graft.queries

import graft.{QuerySpec, Tables}
import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 graph-analytics surface over the deterministic synthetic
  * graphs on the event users (the q94 PageRank contract): triangle
  * counting / clustering coefficients, synchronous label propagation,
  * and BFS hop distances — all integer-exact, so every spec carries a
  * complete DuckDB hash oracle, including every iteration of the two
  * iterative operators (recursive CTEs carrying the state vector as a
  * LIST, the q94 recipe).
  *
  * Reference tie-in: the reference's social graph is implicit in its
  * FK edges (users→posts→comments, `/root/reference/sql/schema.sql`);
  * these operators are the analytics a social-graph pipeline runs on
  * exactly that edge shape (who-comments-on-whom), expressed over the
  * harness's deterministic stand-in graph.
  */
object GraphQueries {

  /** Dense 0..n−1 node numbering over the distinct event users — the
    * same ranked-id contract q94 uses, minted scale-safe by
    * [[Graph.stagedUserNodes]] (range-bucketed rank, no global window;
    * one persisted copy shared by every graph spec in the session). */
  private def rankedUsers(s: SparkSession, dir: String): (DataFrame, Long) =
    Graph.stagedUserNodes(s, dir)

  private val nodesSql =
    """nodes AS (
      |  SELECT row_number() OVER (ORDER BY user_id) - 1 AS r
      |  FROM (SELECT DISTINCT user_id FROM events)
      |), params AS (SELECT count(*)::BIGINT AS n FROM nodes)""".stripMargin

  /** Symmetrized canonical edges from raw (x, y) pairs in `eraw`. */
  private val symEdgeSql =
    """e AS (SELECT DISTINCT u, v FROM (
      |  SELECT x AS u, y AS v FROM eraw WHERE x <> y
      |  UNION ALL SELECT y, x FROM eraw WHERE x <> y)
      |), adj_t AS (
      |  SELECT list(coalesce(a.vs, []) ORDER BY nd.r) AS adj
      |  FROM nodes nd LEFT JOIN (
      |    SELECT u, list(v) AS vs FROM e GROUP BY u) a ON a.u = nd.r)""".stripMargin

  def specs: Seq[QuerySpec] = Seq(

    // Per-node triangle counts + local clustering coefficient over the
    // ring/skip/jump graph (every node's (r, r+1, r+2) closes a
    // triangle; the 31r+7 chords add irregular ones). The oracle counts
    // the same triangle set with the id-ordered 3-way self-join —
    // orientation-independent, so Spark's degree-ordered compact-forward
    // plan needs no replication.
    QuerySpec(
      "q97_triangle_count",
      s"""WITH $nodesSql,
        |eraw AS (
        |  SELECT r AS x, (r + 1) % n AS y FROM nodes, params
        |  UNION ALL SELECT r, (r + 2) % n FROM nodes, params
        |  UNION ALL SELECT r, (r * 31 + 7) % n FROM nodes, params
        |), e AS (
        |  SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
        |  FROM eraw WHERE x <> y
        |), deg AS (
        |  SELECT node, count(*)::BIGINT AS degree FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node
        |), tri AS (
        |  SELECT a.u AS ta, a.v AS tb, b.v AS tc
        |  FROM e a JOIN e b ON b.u = a.v JOIN e c ON c.u = a.u AND c.v = b.v
        |), pern AS (
        |  SELECT node, count(*)::BIGINT AS tri FROM (
        |    SELECT unnest([ta, tb, tc]) AS node FROM tri) GROUP BY node)
        |SELECT d.node, d.degree, coalesce(p.tri, 0)::BIGINT AS tri,
        |  CASE WHEN d.degree >= 2
        |    THEN CAST(floor(2.0 * coalesce(p.tri, 0) * 10000
        |      / (d.degree * (d.degree - 1)) + 0.5) AS BIGINT)
        |    ELSE 0 END AS cc_bp
        |FROM deg d LEFT JOIN pern p ON p.node = d.node""".stripMargin) { (s, dir) =>
      val (ranked, n) = rankedUsers(s, dir)
      val edges = ranked
        .select(col("r").as("src"), ((col("r") + 1) % n).as("dst"))
        .union(ranked.select(col("r").as("src"), ((col("r") + 2) % n).as("dst")))
        .union(ranked.select(col("r").as("src"),
          ((col("r") * 31 + 7) % n).as("dst")))
      Graph.triangleCounts(edges)
    },

    // Five rounds of synchronous label propagation on disjoint 4-node
    // communities (leader star + internal cycle): each round every node
    // adopts the most frequent neighbor label, min label on ties. The
    // oracle replays all 5 rounds in a recursive CTE — the per-node mode
    // is an argmax fold over (count, −label) pairs built from the
    // neighbor-label list, so tie-breaks are bit-identical.
    QuerySpec(
      "q98_label_propagation",
      s"""WITH RECURSIVE $nodesSql,
        |eraw AS (
        |  SELECT r AS x, r - r % 4 AS y FROM nodes
        |  UNION ALL
        |  SELECT r, r - r % 4 + (r + 1) % 4 FROM nodes, params
        |  WHERE r - r % 4 + (r + 1) % 4 < n
        |), $symEdgeSql,
        |lp AS (
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
        |  FROM lp, params, adj_t WHERE it < 5)
        |SELECT r AS node, lab[r + 1] AS label
        |FROM lp, nodes WHERE it = 5""".stripMargin) { (s, dir) =>
      // Shared with q180's modularity accounting via the session memo —
      // detection builds the label table once, evaluation reuses it.
      Graph.communityLabels(s, dir)
    },

    // BFS hop distances from node 0 over the ring + 31r+7-chord graph,
    // capped at 12 hops. Spark runs the frontier-expansion loop
    // (early-exit when the frontier empties); the oracle reaches the
    // same fixed point by vector relaxation — an unvisited node's
    // distance becomes it+1 the first round any neighbor is visited.
    QuerySpec(
      "q99_bfs_hops",
      s"""WITH RECURSIVE $nodesSql,
        |eraw AS (
        |  SELECT r AS x, (r + 1) % n AS y FROM nodes, params
        |  UNION ALL SELECT r, (r * 31 + 7) % n FROM nodes, params
        |), $symEdgeSql,
        |bfs AS (
        |  SELECT 0 AS it, list_transform(range(0, n),
        |    i -> CASE WHEN i = 0 THEN 0::BIGINT END) AS dist
        |  FROM params
        |  UNION ALL
        |  SELECT it + 1, list_transform(range(1, n + 1), j ->
        |    CASE WHEN dist[j] IS NOT NULL THEN dist[j]
        |         WHEN len(list_filter(adj[j], x -> dist[x + 1] IS NOT NULL)) > 0
        |           THEN (it + 1)::BIGINT
        |         END)
        |  FROM bfs, adj_t, params WHERE it < 12)
        |SELECT r AS node, dist[r + 1] AS hops
        |FROM bfs, nodes WHERE it = 12 AND dist[r + 1] IS NOT NULL""".stripMargin) { (s, dir) =>
      val (ranked, n) = rankedUsers(s, dir)
      val edges = ranked
        .select(col("r").as("src"), ((col("r") + 1) % n).as("dst"))
        .union(ranked.select(col("r").as("src"),
          ((col("r") * 31 + 7) % n).as("dst")))
      Graph.shortestHops(edges, source = 0L, maxHops = 12)
    },

    // Weighted single-source shortest paths (Bellman–Ford) from node 0
    // over the ring + chord graph with integer weights in 1..3 — the
    // weighted upgrade of q99. Integer min-plus relaxation is exact, so
    // the oracle replays it to the same fixed point with a recursive CTE
    // carrying the distance vector (48 rounds ≥ the longest optimal
    // path's hop count, bounded by max-w/min-w × the hop diameter; extra
    // rounds are identity at the fixpoint). Spark exits early at the
    // measured fixpoint and throws if genuinely unconverged.
    QuerySpec(
      "q105_sssp",
      s"""WITH RECURSIVE $nodesSql,
        |edges AS (
        |  SELECT src, dst, min(w) AS w FROM (
        |    SELECT r AS src, (r + 1) % n AS dst, r % 2 + 1 AS w FROM nodes, params
        |    UNION ALL
        |    SELECT r, (r * 31 + 7) % n, r % 3 + 1 FROM nodes, params)
        |  GROUP BY src, dst
        |), inn_t AS (
        |  SELECT list(coalesce(a.es, []) ORDER BY nd.r) AS inn
        |  FROM nodes nd LEFT JOIN (
        |    SELECT dst, list({'s': src, 'w': w}) AS es FROM edges GROUP BY dst
        |  ) a ON a.dst = nd.r
        |), bf AS (
        |  SELECT 0 AS it, list_transform(range(1, n + 1),
        |    i -> CASE WHEN i = 1 THEN 0::BIGINT ELSE 1000000000000::BIGINT END) AS d
        |  FROM params
        |  UNION ALL
        |  SELECT it + 1, list_transform(range(1, params.n + 1), j ->
        |    least(d[j], coalesce(list_min(list_transform(inn[j],
        |      e -> d[struct_extract(e, 's') + 1] + struct_extract(e, 'w'))),
        |      1000000000000::BIGINT)))
        |  FROM bf, params, inn_t WHERE it < 48)
        |SELECT r AS node, dist FROM (
        |  SELECT generate_subscripts(d, 1) - 1 AS r, unnest(d) AS dist
        |  FROM bf WHERE it = 48)
        |WHERE dist < 1000000000000""".stripMargin) { (s, dir) =>
      val (ranked, n) = rankedUsers(s, dir)
      val edges = ranked
        .select(col("r").as("src"), ((col("r") + 1) % n).as("dst"),
          (pmod(col("r"), lit(2L)) + 1).as("w"))
        .union(ranked.select(col("r").as("src"),
          ((col("r") * 31 + 7) % n).as("dst"),
          (pmod(col("r"), lit(3L)) + 1).as("w")))
      Graph.sssp(edges, source = 0L)
    },
  )
}
