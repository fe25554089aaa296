package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics beyond connected components
  * ([[Dedup.connectedComponents]]): PageRank as a driver-controlled
  * join-aggregate loop.
  *
  * Engine-portability contract: the per-edge contribution
  * `p(src)/outdeg(src)` is fixed-pointed to picounits (×10¹²) BEFORE the
  * per-destination sum, so the aggregation is over integers and
  * partition/merge order cannot perturb the result — the DuckDB oracle
  * replays all iterations bit-for-bit with a recursive CTE that carries
  * the rank vector as a LIST (q94). Same trick as the perplexity spec:
  * fix the terms, not the total.
  *
  * Iterative-loop discipline (measured on the CC loop, see
  * [[Dedup.connectedComponents]]): shuffle width sized to the edge list
  * (not the session's scan width), broadcast + AQE disabled for the
  * loop, per-round lineage truncation via LogicalRDD re-rooting.
  */
object Graph {

  /** `iterations` rounds of damped PageRank over directed `edges`
    * (`src`, `dst` long columns; parallel edges deduplicated). Every
    * node appearing as src or dst participates; dangling nodes (no
    * out-edges) simply contribute nothing — their mass exits, matching
    * the plain iterative formulation. Returns `(r, p)`. */
  def pageRank(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("r"))
      .union(e.select(col("dst").as("r"))).distinct().persist(lvl)
    val es = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist(lvl)
    Dedup.pendingCaches.add(nodes)
    Dedup.pendingCaches.add(es)
    val edgeCount = es.count()
    val n = nodes.count()
    if (n == 0) return nodes.select(col("r"), lit(0.0).as("p"))
    spark.synchronized {
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      val parts = math.max(1L, math.min(prevParts.toLong, edgeCount / 100000L + 1L))
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        var ranks = nodes.select(col("r"), lit(1.0 / n).as("p"))
        for (_ <- 1 to iterations) {
          val contribs = es
            .join(ranks.select(col("r").as("src"), col("p")), "src")
            .select(col("dst"),
              floor(col("p") / col("outdeg") * 1e12 + 0.5).cast("long").as("c"))
            .groupBy("dst").agg(sum(col("c")).as("sc"))
          val nextPlan = nodes
            .join(contribs, nodes("r") === contribs("dst"), "left")
            .select(nodes("r"),
              (lit((1 - damping) / n) + lit(damping) *
                (coalesce(col("sc"), lit(0L)).cast("double") / lit(1e12))).as("p"))
          // Re-root as a flat LogicalRDD: keeps round K's analyzed tree
          // one round deep instead of K joins deep (driver-side
          // analysis/optimization is the hidden per-round cost of
          // logical-plan chaining — measured 2.0 s vs 3.7 s steady-state
          // at sf0.1 WITH vs WITHOUT the re-root, even though PR has no
          // self-join). No per-round persist/materialization either:
          // without a self-join the lazy re-rooted chain executes as ONE
          // job at the caller's action — per-round count() actions were
          // pure scheduling overhead (3.1 s → 2.0 s). `.rdd` only
          // compiles the round's physical plan; the persisted nodes/es
          // caches feed every round.
          ranks = spark.createDataFrame(nextPlan.rdd, nextPlan.schema)
        }
        ranks
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    }
  }
}
