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
  * Iterative-loop discipline (round-17: every loop here runs its
  * rounds on co-partitioned RDDs — the [[sssp]]/[[shortestHops]]
  * recipe — after the per-round Catalyst pass of the former
  * LogicalRDD-re-rooted DataFrame rounds measured as the loops' wall):
  * edge list partitioned ONCE on a HashPartitioner sized to the edge
  * count, narrow per-round joins, the round's fold is its one shuffle
  * and its lineage cut.
  */
object Graph {

  /** Dense 0-based node numbering over a distinct numeric id column —
    * the shared mint behind every synthetic-graph spec (`r` =
    * `row_number() OVER (ORDER BY id) - 1`). Built on
    * [[Ranks.globalRowNumber]], so the whole node dimension never
    * funnels through one task's sort: range-partitioned sort +
    * zipWithIndex offsets, scale-safe at any node count. Returns a
    * single LongType column `r`.
    *
    * The result is STAGED (persisted via [[Dedup.stage]]): every caller
    * consumes it several times (a count for `n`, the edge mint's src and
    * dst sides, often a final label join), and the rank pipeline is a
    * multi-job plan — recomputing it per consumer measurably doubled
    * the graph-family bench times when this helper replaced the naive
    * global window. */
  def nodeIds(ids: DataFrame, idCol: String): DataFrame =
    Dedup.stage(
      Ranks.globalRowNumber(ids.select(col(idCol)).distinct(), "r",
          Seq(col(idCol)))
        .select((col("r") - 1).as("r")))

  // The seven synthetic-graph specs (q94/q97/q98/q99/q105/q121/q124/
  // q171/q180) all mint the SAME node table — the ranked distinct event
  // users of a directory — then derive their per-spec edges from it
  // with cheap arithmetic. [[nodeIds]] stages per CALL, and the
  // harness's releaseCaches() between queries frees it, so a bench run
  // re-scanned and re-ranked the identical node dimension once per
  // spec. This memo keys the staged table (and its count — every spec
  // needs n) per (session, dir), OUTSIDE the release queue: it is a
  // node DIMENSION (distinct users — thousands of rows at bench SFs,
  // bounded by the user population at any SF), session-lifetime by
  // [[graft.SessionMemo]]'s contract.
  private val userNodeMemo = new graft.SessionMemo[String, (DataFrame, Long)]

  /** The shared ranked-user node table of `dir`'s events — memoized
    * per session so consecutive graph specs reuse one persisted copy
    * instead of re-ranking the users per spec. Returns (nodes, n). */
  def stagedUserNodes(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Long) =
    userNodeMemo.getOrElseUpdate(spark, dir) {
      val ranked0 = Ranks.globalRowNumber(
          graft.Tables.events(spark, dir).select(col("user_id")).distinct(),
          "r", Seq(col("user_id")))
        .select((col("r") - 1).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = ranked0.count()
      // Size-derived partition count for the cached dimension (round-18,
      // guide §2.2 — fewer, larger map tasks): the rank pipeline leaves
      // one partition per range bucket (= session width), so every edge
      // mint that unions k projections of this table launched k×width
      // map tasks, EACH opening width bypass-merge shuffle files —
      // jstack-sampled as the dominant cost of the graph specs at bench
      // SF (128 tasks × 32 files for a 1500-row dimension). Same
      // formula as Dedup.loopParts: ~100k rows per partition, capped at
      // the session width, so a 100 TB node dimension keeps full
      // parallelism while a small one stops paying per-file constants.
      val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val parts = math.max(1, math.min(width, (n / 100000L + 1L).toInt))
      val ranked =
        if (parts >= ranked0.rdd.getNumPartitions) ranked0
        else {
          val c = ranked0.coalesce(parts).persist(StorageLevel.MEMORY_AND_DISK)
          c.count()
          ranked0.unpersist(blocking = false)
          c
        }
      (ranked, n)
    }

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
    // RDD loop (round-17 optimization pass, the [[sssp]]/[[shortestHops]]
    // recipe): the former DataFrame rounds were lineage-truncated via
    // per-round `.rdd` re-roots, and that re-root's Catalyst
    // analyze/optimize/plan pass — never the data — dominated the wall
    // (measured 5.3 s → 2.6 s for the full spec at sf0.1 when the 10
    // rounds moved to RDDs). Co-partitioned on one HashPartitioner:
    // `edgesR ⋈ ranks` is a NARROW join every round and the round's ONE
    // shuffle is the per-destination contribution sum, which also
    // truncates lineage at a shuffle boundary. Arithmetic is the exact
    // expression the DataFrame rounds evaluated — per-edge terms
    // fix-pointed to picounit longs BEFORE the order-independent sum, so
    // the oracle's bit-for-bit replay (q94) is unaffected.
    val parts = math.max(1, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      (edgeCount / 100000L + 1L).toInt))
    val part = new org.apache.spark.HashPartitioner(parts)
    val edgesR = es.select(col("src"), col("dst"), col("outdeg")).rdd
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .partitionBy(part).persist(lvl)
    val nodesR = nodes.rdd.map(r => (r.getLong(0), ()))
      .partitionBy(part).persist(lvl)
    val dampedBase = (1 - damping) / n
    var ranks: org.apache.spark.rdd.RDD[(Long, Double)] =
      nodesR.mapValues(_ => 1.0 / n)
    for (_ <- 1 to iterations) {
      val contribs = edgesR.join(ranks) // narrow: both sides on `part`
        .map { case (_, ((dst, outdeg), p)) =>
          (dst, math.floor(p / outdeg * 1e12 + 0.5).toLong)
        }
      val sums = contribs.reduceByKey(part, _ + _) // the round's shuffle
      ranks = nodesR.leftOuterJoin(sums) // narrow (both on `part`)
        .mapValues { case (_, sc) =>
          dampedBase + damping * (sc.getOrElse(0L).toDouble / 1e12)
        }
    }
    import spark.implicits._
    val out = ranks.toDF("r", "p")
    // Loop pins outlive this function (round-18): this loop runs no
    // in-loop action, so an exit-time unpersist would drop the pins
    // before they ever materialized — the caller's action now fills
    // them on first use and every later round reads the cache instead
    // of the partitionBy shuffle files. Released after the spec's
    // action by the same releaseCaches() the DataFrame stages use.
    Dedup.pendingRddCaches.add(spark, edgesR)
    Dedup.pendingRddCaches.add(spark, nodesR)
    out
  }

  /** Canonical undirected edge set: `(u, v)` with `u < v`, self-loops
    * dropped, parallel edges collapsed. */
  private def canonical(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()

  /** Symmetric undirected adjacency: both `(u,v)` and `(v,u)` for every
    * canonical edge. */
  private def symmetric(edges: DataFrame): DataFrame = {
    val c = canonical(edges)
    c.union(c.select(col("v").as("u"), col("u").as("v")))
  }

  /** Per-node triangle participation and local clustering coefficient
    * over the undirected graph: `(node, degree, tri, cc_bp)` with
    * `cc_bp = round(2·tri / (degree·(degree−1)) · 10⁴)` basis points
    * (0 when degree < 2).
    *
    * Scale: the compact-forward algorithm — orient every edge from the
    * endpoint with the smaller `(degree, id)` to the larger, then close
    * wedges `a→b→c` with the orienting edge `a→c`. The orientation is a
    * DAG under a total order, so each triangle is enumerated exactly
    * once, and the wedge join fans out from a vertex's FORWARD degree
    * only — Σ d_fwd² = O(m^1.5) even on power-law graphs, where the
    * naive join explodes on hub vertices (Σ d² ≫ m^1.5). Three shuffles
    * on edge keys; no driver-side iteration. The count is
    * orientation-independent, so the DuckDB oracle (q97) replays it
    * with the simpler id-ordered join. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // STAGED subtrees (round-18, guide §2.4): the canonical edge set
    // feeds the degree table, the orientation join, and the final
    // degree join, and the oriented list feeds BOTH wedge sides plus
    // the closure probe — un-staged, the expanded tree recomputed the
    // edge mint ~17x (50 Exchanges, zero AQE reuse across the
    // self-join sides; measured 43 CPU-seconds at sf0.1 for a
    // 4500-edge graph). Staging collapses each to one computation.
    val e = Dedup.stage(canonical(edges))
    val deg = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val oriented = Dedup.stage(e
      .join(deg.select(col("node").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("degree").as("dv")), "v")
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b")))
    val wedge = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), "b")
      .select(col("a"), col("b"), col("c"))
    val tri = wedge
      .join(oriented.select(col("a").as("ca"), col("b").as("cb")),
        col("a") === col("ca") && col("c") === col("cb"))
      .select(col("a"), col("b"), col("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("cc_bp",
        when(col("degree") >= 2,
          floor(lit(2.0) * col("tri") * 10000 /
            (col("degree") * (col("degree") - 1)) + 0.5).cast("long"))
          .otherwise(lit(0L)))
  }

  // q98 (community DETECTION) and q180 (community EVALUATION —
  // modularity) run 5-round LP over the SAME leader-star + internal-
  // cycle community graph; without sharing, q180 replays q98's whole
  // loop. Same contract as [[userNodeMemo]]: label table is node-
  // dimension-sized, session-lifetime, outside the release queue —
  // and MATERIALIZED inside the memo compute so the cached plan never
  // depends on per-query caches the harness releases between specs.
  private val communityLabelMemo =
    new graft.SessionMemo[String, DataFrame]

  /** The community-graph edges of `dir`'s users: each node links to its
    * 4-block leader (star) and its in-block successor (cycle) — cheap
    * arithmetic over the memoized node table, shared by q98/q180. */
  def communityEdges(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val (ranked, n) = stagedUserNodes(spark, dir)
    val leader = col("r") - pmod(col("r"), lit(4L))
    val cyc = leader + pmod(col("r") + 1, lit(4L))
    ranked.select(col("r").as("src"), leader.as("dst"))
      .union(ranked.select(col("r").as("src"), cyc.as("dst")).where(cyc < n))
  }

  /** Five-round [[labelPropagation]] labels over [[communityEdges]],
    * memoized per (session, dir): the one-time label build q98 performs
    * is what q180's modularity accounting consumes. */
  def communityLabels(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    communityLabelMemo.getOrElseUpdate(spark, dir) {
      val labels = labelPropagation(communityEdges(spark, dir), iterations = 5)
        .persist(StorageLevel.MEMORY_AND_DISK)
      labels.count()
      labels
    }

  /** `iterations` rounds of synchronous label propagation over the
    * undirected graph: every node simultaneously adopts the most
    * frequent label among its distinct neighbors, smallest label on
    * ties; isolated nodes keep their own id. Fully deterministic (no
    * random tie-breaks, no asynchronous update order), so the DuckDB
    * oracle replays every round bit-for-bit (q98 — argmax fold over the
    * neighbor-label list in a recursive CTE). Returns `(node, label)`.
    *
    * The tie-break rides inside the aggregation as
    * `max(struct(cnt, −label))` — one shuffle per round, no second
    * argmax pass. Loop discipline as [[pageRank]]: lazy chain, per-round
    * LogicalRDD re-root, broadcast/AQE off, shuffle width sized to the
    * edge list. */
  def labelPropagation(edges: DataFrame, iterations: Int = 5): DataFrame = {
    val spark = edges.sparkSession
    val lvl = StorageLevel.MEMORY_AND_DISK
    val adj = symmetric(edges).persist(lvl)
    val nodes = edges.select(col("src").cast("long").as("node"))
      .union(edges.select(col("dst").cast("long").as("node")))
      .distinct().persist(lvl)
    Dedup.pendingCaches.add(adj)
    Dedup.pendingCaches.add(nodes)
    val edgeCount = adj.count()
    nodes.count()
    // RDD loop (round-17 optimization pass — see [[pageRank]]: the
    // per-round `.rdd` re-root's Catalyst pass was the wall, not the
    // data). Adjacency keyed by the LABEL-CARRYING endpoint so the
    // propagation join is narrow; the round's shuffles are the
    // (node, label) count and the per-node argmax fold. The argmax
    // comparator is EXACTLY the struct max the DataFrame rounds
    // evaluated — (cnt, -label) lexicographic — so the q98 oracle's
    // bit-for-bit round replay is unaffected.
    val parts = math.max(1, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      (edgeCount / 100000L + 1L).toInt))
    val part = new org.apache.spark.HashPartitioner(parts)
    val adjR = adj.rdd.map(r => (r.getLong(1), r.getLong(0))) // (v, u)
      .partitionBy(part).persist(lvl)
    val nodesR = nodes.rdd.map(r => (r.getLong(0), ()))
      .partitionBy(part).persist(lvl)
    var labels: org.apache.spark.rdd.RDD[(Long, Long)] =
      nodesR.mapPartitions(_.map { case (n, _) => (n, n) },
        preservesPartitioning = true)
    for (_ <- 1 to iterations) {
      val counted = adjR.join(labels) // narrow
        .map { case (_, (u, lbl)) => ((u, lbl), 1L) }
        .reduceByKey(_ + _) // shuffle on (node, label)
      val picked = counted
        .map { case ((u, lbl), c) => (u, (c, -lbl)) }
        .reduceByKey(part, (x, y) =>
          if (x._1 != y._1) { if (x._1 > y._1) x else y }
          else { if (x._2 > y._2) x else y }) // shuffle back to `part`
      labels = nodesR.leftOuterJoin(picked) // narrow
        .mapPartitions(_.map { case (n, (_, opt)) =>
          (n, opt.map(p => -p._2).getOrElse(n))
        }, preservesPartitioning = true)
    }
    import spark.implicits._
    val out = labels.toDF("node", "label")
    // Deferred release (see [[pageRank]]): action-free loop, so the pins
    // only materialize during the caller's action.
    Dedup.pendingRddCaches.add(spark, adjR)
    Dedup.pendingRddCaches.add(spark, nodesR)
    out
  }

  /** Single-source shortest paths over DIRECTED weighted `edges`
    * (`src`, `dst`, `w` — integer weights), by distributed Bellman–Ford:
    * each round relaxes every edge out of the current distance table and
    * folds the minimum per destination. Parallel edges collapse to their
    * minimum weight; unreached nodes are absent from the output. Returns
    * `(node, dist)`.
    *
    * Convergence: distances only decrease and the reached set only
    * grows, so the (count, sum) pair is a fixpoint signature — one
    * single-row aggregate per round (same probe as
    * [[Dedup.connectedComponents]]'s label sum). Rounds needed = the hop
    * length of the longest optimal path, which is bounded by
    * (max w / min w) × the unweighted diameter; an unconverged exit
    * throws rather than returning inconsistent distances.
    *
    * Scale: per-round work is one join of the edge list against the
    * distance table plus a min-aggregate — both shuffle (long, long)
    * pairs only. Loop discipline as [[pageRank]] (co-partitioned RDD
    * rounds, width sized to the edge list); distances persist
    * round-over-round because the convergence probe is an action. */
  def sssp(edges: DataFrame, source: Long, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(min(col("w")).as("w"))
      .persist(lvl)
    Dedup.pendingCaches.add(e)
    val edgeCount = e.count()
    // The [[shortestHops]] recipe, weighted: a DataFrame round pays a
    // full Catalyst compile per `.rdd` re-root (profiled at half the
    // loop's wall at bench scale), so the relaxation runs on RDDs —
    // co-partitioned on one HashPartitioner(node), the edge list never
    // re-shuffles, and each round's ONE shuffle is the min-merge that
    // also truncates lineage. Convergence probes every `batch` rounds
    // via the (count, sum) signature in a single aggregate action;
    // distances are monotone non-increasing and the reached set
    // monotone non-decreasing, so an unchanged signature across a
    // whole batch is a fixpoint.
    val parts = math.max(1, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      (edgeCount / 100000L + 1L).toInt))
    val part = new org.apache.spark.HashPartitioner(parts)
    val rddPins = collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]()
    val edgesR = e.rdd.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .partitionBy(part).persist(lvl)
    rddPins += edgesR
    var dist = spark.sparkContext
      .parallelize(Seq((source, 0L)), 1).partitionBy(part).persist(lvl)
    rddPins += dist
    var sig = (0L, 0L)
    var converged = false
    var iter = 0
    val batch = 6
    while (!converged && iter < maxIter) {
      val steps = math.min(batch, maxIter - iter)
      var plan = dist
      for (_ <- 1 to steps) {
        val relaxed = edgesR.join(plan)                  // narrow
          .map { case (_, ((dst, w), d)) => (dst, d + w) }
        plan = (plan ++ relaxed)
          .reduceByKey(part, (a, b) => math.min(a, b))   // the round's shuffle
      }
      val grown = plan.persist(lvl)
      rddPins += grown
      val nextSig = grown.aggregate((0L, 0L))(
        (acc, kv) => (acc._1 + 1L, acc._2 + kv._2),
        (a, b) => (a._1 + b._1, a._2 + b._2))
      dist = grown
      converged = nextSig == sig
      sig = nextSig
      iter += steps
    }
    if (!converged)
      throw new IllegalStateException(
        s"sssp did not converge within $maxIter rounds")
    import spark.implicits._
    val out = dist.toDF("node", "dist")
    // Intermediate batches release now; the final distance table (what
    // the returned lineage reads) outlives the function — released
    // after the spec's action (round-18, see [[kCore]]).
    val keep = dist
    rddPins.filterNot(_ eq keep).foreach(_.unpersist(blocking = false))
    Dedup.pendingRddCaches.add(spark, keep)
    out
  }

  /** BFS hop distances from `source` over the undirected graph, up to
    * `maxHops` rounds: `(node, hops)` for every node reached (the source
    * itself at 0). Frontier-expansion loop — each round joins the
    * current frontier against the adjacency list, drops already-visited
    * nodes, and stops early (at batch granularity) when the frontier
    * empties.
    *
    * This is the one driver-iterative loop kept on the RDD API, and
    * deliberately so (the documented `mapPartitions`-tier exception):
    * a DataFrame round costs a full Catalyst analyze/optimize/plan pass
    * per `.rdd` re-root — profiled at HALF the query's wall time at
    * bench scale — and the re-root discards `outputPartitioning`, so no
    * DataFrame formulation can pin the adjacency list's partitioning
    * across rounds. With raw RDDs the loop is zero-compile and
    * co-partitioned end to end on one `HashPartitioner(node)`:
    *   - `adj ⋈ frontier` is a NARROW join (both sides pre-hashed;
    *     `filter` preserves the partitioner, so every round's frontier
    *     arrives already placed);
    *   - the round's ONE shuffle is the `reduceByKey` min-merge of
    *     `visited ++ candidates` — which doubles as lineage truncation
    *     (a shuffle boundary every round; a narrow subtract/union shape
    *     was measured 3x slower from diamond recompute), vs three
    *     shuffles for the DataFrame join/distinct/anti-join shape;
    *   - the frontier is the min-merge's newly-stamped rows
    *     (`hop == round`), a narrow filter, never a second shuffle.
    * Rounds chain lazily, `batch` per reachability probe; reached-set
    * growth doubles as the emptiness probe. Scale: the min-merge
    * re-shuffles the visited set each round (the SSSP relaxation
    * trade: linear lineage beats frontier-only traffic — the
    * anti-join variant pays the same set as a shuffled join side); the
    * adjacency list never re-shuffles after its one-time `partitionBy`.
    * The DuckDB oracle (q99) replays the same distances by vector
    * relaxation in a recursive CTE, which reaches the identical fixed
    * point regardless of round count. */
  def shortestHops(edges: DataFrame, source: Long, maxHops: Int = 12): DataFrame = {
    val spark = edges.sparkSession
    val lvl = StorageLevel.MEMORY_AND_DISK
    val adj = symmetric(edges).persist(lvl)
    Dedup.pendingCaches.add(adj)
    val edgeCount = adj.count()
    val parts = math.max(1, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      (edgeCount / 100000L + 1L).toInt))
    val part = new org.apache.spark.HashPartitioner(parts)
    val rddPins = collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]()
    val adjR = adj.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .partitionBy(part).persist(lvl)
    rddPins += adjR
    var visited = spark.sparkContext
      .parallelize(Seq((source, 0L)), 1).partitionBy(part).persist(lvl)
    rddPins += visited
    var frontier: org.apache.spark.rdd.RDD[(Long, Long)] = visited
    var visitedRows = 1L
    var h = 0
    var more = true
    val batch = 6
    while (more && h < maxHops) {
      val steps = math.min(batch, maxHops - h)
      var planVisited = visited
      var planFrontier = frontier
      for (i <- 1 to steps) {
        val hop = (h + i).toLong
        // Narrow join (frontier keeps the reduceByKey partitioner, adj
        // was partitionBy'd once); the round's ONE shuffle is the
        // min-merge below, which also truncates lineage at a shuffle
        // boundary every round — no narrow diamond, no recompute chain.
        val cand = adjR.join(planFrontier)
          .map { case (_, (v, _)) => (v, hop) }
        planVisited = (planVisited ++ cand)
          .reduceByKey(part, (a, b) => math.min(a, b))
        // filter preserves the partitioner, so next round's join stays
        // narrow; a node is IN the frontier iff this round first
        // reached it (its min hop equals this round's stamp).
        planFrontier = planVisited.filter(_._2 == hop)
      }
      val grown = planVisited.persist(lvl)
      rddPins += grown
      val n = grown.count()
      visited = grown
      frontier = planFrontier
      more = n > visitedRows
      visitedRows = n
      h += steps
    }
    // Hand back a DataFrame over the final visited set. Intermediate
    // batches release now; the final visited set (what the returned
    // lineage reads) outlives the function — released after the spec's
    // action (round-18, see [[kCore]]).
    import spark.implicits._
    val out = visited.toDF("node", "hops")
    val keep = visited
    rddPins.filterNot(_ eq keep).foreach(_.unpersist(blocking = false))
    Dedup.pendingRddCaches.add(spark, keep)
    out
  }

  /** `iterations` rounds of UNNORMALIZED HITS over directed `edges`
    * (self-loops dropped, parallel edges collapsed): per round, every
    * node's authority becomes the sum of its in-neighbors' hubs, then
    * every hub becomes the sum of its out-neighbors' NEW authorities —
    * the classic alternating update, kept in exact integers by skipping
    * the normalization (scores order identically). Growth COMPOUNDS:
    * after `t` rounds magnitudes reach ~(d_in·d_out)^t for max
    * in/out-degrees d_in/d_out, so exact-integer semantics are only
    * safe while t·log2(d_in·d_out) stays under 62 bits — checked up
    * front (two degree aggregates) with a hard `require`, rather than
    * silently wrapping on a high-degree graph or a larger iteration
    * count. Callers past the bound should normalize per round (double
    * HITS) instead. Deterministic, so a recursive-CTE oracle replays
    * every round (q124). Returns `(node, hub, auth)`; zero-degree
    * sides score 0.
    *
    * Two shuffled folds per round over `(long, long)` pairs; loop
    * discipline as [[pageRank]] (co-partitioned RDD rounds, width sized
    * to the edge list, no per-round action). */
  def hits(edges: DataFrame, iterations: Int = 5): DataFrame = {
    val spark = edges.sparkSession
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct().persist(lvl)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist(lvl)
    Dedup.pendingCaches.add(e)
    Dedup.pendingCaches.add(nodes)
    val edgeCount = e.count()
    if (edgeCount > 0) {
      // Exact-integer overflow guard (see scaladoc): bits per round =
      // log2(max in-degree · max out-degree), compounded per iteration.
      val dIn = e.groupBy(col("dst")).agg(count(lit(1)).as("d"))
        .agg(max(col("d"))).head().getLong(0)
      val dOut = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .agg(max(col("d"))).head().getLong(0)
      val bitsPerRound =
        (math.log(dIn.toDouble) + math.log(dOut.toDouble)) / math.log(2.0)
      require(iterations * bitsPerRound < 62.0,
        s"unnormalized HITS would exceed 64-bit integers: $iterations rounds" +
          f" × $bitsPerRound%.1f bits/round (max in-degree $dIn, out-degree" +
          s" $dOut); reduce iterations or use a normalized variant")
    }
    // RDD loop (round-17 optimization pass — the [[pageRank]] rationale:
    // the per-round `.rdd` re-root's Catalyst pass dominated the wall).
    // Two co-partitioned edge copies, one per propagation direction;
    // each half-round's ONE shuffle is its per-node sum. Integer sums
    // are order-independent, so the q124 recursive-CTE oracle replays
    // bit-for-bit unchanged.
    val parts = math.max(1, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      (edgeCount / 100000L + 1L).toInt))
    val part = new org.apache.spark.HashPartitioner(parts)
    val bySrc = e.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .partitionBy(part).persist(lvl)
    val byDst = e.rdd.map(r => (r.getLong(1), r.getLong(0)))
      .partitionBy(part).persist(lvl)
    val nodesR = nodes.rdd.map(r => (r.getLong(0), ()))
      .partitionBy(part).persist(lvl)
    var scores: org.apache.spark.rdd.RDD[(Long, (Long, Long))] =
      nodesR.mapValues(_ => (1L, 1L))
    for (_ <- 1 to iterations) {
      val na = bySrc.join(scores) // narrow
        .map { case (_, (dst, (hub, _))) => (dst, hub) }
        .reduceByKey(part, _ + _) // shuffle: per-dst auth sum
      val nh = byDst.join(na) // narrow (both on `part`)
        .map { case (_, (src, a)) => (src, a) }
        .reduceByKey(part, _ + _) // shuffle: per-src hub sum
      scores = nodesR.leftOuterJoin(nh).leftOuterJoin(na) // both narrow
        .mapValues { case ((_, h), a) => (h.getOrElse(0L), a.getOrElse(0L)) }
    }
    import spark.implicits._
    val out = scores.map { case (node, (hub, auth)) => (node, hub, auth) }
      .toDF("node", "hub", "auth")
    // Deferred release (see [[pageRank]]): action-free loop, so the pins
    // only materialize during the caller's action.
    Dedup.pendingRddCaches.add(spark, bySrc)
    Dedup.pendingRddCaches.add(spark, byDst)
    Dedup.pendingRddCaches.add(spark, nodesR)
    out
  }

  /** k-core decomposition by synchronous peeling: every round, all
    * currently-alive nodes whose alive-neighbor count is < `k` are
    * removed SIMULTANEOUSLY; repeat for exactly `rounds` rounds (peeling
    * is monotone, so extra rounds past the fixpoint are identity — the
    * q105 trick that lets a recursive-CTE oracle replay the loop with a
    * fixed iteration count). Returns the surviving core as
    * `(node, core_deg)` — each survivor's degree within the core.
    *
    * Synchronous (Jacobi) peeling is chosen over the sequential
    * min-degree peel deliberately: it is order-free, hence deterministic
    * under any partitioning, and each round is one join + one aggregate
    * over `(long, long)` pairs — the same per-round shuffle shape as
    * [[sssp]]. Early exit when a round removes nothing, so `rounds` is
    * purely a safety cap — each round removes ≥ 1 node until the
    * fixpoint, and the default cap is generous for any test-scale
    * graph. A capped-out unconverged peel (possible on a long pendant
    * chain: one node falls per round) is reported on stderr rather
    * than returned silently — the result is then a valid OVER-
    * approximation of the k-core, which oracle specs replaying the
    * same fixed round count still match exactly. Loop discipline as
    * [[pageRank]]: co-partitioned RDD rounds, shuffle width sized to
    * the edge list. */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 40): DataFrame = {
    // k >= 1 pinned: the peel below drops an alive node whose
    // alive-subgraph degree fold is EMPTY (all neighbors dead), which
    // equals the former coalesce(deg, 0) >= k only for positive k (a
    // k <= 0 "core" is the whole graph — not a meaningful request).
    require(k >= 1, s"kCore needs k >= 1, got $k")
    val spark = edges.sparkSession
    val lvl = StorageLevel.MEMORY_AND_DISK
    val adj = symmetric(edges).persist(lvl)
    Dedup.pendingCaches.add(adj)
    val edgeCount = adj.count()
    // RDD loop (round-17 optimization pass — see [[pageRank]]: the
    // per-round `.rdd` re-root's Catalyst pass was the wall). The
    // adjacency list partitions ONCE by u; each round keeps edges whose
    // u is alive (narrow join), re-keys by v for the other endpoint's
    // liveness (the round's first shuffle), and folds the surviving
    // degree per u (the second) — the exact alive-subgraph degree the
    // DataFrame rounds computed, so the q174-style fixed-round oracle
    // replay is unaffected. The per-round count() doubles as the
    // convergence probe, as before.
    val parts = math.max(1, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      (edgeCount / 100000L + 1L).toInt))
    val part = new org.apache.spark.HashPartitioner(parts)
    val rddPins = collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]()
    val adjR = adj.rdd.map(r => (r.getLong(0), r.getLong(1))) // (u, v)
      .partitionBy(part).persist(lvl)
    rddPins += adjR
    def aliveDegrees(alive: org.apache.spark.rdd.RDD[(Long, Unit)])
        : org.apache.spark.rdd.RDD[(Long, Long)] =
      adjR.join(alive) // narrow: both on `part`
        .map { case (u, (v, _)) => (v, u) }
        .join(alive) // shuffle 1: re-key by the other endpoint
        .map { case (_, (u, _)) => (u, 1L) }
        .reduceByKey(part, _ + _) // shuffle 2: alive-subgraph degree
    var alive: org.apache.spark.rdd.RDD[(Long, Unit)] = adjR
      .mapValues(_ => ()).reduceByKey(part, (a, _) => a).persist(lvl)
    rddPins += alive
    var nAlive = alive.count()
    var r = 0
    var converged = false
    while (!converged && r < rounds) {
      r += 1
      // Nodes losing all edges drop out of the degree fold entirely —
      // absent means degree 0, dropped for any k >= 1 exactly as the
      // former left-join's coalesce(deg, 0) >= k.
      val next = aliveDegrees(alive)
        .filter { case (_, d) => d >= k }
        .mapValues(_ => ()).persist(lvl)
      rddPins += next
      val n = next.count()
      converged = n == nAlive
      nAlive = n
      alive = next
    }
    if (!converged)
      System.err.println(s"[graft] kCore: round cap $rounds hit before " +
        s"the peel fixpoint ($nAlive nodes still alive) — result is an " +
        "over-approximation; raise `rounds` for the exact core")
    import spark.implicits._
    val out = aliveDegrees(alive).toDF("node", "core_deg")
    // Intermediate rounds release now (already consumed by the in-loop
    // probes); the pins the returned lineage READS — the adjacency list
    // and the final alive set — outlive the function and are released
    // after the spec's action (round-18: an exit-time unpersist risked
    // round re-runs under external-shuffle eviction on a cluster).
    val keep = alive
    rddPins.filterNot(p => (p eq adjR) || (p eq keep))
      .foreach(_.unpersist(blocking = false))
    Dedup.pendingRddCaches.add(spark, adjR)
    Dedup.pendingRddCaches.add(spark, keep)
    out
  }
}
