package graft.queries

import graft.{QuerySpec, Tables}
import graft.operators.{Dedup, Graph, Relational, Similarity, TextAnalysis, TimeSeries}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 extension surface: Gopher-style document quality rules,
  * C4-style cross-corpus line deduplication, scalar-quantized (int8)
  * similarity search, and snapshot reconciliation — each fully
  * deterministic (integer / fixed-point math throughout), so every spec
  * here carries a complete DuckDB hash oracle, including the ANN path.
  *
  * The harness corpus is single-line synthetic prose with no markup, so
  * the two text specs plant deterministic decorations (boilerplate
  * lines, bullets, ellipses, `#` runs) keyed on `doc_id` — identically
  * on both engines, the same pattern the PII spec uses
  * ([[CurationQueries]]) — to make the rules discriminative.
  */
object QualityQueries {

  private val duckToks =
    "list_filter(string_split_regex(lower(t), '[^a-z0-9]+'), x -> x <> '')"

  /** doc_id-keyed decoration exercising every Gopher rule family. */
  private val gopherDecoSql =
    """text || CASE doc_id % 4
      |    WHEN 0 THEN chr(10) || '- item one' || chr(10) || '- item two' || chr(10) || '* item three'
      |    WHEN 1 THEN chr(10) || 'To be continued...' || chr(10) || 'more soon...'
      |    WHEN 2 THEN ' ### markdown ### noise ##'
      |    ELSE '' END""".stripMargin

  private def gopherDeco = concat(col("text"),
    when(pmod(col("doc_id"), lit(4)) === 0,
      lit("\n- item one\n- item two\n* item three"))
      .when(pmod(col("doc_id"), lit(4)) === 1,
        lit("\nTo be continued...\nmore soon..."))
      .when(pmod(col("doc_id"), lit(4)) === 2,
        lit(" ### markdown ### noise ##"))
      .otherwise(lit("")))

  /** Shared boilerplate lines ~1/5 and ~1/7 of docs carry — the exact
    * repeated-chrome shape C4's line dedup removes. */
  // Single line on purpose: this fragment is interpolated into templates
  // whose stripMargin would eat the first `|` of a line-leading `||`.
  private val lineDecoSql =
    "text || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'subscribe to our newsletter' || chr(10) || 'all rights reserved' ELSE '' END" +
      " || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'click here to read more' ELSE '' END"

  private def lineDeco = concat(col("text"),
    when(pmod(col("doc_id"), lit(5)) === 0,
      lit("\nsubscribe to our newsletter\nall rights reserved"))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(7)) === 0,
      lit("\nclick here to read more")).otherwise(lit("")))

  def specs: Seq[QuerySpec] = Seq(

    // Gopher quality rules (Rae et al. 2021 table A1): per-document
    // format/repetition signals plus the keep decision. All signals are
    // exact integers or basis points, so the oracle is a full hash
    // compare — including every rule boundary.
    QuerySpec(
      "tx18_gopher_rules",
      s"""WITH base AS (
         |  SELECT doc_id, $gopherDecoSql AS t FROM documents
         |), staged AS (
         |  SELECT doc_id, t, $duckToks AS toks, string_split(t, chr(10)) AS lines
         |  FROM base
         |), sig AS (
         |  SELECT doc_id,
         |    len(toks) AS n_words,
         |    greatest(len(toks), 1)::DOUBLE AS dw,
         |    greatest(len(lines), 1)::DOUBLE AS dl,
         |    coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS sum_len,
         |    length(t) - length(replace(t, '#', '')) AS hashes,
         |    (length(t) - length(replace(t, '...', ''))) / 3 AS ellipses,
         |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
         |    len(list_filter(lines, l -> starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* '))) AS bullet_lines,
         |    len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS ellipsis_lines,
         |    len(list_intersect(toks, ['the','be','to','of','and','that','have','with'])) AS n_stop
         |  FROM staged
         |), bps AS (
         |  SELECT doc_id, n_words, n_stop,
         |    CAST(floor(sum_len / dw * 10000 + 0.5) AS BIGINT) AS mwl_bp,
         |    CAST(floor((hashes + ellipses) / dw * 10000 + 0.5) AS BIGINT) AS symbol_bp,
         |    CAST(floor(alpha_words / dw * 10000 + 0.5) AS BIGINT) AS alpha_bp,
         |    CAST(floor(bullet_lines / dl * 10000 + 0.5) AS BIGINT) AS bullet_bp,
         |    CAST(floor(ellipsis_lines / dl * 10000 + 0.5) AS BIGINT) AS ellipsis_bp
         |  FROM sig)
         |SELECT doc_id, n_words, mwl_bp, symbol_bp, alpha_bp, bullet_bp,
         |  ellipsis_bp, n_stop,
         |  CASE WHEN n_words BETWEEN 50 AND 100000
         |    AND mwl_bp BETWEEN 30000 AND 100000 AND symbol_bp < 1000
         |    AND bullet_bp < 9000 AND ellipsis_bp < 3000 AND alpha_bp > 8000
         |    AND n_stop >= 1 THEN 1 ELSE 0 END AS keep
         |FROM bps""".stripMargin) { (s, dir) =>
      val staged = Tables.fanOut(
        Tables.documents(s, dir).select(col("doc_id"), col("text")))
        .select(col("doc_id"), gopherDeco.as("t"))
        .select(col("doc_id"), col("t"),
          TextAnalysis.tokens(col("t")).as("toks"),
          split(col("t"), "\n").as("lines"))
      val sig = staged.select(
        col("doc_id") +: TextAnalysis.gopherSignals(
          col("t"), col("toks"), col("lines"))
          .map { case (n, c) => c.as(n) }: _*)
      sig.select(col("*"),
        TextAnalysis.gopherKeep(col("n_words"), col("mwl_bp"),
          col("symbol_bp"), col("alpha_bp"), col("bullet_bp"),
          col("ellipsis_bp"), col("n_stop")).as("keep"))
    },

    // C4-style cross-corpus line dedup: lines occurring in ≥5 documents
    // are boilerplate and are dropped; each document is rebuilt from its
    // surviving lines in order (verified via md5 of the cleaned text).
    QuerySpec(
      "tx19_line_dedup",
      s"""WITH base AS (
         |  SELECT doc_id, $lineDecoSql AS t FROM documents
         |), ls AS (
         |  SELECT doc_id, string_split(t, chr(10)) AS l FROM base
         |), lines AS (
         |  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS line FROM ls
         |), freq AS (
         |  SELECT line, count(*) AS freq FROM lines GROUP BY line)
         |SELECT doc_id,
         |  count(*) FILTER (WHERE freq < 5) AS kept,
         |  count(*) FILTER (WHERE freq >= 5) AS dropped,
         |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
         |    FILTER (WHERE freq < 5), '')) AS fp
         |FROM lines JOIN freq USING (line)
         |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.dedupLines(
        Tables.fanOut(Tables.documents(s, dir).select(col("doc_id"), col("text")))
          .select(col("doc_id"), lineDeco.as("text")),
        "doc_id", "text", maxFreq = 5)
    },

    // Scalar-quantized (int8) ANN with exact rerank — deterministic end
    // to end (integer candidate scoring, reproducible IEEE double
    // dequantization), hence a FULL oracle for an approximate-search
    // path, like ss8. Candidate metric: dequantized dot product.
    QuerySpec(
      "ss9_ann_int8",
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
        |  FROM embeddings WHERE vec_id = 0
        |), qs AS (
        |  SELECT qv, list_max(list_transform(qv, x -> abs(x))) AS qamax FROM q
        |), qz AS (
        |  SELECT qv, qamax, list_transform(qv, x -> CAST(floor(
        |      x * (127.0 / CASE WHEN qamax = 0 THEN 1.0 ELSE qamax END) + 0.5)
        |    AS BIGINT)) AS q8
        |  FROM qs
        |), d AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
        |), da AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM d
        |), dz AS (
        |  SELECT vec_id, v, amax, list_transform(v, x -> CAST(floor(
        |      x * (127.0 / CASE WHEN amax = 0 THEN 1.0 ELSE amax END) + 0.5)
        |    AS BIGINT)) AS v8
        |  FROM da
        |), scored AS (
        |  SELECT vec_id, v,
        |    (CAST(list_sum(list_transform(range(1, 65), i -> v8[i] * qz.q8[i])) AS DOUBLE)
        |      * amax) * qamax AS score
        |  FROM dz, qz
        |), cand AS (
        |  SELECT vec_id, v FROM scored ORDER BY score DESC, vec_id LIMIT 50)
        |SELECT vec_id,
        |  round(list_cosine_similarity(v, (SELECT qv FROM q)), 6) AS sim
        |FROM cand ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.int8TopK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "embedding", k = 10, cand = 50)
    },

    // Snapshot reconciliation: row-level diff of two derived snapshots
    // of `orders` (keys added / removed / values changed), the CDC
    // validation primitive. Differences are planted deterministically on
    // both engines.
    QuerySpec(
      "q91_snapshot_diff",
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |), a AS (
        |  SELECT * FROM o WHERE o_orderkey % 11 <> 3
        |), b AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 6 = 0 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 13 <> 5
        |), j AS (
        |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    a.o_orderkey IS NULL AS is_added, b.o_orderkey IS NULL AS is_removed,
        |    list_filter([
        |      CASE WHEN NOT (a.o_custkey IS NOT DISTINCT FROM b.o_custkey) THEN 'o_custkey' END,
        |      CASE WHEN NOT (a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus) THEN 'o_orderstatus' END,
        |      CASE WHEN NOT (a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice) THEN 'o_totalprice' END
        |    ], x -> x IS NOT NULL) AS cc
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        |SELECT * FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN is_added THEN 'added' WHEN is_removed THEN 'removed'
        |         WHEN len(cc) > 0 THEN 'changed' ELSE 'unchanged' END AS status,
        |    CASE WHEN NOT is_added AND NOT is_removed AND len(cc) > 0
        |         THEN array_to_string(cc, ',') ELSE '' END AS changed_cols
        |  FROM j)
        |WHERE status <> 'unchanged'""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val snapA = o.where(pmod(col("o_orderkey"), lit(11)) =!= 3)
      val snapB = o.where(pmod(col("o_orderkey"), lit(13)) =!= 5)
        .withColumn("o_orderstatus",
          when(pmod(col("o_orderkey"), lit(6)) === 0, lit("R"))
            .otherwise(col("o_orderstatus")))
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(7)) === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      Relational.snapshotDiff(snapA, snapB, "o_orderkey")
    },

    // Time-series subsequence search: top-10 per-user event-value
    // windows (length 8) closest in z-normalized Euclidean distance to
    // a rising-ramp pattern. Folds are sequential on both engines,
    // division/sqrt are IEEE-exact, ranking is on the fixed-point
    // distance — full oracle despite the heavy floating-point pipeline.
    QuerySpec(
      "q92_ts_subseq",
      {
        val zp = TimeSeries.znorm((1 to 8).map(_.toDouble))
          .map(_.toString).mkString("[", ", ", "]")
        s"""WITH s AS (
           |  SELECT user_id, value,
           |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx
           |  FROM events
           |), w AS (
           |  SELECT user_id, idx, list(value) OVER (
           |    PARTITION BY user_id ORDER BY idx
           |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS win
           |  FROM s
           |), f AS (
           |  SELECT user_id, idx, win FROM w WHERE len(win) = 8
           |), m AS (
           |  SELECT user_id, idx, win,
           |    list_reduce(list_prepend(0.0, win), (a, x) -> a + x) / 8 AS mean
           |  FROM f
           |), sd AS (
           |  SELECT user_id, idx, win, mean,
           |    sqrt(list_reduce(list_prepend(0.0,
           |      list_transform(win, x -> (x - mean) * (x - mean))), (a, x) -> a + x) / 8) AS sd
           |  FROM m
           |), z AS (
           |  SELECT user_id, idx,
           |    list_transform(win, x -> CASE WHEN sd = 0 THEN 0.0 ELSE (x - mean) / sd END) AS zw
           |  FROM sd
           |), d AS (
           |  SELECT user_id, idx,
           |    list_reduce(list_prepend(0.0, list_transform(range(1, 9),
           |      i -> (zw[i] - ($zp)[i]) * (zw[i] - ($zp)[i]))), (a, x) -> a + x) AS dist
           |  FROM z)
           |SELECT user_id, idx,
           |  CAST(floor(dist * 10000.0 + 0.5) AS BIGINT) AS dist_bp
           |FROM d ORDER BY dist_bp, user_id, idx LIMIT 10""".stripMargin
      }) { (s, dir) =>
      TimeSeries.subseqSearch(Tables.events(s, dir), "user_id", "ts",
        "event_id", "value", (1 to 8).map(_.toDouble), k = 10)
    },

    // Weighted sampling (Efraimidis–Spirakis): 100 orders drawn with
    // probability ∝ o_totalprice, reproducible from the key column
    // alone. The fixed-point ranking key is part of the output so the
    // oracle verifies the draw itself, not just membership.
    QuerySpec(
      "q93_weighted_sample",
      """SELECT o_orderkey, o_totalprice AS weight,
        |  CAST(floor(
        |    ln((CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
        |        % 2147483647 + 1)::DOUBLE / 2147483648.0)
        |    / o_totalprice * 1000000.0 + 0.5) AS BIGINT) AS key_bp
        |FROM orders
        |ORDER BY key_bp DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      Relational.weightedSample(
        Tables.orders(s, dir).select("o_orderkey", "o_totalprice"),
        "o_orderkey", "o_totalprice", k = 100)
    },

    // PageRank (10 damped iterations) over a deterministic functional
    // graph on the event users — the second iterative-loop operator
    // (Graph.pageRank; CC is the first). Per-edge contributions are
    // fixed-pointed BEFORE the per-destination sum, so all 10 iterations
    // replay bit-for-bit in the oracle's recursive CTE, which carries
    // the rank vector as a LIST. NB the oracle writes `(1 - 0.85)`, not
    // `0.15`: they differ in the last ulp, and the Scala side computes
    // `1 - damping`.
    QuerySpec(
      "q94_pagerank",
      """WITH RECURSIVE nodes AS (
        |  SELECT row_number() OVER (ORDER BY user_id) - 1 AS r
        |  FROM (SELECT DISTINCT user_id FROM events)
        |), params AS (SELECT count(*)::BIGINT AS n FROM nodes),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT r AS src, (r * 31 + 7) % n AS dst FROM nodes, params
        |    UNION ALL
        |    SELECT r, (r + 1) % n FROM nodes, params)
        |), deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |odeg_t AS (
        |  SELECT list(coalesce(d.outdeg, 0) ORDER BY nd.r) AS odeg
        |  FROM nodes nd LEFT JOIN deg d ON d.src = nd.r
        |), inn_t AS (
        |  SELECT list(coalesce(a.srcs, []) ORDER BY nd.r) AS inn
        |  FROM nodes nd LEFT JOIN (
        |    SELECT dst, list(src) AS srcs FROM edges GROUP BY dst) a ON a.dst = nd.r
        |), pr AS (
        |  SELECT 0 AS it, list_transform(range(1, n + 1), i -> 1.0 / n) AS p
        |  FROM params
        |  UNION ALL
        |  SELECT it + 1,
        |    list_transform(range(1, params.n + 1), j ->
        |      (1 - 0.85) / params.n + 0.85 * (CAST(list_reduce(list_prepend(0::BIGINT,
        |        list_transform(inn[j], s -> CAST(floor(p[s + 1] / odeg[s + 1] * 1e12 + 0.5) AS BIGINT))),
        |        (a, x) -> a + x) AS DOUBLE) / 1e12))
        |  FROM pr, params, odeg_t, inn_t WHERE it < 10
        |)
        |SELECT r, pr_ppb FROM (
        |  SELECT generate_subscripts(p, 1) - 1 AS r,
        |    CAST(floor(unnest(p) * 1e9 + 0.5) AS BIGINT) AS pr_ppb
        |  FROM pr WHERE it = 10)
        |ORDER BY pr_ppb DESC, r LIMIT 20""".stripMargin) { (s, dir) =>
      val (ranked, n) = Graph.stagedUserNodes(s, dir)
      val edges = ranked
        .select(col("r").as("src"), ((col("r") * 31 + 7) % n).as("dst"))
        .union(ranked.select(col("r").as("src"), ((col("r") + 1) % n).as("dst")))
      Graph.pageRank(edges, iterations = 10, damping = 0.85)
        .select(col("r"), floor(col("p") * 1e9 + 0.5).cast("long").as("pr_ppb"))
        .orderBy(col("pr_ppb").desc, col("r")).limit(20)
    },

    // Table profiler: one row per column with row/null/distinct counts
    // and typed min/max — the data-quality summary every ingest gate
    // runs. Exact distincts here for oracle parity; at 100 TB swap in
    // approx_count_distinct (the multi-count-distinct Expand multiplies
    // the scan by the column count).
    QuerySpec(
      "q95_profile_table",
      Seq(("o_orderkey", true), ("o_custkey", true), ("o_totalprice", true),
        ("o_orderstatus", false), ("o_orderpriority", false)).map {
        case (c, isNum) =>
          val minMax =
            if (isNum) s"min($c)::DOUBLE AS min_num, max($c)::DOUBLE AS max_num, " +
              "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
            else "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, " +
              s"min($c) AS min_str, max($c) AS max_str"
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  count(DISTINCT $c) AS n_distinct, $minMax FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
      val strCols = Seq("o_orderstatus", "o_orderpriority")
      val allCols = numCols ++ strCols
      val aggs = Seq(count(lit(1)).as("__n")) ++ allCols.flatMap(c => Seq(
        sum(col(c).isNull.cast("long")).as(s"__${c}_nulls"),
        countDistinct(col(c)).as(s"__${c}_dist"))) ++
        numCols.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"__${c}_min"),
          max(col(c)).cast("double").as(s"__${c}_max"))) ++
        strCols.flatMap(c => Seq(
          min(col(c)).as(s"__${c}_mins"), max(col(c)).as(s"__${c}_maxs")))
      val rows = allCols.map { c =>
        val isNum = numCols.contains(c)
        struct(
          lit(c).as("col_name"), col("__n").as("n_rows"),
          col(s"__${c}_nulls").as("n_nulls"), col(s"__${c}_dist").as("n_distinct"),
          (if (isNum) col(s"__${c}_min") else lit(null).cast("double")).as("min_num"),
          (if (isNum) col(s"__${c}_max") else lit(null).cast("double")).as("max_num"),
          (if (isNum) lit(null).cast("string") else col(s"__${c}_mins")).as("min_str"),
          (if (isNum) lit(null).cast("string") else col(s"__${c}_maxs")).as("max_str"))
      }
      o.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rows: _*)).as("__r"))
        .select(col("__r.*"))
    },

    // Training-mixture rebalancing: sample each source down to a target
    // share of the corpus (targets ∝ source-index % 4 + 1, so some
    // sources sub-sample and some keep everything). Rates derive from
    // exact counts; the per-row draw is the portable-hash uniform — the
    // whole resample replays bit-for-bit, including rows on the
    // u < rate boundary. Conditional count (not a filter) so sources
    // whose sample is empty still report kept = 0 on both engines.
    QuerySpec(
      "tx20_mixture_rebalance",
      """WITH cnts AS (
        |  SELECT source, count(*) AS n_src FROM documents GROUP BY source
        |), tot AS (SELECT count(*) AS n_tot FROM documents),
        |rates AS (
        |  SELECT source, n_src,
        |    least(1.0, (CAST(substr(source, 4) AS INT) % 4 + 1)::DOUBLE
        |      / 50.0 * n_tot / n_src) AS rate
        |  FROM cnts, tot)
        |SELECT d.source,
        |  count(*) FILTER (WHERE
        |    (CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 2147483647)::DOUBLE / 2147483647.0 < r.rate) AS kept,
        |  max(r.n_src) AS n_src,
        |  CAST(floor(max(r.rate) * 10000 + 0.5) AS BIGINT) AS rate_bp
        |FROM documents d JOIN rates r USING (source)
        |GROUP BY d.source""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "source")
      val cnts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
      val tot = docs.agg(count(lit(1)).as("n_tot"))
      val w = (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).cast("double")
      val rates = cnts.crossJoin(broadcast(tot))
        .select(col("source"), col("n_src"),
          least(lit(1.0), w / 50.0 * col("n_tot") / col("n_src")).as("rate"))
      val u = pmod(conv(substring(md5(col("doc_id").cast("string")
        .cast("binary")), 1, 8), 16, 10).cast("long"), lit(2147483647L))
        .cast("double") / 2147483647.0
      docs.join(broadcast(rates), "source")
        .groupBy("source")
        .agg(count(when(u < col("rate"), lit(1))).as("kept"),
          max(col("n_src")).as("n_src"),
          floor(max(col("rate")) * 10000 + 0.5).cast("long").as("rate_bp"))
    },

    // Robust outlier detection: per-group median + MAD (two exact
    // percentile levels), rows flagged beyond 3 MADs. Median/MAD are
    // bit-identical to quantile_cont, deviations and the 3×MAD boundary
    // are exact double ops — so even the boundary rows agree.
    QuerySpec(
      "q96_mad_outliers",
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type
        |), dev AS (
        |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)
        |), mad AS (
        |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n,
        |  count(*) FILTER (WHERE d.adev > 3 * m.mad) AS n_outliers,
        |  CAST(floor(max(d.med) * 10000 + 0.5) AS BIGINT) AS med_bp,
        |  CAST(floor(max(m.mad) * 10000 + 0.5) AS BIGINT) AS mad_bp
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).select("event_type", "value")
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), col("value"), col("med"),
          abs(col("value") - col("med")).as("adev"))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(when(col("adev") > lit(3) * col("mad"), lit(1))).as("n_outliers"),
          floor(max(col("med")) * 10000 + 0.5).cast("long").as("med_bp"),
          floor(max(col("mad")) * 10000 + 0.5).cast("long").as("mad_bp"))
    })
}
