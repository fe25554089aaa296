package graft.sources

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** INCREMENTAL MATERIALIZED VIEWS over manifest tables — the missing
  * catalog object on top of the IVM algebra the query registry already
  * proves (q176's AVG partials, q88's mergeable stats): a maintained
  * PARTIAL-AGGREGATE table plus a catalog VIEW that finalizes it.
  *
  * The design is the self-maintainable-aggregate shape:
  *
  *  - the MV TABLE is a LOG OF PARTIALS `(group, sum_p, cnt_p)` — one
  *    batch of rows per refresh;
  *  - the VIEW folds them (`sum(sum_p), sum(cnt_p)`) — sum/count are
  *    commutative monoids, so folding partials of any refresh
  *    granularity equals the full recompute exactly (integer
  *    arithmetic end to end);
  *  - REFRESH reads ONLY the base table's generation delta
  *    (`startingVersion` = last refreshed generation — the manifest
  *    source's O(delta) diff planner; the base rows before it are
  *    never touched, pinned in IngestSpec by hiding them) and APPENDS
  *    one partial batch — O(delta) read, O(groups-in-delta) write, no
  *    merge join, no MV rewrite.
  *
  * At 100 TB this is the difference between "recompute the aggregate
  * nightly over the corpus" and "fold yesterday's partial into the
  * log": refresh cost tracks the APPEND rate, not the table size. The
  * partial log grows one batch per refresh; ordinary compaction
  * (`CALL system.compact`) keeps it bounded without changing the fold.
  *
  * Bookkeeping rides the MV table's properties (`mv.base`, `mv.group`,
  * `mv.value`, `mv.gen`), updated by the same atomic metadata swap
  * ALTER TABLE uses. The base table must be retained
  * (`retainHistory=true`): the delta read resolves the last-refreshed
  * generation's manifest. Append-only bases only — a base DELETE or
  * rewrite fails the delta read loudly (the generation-diff planner's
  * append-only guard) instead of silently double-counting; re-create
  * the MV after row-level maintenance. */
object MaterializedViews {

  private def dirFor(spark: SparkSession, cat: String, table: String): Path = {
    val base = Paths.get(spark.conf.get(s"spark.sql.catalog.$cat.base"))
    table.split("\\.").foldLeft(base)(_.resolve(_))
  }

  /** Create the AVG-shaped MV: `CREATE TABLE <mvTable>` seeded with the
    * full partials, plus `CREATE VIEW <view>` finalizing
    * `(group, sum_v, cnt_v, avg_v)` with exact integer division. */
  def createAvg(spark: SparkSession, cat: String, view: String,
      baseTable: String, mvTable: String, groupCol: String,
      valueCol: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.$mvTable")
    spark.sql(s"""CREATE TABLE $cat.$mvTable AS
      SELECT `$groupCol`, sum(`$valueCol`) AS sum_p,
        count(`$valueCol`) AS cnt_p
      FROM $cat.$baseTable GROUP BY `$groupCol`""")
    val baseDir = dirFor(spark, cat, baseTable)
    GraftCatalog.setTableProperties(dirFor(spark, cat, mvTable), Map(
      "mv.base" -> baseDir.toString,
      "mv.group" -> groupCol,
      "mv.value" -> valueCol,
      "mv.gen" -> ManifestSink.committedGeneration(baseDir.toString).toString))
    spark.sql(s"DROP VIEW IF EXISTS $cat.$view")
    spark.sql(s"""CREATE VIEW $cat.$view AS
      SELECT `$groupCol`, sum(sum_p) AS sum_v, sum(cnt_p) AS cnt_v,
        sum(sum_p) DIV sum(cnt_p) AS avg_v
      FROM $cat.$mvTable GROUP BY `$groupCol`""")
  }

  /** Create the TOP-K MV: the per-(group, key) COUNT log plus a view
    * ranking the folded counts and keeping rank <= k. Count is a
    * monoid, so the fold is exact at any refresh granularity; the rank
    * is computed AT READ over the folded counts — which is what makes
    * a key that drops out of (or re-enters) the top k always correct:
    * the MV maintains the full count table (O(distinct keys), the
    * standard IVM answer for top-k — a pruned log could never bring a
    * key back), and only the view applies the k cut. Tie-break on the
    * key keeps the cut total-ordered (engine-identical). */
  def createTopK(spark: SparkSession, cat: String, view: String,
      baseTable: String, mvTable: String, groupCol: String,
      keyCol: String, k: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.$mvTable")
    spark.sql(s"""CREATE TABLE $cat.$mvTable AS
      SELECT `$groupCol`, `$keyCol`, count(*) AS cnt_p
      FROM $cat.$baseTable GROUP BY `$groupCol`, `$keyCol`""")
    val baseDir = dirFor(spark, cat, baseTable)
    GraftCatalog.setTableProperties(dirFor(spark, cat, mvTable), Map(
      "mv.kind" -> "topk",
      "mv.base" -> baseDir.toString,
      "mv.group" -> groupCol,
      "mv.key" -> keyCol,
      "mv.gen" -> ManifestSink.committedGeneration(baseDir.toString).toString))
    spark.sql(s"DROP VIEW IF EXISTS $cat.$view")
    spark.sql(s"""CREATE VIEW $cat.$view AS
      SELECT `$groupCol`, `$keyCol`, cnt, rnk FROM (
        SELECT `$groupCol`, `$keyCol`, sum(cnt_p) AS cnt,
          row_number() OVER (PARTITION BY `$groupCol`
            ORDER BY sum(cnt_p) DESC, `$keyCol`) AS rnk
        FROM $cat.$mvTable GROUP BY `$groupCol`, `$keyCol`)
      WHERE rnk <= $k""")
  }

  /** Fold the base table's generation delta into the MV. Returns
    * (fromGeneration, toGeneration) — equal when already fresh (no
    * commit published, no delta read planned). Dispatches on the MV's
    * recorded kind (avg partials vs top-k count log). */
  def refresh(spark: SparkSession, cat: String, mvTable: String)
      : (Long, Long) = {
    val mvDir = dirFor(spark, cat, mvTable)
    val (_, _, props) = GraftCatalog.readMeta(mvDir)
    val baseDir = props("mv.base")
    val groupCol = props("mv.group")
    val last = props("mv.gen").toLong
    val cur = ManifestSink.committedGeneration(baseDir)
    if (cur == last) return (last, last)
    val baseSchema = GraftCatalog.readMeta(Paths.get(baseDir))._1
    // O(delta): the generation-diff planner serves exactly the files
    // committed in (last, cur] — carried segments are not even read.
    val delta = spark.read.format("graft.sources.ManifestSink")
      .schema(baseSchema).option("path", baseDir)
      .option("startingVersion", last.toString)
      .option("endingVersion", cur.toString)
      .load()
    val partial = props.getOrElse("mv.kind", "avg") match {
      case "topk" =>
        delta.groupBy(col(groupCol), col(props("mv.key")))
          .agg(count(lit(1)).as("cnt_p"))
      case _ =>
        val valueCol = props("mv.value")
        delta.groupBy(col(groupCol))
          .agg(sum(col(valueCol)).as("sum_p"),
            count(col(valueCol)).as("cnt_p"))
    }
    partial.write.format("graft.sources.ManifestSink")
      .option("path", mvDir.toString).mode("append").save()
    GraftCatalog.setTableProperties(mvDir, Map("mv.gen" -> cur.toString))
    (last, cur)
  }
}
