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
    // retainHistory: the MV table's own commit log is the refresh
    // watermark's CRASH RECOVERY record (each refresh stamps its folded
    // delta range as its commit tag) — retained generations keep those
    // tags visible even if maintenance commits land in between.
    spark.sql(s"""CREATE TABLE $cat.$mvTable
      TBLPROPERTIES ('retainHistory'='true') AS
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
    spark.sql(s"""CREATE TABLE $cat.$mvTable
      TBLPROPERTIES ('retainHistory'='true') AS
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

  /** Create the MIN/MAX MV: the partial log carries each refresh
    * batch's `(group, min_p, max_p)` and the view folds
    * `min(min_p), max(max_p)`. Min/max are monoids UNDER APPEND-ONLY —
    * a deleted row cannot lower a recorded max back down — which is
    * exactly the discipline refresh already enforces: the delta read
    * (plain incremental, never change-feed) fails loudly on any
    * retirement, deletion-vector change, or equality-delete commit in
    * the window (the same sound-or-stand-down posture a42's aggregate
    * pushdown takes). Re-create the MV after row-level maintenance. */
  def createMinMax(spark: SparkSession, cat: String, view: String,
      baseTable: String, mvTable: String, groupCol: String,
      valueCol: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.$mvTable")
    spark.sql(s"""CREATE TABLE $cat.$mvTable
      TBLPROPERTIES ('retainHistory'='true') AS
      SELECT `$groupCol`, min(`$valueCol`) AS min_p,
        max(`$valueCol`) AS max_p
      FROM $cat.$baseTable GROUP BY `$groupCol`""")
    val baseDir = dirFor(spark, cat, baseTable)
    GraftCatalog.setTableProperties(dirFor(spark, cat, mvTable), Map(
      "mv.kind" -> "minmax",
      "mv.base" -> baseDir.toString,
      "mv.group" -> groupCol,
      "mv.value" -> valueCol,
      "mv.gen" -> ManifestSink.committedGeneration(baseDir.toString).toString))
    spark.sql(s"DROP VIEW IF EXISTS $cat.$view")
    spark.sql(s"""CREATE VIEW $cat.$view AS
      SELECT `$groupCol`, min(min_p) AS min_v, max(max_p) AS max_v
      FROM $cat.$mvTable GROUP BY `$groupCol`""")
  }

  /** Create the STAR-JOIN MV (fact ⋈ dim, aggregated by a dim
    * attribute): the partial log keys by the fact's DIM FK — the one
    * key appends can always be folded on — and the view JOINS the dim
    * AT READ, grouping by the dim attribute:
    *
    *  - refresh stays the plain O(delta) fact fold (the avg kind's
    *    machinery verbatim — the FK is just the group column);
    *  - the dim side is LATE-BOUND: a dim attribute update (a customer
    *    moving nations) is visible at the next read with NO partial
    *    invalidation, because partials never baked the attribute in —
    *    the classic IVM answer for N:1 star joins;
    *  - the fold-then-join is exact because the join is N:1 on the dim
    *    key (each FK partial meets exactly one dim row). FKs with no
    *    dim row drop, like the relational inner join they mirror. */
  def createJoinAgg(spark: SparkSession, cat: String, view: String,
      factTable: String, dimTable: String, mvTable: String,
      fkCol: String, dimKeyCol: String, dimAttrCol: String,
      valueCol: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.$mvTable")
    spark.sql(s"""CREATE TABLE $cat.$mvTable
      TBLPROPERTIES ('retainHistory'='true') AS
      SELECT `$fkCol`, sum(`$valueCol`) AS sum_p,
        count(`$valueCol`) AS cnt_p
      FROM $cat.$factTable GROUP BY `$fkCol`""")
    val baseDir = dirFor(spark, cat, factTable)
    GraftCatalog.setTableProperties(dirFor(spark, cat, mvTable), Map(
      "mv.base" -> baseDir.toString,
      "mv.group" -> fkCol,
      "mv.value" -> valueCol,
      "mv.gen" -> ManifestSink.committedGeneration(baseDir.toString).toString))
    spark.sql(s"DROP VIEW IF EXISTS $cat.$view")
    spark.sql(s"""CREATE VIEW $cat.$view AS
      SELECT d.`$dimAttrCol`, sum(m.sum_p) AS sum_v, sum(m.cnt_p) AS cnt_v,
        sum(m.sum_p) DIV sum(m.cnt_p) AS avg_v
      FROM $cat.$mvTable m JOIN $cat.$dimTable d
        ON m.`$fkCol` = d.`$dimKeyCol`
      GROUP BY d.`$dimAttrCol`""")
  }

  /** The refresh-cycle lock file: refresh's read-fold-append-advance
    * sequence is a COARSER critical section than one manifest commit
    * (the inner append takes the normal publish lock), so it gets its
    * own lock name — same create-exclusive + lease-reclaim machinery. */
  private[sources] val RefreshLockName = ".mv.refresh.lock"

  /** Commit tag a refresh stamps on its partial-batch append:
    * `mv-refresh-<last>-<cur>` — the folded delta range, making the
    * append SELF-DESCRIBING in the MV's own history. */
  private[sources] def refreshTag(last: Long, cur: Long): String =
    s"mv-refresh-$last-$cur"
  private val RefreshTagRe = "mv-refresh-(\\d+)-(\\d+)".r

  /** The TRUE last-refreshed base generation: the `mv.gen` property OR
    * the newest refresh tag in the MV's commit history, whichever is
    * larger. A crash between the partial append and the property swap
    * leaves the property stale — but the append's tag already recorded
    * the folded range, so recovery is structural: a replayed refresh
    * sees its own prior append and no-ops instead of double-counting. */
  private def lastRefreshedGen(mvDir: Path, propGen: Long): Long = {
    val tagged = ManifestSink.history(mvDir.toString).iterator.flatMap(c =>
      c.tag match {
        case RefreshTagRe(_, cur) => Some(cur.toLong)
        case _ => None
      }).foldLeft(0L)(math.max)
    math.max(propGen, tagged)
  }

  /** Fold the base table's generation delta into the MV. Returns
    * (fromGeneration, toGeneration) — equal when already fresh (no
    * commit published, no delta read planned). Dispatches on the MV's
    * recorded kind (avg partials vs top-k count log).
    *
    * EXACTLY-ONCE under crash and concurrency:
    *
    *  - the whole read-watermark → fold-delta → append → advance cycle
    *    runs under the MV dir's [[RefreshLockName]] file lock, so two
    *    concurrent refreshes SERIALIZE (the second re-reads the
    *    watermark inside the lock and no-ops);
    *  - the partial append is tagged with its folded range
    *    ([[refreshTag]]), and the watermark is derived from
    *    max(property, newest tag) — a refresh that crashed between the
    *    append and the property swap is healed by the next refresh
    *    (it sees the tag, repairs the property, folds nothing twice);
    *  - the property swap also runs under the refresh lock, closing
    *    the unlocked read-modify-write of `_table.json` between
    *    refreshes (a concurrent ALTER TABLE on the MV table itself
    *    remains out of scope — MVs are system-maintained).
    *
    * `crashAfterAppend` is the test hook simulating a kill at the one
    * crash site that used to double-count. */
  def refresh(spark: SparkSession, cat: String, mvTable: String,
      crashAfterAppend: Boolean = false): (Long, Long) =
    refreshDir(spark, dirFor(spark, cat, mvTable), crashAfterAppend)

  /** Directory-addressed refresh — the `CALL cat.system.refresh_mv`
    * entry point (the procedure knows its catalog base directly and
    * must not re-resolve it through session conf, which Spark caches
    * per catalog NAME). */
  private[sources] def refreshDir(spark: SparkSession, mvDir: Path,
      crashAfterAppend: Boolean = false): (Long, Long) =
    ManifestSink.withFileLock(mvDir, RefreshLockName,
        acquireWaitMs = 120000L) {
      val (_, _, props) = GraftCatalog.readMeta(mvDir)
      val baseDir = props("mv.base")
      val groupCol = props("mv.group")
      val propGen = props("mv.gen").toLong
      val last = lastRefreshedGen(mvDir, propGen)
      // Heal a stale property left by a crash between append and swap.
      if (last > propGen)
        GraftCatalog.setTableProperties(mvDir,
          Map("mv.gen" -> last.toString))
      val cur = ManifestSink.committedGeneration(baseDir)
      if (cur == last) (last, last)
      else {
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
          case "minmax" =>
            val valueCol = props("mv.value")
            delta.groupBy(col(groupCol))
              .agg(min(col(valueCol)).as("min_p"),
                max(col(valueCol)).as("max_p"))
          case _ =>
            val valueCol = props("mv.value")
            delta.groupBy(col(groupCol))
              .agg(sum(col(valueCol)).as("sum_p"),
                count(col(valueCol)).as("cnt_p"))
        }
        partial.write.format("graft.sources.ManifestSink")
          .option("path", mvDir.toString)
          .option("commitTag", refreshTag(last, cur))
          .mode("append").save()
        if (crashAfterAppend)
          throw new IllegalStateException(
            "simulated crash between partial append and watermark swap")
        GraftCatalog.setTableProperties(mvDir, Map("mv.gen" -> cur.toString))
        (last, cur)
      }
    }
}
