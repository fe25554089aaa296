package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable relational operators the reference's SQL surface implies but
  * Spark has no single built-in for (SURVEY.md §2.C R9, R11).
  */
object Relational {

  /** All rows attaining the global max of `metric` — *ties preserved*
    * (SURVEY R9: both nontrivial reference queries
    * `/root/reference/sql/blog_post_queries.sql:13-17,35-38` return every
    * max attainer, so `limit(1)` / `max_by` would be wrong).
    *
    * Scale note: implemented as a broadcast join against the 1-row global
    * max, NOT `rank().over(Window.orderBy(...))` — an un-partitioned window
    * funnels the whole table through a single task, which is unacceptable
    * at 100 TB. This shape is two streaming passes over the data with a
    * broadcast of one row.
    */
  def argmaxWithTies(df: DataFrame, metric: Column): DataFrame = {
    val maxRow = df.agg(max(metric).as("__graft_max"))
    df.join(broadcast(maxRow), metric === col("__graft_max"), "inner")
      .drop("__graft_max")
  }

  /** Top-k with a total, deterministic order (`TakeOrderedAndProjectExec`:
    * per-partition top-k then a k-row merge on the driver — no full sort,
    * no single-task shuffle). Callers must include a tiebreak column. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Rows of `child` whose `fk` has no match in `parent.pk` — the engine's
    * form of the reference's FK constraints
    * (`/root/reference/sql/blog_post_definitions.sql:44-53,62-67,76-81`).
    * Empty result ⇔ integrity holds. NULL fks are not orphans (SQL FK
    * semantics: NULL is exempt). */
  def fkOrphans(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame =
    child.where(col(fk).isNotNull)
      .join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")

  /** Primary-key violation rows: `pk` values occurring more than once.
    * Empty result ⇔ uniqueness holds. */
  def pkDuplicates(df: DataFrame, pk: String*): DataFrame =
    df.groupBy(pk.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)
}
