package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 registers one [[QuerySpec]]
  * in an object under the `graft.queries` package; this file only
  * concatenates them into the `queries` / `oracleSql` maps the driver
  * consumes.
  */
object SparkEntry {

  def allSpecs: Seq[QuerySpec] =
    _root_.graft.queries.RefQueries.specs ++
      _root_.graft.queries.CoreQueries.specs ++
      _root_.graft.queries.ExtQueries.specs ++
      _root_.graft.queries.PipelineQueries.specs ++
      _root_.graft.queries.BreadthQueries.specs ++
      _root_.graft.queries.CurationQueries.specs ++
      _root_.graft.queries.ScaleQueries.specs ++
      _root_.graft.queries.Spark4Queries.specs ++
      _root_.graft.queries.QualityQueries.specs ++
      _root_.graft.queries.GraphQueries.specs ++
      _root_.graft.queries.SemanticQueries.specs ++
      _root_.graft.queries.RankingQueries.specs ++
      _root_.graft.queries.OlapQueries.specs ++
      _root_.graft.queries.ExpQueries.specs ++
      _root_.graft.queries.Exp2Queries.specs ++
      _root_.graft.queries.SketchQueries.specs ++
      _root_.graft.queries.IncrementalQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Looked up by name so reordering/prepending specs can't silently swap
    * the smoke query for one that may legitimately return 0 rows.
    *
    * Note: query functions set `spark.sql.legacy.parquet.nanosAsLong` on
    * the passed session (via [[Tables.load]]) — required to read the
    * harness's TIMESTAMP(NANOS) parquet on any session, including ones
    * the driver constructs itself. */
  def entry(spark: SparkSession): DataFrame =
    queries("ref_a_top_commenter")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
