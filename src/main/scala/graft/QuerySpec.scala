package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a DataFrame program plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string the
  * driver's oracle runs over the same parquet tables.
  *
  * Contract (driver harness): column names of the Spark result and the
  * oracle result must match exactly — the compare sorts columns by name
  * before hashing. Aggregates over doubles are rounded identically on both
  * sides so partial-aggregation order cannot produce hash mismatches.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))

  /** A query whose semantics are not expressible in ANSI SQL (approximate /
    * hash-seeded / streaming-only); the driver records a rows-only check. */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}
