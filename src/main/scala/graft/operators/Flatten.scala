package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Schema-recursive struct flattener.
  *
  * Re-expresses the reference's recursive dict flattener
  * (`/root/reference/dags/utils/utils.py:1-20`, applied at
  * `dags/users_etl.py:109`) as a pure logical projection: we recurse over
  * the DataFrame's `StructType` at *plan time* and emit one
  * `col("a.b.c").alias("a_b_c")` per leaf. Catalyst sees a plain `Project`,
  * so column pruning and pushdown still reach the scan — no row-at-a-time
  * work, unlike the reference.
  *
  * Key-concatenation semantics match the reference exactly
  * (`utils.py:15`): `parent_key + sep + key`, default `sep = "_"`,
  * top-level keys unprefixed.
  */
object Flatten {

  /** Select-list of flattened leaf columns for `schema`. */
  def flatColumns(schema: StructType, sep: String = "_"): Seq[Column] = {
    def recurse(fields: Seq[StructField], path: Seq[String], prefix: String): Seq[Column] =
      fields.flatMap { f =>
        val fieldPath = path :+ f.name
        val flatName = if (prefix.isEmpty) f.name else s"$prefix$sep${f.name}"
        f.dataType match {
          case st: StructType => recurse(st.fields.toSeq, fieldPath, flatName)
          case _ =>
            // Quote each path segment so field names containing dots survive.
            Seq(col(fieldPath.map(p => s"`$p`").mkString(".")).alias(flatName))
        }
      }
    recurse(schema.fields.toSeq, Nil, "")
  }

  /** Flatten every (arbitrarily nested) struct column; non-struct columns
    * pass through in their original order. Idempotent on flat input. */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame =
    df.select(flatColumns(df.schema, sep): _*)
}
