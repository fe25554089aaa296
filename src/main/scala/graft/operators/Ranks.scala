package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global-ordering primitives that avoid the single-partition
  * `Window.orderBy(...)` plan (`WindowExec: No Partition Defined` — the
  * whole input funnelling through one task's sort).
  *
  * Shape: bucket rows by deterministic range boundaries of the leading
  * sort key (one `percentile_approx` aggregate, broadcast back), rank
  * WITHIN each bucket with a partitioned window, then shift each bucket
  * by the total count of all lower buckets (a bucket-count table of at
  * most `buckets` rows, combined with a triangular broadcast self-join —
  * no driver collect, no global window anywhere). Every task stays
  * bounded by its range slice at any scale; bucket count follows
  * `spark.sql.shuffle.partitions`, so a 1000-executor cluster gets a
  * proportionally finer range split for free.
  *
  * Correctness does not depend on the boundaries being balanced, only on
  * bucket id being a deterministic, monotone (in the leading sort key)
  * function of the row — `percentile_approx` boundaries are a
  * deterministic aggregate of the (staged) input, and ties share a
  * bucket. The full `sort` order must be total (callers pass a unique
  * tie-break key), which every global-rank semantics needs anyway.
  */
object Ranks {

  /** Append the exact 1-based global `row_number()` by `sort` as column
    * `out` (LongType), without a single-partition sort.
    *
    * @param sort     total order (include a unique tie-break key)
    * @param rangeKey numeric expression aligned with the LEADING sort
    *                 direction (negate it for a descending head) — used
    *                 only to derive range buckets, never in the output
    * @param buckets  range-bucket count; defaults to
    *                 `spark.sql.shuffle.partitions`
    */
  def globalRowNumber(df: DataFrame, out: String, sort: Seq[Column],
      rangeKey: Column, buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nb = math.max(1,
      if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    // Stage the input: it feeds three consumers (boundary aggregate,
    // bucket counts, the ranked output) and a persisted source also
    // pins the boundary aggregate to one deterministic input.
    val in = Dedup.stage(df)
    val k = rangeKey.cast("double")
    val bucketed =
      if (nb == 1) in.withColumn("__pid", lit(0))
      else {
        val ps = (1 until nb).map(i => i.toDouble / nb)
        val bnd = in.agg(
          percentile_approx(k, typedLit(ps), lit(10000)).as("__bnds"))
        in.crossJoin(broadcast(bnd))
          .withColumn("__pid", size(filter(col("__bnds"), b => b < k)))
          .drop("__bnds")
      }
    val counts = bucketed.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val offs = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(sort: _*)
    bucketed.withColumn("__rn", row_number().over(w))
      .join(broadcast(offs), "__pid")
      .withColumn(out, (col("__rn") + col("__off")).cast("long"))
      .drop("__pid", "__rn", "__off")
  }

  /** `ntile(k)` reconstructed from an exact 1-based global rank `rn` and
    * the total row count `n` — SQL-standard bucket sizing (the first
    * `n % k` buckets take the extra row), so it hash-matches
    * `ntile(k) OVER (ORDER BY ...)` with the same total order. */
  def ntileFromRank(rn: Column, n: Column, k: Int): Column = {
    val base = floor(n / k).cast("long")
    val rem = n - base * k
    val cut = rem * (base + 1)
    when(rn <= cut, floor((rn - 1) / (base + 1)).cast("long") + 1)
      .otherwise(rem + floor((rn - cut - 1) / greatest(base, lit(1L)))
        .cast("long") + 1)
  }
}
