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
  /** Shared bucketing pass: stage `df` (it feeds the boundary
    * aggregate, the per-bucket aggregate, and the final output) and
    * append a deterministic, leading-key-monotone `__pid` range-bucket
    * id derived from `percentile_approx` boundaries of `rangeKey`. */
  private def rangeBucket(df: DataFrame, rangeKey: Column,
      buckets: Int): DataFrame = {
    val spark = df.sparkSession
    val nb = math.max(1,
      if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val in = Dedup.stage(df)
    val k = rangeKey.cast("double")
    if (nb == 1) in.withColumn("__pid", lit(0))
    else {
      val ps = (1 until nb).map(i => i.toDouble / nb)
      val bnd = in.agg(
        percentile_approx(k, typedLit(ps), lit(10000)).as("__bnds"))
      in.crossJoin(broadcast(bnd))
        .withColumn("__pid", size(filter(col("__bnds"), b => b < k)))
        .drop("__bnds")
    }
  }

  def globalRowNumber(df: DataFrame, out: String, sort: Seq[Column],
      rangeKey: Column, buckets: Int = 0): DataFrame = {
    val bucketed = rangeBucket(df, rangeKey, buckets)
    // Staged: counts feeds both sides of the offset self-join below, and
    // each un-cached consumer would re-run the whole bucketing pass.
    val counts = Dedup.stage(
      bucketed.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt")))
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

  /** Append the strict-prefix running MAX of `value` under the total
    * order `sort` as column `out` (NULL for the global first row — the
    * `max(...) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND
    * 1 PRECEDING)` contract), without a single-partition sort: running
    * max within each range bucket via a partitioned window, plus the max
    * over all LOWER buckets via the same triangular broadcast join
    * [[globalRowNumber]] uses for offsets. Same requirements: `sort`
    * total, `rangeKey` numeric and aligned with the leading direction.
    *
    * NOTE on ties in `rangeKey`: rows tying on the leading key share a
    * bucket (bucket id is monotone in the leading key), so the
    * within-bucket window sees every tied predecessor — prefix semantics
    * hold for any total `sort`. */
  def strictPrefixMax(df: DataFrame, out: String, sort: Seq[Column],
      rangeKey: Column, value: Column, buckets: Int = 0): DataFrame = {
    val bucketed = rangeBucket(df, rangeKey, buckets)
    val bmax = Dedup.stage(
      bucketed.groupBy(col("__pid")).agg(max(value).as("__bm")))
    val lower = bmax.as("a")
      .join(broadcast(bmax.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(max(col("b.__bm")).as("__lowmax"))
    val w = Window.partitionBy(col("__pid")).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("__wmax", max(value).over(w))
      .join(broadcast(lower), "__pid")
      .withColumn(out, greatest(
        coalesce(col("__wmax"), col("__lowmax")),
        coalesce(col("__lowmax"), col("__wmax"))))
      .drop("__pid", "__wmax", "__lowmax")
  }

  /** Append the INCLUSIVE running sums of each `(value, out)` pair under
    * the total order `sort` — the
    * `sum(v) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND
    * CURRENT ROW)` contract — without a single-partition sort: running
    * sums within each range bucket via a partitioned window, plus the
    * totals of all LOWER buckets via the triangular broadcast join
    * [[globalRowNumber]] uses for offsets. All requested sums share one
    * bucketing pass and one window, so a CDF pair (the KS / AUC /
    * Mann–Whitney shape) costs the same as a single sum. Values must be
    * integral (per-bucket totals coalesce with `0L`); same contract as
    * the siblings: `sort` total, `rangeKey` aligned with the leading
    * direction, ties in the leading key share a bucket so prefix
    * semantics hold. */
  def prefixSums(df: DataFrame, sort: Seq[Column], rangeKey: Column,
      values: Seq[(Column, String)], buckets: Int = 0): DataFrame = {
    val bucketed = rangeBucket(df, rangeKey, buckets)
    val btotAggs = values.zipWithIndex.map { case ((v, _), i) =>
      sum(v).as(s"__bt$i") }
    val btot = Dedup.stage(
      bucketed.groupBy(col("__pid")).agg(btotAggs.head, btotAggs.tail: _*))
    val lowAggs = values.indices.map { i =>
      coalesce(sum(col(s"b.__bt$i")), lit(0L)).as(s"__low$i") }
    val lower = btot.as("a")
      .join(broadcast(btot.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(lowAggs.head, lowAggs.tail: _*)
    val w = Window.partitionBy(col("__pid")).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = values.zipWithIndex.foldLeft(bucketed) {
      case (d, ((v, _), i)) => d.withColumn(s"__w$i", sum(v).over(w))
    }
    val summed = values.zipWithIndex.foldLeft(
      windowed.join(broadcast(lower), "__pid")) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"__w$i") + col(s"__low$i"))
    }
    summed.drop("__pid" +: values.indices.flatMap(i =>
      Seq(s"__w$i", s"__low$i")): _*)
  }

  /** Numeric range key for a STRING sort column: the first 6 UTF-8
    * bytes as a right-zero-padded big-endian integer. Monotone
    * (non-strict) in the lexicographic byte order — strings sharing a
    * 6-byte prefix collapse to one key, which only merges buckets,
    * never reorders them, so it satisfies the [[globalRowNumber]]
    * range-key contract for any binary/ASCII collation. 6 bytes keeps
    * the value < 2^48, exact through the double cast the bucketing
    * applies. */
  def stringPrefixKey(c: Column): Column =
    conv(rpad(hex(c.cast("binary")), 12, "0"), 16, 10).cast("long")

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
