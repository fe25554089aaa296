package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series similarity search over an event stream: z-normalized
  * subsequence matching (the distributed "find windows shaped like this
  * pattern" primitive — cf. the streaming time-series similarity-search
  * line of work, PAPERS.md EDBT 2019).
  *
  * Scale shape: ONE shuffle partitions by series key; windows
  * materialize per-row from a bounded frame (`w` values), all math is
  * per-row Column folds (no UDF, no driver loop), and ranking is a
  * global top-k (`TakeOrderedAndProject`). Every arithmetic step is a
  * sequential fold or an IEEE-exact op (division, sqrt), and ranking
  * uses fixed-point keys — so results are engine-portable and the
  * DuckDB oracle verifies the full pipeline.
  */
object TimeSeries {

  /** Driver-side z-normalization for the query pattern (sequential
    * folds — the same order the engine-side folds use). */
  def znorm(xs: Seq[Double]): Seq[Double] = {
    val n = xs.length
    val mean = xs.foldLeft(0.0)(_ + _) / n
    val sumsq = xs.foldLeft(0.0)((a, x) => a + (x - mean) * (x - mean))
    val std = math.sqrt(sumsq / n)
    if (std == 0) xs.map(_ => 0.0) else xs.map(x => (x - mean) / std)
  }

  private def seqSum(c: Column): Column = aggregate(c, lit(0.0), (a, x) => a + x)

  /** Top-`k` length-`|pattern|` subsequences of each `partCol` series
    * (ordered by `tsCol`, ties by `tieCol`) closest to `pattern` in
    * z-normalized squared Euclidean distance. Flat (constant) windows
    * z-normalize to the zero vector by convention. Returns
    * `(partCol, idx, dist_bp)` — idx is the window's 1-based start
    * position in its series; dist_bp the distance in basis points
    * (ranking happens ON the fixed-point value, so cross-engine ulp
    * drift cannot reorder the sample). */
  def subseqSearch(events: DataFrame, partCol: String, tsCol: String,
      tieCol: String, valCol: String, pattern: Seq[Double], k: Int): DataFrame = {
    val w = pattern.length
    require(w >= 2, s"subseqSearch: pattern length must be >= 2 (got $w)")
    val zp = array(znorm(pattern).map(lit): _*)
    val order = Window.partitionBy(partCol).orderBy(col(tsCol), col(tieCol))
    val frame = order.rowsBetween(Window.currentRow, w - 1)
    events
      .select(col(partCol), col(tsCol), col(tieCol), col(valCol))
      .withColumn("idx", row_number().over(order).cast("long"))
      .withColumn("win", collect_list(col(valCol)).over(frame))
      .where(size(col("win")) === w)
      // Each stage materializes an attribute before the next references
      // it inside a lambda (HOF staging discipline).
      .select(col(partCol), col("idx"), col("win"))
      .withColumn("mean", seqSum(col("win")) / w)
      .withColumn("sd", sqrt(seqSum(transform(col("win"),
        x => (x - col("mean")) * (x - col("mean")))) / w))
      .withColumn("zw", transform(col("win"),
        x => when(col("sd") === 0, lit(0.0))
          .otherwise((x - col("mean")) / col("sd"))))
      .withColumn("dist", seqSum(zip_with(col("zw"), zp,
        (a, b) => (a - b) * (a - b))))
      .select(col(partCol), col("idx"),
        floor(col("dist") * 10000.0 + 0.5).cast("long").as("dist_bp"))
      .orderBy(col("dist_bp"), col(partCol), col("idx"))
      .limit(k)
  }
}
