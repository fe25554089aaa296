package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` computing the element-wise mean of a
  * fixed-dimension vector column — the engine's custom-UDAF surface
  * (SURVEY §2.E "UDF/UDAF/UDTF" row).
  *
  * Why an Aggregator and not `posexplode → groupBy(pos) → avg`: the
  * explode path shuffles `rows × dim` (id, pos, value) tuples; this
  * aggregator keeps a dim-length double buffer per grouping key and
  * merges partials — map-side combine shrinks the shuffle to one buffer
  * per key per partition, the same contract as built-in declarative
  * aggregates. At 100 TB × dim 64 that is a 64× shuffle-volume
  * reduction for centroid computation.
  *
  * Used via `functions.udaf(...)` so it composes with DataFrame
  * `groupBy` like any built-in (see `graft.queries.PipelineQueries`
  * `ss4_label_centroids`).
  */
class VectorMean(dim: Int)
    extends Aggregator[Seq[Float], VectorMean.Buf, Seq[Double]] {

  override def zero: VectorMean.Buf = VectorMean.Buf(new Array[Double](dim), 0L)

  override def reduce(b: VectorMean.Buf, v: Seq[Float]): VectorMean.Buf = {
    if (v == null) b // NULL rows are ignored, like every SQL aggregate
    else {
      // Fail fast on ragged vectors: silently skipping them would report
      // a mean over an unannounced subset of the rows.
      require(v.length == dim,
        s"VectorMean($dim) fed a vector of length ${v.length}")
      var i = 0
      while (i < dim) { b.sums(i) += v(i); i += 1 }
      VectorMean.Buf(b.sums, b.n + 1)
    }
  }

  override def merge(a: VectorMean.Buf, b: VectorMean.Buf): VectorMean.Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    VectorMean.Buf(a.sums, a.n + b.n)
  }

  override def finish(b: VectorMean.Buf): Seq[Double] =
    if (b.n == 0) Seq.fill(dim)(0.0)
    else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VectorMean.Buf] = Encoders.product[VectorMean.Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorMean {
  /** Partial state: running element sums + row count. */
  final case class Buf(sums: Array[Double], n: Long)
}
