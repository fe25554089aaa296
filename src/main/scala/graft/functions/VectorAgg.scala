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

/** Bounded top-k by score: keeps the `k` best (score desc, id asc)
  * pairs seen, as a typed Aggregator so the bound applies MAP-SIDE.
  *
  * Why not a window (`row_number over (partition by qid order by sim)`)
  * : the window shuffles every candidate row to the query's partition
  * before ranking — at a 100 TB base table that is the whole scored
  * corpus over the wire per query batch. With map-side combine this
  * aggregator shuffles at most `k` pairs per input partition per group,
  * independent of corpus size. Used by `Similarity.knnJoin`.
  *
  * The buffer is a sorted (best-first) list of ≤ k pairs; reduce is an
  * insertion into a ≤ k list and merge is a bounded sorted-list merge —
  * O(k) each, negligible next to the similarity kernel.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"TopKByScore: k must be positive (got $k)")

  // Total order: higher score first, id ascending among equal scores —
  // the determinism contract every caller's oracle relies on.
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    // NaN scores are dropped like SQL NULLs: beats() is a total order
    // only over reals, and a NaN entry would land at the head of the
    // buffer and break the bound/determinism invariants.
    if (v == null || v._1.isNaN) buf
    else if (buf.lengthCompare(k) >= 0 && !beats(v, buf.last)) buf
    else {
      val (better, worse) = buf.span(beats(_, v))
      (better ++ (v +: worse)).take(k)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && beats(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
