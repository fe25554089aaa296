package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded KMV (k-minimum-values) distinct sketch: keeps the `k`
  * smallest DISTINCT hash values seen, as a typed Aggregator so the
  * bound applies MAP-SIDE.
  *
  * Why not `distinct().orderBy().limit(k)`: the exact distinct shuffles
  * every distinct key before the limit can bite — at a 100 TB key
  * stream that is the whole keyspace over the wire, the exact cost a
  * bounded-state sketch exists to avoid (the same failure mode the
  * r7 q183 `.distinct()` finding documented for HLL). With map-side
  * combine this aggregator's partial state is a sorted ≤ k array per
  * partition; the shuffle carries one ≤ k array per partition,
  * independent of input size.
  *
  * Determinism: the k smallest distinct values of a multiset are a pure
  * function of the SET of values — independent of row order, partition
  * count, and merge order — so a DuckDB oracle can replay the result as
  * `SELECT DISTINCT hv ORDER BY hv LIMIT k` (the relational spec; the
  * aggregator is the scalable plan). `finish` returns the values in
  * ascending order.
  *
  * KMV estimator (used by callers, not computed here): with hashes
  * uniform on [0, M) and h_k the k-th smallest distinct value, distinct
  * count ≈ (k-1)·M / h_k; relative std-error ≈ 1/sqrt(k-2). Sketches
  * are mergeable: KMV(A ∪ B) = the k smallest of KMV(A) ∪ KMV(B) —
  * pinned in SketchSpec.
  *
  * Buffer ops are O(k) linear inserts/merges (k ≈ 256) — negligible
  * next to the hash kernel, and zero allocation pressure beyond the
  * buffer itself.
  */
class KMinValues(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"KMinValues: k must be positive (got $k)")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.lengthCompare(k) >= 0 && v >= buf.last) buf
    else {
      val (lo, hi) = buf.span(_ < v)
      if (hi.headOption.contains(v)) buf // already present: a SET sketch
      else (lo ++ (v +: hi)).take(k)
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length) { out += a(i); i += 1 }
      else if (i >= a.length) { out += b(j); j += 1 }
      else if (a(i) < b(j)) { out += a(i); i += 1 }
      else if (a(i) > b(j)) { out += b(j); j += 1 }
      else { out += a(i); i += 1; j += 1 } // equal: keep one (set union)
    }
    out.toSeq
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
