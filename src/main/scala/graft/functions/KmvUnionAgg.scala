package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded KMV-sketch union: aggregates arrays of hashes into the k
  * smallest DISTINCT values (ascending), holding at most k longs of state
  * per group at every point of the aggregation.
  *
  * Semantics are exactly
  * `slice(array_sort(array_distinct(flatten(collect_list(sk)))), 1, k)` —
  * the k smallest distinct of a union — because the KMV order statistic is
  * associative: the k smallest of a union equal the k smallest of the union
  * of the per-part k-smallest (dropping any value larger than a part's k-th
  * smallest can never drop one of the global k smallest). Unlike the
  * collect_list form, whose aggregation buffer grows Θ(degree·k) on a hub
  * vertex before the final slice (the round-5 VERDICT scale-killer), this
  * buffer is capped at k both map-side (partial) and reduce-side (merge),
  * so a 10⁷-degree crawl-graph hub costs the same 8·k bytes as a leaf.
  *
  * Inputs need not be sorted or distinct; outputs always are, so chained
  * supersteps keep the sorted-distinct invariant the estimator reads
  * (`element_at(sk, k)` = the k-th smallest hash).
  */
class KmvUnionAgg(k: Int) extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
  require(k >= 1, s"need k >= 1, got $k")

  /** Merge two ascending-distinct arrays, cap at k (two-pointer). */
  private def mergeSorted(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty && b.length <= k) return b
    val out = new scala.collection.mutable.ArrayBuffer[Long](k)
    var i = 0; var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (out.isEmpty || out.last != v) out += v
    }
    out.toSeq
  }

  /** Normalize an incoming sketch row: ascending distinct, capped at k.
    * Loop-carried sketches already satisfy this (cheap no-op check). */
  private def normalize(xs: Seq[Long]): Seq[Long] = {
    var i = 1
    var sortedDistinct = true
    while (sortedDistinct && i < xs.length) {
      if (xs(i - 1) >= xs(i)) sortedDistinct = false
      i += 1
    }
    if (sortedDistinct) { if (xs.length <= k) xs else xs.take(k) }
    else mergeSorted(Vector.empty, xs.distinct.sorted)
  }

  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], x: Seq[Long]): Seq[Long] =
    mergeSorted(buf, normalize(x))
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = mergeSorted(a, b)
  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
