package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (score desc, id asc) pairs per
  * group in a fixed-size buffer with map-side partial merge.
  *
  * Why not `row_number().over(Window.partitionBy(q).orderBy(...)) <= k`: the
  * window form SORTS every group's full candidate list (O(n log n) per group,
  * all rows shuffled); this aggregator keeps O(k) state per group, combines
  * partials before the exchange, and ships only k rows per group on the wire
  * — the difference at a 10⁹-row candidate table is the whole job. This is
  * the engine's `Aggregator[IN, BUF, OUT]` tier (guide §custom-aggregates);
  * register with `functions.udaf(new TopKAggregator(k))`.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  require(k > 0)

  // total order even for NaN (compare ranks NaN greatest, like Spark's
  // window desc ordering did): lower score, or tie + higher id = worse
  private def worseThan(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c < 0 || (c == 0 && a._2 > b._2)
  }

  /** Insert keeping the buffer sorted best-first, capped at k. */
  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length >= k && worseThan(x, buf.last)) buf
    else {
      val (better, worse) = buf.span(b => worseThan(x, b))
      (better ++ (x +: worse)).take(k)
    }
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, x)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
