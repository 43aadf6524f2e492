package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded accumulator for [[MinKAggregator]]: the k smallest values seen
  * so far, kept sorted ascending. Public (not nested/private) — Catalyst
  * encoders codegen against it.
  */
case class MinKBuf(xs: Array[Long])

/** Typed aggregate returning the k SMALLEST longs of a group, ascending.
  *
  * The scale story: aggregation state is O(k) regardless of group size,
  * and the aggregate is map-side combinable (`reduce` runs per partition,
  * `merge` folds partials), so a group with a billion members — a
  * stopword term's posting list at 100 TB — costs each task at most k
  * longs of state and the final merge at most (#partitions · k) inputs.
  * This is what replaces `row_number() OVER (PARTITION BY term)` posting
  * heads: the window sorts the WHOLE group in one task; this never
  * materializes the group at all.
  */
class MinKAggregator(k: Int) extends Aggregator[Long, MinKBuf, Array[Long]] {
  require(k > 0, "k must be positive")

  override def zero: MinKBuf = MinKBuf(Array.emptyLongArray)

  override def reduce(b: MinKBuf, x: Long): MinKBuf = {
    val xs = b.xs
    if (xs.length < k) {
      // insert keeping ascending order
      val out = new Array[Long](xs.length + 1)
      var i = 0
      while (i < xs.length && xs(i) <= x) { out(i) = xs(i); i += 1 }
      out(i) = x
      while (i < xs.length) { out(i + 1) = xs(i); i += 1 }
      MinKBuf(out)
    } else if (x < xs(k - 1)) {
      val out = xs.clone()
      var i = k - 1
      while (i > 0 && out(i - 1) > x) { out(i) = out(i - 1); i -= 1 }
      out(i) = x
      MinKBuf(out)
    } else b
  }

  override def merge(a: MinKBuf, b: MinKBuf): MinKBuf = {
    // merge two sorted arrays, keep the k smallest
    val n = math.min(k, a.xs.length + b.xs.length)
    val out = new Array[Long](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      if (j >= b.xs.length || (i < a.xs.length && a.xs(i) <= b.xs(j))) {
        out(o) = a.xs(i); i += 1
      } else { out(o) = b.xs(j); j += 1 }
      o += 1
    }
    MinKBuf(out)
  }

  override def finish(b: MinKBuf): Array[Long] = b.xs

  override def bufferEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
