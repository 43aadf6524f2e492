package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded accumulator for [[MinKPairAggregator]]: the k lexicographically
  * smallest (d, id) pairs seen so far, kept sorted ascending as parallel
  * arrays (Catalyst encodes primitive arrays without boxing). Public —
  * encoders codegen against it.
  */
case class MinKPairBuf(ds: Array[Double], ids: Array[Long])

/** Typed aggregate returning the k lexicographically SMALLEST
  * (double, long) pairs of a group, ascending — the two-column sibling of
  * [[MinKAggregator]].
  *
  * The scale story is identical: aggregation state is O(k) regardless of
  * group size and the aggregate is map-side combinable, so per-group cost
  * never grows with the group. This is what replaces
  * `array_sort(collect_list(struct(d, id)))[k]` k-th-neighbor extraction:
  * collect_list buffers the WHOLE group (an IVF cell's full neighbor list —
  * √n elements per anchor at the documented IVF_K≈√n dial); this keeps k
  * pairs per partial, full stop. Ties on d break by id, matching the
  * struct sort it replaces.
  */
class MinKPairAggregator(k: Int)
    extends Aggregator[(Double, Long), MinKPairBuf, MinKPairBuf] {
  require(k > 0, "k must be positive")

  override def zero: MinKPairBuf =
    MinKPairBuf(Array.emptyDoubleArray, Array.emptyLongArray)

  // (d1,i1) < (d2,i2) lexicographically, under double's TOTAL order
  // (java.lang.Double.compare: NaN greatest, matching array_sort's
  // NaN-last) — naive `<` treats every NaN comparison as false and a
  // NaN already in the buffer would break the sorted invariant.
  private def lt(d1: Double, i1: Long, d2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c < 0 || (c == 0 && i1 < i2)
  }

  override def reduce(b: MinKPairBuf, x: (Double, Long)): MinKPairBuf = {
    val (d, id) = x
    val n = b.ds.length
    if (n < k) {
      val ds = new Array[Double](n + 1); val ids = new Array[Long](n + 1)
      var i = 0
      while (i < n && !lt(d, id, b.ds(i), b.ids(i))) {
        ds(i) = b.ds(i); ids(i) = b.ids(i); i += 1
      }
      ds(i) = d; ids(i) = id
      while (i < n) { ds(i + 1) = b.ds(i); ids(i + 1) = b.ids(i); i += 1 }
      MinKPairBuf(ds, ids)
    } else if (lt(d, id, b.ds(k - 1), b.ids(k - 1))) {
      val ds = b.ds.clone(); val ids = b.ids.clone()
      var i = k - 1
      while (i > 0 && lt(d, id, ds(i - 1), ids(i - 1))) {
        ds(i) = ds(i - 1); ids(i) = ids(i - 1); i -= 1
      }
      ds(i) = d; ids(i) = id
      MinKPairBuf(ds, ids)
    } else b
  }

  override def merge(a: MinKPairBuf, b: MinKPairBuf): MinKPairBuf = {
    val n = math.min(k, a.ds.length + b.ds.length)
    val ds = new Array[Double](n); val ids = new Array[Long](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      val takeA = j >= b.ds.length ||
        (i < a.ds.length && !lt(b.ds(j), b.ids(j), a.ds(i), a.ids(i)))
      if (takeA) { ds(o) = a.ds(i); ids(o) = a.ids(i); i += 1 }
      else { ds(o) = b.ds(j); ids(o) = b.ids(j); j += 1 }
      o += 1
    }
    MinKPairBuf(ds, ids)
  }

  override def finish(b: MinKPairBuf): MinKPairBuf = b

  override def bufferEncoder: Encoder[MinKPairBuf] = Encoders.product[MinKPairBuf]
  override def outputEncoder: Encoder[MinKPairBuf] = Encoders.product[MinKPairBuf]
}
