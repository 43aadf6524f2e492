package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable SimHash accumulator: per-bit vote counters + element count.
  * Public (not nested/private) — Catalyst encoders codegen against it.
  */
case class SimHashBuf(counts: Array[Long], n: Long)

/** Typed custom aggregate (the `Aggregator[IN, BUF, OUT]` point on the
  * §2.8 surface): folds 60-bit word hashes into a SimHash in ONE pass —
  * per-bit majority vote — with map-side partial aggregation for free
  * (reduce runs per partition, merge combines partials), instead of the
  * 60-sum-columns formulation `Dedup.qDedupSimhash` uses. Both produce
  * identical signatures (spec-checked); the columnar one stays wired to
  * the oracle because its expressions mirror 1:1 into SQL.
  */
object SimHashAggregator extends Aggregator[Long, SimHashBuf, Long] {

  private val BITS = 60

  override def zero: SimHashBuf = SimHashBuf(new Array[Long](BITS), 0L)

  override def reduce(b: SimHashBuf, h: Long): SimHashBuf = {
    var i = 0
    while (i < BITS) { b.counts(i) += (h >> i) & 1L; i += 1 }
    SimHashBuf(b.counts, b.n + 1)
  }

  override def merge(a: SimHashBuf, b: SimHashBuf): SimHashBuf = {
    var i = 0
    while (i < BITS) { a.counts(i) += b.counts(i); i += 1 }
    SimHashBuf(a.counts, a.n + b.n)
  }

  override def finish(b: SimHashBuf): Long = {
    var out = 0L; var i = 0
    while (i < BITS) {
      if (b.counts(i) * 2 >= b.n) out |= 1L << i
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[SimHashBuf] = Encoders.product[SimHashBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
