package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** IVF-PQ composition invariants: residual quantization must
  * approximate at least as well as flat PQ (that is the point of the
  * composition), and the head must intersect exact truth.
  */
class IvfPqSpec extends AnyFunSpec with SparkTestBase {

  it("residual ADC tracks exact cosine at least as well as flat PQ") {
    def meanErr(rows: Array[org.apache.spark.sql.Row], adcIdx: Int, cosIdx: Int) = {
      val errs = rows.map(r => math.abs(r.getDouble(adcIdx) - r.getDouble(cosIdx)))
      errs.sum / errs.length
    }
    val ivfpq = Similarity.qKnnIvfPq(spark, sfDir).collect()
    assert(ivfpq.length == 5)
    val flat = Similarity.qKnnPq(spark, sfDir).collect()
    val eIvfPq = meanErr(ivfpq, 2, 3)
    val eFlat = meanErr(flat, 1, 2)
    assert(eIvfPq <= eFlat + 0.05,
      s"residual PQ error $eIvfPq worse than flat PQ $eFlat")
    assert(eIvfPq < 0.25, s"residual ADC error $eIvfPq out of range")
  }

  it("the IVF-PQ head overlaps exact brute-force top-10") {
    val head = Similarity.qKnnIvfPq(spark, sfDir).collect().map(_.getLong(0)).toSet
    val brute = Similarity.qKnnBrute(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert((head & brute).nonEmpty, s"IVF-PQ head $head disjoint from exact $brute")
  }

  it("every returned candidate comes from a probed cell") {
    val cells = Similarity.qKnnIvfPq(spark, sfDir).collect().map(_.getInt(1)).toSet
    assert(cells.size <= 2, s"candidates from ${cells.size} cells (nprobe=2): $cells")
  }
}
