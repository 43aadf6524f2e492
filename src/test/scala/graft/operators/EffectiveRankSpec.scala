package graft.operators

import graft.{SparkTestBase, Tables}
import org.scalatest.funspec.AnyFunSpec

/** q_effective_rank: participation ratio off the exact covariance —
  * replayed driver-side from the raw embeddings.
  */
class EffectiveRankSpec extends AnyFunSpec with SparkTestBase {

  lazy val row = Similarity.qEffectiveRank(spark, sfDir).head

  it("matches a driver-side covariance participation-ratio replay") {
    val embs = Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = embs.length
    val dim = embs.head.length
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mu = (0 until dim).map(j => r6(embs.map(_(j)).sum / n)).toArray
    val xc = embs.map(e => e.indices.map(j => r6(e(j) - mu(j))).toArray)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val micro = xc.map(x => math.round(x(i) * x(j) * 1e6)).sum
      r6(micro / 1e6 / n)
    }
    val tr = (0 until dim).map(i => cov(i)(i)).sum
    val fr = cov.flatten.map(v => v * v).sum
    val pr = tr * tr / fr
    assert(row.getLong(0) == dim)
    assert(math.abs(row.getDouble(1) - tr) < 1e-4, "trace")
    assert(math.abs(row.getDouble(2) - pr) < 1e-2,
      s"effective rank ${row.getDouble(2)} vs replay $pr")
  }

  it("sits in [1, DIM] and the isotropy share in (0, 1]") {
    assert(row.getDouble(2) >= 1.0 && row.getDouble(2) <= row.getLong(0))
    assert(row.getDouble(3) > 0.0 && row.getDouble(3) <= 1.0)
  }
}
