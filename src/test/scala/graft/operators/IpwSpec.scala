package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** q_ipw_effect: Hájek-normalized inverse-propensity arm means off the
  * trained probe — replayed driver-side from the same trained weights.
  */
class IpwSpec extends AnyFunSpec with SparkTestBase {

  it("matches a driver-side Hájek replay from the trained propensities") {
    val w = Similarity.probeWeights(spark, sfDir).head.getSeq[Double](0).toArray
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = rows.map { case (label, emb) =>
      val t = if (label < 5) 1 else 0
      val x = 1.0 +: emb
      val margin = x.zip(w).map { case (a, b) => a * b }.sum
      val e = math.min(math.max(r6(1.0 / (1.0 + math.exp(-margin))), 0.05), 0.95)
      val out = math.round(emb.map(v => v * v).sum * 1e4)
      val wy = if (t == 1) math.round(out / e) else math.round(out / (1.0 - e))
      val w6 = if (t == 1) math.round(1e6 / e) else math.round(1.0 / (1.0 - e) * 1e6)
      (t, out, wy, w6)
    }
    def arm(t: Int) = {
      val a = terms.filter(_._1 == t)
      a.map(_._3.toDouble).sum / a.map(_._4.toDouble).sum * 100.0
    }
    val row = Similarity.qIpwEffect(spark, sfDir).head
    assert(row.getLong(0) == terms.count(_._1 == 1))
    assert(row.getLong(1) == terms.count(_._1 == 0))
    assert(math.abs(row.getDouble(3) - arm(1)) < 1e-3,
      s"ipw_treat ${row.getDouble(3)} vs replay ${arm(1)}")
    assert(math.abs(row.getDouble(4) - arm(0)) < 1e-3)
    assert(math.abs(row.getDouble(5) - (arm(1) - arm(0))) < 2e-3)
  }

  it("unit-norm embeddings give arm means near 1.0 and a tiny honest effect") {
    val row = Similarity.qIpwEffect(spark, sfDir).head
    assert(math.abs(row.getDouble(3) - 1.0) < 0.2)
    assert(math.abs(row.getDouble(5)) < 0.1)
  }
}
