package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** The two new dial/forecast operators: the SemDeDup threshold sweep's
  * monotonicity + reconciliation with the single-τ query, and Holt
  * smoothing's recurrence invariants.
  */
class SweepSmoothingSpec extends AnyFunSpec with SparkTestBase {

  it("semdedup sweep: drops shrink as tau tightens; tau=0.9 matches qDedupSemantic") {
    val rows = Similarity.qSemdedupSweep(spark, sfDir).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.80, 0.90, 0.95, 0.99))
    val drops = rows.map(_.getLong(2))
    assert(drops.zip(drops.tail).forall { case (lo, hi) => lo >= hi },
      s"a tighter tau cannot drop more: ${drops.mkString(",")}")
    assert(drops.head > 0, "the planted dups must be caught at tau=0.80")
    val atTau = rows.find(_.getDouble(0) == 0.90).get.getLong(2)
    val single = Similarity.qDedupSemantic(spark, sfDir)
      .agg(sum("n_dropped")).head().getLong(0)
    assert(atTau == single,
      s"sweep@0.90 ($atTau) must reconcile with qDedupSemantic ($single)")
  }

  it("holt winters: forecast is the previous level+trend; errors reconcile") {
    val rows = EventOps.qHoltWinters(spark, sfDir).collect()
    assert(rows.length > 5)
    assert(rows.head.isNullAt(4) && rows.head.isNullAt(5),
      "day 1 has no forecast (nothing before it)")
    assert(rows.head.getDouble(2) == rows.head.getLong(1).toDouble &&
      rows.head.getDouble(3) == 0.0, "fold seeds level=n1, trend=0")
    rows.sliding(2).foreach { case Array(prev, cur) =>
      val expect = BigDecimal(prev.getDouble(2) + prev.getDouble(3))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(cur.getDouble(4) - expect) < 2e-6, // 6dp outputs: diff can sit ON 1e-6
        s"forecast(${cur.get(0)}) != level+trend of previous day")
      assert(math.abs(cur.getDouble(5) - (cur.getLong(1) - cur.getDouble(4))) < 1e-5,
        s"err != n - forecast at ${cur.get(0)}")
    }
  }
}
