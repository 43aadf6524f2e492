package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** q_hurst: rescaled-range R/S ladder over daily volumes, replayed
  * driver-side block by block.
  */
class HurstSpec extends AnyFunSpec with SparkTestBase {

  lazy val daily = EventOps.events(spark, sfDir)
    .groupBy(date_trunc("day", col("ts")).as("day"))
    .agg(count(lit(1)).as("n"))
    .orderBy("day").collect().map(_.getLong(1))

  lazy val rows = EventOps.qHurst(spark, sfDir).collect()

  private def rsMean(m: Int): (Int, Double) = {
    val blocks = daily.grouped(m).filter(_.length == m).toSeq
    val rss = blocks.flatMap { b =>
      val ls = b.sum
      val mu = ls.toDouble / m
      val cum = b.scanLeft(0L)(_ + _).tail
      val cumdev = cum.zipWithIndex.map { case (c, i) => c.toDouble - (i + 1) * mu }
      val rng = math.max(cumdev.max, 0.0) - math.min(cumdev.min, 0.0)
      val sd = math.sqrt((b.map(v => v.toDouble * v).sum - ls.toDouble * ls / m) / m)
      if (sd > 0) Some(rng / sd) else None
    }
    (rss.length, rss.sum / rss.length)
  }

  it("per-size R/S means match a driver-side block replay") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, rs) = rsMean(r.getLong(0).toInt)
      assert(r.getLong(1) == nb, s"m=${r.getLong(0)} blocks")
      assert(math.abs(r.getDouble(2) - rs) < 1e-5,
        s"m=${r.getLong(0)} rs ${r.getDouble(2)} vs replay $rs")
    }
  }

  it("the fitted exponent matches the OLS replay and sits in (0, 1.2)") {
    val pts = rows.map(r => (math.log(r.getLong(0).toDouble), math.log(r.getDouble(2))))
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val h = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert(math.abs(rows.head.getDouble(3) - h) < 1e-4)
    // R/S of a counting series is positively persistent-ish; the
    // estimator itself must stay in the meaningful band
    assert(rows.head.getDouble(3) > 0.0 && rows.head.getDouble(3) < 1.2)
  }
}
