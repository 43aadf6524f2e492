package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Semantic invariants for the robust-stats family, each cross-checked
  * against an independent driver-side recomputation on the collected
  * (small) sf data — not against the query's own plan.
  */
class StatsFamilySpec extends AnyFunSpec with SparkTestBase {

  it("q_mad_outliers matches a driver-side median/MAD replay per type") {
    val got = Stats.qMadOutliers(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val vals = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) / 2.0
      val (lo, hi) = (s(math.floor(h).toInt), s(math.ceil(h).toInt))
      lo + (hi - lo) * (h - math.floor(h))
    }
    assert(got.keySet == vals.keySet)
    vals.foreach { case (t, tv) =>
      val xs = tv.map(_._2)
      val (n, med, mad, out) = got(t)
      assert(n == xs.length)
      val medR = BigDecimal(medianOf(xs)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(med == medR, s"$t median: got $med want $medR")
      val madR = BigDecimal(medianOf(xs.map(v => math.abs(v - medR))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mad == madR, s"$t mad: got $mad want $madR")
      val outR = xs.count(v => math.abs(v - medR) > madR * 3.0 * 1.4826)
      assert(out == outR, s"$t outliers: got $out want $outR")
      assert(out <= n)
    }
  }

  it("q_histogram covers every order exactly once and its cum_share ends at 1") {
    val rows = Stats.qHistogram(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == total, "histogram must partition the table")
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9, "cumulative share must end at 1")
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
    rows.foreach(r => assert(r.getDouble(1) == r.getInt(0) * Stats.HIST_W))
  }

  it("q_benford's observed shares sum to 1 and expected mass is the Benford law") {
    val rows = Stats.qBenford(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(('1' to '9').map(_.toString).toSet))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val d = r.getString(0).toInt
      val expected = BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expected, s"digit $d expected mass")
      assert(r.getDouble(4) >= 0.0, "chi2 terms are non-negative")
    }
  }

  it("q_ks_test matches a driver-side binned-ECDF replay") {
    val row = Stats.qKsTest(spark, sfDir).collect()(0)
    val seg = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin(Stats.KS_SEG_A, Stats.KS_SEG_B))
      .select("c_mktsegment", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) / Stats.KS_BIN).toLong))
    val a = seg.filter(_._1 == Stats.KS_SEG_A).map(_._2)
    val b = seg.filter(_._1 == Stats.KS_SEG_B).map(_._2)
    assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
    val bins = (a ++ b).distinct.sorted
    val d = bins.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.length - b.count(_ <= x).toDouble / b.length)
    }.max
    val dR = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(2) == dR, s"D: got ${row.getDouble(2)} want $dR")
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }

  it("q_mutual_info is non-negative and bounded by both entropies") {
    val r = Stats.qMutualInfo(spark, sfDir).collect()(0)
    val (mi, hx, hy, nmi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(mi >= -1e-6, "MI is non-negative")
    assert(mi <= math.min(hx, hy) + 1e-6, "MI is bounded by min entropy")
    assert(nmi >= -1e-6 && nmi <= 1.0 + 1e-6, "normalized MI in [0,1]")
    // independence sanity: shuffling one margin to a constant kills MI
    import spark.implicits._
    val const = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), lit("X").as("l_linestatus"))
    val joint = const.groupBy("l_returnflag", "l_linestatus").count()
    assert(joint.select(countDistinct("l_linestatus")).as[Long].head() == 1L)
  }
}
