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

  it("q_gini_binned matches a driver-side Lorenz replay on the same bins") {
    val row = Stats.qGiniBinned(spark, sfDir).collect()(0)
    val spend = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(sum("o_totalprice").as("s")).collect().map(_.getDouble(1))
    assert(row.getLong(0) == spend.length)
    val bins = spend.groupBy(s =>
      math.min(math.floor(s / Stats.GINI_BIN).toLong, Stats.GINI_NB - 1L))
      .toSeq.sortBy(_._1).map { case (_, xs) => (xs.length.toLong, xs.sum) }
    val (tn, ts) = (bins.map(_._1).sum.toDouble, bins.map(_._2).sum)
    var (cx, cy, gini) = (0.0, 0.0, 1.0)
    bins.foreach { case (nc, sp) =>
      val (nx, ny) = (cx + nc / tn, cy + sp / ts)
      gini -= (nx - cx) * (ny + cy); cx = nx; cy = ny
    }
    val giniR = BigDecimal(gini).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(1) - giniR) < 1e-9, s"gini ${row.getDouble(1)} vs $giniR")
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
    assert(row.getDouble(2) > 0.1, "top decile holds >10% of spend")
  }

  it("q_autocorr lies in [-1,1] and matches a driver-side ACF replay") {
    val got = Stats.qAutocorr(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("d")).agg(sum("o_totalprice").as("x"))
      .orderBy("d").collect().map(_.getDouble(1))
    val mu = daily.sum / daily.length
    val dx = daily.map(_ - mu)
    val den = dx.map(v => v * v).sum
    (1 to Stats.ACF_LAGS).foreach { k =>
      val num = dx.drop(k).zip(dx.dropRight(k)).map { case (a, b) => a * b }.sum
      val want = BigDecimal(num / den).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(k) - want) < 1e-9, s"lag $k: got ${got(k)} want $want")
      assert(got(k) >= -1.0 && got(k) <= 1.0)
    }
  }

  it("q_cramers_v agrees with a chi2 replay and stays in [0,1]") {
    val row = Stats.qCramersV(spark, sfDir).collect()(0)
    val joint = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = joint.map(_._2).sum.toDouble
    val nx = joint.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val ny = joint.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val chi2 = joint.map { case ((x, y), nxy) =>
      val e = nx(x).toDouble * ny(y) / n
      math.pow(nxy - e, 2) / e
    }.sum
    assert(math.abs(row.getDouble(1) - chi2) < 1e-2, s"chi2 ${row.getDouble(1)} vs $chi2")
    val v = row.getDouble(3)
    assert(v >= 0.0 && v <= 1.0)
    assert(row.getLong(2) == (math.min(nx.size, ny.size) - 1L) * (math.max(nx.size, ny.size) - 1L))
  }

  it("q_hhi equals the explicit share-squared sum and bounds effective_n") {
    val rows = Stats.qHhi(spark, sfDir).collect()
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_suppkey").agg(sum("l_extendedprice").as("r"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).groupBy(_._1)
    rows.foreach { r =>
      val xs = rev(r.getString(0)).map(_._2)
      assert(r.getLong(1) == xs.length)
      val tot = xs.sum
      val hhi = xs.map(x => (x / tot) * (x / tot)).sum
      assert(math.abs(r.getDouble(2) - hhi) < 1e-6, s"${r.getString(0)} hhi")
      // 1/n <= HHI <= 1, effective_n <= n_suppliers
      assert(r.getDouble(2) >= 1.0 / xs.length - 1e-9 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) <= xs.length + 1e-6)
    }
  }

  it("q_cusum_changepoint matches a sequential driver-side CUSUM replay per type") {
    val got = Stats.qCusumChangepoint(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val daily = EventOps.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d")).count()
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2).toDouble))
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val mu = BigDecimal(xs.sum / xs.length).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val sd = BigDecimal(math.sqrt(xs.map(x => (x - xs.sum / xs.length) *
        (x - xs.sum / xs.length)).sum / (xs.length - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      var (s, maxS, alarms) = (0.0, 0.0, 0L)
      xs.foreach { x =>
        s = math.max(0.0, s + (x - mu - 0.5 * sd))
        maxS = math.max(maxS, s)
        if (s > 4.0 * sd) alarms += 1
      }
      val (gn, gmax, galarms) = got(t)
      assert(gn == xs.length, s"$t n_days")
      assert(math.abs(gmax - maxS) < 1e-4, s"$t max_cusum: got $gmax want $maxS")
      assert(galarms == alarms, s"$t alarms: got $galarms want $alarms")
    }
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
