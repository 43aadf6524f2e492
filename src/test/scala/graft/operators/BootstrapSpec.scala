package graft.operators

import graft.{SparkTestBase, Tables}
import graft.functions.HashFns
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Poisson-bootstrap CI: full driver-side replay (same h60 draws, same
  * ladder, same sorted-fold spread math) plus interval sanity.
  */
class BootstrapSpec extends AnyFunSpec with SparkTestBase {

  def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  it("q_bootstrap_ci matches a sequential driver-side replay") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val means = (0 until Stats.BOOT_B).map { b =>
      var swx = 0L; var sw = 0L
      rows.foreach { case (k, cents) =>
        val m = Stats.LCG_M
        val h1 = ((k % m) * 1103515245L + b * 2654435761L + 12345L) % m
        val h2 = (h1 * 1103515245L + 12345L) % m
        val u = (h2 / 2048L % 1000000L) / 1000000.0
        val w = Stats.POIS_CDF.zipWithIndex
          .collectFirst { case (p, i) if u < p => i }.getOrElse(5)
        swx += w * cents; sw += w
      }
      swx.toDouble / sw / 100.0
    }.sorted
    val mMean = means.foldLeft(0.0)(_ + _) / Stats.BOOT_B
    val se = math.sqrt(means.foldLeft(0.0)((a, x) => a + (x - mMean) * (x - mMean))
      / (Stats.BOOT_B - 1))
    val row = Stats.qBootstrapCi(spark, sfDir).collect().head
    assert(row.getLong(0) == rows.length)
    val point = rows.map(_._2).sum.toDouble / rows.length / 100.0
    assert(row.getDouble(1) == r4(point), "point_mean")
    assert(row.getDouble(2) == r4(means(1)), "ci_lo = 2nd smallest")
    assert(row.getDouble(3) == r4(means(Stats.BOOT_B - 2)), "ci_hi = 31st")
    assert(math.abs(row.getDouble(4) - r4(se)) <= 1e-4, "boot_se")
    // the interval brackets the point estimate and is properly ordered
    assert(row.getDouble(2) <= row.getDouble(1) &&
      row.getDouble(1) <= row.getDouble(3), s"CI does not bracket: $row")
    assert(row.getDouble(4) > 0)
  }

  it("q_ab_welch matches a driver-side replay and the A/A split reads as noise") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byArm = rows.groupBy { case (k, _) => HashFns.h60Local(k.toString) % 2 }
    def stats(arm: Long) = {
      val xs = byArm(arm).map(_._2)
      val n = xs.length.toLong
      val sx = xs.sum
      val sx2 = xs.map(c => BigInt(c) * c).sum
      (n, sx, sx2)
    }
    val (na, sxa, sx2a) = stats(0L); val (nb, sxb, sx2b) = stats(1L)
    val ma = sxa.toDouble / na / 100.0; val mb = sxb.toDouble / nb / 100.0
    val sea = (sx2a.toDouble - sxa.toDouble * sxa.toDouble / na) / (na - 1) / 10000.0 / na
    val seb = (sx2b.toDouble - sxb.toDouble * sxb.toDouble / nb) / (nb - 1) / 10000.0 / nb
    val t = (ma - mb) / math.sqrt(sea + seb)
    val row = Stats.qAbWelch(spark, sfDir).collect().head
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    // the h60-parity split must be roughly balanced
    assert(math.abs(na - nb).toDouble / (na + nb) < 0.1, s"unbalanced arms: $na/$nb")
    assert(row.getDouble(2) == r4(ma) && row.getDouble(3) == r4(mb))
    assert(math.abs(row.getDouble(4) -
      BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-6)
    // an A/A split of iid synthetic orders should not be wildly significant
    assert(math.abs(row.getDouble(4)) < 5, s"A/A t-stat implausible: $row")
  }

  it("q_cuped matches a driver-side replay and the adjustment preserves the global mean") {
    val pivot = java.sql.Timestamp.valueOf(Stats.CUPED_PIVOT + " 00:00:00").getTime
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long"),
        col("o_orderdate").cast("timestamp").cast("long") * 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perCust = rows.groupBy(_._1).map { case (k, os) =>
      val x = os.filter(_._3 < pivot).map(_._2).sum
      val y = os.filter(_._3 >= pivot).map(_._2).sum
      (HashFns.h60Local(k.toString) % 2, x, y)
    }.toSeq
    val n = perCust.length
    def d(v: BigInt) = v.toDouble
    val sx = perCust.map(_._2).sum; val sy = perCust.map(_._3).sum
    val sxy = perCust.map(c => BigInt(c._2) * c._3).sum
    val sxx = perCust.map(c => BigInt(c._2) * c._2).sum
    val syy = perCust.map(c => BigInt(c._3) * c._3).sum
    val varX = (d(sxx) - sx.toDouble * sx / n) / (n - 1)
    val varY = (d(syy) - sy.toDouble * sy / n) / (n - 1)
    val cov = (d(sxy) - sx.toDouble * sy / n) / (n - 1)
    val theta = cov / varX
    val row = Stats.qCuped(spark, sfDir).collect().head
    def r(x: Double, sc: Int) = BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - r(theta, 6)) <= 1e-6, "theta")
    assert(math.abs(row.getDouble(2) - r(cov * cov / (varX * varY), 6)) <= 1e-6, "rho2")
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1, "rho2 range")
    // CUPED is mean-preserving: weighted avg of adjusted arm means =
    // global experiment-period mean
    val arms = perCust.groupBy(_._1)
    val wavg = Seq(0L, 1L).map { a =>
      val xs = arms(a)
      val adj = xs.map(_._3).sum.toDouble / xs.length -
        theta * (xs.map(_._2).sum.toDouble / xs.length - sx.toDouble / n)
      adj / 100.0 * xs.length
    }.sum / n
    assert(math.abs(wavg - sy.toDouble / n / 100.0) < 1e-6, "not mean-preserving")
    assert(math.abs(row.getDouble(3) - r(
      (arms(0L).map(_._3).sum.toDouble / arms(0L).length -
        theta * (arms(0L).map(_._2).sum.toDouble / arms(0L).length - sx.toDouble / n)) / 100.0,
      4)) <= 1e-4, "adj_mean_a")
  }

  it("q_survival_km matches a driver-side KM replay with monotone survival") {
    def y12m(t: java.sql.Timestamp) = {
      val c = t.toLocalDateTime
      c.getYear * 12 + c.getMonthValue
    }
    val perCust = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(min(col("o_orderdate").cast("timestamp")).as("f"),
        max(col("o_orderdate").cast("timestamp")).as("l"))
      .collect().map(r => (r.getTimestamp(1), r.getTimestamp(2)))
    val maxM = perCust.map(c => y12m(c._2)).max
    val durs = perCust.map { case (f, l) =>
      val event = maxM - y12m(l) >= Stats.KM_CHURN_M
      (if (event) y12m(l) - y12m(f) else maxM - y12m(f), event)
    }
    val byDur = durs.groupBy(_._1).view.mapValues { xs =>
      (xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.toMap
    val sorted = byDur.keys.toSeq.sorted
    var atRisk = durs.length.toLong
    var surv = 1.0
    val expected = sorted.map { t =>
      val (d, c) = byDur(t)
      surv *= 1.0 - d.toDouble / atRisk
      val row = (t, atRisk, d,
        BigDecimal(surv).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      atRisk -= d + c
      row
    }
    val got = Stats.qSurvivalKm(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) <= 1e-6, s"survival at ${g._1}: $g vs $e")
    }
    assert(got.length == expected.length)
    val curve = got.map(_._4)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a + 1e-9 },
      "survival not monotone non-increasing")
    assert(curve.head <= 1.0 && curve.last >= 0.0)
  }
}
