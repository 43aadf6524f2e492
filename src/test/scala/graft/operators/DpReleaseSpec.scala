package graft.operators

import graft.{SparkTestBase, Tables}
import org.scalatest.funspec.AnyFunSpec

/** Driver-side replay of the deterministic Laplace mechanism. */
class DpReleaseSpec extends AnyFunSpec with SparkTestBase {

  it("q_dp_release noise is the inverse-CDF Laplace of the hash uniform") {
    val rows = Privacy.qDpRelease(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      // mirror HashFns.h60: top 60 bits of the md5 as a nonneg long
      val hex = d.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    rows.foreach { case (stat, key, nTrue, noise, released) =>
      val u = (h60(s"$stat:$key") % 1999999L + 1L).toDouble / 2000000.0 - 0.5
      val b = 2.0 // 1/eps, eps = 0.5
      val expect = BigDecimal(-b * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(noise - expect) < 1e-9, s"$stat/$key noise")
      assert(math.abs(released - (nTrue + noise)) < 1e-6, s"$stat/$key released")
    }
    // sanity of the mechanism: noise is bounded by b·ln(1e6) and centered
    val noises = rows.map(_._4)
    assert(noises.forall(n => math.abs(n) <= 2.0 * math.log(2e6)))
    assert(noises.exists(_ > 0) && noises.exists(_ < 0), "two-sided noise")
    // composed budget: one eps per released statistic
    val eps = Privacy.qDpRelease(spark, sfDir).select("eps").distinct().collect()
    assert(eps.length == 1)
  }

  it("released counts stay useful: total absolute error is small vs the corpus") {
    val rows = Privacy.qDpRelease(spark, sfDir).collect()
      .filter(_.getString(0) == "cnt_by_nation")
    val nCust = Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == nCust, "true counts partition the table")
    val mae = rows.map(r => math.abs(r.getDouble(3))).sum / rows.length
    assert(mae < 15.0, "mean |Laplace(2)| noise stays near its 2.0 expectation")
  }
}
