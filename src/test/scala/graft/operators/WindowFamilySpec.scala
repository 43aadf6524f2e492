package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** RANGE-framed trailing window + Q22-style idle-capital composition. */
class WindowFamilySpec extends AnyFunSpec with SparkTestBase {

  it("q_window_range matches a sequential per-customer replay of the 30-day frame") {
    val got = Relational.qWindowRange(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("es"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.size == orders.length)
    orders.groupBy(_._2).foreach { case (_, rows) =>
      rows.foreach { case (okey, _, es, _) =>
        val inFrame = rows.filter(t => t._3 >= es - 30L * 86400 && t._3 <= es)
        val expSum = BigDecimal(inFrame.map(_._4).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (gotSum, gotN) = got(okey)
        assert(gotN == inFrame.length, s"frame size for order $okey")
        assert(math.abs(gotSum - expSum) < 0.02, s"frame sum for order $okey: $gotSum vs $expSum")
      }
    }
  }

  it("q_idle_capital is non-vacuous and every cohort member is above-mean and inactive") {
    val out = Relational.qIdleCapital(spark, sfDir).collect()
    assert(out.nonEmpty && out.map(_.getLong(1)).sum > 0, "vacuous idle-capital result")
    // rebuild the member set directly and compare cohort totals
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), (col("c_custkey") % 7).as("code"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .filter(col("acctbal") > 0.0)
    val avgBal = cust.agg(round(avg("acctbal"), 4)).collect().head.getDouble(0)
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val members = cust.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => t._3 > avgBal && !recent.contains(t._1))
    val byCode = members.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val gotByCode = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotByCode == byCode)
  }
}
