package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** International trade flows (`q_nation_trade`, `q_market_share`):
  * structural invariants against the fact table — flow conservation,
  * share bounds, and cents-exact revenue reconciliation.
  */
class TradeFlowsSpec extends AnyFunSpec with SparkTestBase {

  it("nation trade: no self-flows, bounded pair matrix, cents-exact total") {
    val t = Relational.qNationTrade(spark, sfDir).cache()
    assert(t.filter(col("supp_nation") === col("cust_nation")).isEmpty,
      "domestic trade must be excluded")
    val pairs = t.select("supp_nation", "cust_nation").distinct().count()
    assert(pairs <= 5 * 4, s"focus set is 5 nations -> <= 20 directed pairs, got $pairs")
    // total reconciles with a direct cents fold over the same slice
    val direct = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") < 5 && col("s_nationkey") < 5 &&
        col("c_nationkey") =!= col("s_nationkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("cents"))
      .head().getLong(0)
    val total = t.agg(sum(col("revenue") * 100).cast("long")).head().getLong(0)
    assert(total == direct, s"trade total $total != direct cents fold $direct")
  }

  it("market share: in [0,1], focal <= market, years cover the order range") {
    val m = Relational.qMarketShare(spark, sfDir).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val share = r.getDouble(3)
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $r")
      assert(r.getDouble(2) <= r.getDouble(1) + 1e-9,
        s"focal revenue exceeds market revenue: $r")
    }
    val years = m.map(_.getInt(0)).toSeq
    assert(years == years.sorted && years.distinct == years)
  }
}
