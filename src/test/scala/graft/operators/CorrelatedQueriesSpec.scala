package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** The correlated-subquery relational family (r6): each query is checked
  * against an independent recomputation through a DIFFERENT plan shape on
  * the same session (the DuckDB oracle re-checks cross-engine at sf0.01),
  * plus the plan property that makes it scale.
  */
class CorrelatedQueriesSpec extends AnyFunSpec with SparkTestBase {

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  describe("q_exists_late (correlated EXISTS with inequality)") {

    it("matches the inner-join + distinct recomputation and plans a semi join") {
      val got = Relational.qExistsLate(spark, sfDir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val naive = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("o_orderkey", "o_orderpriority").distinct()
        .groupBy("o_orderpriority").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == naive)
      assert(got.values.sum > 0, "vacuous: no late orders in the fixture")
      val plan = explain(Relational.qExistsLate(spark, sfDir))
      assert(plan.contains("LeftSemi"), s"EXISTS did not plan a semi join:\n$plan")
    }
  }

  describe("q_small_qty_revenue (Q17-style scalar correlated subquery)") {

    it("matches a window-based recomputation and is non-vacuous") {
      val viaJoin = Relational.qSmallQtyRevenue(spark, sfDir)
        .collect().head.getDouble(0)
      // independent shape: per-part mean via a window instead of groupBy+join
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
      val viaWindow = Tables.lineitem(spark, sfDir)
        .withColumn("avg_qty", round(avg("l_quantity").over(w), 6))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg(round(sum("l_extendedprice") / 7.0, 2))
        .collect().head.getDouble(0)
      assert(viaJoin == viaWindow)
      assert(viaJoin > 0.0)
    }
  }

  describe("q_cust_order_dist (Q13-style outer-join distribution)") {

    it("buckets every customer exactly once and its 0-bucket is the anti-join count") {
      val dist = Relational.qCustOrderDist(spark, sfDir).collect()
      val nCustomers = Tables.customer(spark, sfDir).count()
      assert(dist.map(_.getLong(1)).sum == nCustomers,
        "distribution must partition the customer set")
      val zeroBucket = dist.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
      val antiCount = Relational.qAntiJoin(spark, sfDir).count()
      assert(zeroBucket == antiCount,
        s"0-order bucket $zeroBucket != anti-join count $antiCount")
    }
  }

  describe("q_supplier_share (HAVING vs a global scalar)") {

    it("returns exactly the suppliers above 1.05x the mean, via a bounded 1-row broadcast") {
      val rows = Relational.qSupplierShare(spark, sfDir).collect()
      val rev = Tables.lineitem(spark, sfDir)
        .groupBy("l_suppkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val threshold = {
        val rounded = BigDecimal(rev.values.sum / rev.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        rounded * 1.05
      }
      val expected = rev.filter(_._2 > threshold)
      assert(rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap == expected)
      assert(rows.nonEmpty && rows.length < rev.size,
        "threshold must split the supplier set")
      // the global-mean frame is one row: the nested loop is bounded by construction
      val plan = explain(Relational.qSupplierShare(spark, sfDir))
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    }
  }
}
