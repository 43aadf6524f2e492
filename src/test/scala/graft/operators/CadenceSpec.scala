package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Order-cadence (lead/lag + ntile) and Q21-style sole-late-supplier
  * queries: each re-checked through an independent plan shape on the same
  * session; the DuckDB oracle re-checks cross-engine at sf0.01.
  */
class CadenceSpec extends AnyFunSpec with SparkTestBase {

  describe("q_order_gaps") {

    it("gap statistics match a sequential per-customer replay") {
      val got = Relational.qOrderGaps(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r).toMap
      val orders = Tables.orders(spark, sfDir)
        .select(col("o_custkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("epoch_s"), col("o_orderkey"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      assert(got.size == orders.size)
      orders.foreach { case (cust, rows) =>
        val sorted = rows.sortBy(t => (t._2, t._3))
        val gaps = sorted.sliding(2).collect {
          case Array(a, b) => ((b._2 - a._2) / 86400L).toInt
        }.toSeq
        val r = got(cust)
        assert(r.getLong(1) == rows.length, s"n_orders for $cust")
        if (gaps.nonEmpty) {
          assert(r.getInt(3) == gaps.max, s"max_gap_days for $cust")
          val avg = BigDecimal(gaps.sum.toDouble / gaps.size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(r.getDouble(2) == avg, s"avg_gap_days for $cust")
        } else assert(r.isNullAt(2) && r.isNullAt(3), s"single-order customer $cust")
      }
    }

    it("spend quartiles are balanced and monotone in total spend") {
      val rows = Relational.qOrderGaps(spark, sfDir)
        .select("total_spend", "spend_quartile").collect()
        .map(r => (r.getDouble(0), r.getInt(1)))
      val sizes = rows.groupBy(_._2).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"ntile buckets unbalanced: $sizes")
      val sorted = rows.sortBy(_._1).map(_._2)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b } ||
        // ties on total_spend may interleave quartiles at the boundary only
        rows.groupBy(_._1).forall(_._2.map(_._2).distinct.size <= 2),
        "quartile not monotone in spend")
    }
  }

  describe("q_late_sole_supplier") {

    it("matches the correlated EXISTS / NOT EXISTS formulation run through Catalyst") {
      val got = Relational.qLateSoleSupplier(spark, sfDir).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      assert(got.nonEmpty, "vacuous: no sole-late suppliers in the fixture")
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("li_q21")
      Tables.orders(spark, sfDir).createOrReplaceTempView("ord_q21")
      Tables.supplier(spark, sfDir).createOrReplaceTempView("sup_q21")
      val viaExists = spark.sql(
        """SELECT s_name, count(*) AS numwait FROM (
          | SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
          | FROM li_q21 l1 JOIN ord_q21 o ON l1.l_orderkey = o.o_orderkey
          | WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 1400 DAYS
          |  AND EXISTS (SELECT 1 FROM li_q21 l2
          |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM li_q21 l3 JOIN ord_q21 o3 ON l3.l_orderkey = o3.o_orderkey
          |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 1400 DAYS)
          |) t JOIN sup_q21 ON l_suppkey = s_suppkey
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      assert(got.toSeq == viaExists.toSeq)
    }

    it("plans no cartesian product and aggregates before the supplier join") {
      val plan = Relational.qLateSoleSupplier(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct"))
      assert(plan.contains("BroadcastHashJoin"), "supplier dim should broadcast")
    }
  }
}
