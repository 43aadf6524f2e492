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

  describe("q_ship_priority (Q12-style two-way conditional count)") {

    it("matches a two-key groupBy recomputation and partitions the late lines") {
      val got = Relational.qShipPriority(spark, sfDir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // independent shape: group by (flag, crit) then re-assemble
      val byPair = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("crit"))
        .count()
        .collect()
        .groupBy(_.getString(0))
        .map { case (f, rs) =>
          def n(c: Boolean) = rs.find(_.getBoolean(1) == c).map(_.getLong(2)).getOrElse(0L)
          f -> (n(true), n(false))
        }
      assert(got == byPair)
      assert(got.values.map { case (h, l) => h + l }.sum > 0, "vacuous: no late lines")
      // high+low per flag must equal the plain late-line count per flag
      val lateTotals = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.map { case (f, (h, l)) => f -> (h + l) } == lateTotals)
      // one fact-fact EQUI-join (broadcast at fixture scale, SMJ once
      // both sides are facts), one aggregate — no second scan for the
      // low branch (both conditional sums fold in a single HashAggregate)
      val plan = explain(Relational.qShipPriority(spark, sfDir))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
          || plan.contains("BroadcastHashJoin"),
        s"expected a hash/merge equi-join:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"date residual must not degrade the join to a nested loop:\n$plan")
      assert("HashAggregate".r.findAllIn(plan).size <= 4,
        s"more aggregates than one partial+final pair per stage:\n$plan")
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

  describe("q_scd2_dim (SCD-2 change detection)") {

    it("versions only genuine changes and keeps exactly one current row per key") {
      val rows = Relational.qScd2Dim(spark, sfDir).collect()
      val byKey = rows.groupBy(_.getLong(0))
      byKey.foreach { case (k, vs) =>
        assert(vs.count(_.getBoolean(4)) == 1, s"key $k has != 1 current row")
        if (vs.length == 2) {
          // changed key: v1 closed, v2 current with the new segment
          val v1 = vs.find(_.getLong(1) == 1L).get
          val v2 = vs.find(_.getLong(1) == 2L).get
          assert(!v1.getBoolean(4) && v2.getBoolean(4))
          assert(k % 10 == 0, s"key $k versioned without a change")
          assert(v2.getString(2) == "PROMO" && v1.getString(2) != "PROMO")
        } else {
          assert(vs.length == 1)
          // unchanged arrivals (c%5==0 but not %10) must NOT version
          assert(vs.head.getBoolean(4))
        }
      }
      // every %10 key versioned, nothing else
      val versioned = byKey.filter(_._2.length == 2).keySet
      val expected = byKey.keySet.filter(_ % 10 == 0)
      assert(versioned == expected)
    }
  }

  describe("q_sketch_merge (mergeable persisted HLL sketches)") {

    it("union-of-monthly-sketches estimates match a direct sketch and pass the tolerance") {
      val rows = Relational.qSketchMerge(spark, sfDir).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getBoolean(4), s"estimate out of tolerance: $r"))
      // mergeability: union of per-month sketches == one direct sketch
      val direct = graft.Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val merged = graft.Tables.lineitem(spark, sfDir)
        .groupBy(col("l_returnflag"), month(col("l_shipdate")).as("m"))
        .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
        .groupBy("l_returnflag")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(merged == direct, "sketch union is not lossless vs a direct sketch")
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
