package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession
import org.scalatest.funspec.AnyFunSpec

/** The injected optimizer rule must turn dimension joins into broadcast
  * joins WITHOUT explicit hints and with size-based auto-broadcast
  * disabled — and must leave fact-fact joins alone.
  */
class DimAutoBroadcastSpec extends AnyFunSpec with SparkTestBase {

  describe("DimAutoBroadcast optimizer rule") {
    it("broadcasts registered dims hint-free; leaves fact-fact joins alone") {
      val base = spark
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try {
        val s2 = SparkSession.builder()
          .master("local[4]")
          .withExtensions(new GraftExtensions())
          .config("spark.sql.shuffle.partitions", "4")
          .getOrCreate()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val li = s2.read.parquet(s"$sfDir/lineitem.parquet")
          val supp = s2.read.parquet(s"$sfDir/supplier.parquet")
          val orders = s2.read.parquet(s"$sfDir/orders.parquet")
          // dim join: no broadcast() hint anywhere, auto-broadcast off —
          // the rule alone must produce the broadcast join
          val dimJoin = li.join(supp, li("l_suppkey") === supp("s_suppkey"))
          val dimPlan = dimJoin.queryExecution.executedPlan.toString
          assert(dimPlan.contains("BroadcastHashJoin"),
            s"dim join did not broadcast:\n$dimPlan")
          // fact-fact join must NOT be broadcast by the rule
          val factJoin = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
          val factPlan = factJoin.queryExecution.executedPlan.toString
          assert(!factPlan.contains("BroadcastHashJoin"),
            s"fact-fact join wrongly broadcast:\n$factPlan")
          // correctness unaffected
          assert(dimJoin.count() == li.count())
        } finally s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      } finally {
        SparkSession.clearActiveSession()
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    }
  }
}
