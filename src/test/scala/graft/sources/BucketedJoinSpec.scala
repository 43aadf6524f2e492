package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Proves the bucketed-layout join lever: two tables bucketed on the
  * join key at write time join with ZERO exchanges — the shuffle is
  * paid once at layout time, not per query. Broadcast is disabled for
  * the check (a broadcast join avoids the shuffle trivially and would
  * prove nothing about bucketing), and AQE is disabled so the executed
  * plan is inspectable deterministically.
  */
class BucketedJoinSpec extends AnyFunSpec with SparkTestBase {

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  describe("bucketed catalog tables") {
    it("join on the bucket key plans zero exchanges (layout-time shuffle)") {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val customer = spark.read.parquet(s"$sfDir/customer.parquet")
        .select("c_custkey", "c_name", "c_nationkey")
      try {
        Sources.writeBucketed(orders, "graft_bkt_orders", "o_custkey", 8)
        Sources.writeBucketed(customer.withColumnRenamed("c_custkey", "o_custkey"),
          "graft_bkt_customer", "o_custkey", 8)
        withConf(
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.enabled" -> "false") {
          val joined = spark.table("graft_bkt_orders")
            .join(spark.table("graft_bkt_customer"), Seq("o_custkey"))
          val plan = joined.queryExecution.executedPlan.toString
          assert(!plan.contains("Exchange"),
            s"bucketed join still shuffles:\n$plan")
          // and it is a real distributed join, not a broadcast shortcut
          assert(plan.contains("SortMergeJoin"), plan)
          // correctness: same cardinality as the plain parquet join
          val expected = orders.join(
            customer.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey")).count()
          assert(joined.count() == expected)
        }
        // the same layout serves aggregation on the bucket key shuffle-free
        withConf("spark.sql.adaptive.enabled" -> "false") {
          val agg = spark.table("graft_bkt_orders")
            .groupBy("o_custkey").agg(sum("o_totalprice"))
          assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
            "bucketed aggregation still shuffles")
        }
      } finally {
        spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS graft_bkt_customer")
      }
    }
  }
}
