package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.scalatest.funspec.AnyFunSpec

/** Pins the two-phase exact-percentile plan: no window over the RAW fact
  * stream may partition by the group alone (that is the whole-group
  * single-task sort the r5 verdict flagged), and the rank arithmetic
  * stays exact on degenerate groups.
  */
class PercentilesSpec extends AnyFunSpec with SparkTestBase {

  private val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)

  describe("plan shape") {

    it("every window over un-aggregated rows partitions by (group, bucket)") {
      val df = Relational.qPercentiles(spark, sfDir)
      val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(windows.nonEmpty)
      windows.foreach { w =>
        val overAggregated = w.child.exists(_.isInstanceOf[Aggregate])
        val partNames = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        if (!overAggregated)
          assert(partNames.contains("bucket"),
            s"raw-stream window partitioned by $partNames — whole-group sort")
        else
          // the cumulative-rank window runs over the B-rows-per-group histogram
          assert(partNames.nonEmpty, "unpartitioned window over aggregate")
      }
    }
  }

  describe("exactness on degenerate groups") {

    it("uniform 0..100 group hits the exact integer quantiles") {
      val df = spark.range(101).selectExpr("'a' AS g", "CAST(id AS DOUBLE) AS v")
      val r = Relational.percentilesTwoPhase(df, "g", "v", ps).collect().head
      // n=101 → (n-1)p is integral: p50=50, p90=90, p99=99
      assert(r.getAs[Double]("p50") == 50.0)
      assert(r.getAs[Double]("p90") == 90.0)
      assert(r.getAs[Double]("p99") == 99.0)
    }

    it("interpolates between bracketing ranks (n=2)") {
      val df = spark.range(2).selectExpr("'a' AS g", "CAST(id*10 AS DOUBLE) AS v")
      val r = Relational.percentilesTwoPhase(df, "g", "v", ps).collect().head
      assert(r.getAs[Double]("p50") == 5.0)   // 0 + 0.5·(10-0)
      assert(r.getAs[Double]("p90") == 9.0)
      assert(r.getAs[Double]("p99") == 9.9)
    }

    it("single-row and constant-valued groups (span=0) return the value") {
      val df = spark.sql(
        """SELECT * FROM VALUES ('one', 7.0), ('const', 3.0), ('const', 3.0),
          |('const', 3.0) AS t(g, v)""".stripMargin)
      val rows = Relational.percentilesTwoPhase(df, "g", "v", ps)
        .collect().map(r => r.getString(0) -> r).toMap
      Seq("p50", "p90", "p99").foreach { p =>
        assert(rows("one").getAs[Double](p) == 7.0)
        assert(rows("const").getAs[Double](p) == 3.0)
      }
    }

    it("groups smaller than the bucket count stay exact") {
      val df = spark.range(10).selectExpr("'a' AS g", "CAST(id AS DOUBLE) AS v")
      val r = Relational.percentilesTwoPhase(df, "g", "v", Seq("p50" -> 0.5), 256)
        .collect().head
      assert(r.getAs[Double]("p50") == 4.5)
    }
  }
}
