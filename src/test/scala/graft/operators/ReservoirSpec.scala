package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** `q_sample_reservoir`'s contract: exactly k docs per stratum, chosen
  * by hash order, through an O(k) aggregate — never a per-stratum sort.
  */
class ReservoirSpec extends AnyFunSpec with SparkTestBase {

  it("takes exactly k per source (or the whole stratum when smaller)") {
    val rows = Pipeline.qSampleReservoir(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val n = rs.head.getAs[Long]("n_source")
      assert(rs.length == math.min(10L, n),
        s"$src: ${rs.length} sampled from $n")
      // ranks are 1..k and hk ascends with rank (hash order within stratum)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      val hks = sorted.map(_.getAs[Long]("hk")).toSeq
      assert(hks == hks.sorted, s"$src: reservoir not in hash order")
    }
  }

  it("plans zero windows — the reservoir is the O(k) MinKPair aggregate") {
    val plan = Pipeline.qSampleReservoir(spark, sfDir).queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "per-stratum ranking regressed to a window sort")
  }
}
