package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** PageRank over the transaction graph: probability-mass conservation,
  * structural ranking (hub side wins), and determinism.
  */
class PagerankSpec extends AnyFunSpec with SparkTestBase {

  it("conserves probability mass across iterations (sum pr ≈ 1)") {
    val pr = Graph.pagerankAll(spark, sfDir)
    val total = pr.agg(sum("pr")).collect().head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass drifted: $total")
  }

  it("suppliers (the high-degree side of the bipartite graph) dominate the head") {
    val top = Graph.qPagerank(spark, sfDir).collect().map(_.getString(0))
    assert(top.nonEmpty)
    assert(top.take(10).forall(_.startsWith("s")),
      s"hub side should outrank: ${top.take(10).mkString(",")}")
    // rank head strictly exceeds the uniform baseline 1/N
    val n = Graph.pagerankAll(spark, sfDir).count().toDouble
    val headPr = Graph.qPagerank(spark, sfDir).collect().head.getDouble(1)
    assert(headPr > 1.0 / n, s"head rank $headPr not above uniform ${1.0 / n}")
  }

  it("is deterministic across runs") {
    val a = Graph.qPagerank(spark, sfDir).collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val b = Graph.qPagerank(spark, sfDir).collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(a == b)
  }
}
