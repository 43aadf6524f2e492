package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Multi-source BFS over the thresholded bipartite trade graph: the
  * per-hop census must respect bipartite structure and conserve nodes.
  */
class GraphBfsSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  describe("q_graph_bfs") {

    it("census conserves the vertex set and alternates sides per hop") {
      val rows = Graph.qGraphBfs(spark, sfDir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val byHop = rows.map(t => t._1 -> t).toMap
      assert(byHop.contains(-1), "unreached row must always be present")
      assert(byHop.contains(0) && byHop(0)._2 > 0, "seeds exist and are customers")
      assert(byHop(0)._3 == 0, "hop 0 is customer-only")
      rows.filter(t => t._1 > 0).foreach { case (hop, nc, ns, _) =>
        if (hop % 2 == 1) assert(nc == 0, s"odd hop $hop must be supplier-only")
        else assert(ns == 0, s"even hop $hop must be customer-only")
      }
      // conservation: reached + unreached == all vertices of the graph
      val pairs = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("a"),
          concat(lit("s"), col("l_suppkey")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w")).filter(col("w") >= 3)
      val nNodes = pairs.select(col("a").as("v"))
        .unionByName(pairs.select(col("b").as("v"))).distinct().count()
      assert(rows.map(_._4).sum == nNodes)
    }

    it("every hop-h vertex count is bounded by the frontier expansion (monotone reach)") {
      val rows = Graph.qGraphBfs(spark, sfDir).collect()
        .map(r => (r.getInt(0), r.getLong(3)))
      val reached = rows.filter(_._1 >= 0).map(_._2).sum
      assert(reached > rows.find(_._1 == 0).get._2, "BFS must reach beyond the seeds")
    }

    it("is deterministic across runs") {
      val a = Graph.qGraphBfs(spark, sfDir).collect().toSeq
      val b = Graph.qGraphBfs(spark, sfDir).collect().toSeq
      assert(a == b)
    }
  }
}
