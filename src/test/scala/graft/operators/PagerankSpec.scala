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

  it("pageRankConverged reaches the tolerance and agrees with the unrolled gauge round-for-round") {
    val (pr, rounds, converged) = Graph.pageRankConverged(spark, sfDir, eps = 1e-6)
    assert(converged, s"did not converge within the round cap (ran $rounds rounds)")
    assert(rounds > Graph.PR_ITERS,
      s"tolerance met in $rounds rounds — too lax to distinguish from the 3-round gauge")
    // mass conservation survives tolerance-driven iteration
    val total = pr.agg(sum("pr")).collect().head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass drifted: $total")
    // the converged frame is a FIXPOINT of the gauge's per-round map:
    // the 3-round unroll continued to `rounds` rounds produces the
    // identical rank frame (both round to 9dp per round, so the
    // comparison is exact, not approximate)
    val unrolled = Graph.pagerankRounds(spark, sfDir, rounds)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val got = pr.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == unrolled,
      "converged variant diverged from the unrolled recurrence at the same round")
    // ... and one MORE round moves nothing beyond eps (true fixpoint)
    val oneMore = Graph.pagerankRounds(spark, sfDir, rounds + 1)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val maxStep = got.map { case (k, v) => math.abs(oneMore(k) - v) }.max
    assert(maxStep < 1e-6, s"not a fixpoint: next step moves $maxStep")
  }

  it("q_kcore matches a driver-side sequential peel of the same edge set") {
    import graft.Tables
    val rows = Graph.qKcore(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(rows.size == 6)
    // independent replay: build the thresholded pair set, peel in Scala
    val pairs = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey")).count()
      .filter(col("count") >= 3)
      .select("o_custkey", "l_suppkey").collect()
      .map(r => (s"c${r.getLong(0)}", s"s${r.getLong(1)}"))
    val adj = pairs.flatMap { case (c, sup) => Seq(c -> sup, sup -> c) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    var alive: Set[String] = adj.keySet
    (1 to 5).foreach { r =>
      val next = alive.filter(v => (adj(v) & alive).size >= 3)
      val (nc, ns) = (next.count(_.startsWith("c")).toLong, next.count(_.startsWith("s")).toLong)
      val (dropped, expected) = (alive.size - next.size.toLong, rows(r))
      assert(expected == ((dropped, nc, ns, nc + ns, r == 5 && dropped == 0L)), s"round $r")
      alive = next
    }
    // the peel bites at this SF (multi-round cascade is pinned by the
    // sf0.01 oracle gate, where drops run [634, 6, 7])
    assert(rows(1)._1 > 0, "peel removed nothing — threshold/K need retuning")
    assert(rows(5)._4 > 0, "core emptied out")
    assert(rows(5)._5, "expected convergence within the unroll depth")
  }
}
