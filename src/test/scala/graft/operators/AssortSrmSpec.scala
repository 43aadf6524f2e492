package graft.operators

import graft.{SparkTestBase, Tables}
import graft.functions.HashFns
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** q_graph_assortativity (edge degree–degree Pearson) and q_srm_check
  * (split sample-ratio-mismatch χ²): pinned by driver-side replays; the
  * DuckDB oracle re-checks cross-engine at sf0.01.
  */
class AssortSrmSpec extends AnyFunSpec with SparkTestBase {

  describe("q_graph_assortativity") {
    lazy val row = Graph.qGraphAssortativity(spark, sfDir).head

    lazy val edges = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    it("matches a driver-side Pearson over the replayed edge list") {
      val cdeg = edges.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
      val sdeg = edges.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
      val xs = edges.map(e => cdeg(e._1))
      val ys = edges.map(e => sdeg(e._2))
      val n = edges.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      val vy = ys.map(y => (y - my) * (y - my)).sum
      val r = cov / (math.sqrt(vx) * math.sqrt(vy))
      assert(row.getLong(0) == edges.length)
      assert(math.abs(row.getDouble(1) - mx) < 1e-5)
      assert(math.abs(row.getDouble(2) - my) < 1e-5)
      assert(math.abs(row.getDouble(3) - r) < 1e-5,
        s"assortativity ${row.getDouble(3)} vs replay $r")
    }

    it("is a correlation: |r| <= 1, and bipartite trade graphs trend disassortative") {
      val r = row.getDouble(3)
      assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    }
  }

  describe("q_srm_check") {
    lazy val rows = Pipeline.qSrmCheck(spark, sfDir).collect()

    it("observed counts match a direct hash-split replay") {
      val ids = Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("string")).collect().map(_.getString(0))
      val expected = ids.groupBy { id =>
        val b = HashFns.h60Local(id) % 100
        if (b < 80) "train" else if (b < 90) "val" else "test"
      }.view.mapValues(_.length.toLong).toMap
      assert(rows.length == expected.size)
      rows.foreach { r =>
        assert(r.getLong(1) == expected(r.getString(0)), s"${r.getString(0)} count")
      }
    }

    it("chi2 terms reconcile and the verdict matches the critical value") {
      val n = rows.map(_.getLong(1)).sum.toDouble
      rows.foreach { r =>
        val e = n * r.getDouble(3)
        val term = (r.getLong(1) - e) * (r.getLong(1) - e) / e
        assert(math.abs(r.getDouble(4) - term) < 1e-5, s"${r.getString(0)} term")
      }
      val total = rows.head.getDouble(5)
      assert(math.abs(total - rows.map(_.getDouble(4)).sum) < 1e-5)
      val flag = rows.head.getLong(6)
      assert(flag == (if (total > 13.8155) 1L else 0L))
      // every row repeats the same verdict
      assert(rows.map(_.getDouble(5)).distinct.length == 1)
      assert(rows.map(_.getLong(6)).distinct.length == 1)
    }

    it("shares sum to one on both the observed and expected side") {
      assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-5)
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
  }
}
