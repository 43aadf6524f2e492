package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Label propagation and hard-negative mining: both verified by full
  * driver-side replays of the distributed computation.
  */
class GraphCommunitySpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  describe("q_label_prop") {

    it("round 0 is all singletons; propagation coalesces communities") {
      val rows = Graph.qLabelProp(spark, sfDir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3))
      val r0 = rows.head
      assert(r0._2 == r0._4 && r0._3 == 1L, "round 0: every node its own singleton")
      assert(rows(1)._2 < r0._2, "one round of propagation must merge communities")
      assert(rows.last._3 >= rows(1)._3, "dominant bloc should not shrink by round 3")
    }

    it("matches a sequential driver-side LPA replay round for round") {
      // rebuild the identical thresholded bipartite graph
      val pairs = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("a"),
          concat(lit("s"), col("l_suppkey")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w")).filter(col("w") >= 3)
        .select("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
      val adj = (pairs.map(p => p._1 -> p._2) ++ pairs.map(p => p._2 -> p._1))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var labels: Map[String, String] = adj.keys.map(v => v -> v).toMap
      def census(l: Map[String, String]) = {
        val sizes = l.values.groupBy(identity).view.mapValues(_.size).values.toSeq
        (sizes.size.toLong, sizes.max.toLong, sizes.count(_ == 1).toLong)
      }
      var expected = Seq(census(labels))
      for (_ <- 1 to 3) {
        labels = adj.map { case (v, ns) =>
          val freq = ns.map(labels).groupBy(identity).view.mapValues(_.size)
          v -> freq.toSeq.minBy { case (lab, cnt) => (-cnt, lab) }._1
        }
        expected = expected :+ census(labels)
      }
      val got = Graph.qLabelProp(spark, sfDir).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expected)
    }
  }

  describe("q_graph_modularity") {

    it("matches a driver-side Newman-Q replay over the replayed LPA labels") {
      val pairs = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("a"),
          concat(lit("s"), col("l_suppkey")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w")).filter(col("w") >= 3)
        .select("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
      val dir = pairs.map(p => p._1 -> p._2) ++ pairs.map(p => p._2 -> p._1)
      val adj = dir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var labels: Map[String, String] = adj.keys.map(v => v -> v).toMap
      for (_ <- 1 to 3) { // LPA_ROUNDS
        labels = adj.map { case (v, ns) =>
          val freq = ns.map(labels).groupBy(identity).view.mapValues(_.size)
          v -> freq.toSeq.minBy { case (lab, cnt) => (-cnt, lab) }._1
        }
      }
      val twom = dir.length.toLong
      val wIn = dir.count { case (s0, d0) => labels(s0) == labels(d0) }.toLong
      val dC = dir.groupBy(e => labels(e._1)).view.mapValues(_.size.toLong).toMap
      val d2 = dC.values.map(d => BigInt(d) * d).sum
      val q = wIn.toDouble / twom - d2.toDouble / (twom.toDouble * twom)
      val r6 = BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val row = Graph.qGraphModularity(spark, sfDir).collect().head
      assert(row.getLong(0) == adj.size.toLong, "n_nodes")
      assert(row.getLong(1) == dC.size.toLong, "n_comms")
      assert(row.getLong(2) == twom / 2, "n_edges")
      assert(math.abs(row.getDouble(3) - r6) <= 1e-6,
        s"modularity ${row.getDouble(3)} vs replay $r6")
      assert(row.getDouble(3) > -1 && row.getDouble(3) < 1)
    }
  }

  describe("q_hard_negatives") {

    it("every mined negative has a different label and a valid cosine") {
      val rows = Graph2.hardNegatives(spark, sfDir)
      assert(rows.nonEmpty)
      assert(rows.forall(r => r._2 != r._4), "negative must carry a different label")
      assert(rows.forall(r => r._5 >= -1.0001 && r._5 <= 1.0001))
      assert(rows.map(_._1).distinct.length == rows.length, "one negative per anchor")
    }

    it("matches a driver-side brute-force argmax within each trained cell") {
      val e = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cent = Similarity.trainedCentroids(spark, e)
      val assigned = Similarity.assignCells(spark, e, cent)
        .join(graft.Tables.embeddings(spark, sfDir).select("vec_id", "label"), "vec_id")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray, r.getInt(3)))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / math.sqrt(na * nb)
      }
      val byCell = assigned.groupBy(_._2)
      val expect = assigned.flatMap { case (vid, cell, emb, lab) =>
        val cands = byCell(cell).filter(_._4 != lab)
        if (cands.isEmpty) None
        else {
          val best = cands.map(c => (-cos(emb, c._3), c._1, c._4)).min
          Some((vid, lab, best._2, best._3))
        }
      }.sortBy(_._1).toSeq
      val got = Graph2.hardNegatives(spark, sfDir).map(r => (r._1, r._2, r._3, r._4))
      assert(got == expect)
    }
  }

  /** Collected (vec_id, label, neg_id, neg_label, cos) rows. */
  private object Graph2 {
    def hardNegatives(s: org.apache.spark.sql.SparkSession, dir: String) =
      Similarity.qHardNegatives(s, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
        .toSeq
  }
}
