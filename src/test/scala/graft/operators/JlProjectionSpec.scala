package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** JL random projection + CUBE grouping-sets: structural properties the
  * oracle hash-compare can't see (sign balance, scale invariance, grouping
  * lattice consistency).
  */
class JlProjectionSpec extends AnyFunSpec with SparkTestBase {

  describe("jlSigns / q_embedding_jl") {

    it("projection matrix is deterministic ±1 with both signs present in every row") {
      val s1 = Similarity.jlSigns
      val s2 = Similarity.jlSigns
      assert(s1 == s2)
      assert(s1.size == 16 && s1.forall(_.size == 64))
      s1.foreach { row =>
        assert(row.forall(v => v == 1.0 || v == -1.0))
        assert(row.contains(1.0) && row.contains(-1.0), "degenerate all-same-sign row")
      }
    }

    it("identical vectors stay identical after projection (cos_jl = 1 for exact dups)") {
      val out = Similarity.qEmbeddingJl(spark, sfDir).collect()
      assert(out.length > 0)
      out.foreach { r =>
        val (cosFull, cosJl) = (r.getDouble(3), r.getDouble(4))
        assert(cosFull <= 1.0 + 1e-9 && cosJl <= 1.0 + 1e-9)
        // if full-space top-1 is an exact duplicate (cos 1.0), JL must keep it at 1.0
        if (cosFull >= 0.999999 && r.getLong(1) == r.getLong(2))
          assert(cosJl >= 0.999999, s"projection broke an exact duplicate: $r")
      }
    }

    it("the projection itself plans as a pure per-row projection (no shuffle before the sample join)") {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      // rebuild just the projection stage the query uses
      val signs = Similarity.jlSigns
      def dot(a: org.apache.spark.sql.Column, w: IndexedSeq[Double]) =
        aggregate(zip_with(a, array(w.map(lit): _*), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      val p = e.select(col("vec_id"), array(signs.map(dot(col("emb"), _)): _*).as("jl"))
      val plan = p.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.linesIterator.count(_.matches("^\\(\\d+\\) Exchange.*")) == 0,
        s"JL projection stage shuffles:\n$plan")
    }
  }

  describe("q_grouping_sets") {

    it("the four grouping sets are mutually consistent (lattice sums agree)") {
      val rows = Relational.qGroupingSets(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(4)))
      val byGid = rows.groupBy(_._3)
      assert(byGid.keySet == Set(0, 1, 2, 3))
      val total = byGid(3).head._4
      assert(byGid(0).map(_._4).sum == total)
      assert(byGid(1).map(_._4).sum == total)
      assert(byGid(2).map(_._4).sum == total)
      // a rolled-up cell carries gid, not a fake NULL-turned-'ALL' ambiguity
      assert(byGid(1).forall(_._2 == "ALL") && byGid(2).forall(_._1 == "ALL"))
    }
  }
}
