package graft.operators

import graft.{SparkTestBase, Tables}
import org.scalatest.funspec.AnyFunSpec

/** q_heaps_fit (prefix vocabulary growth + OLS beta) and q_stl_strength
  * (Hyndman F_s/F_t over the multiplicative decomposition) — pinned by
  * driver-side replays; the DuckDB oracle re-checks cross-engine.
  */
class HeapsStrengthSpec extends AnyFunSpec with SparkTestBase {

  describe("q_heaps_fit") {
    lazy val rows = TextAnalysis.qHeapsFit(spark, sfDir).collect()

    it("cumulative vocabulary matches a direct prefix replay") {
      val docs = Tables.documents(spark, sfDir)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val maxp1 = docs.map(_._1).max + 1
      def bucket(id: Long): Int =
        math.min(math.floor(id * 10.0 / maxp1).toInt, 9)
      assert(rows.length == 10)
      rows.foreach { r =>
        val k = r.getInt(0)
        val prefix = docs.filter(d => bucket(d._1) <= k)
        val vocab = prefix.flatMap(_._2.split(" ", -1)).distinct.length
        val toks = prefix.map(_._2.split(" ", -1).length.toLong).sum
        assert(r.getLong(3) == vocab, s"bucket $k vocab")
        assert(r.getLong(1) == toks, s"bucket $k tokens")
        assert(r.getLong(2) == prefix.length, s"bucket $k docs")
      }
    }

    it("beta matches the OLS replay and sits in the Heaps range (0, 1]") {
      val pts = rows.map(r => (math.log(r.getLong(1).toDouble),
        math.log(r.getLong(3).toDouble)))
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val beta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      assert(math.abs(rows.head.getDouble(4) - beta) < 1e-5,
        s"beta ${rows.head.getDouble(4)} vs replay $beta")
      assert(beta > 0.0 && beta <= 1.0)
    }

    it("growth curves are monotone nondecreasing") {
      val v = rows.map(_.getLong(3)); val t = rows.map(_.getLong(1))
      assert(v.sameElements(v.sorted) && t.sameElements(t.sorted))
    }
  }

  describe("q_stl_strength") {
    lazy val row = EventOps.qStlStrength(spark, sfDir).head

    it("strengths are in [0, 1] and the residual variance is small and positive") {
      assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
      assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
      assert(row.getDouble(3) >= 0.0)
    }

    it("agrees with a variance replay over q_stl_decompose's residuals") {
      val stl = EventOps.qStlDecompose(spark, sfDir).collect()
      val r = stl.map(x => x.getDouble(5)) // resid column
      def varOf(xs: Array[Double]): Double = {
        val n = xs.length.toDouble
        val m = xs.sum / n
        xs.map(v => (v - m) * (v - m)).sum / n
      }
      assert(row.getLong(0) == stl.length)
      assert(math.abs(row.getDouble(3) - varOf(r)) < 1e-5,
        s"var_resid ${row.getDouble(3)} vs replay ${varOf(r)}")
    }
  }
}
