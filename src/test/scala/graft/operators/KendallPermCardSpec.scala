package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** q_kendall (tau-b from the bounded contingency frame), q_perm_test
  * (LCG-deterministic binomial relabeling), q_dataset_card (per-source
  * corpus profile) — each pinned by a driver-side replay; the DuckDB
  * oracle re-checks cross-engine at sf0.01.
  */
class KendallPermCardSpec extends AnyFunSpec with SparkTestBase {

  describe("q_kendall") {
    it("matches a driver-side tau-b over the replayed pairs") {
      val xs = Tables.lineitem(spark, sfDir)
        .select("l_quantity", "l_discount")
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      val cells = xs.groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .map { case ((x, y), c) => (x, y, c) }
      var conc = 0.0; var disc = 0.0
      for ((xa, ya, ca) <- cells; (xb, yb, cb) <- cells if xa < xb) {
        if (ya < yb) conc += ca.toDouble * cb
        else if (ya > yb) disc += ca.toDouble * cb
      }
      val n = xs.length.toDouble
      def tieSum(sel: ((Double, Double, Long)) => Double): Double =
        cells.groupBy(sel).values
          .map(g => { val t = g.map(_._3).sum.toDouble; t * (t - 1) }).sum
      val tx2 = tieSum(_._1); val ty2 = tieSum(_._2)
      val tau = (conc - disc) /
        (math.sqrt((n * (n - 1) - tx2) / 2.0) * math.sqrt((n * (n - 1) - ty2) / 2.0))
      val row = Stats.qKendall(spark, sfDir).head
      assert(row.getLong(0) == xs.length)
      assert(row.getLong(1) == cells.size)
      assert(row.getDouble(2) == conc && row.getDouble(3) == disc)
      assert(math.abs(row.getDouble(4) - tau) < 1e-6, s"tau ${row.getDouble(4)} vs $tau")
    }

    it("tau-b is a correlation: |tau| <= 1, and conc+disc <= n(n-1)/2") {
      val row = Stats.qKendall(spark, sfDir).head
      assert(math.abs(row.getDouble(4)) <= 1.0)
      val n = row.getLong(0).toDouble
      assert(row.getDouble(2) + row.getDouble(3) <= n * (n - 1) / 2.0)
    }
  }

  describe("q_perm_test") {
    lazy val row = Stats.qPermTest(spark, sfDir).head

    it("p-value is the extreme share with add-one smoothing over PERM_B replicates") {
      val b = row.getLong(3)
      val extreme = row.getLong(4)
      assert(b == 64L)
      assert(row.getDouble(5) == BigDecimal((extreme + 1).toDouble / 65.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(extreme >= 0 && extreme <= b)
    }

    it("observed diff matches the group means from a direct replay") {
      val xs = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment"),
          round(col("o_totalprice") * 100).cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val a = xs.filter(_._1 == "BUILDING").map(_._2)
      val b = xs.filter(_._1 == "MACHINERY").map(_._2)
      val diff = (a.sum.toDouble / a.length - b.sum.toDouble / b.length) / 100.0
      assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
      assert(math.abs(row.getDouble(2) - diff) < 1e-4)
    }
  }

  describe("q_dataset_card") {
    it("volume, dup ratio and language mix match a direct replay per source") {
      val rows = Pipeline.qDatasetCard(spark, sfDir).collect()
      val docs = Tables.documents(spark, sfDir)
        .select("source", "lang", "text").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val bySource = docs.groupBy(_._1)
      assert(rows.length == bySource.size)
      rows.foreach { r =>
        val g = bySource(r.getString(0))
        assert(r.getLong(1) == g.length, "docs")
        assert(r.getLong(2) == g.map(_._3).distinct.length, "distinct_texts")
        val toks = g.map(_._3.split(" ", -1).length.toLong).sum
        assert(r.getLong(4) == toks, "tokens")
        val langs = g.groupBy(_._2).view.mapValues(_.length.toDouble)
        val n = g.length.toDouble
        val ent = langs.values.map(c => -(c / n) * math.log(c / n)).sum
        assert(math.abs(r.getDouble(9) - ent) < 1e-5, "lang_entropy")
      }
    }

    it("dup_ratio = 1 - distinct/docs and quality stays in [0, 1]") {
      Pipeline.qDatasetCard(spark, sfDir).collect().foreach { r =>
        val expect = 1.0 - r.getLong(2).toDouble / r.getLong(1)
        assert(math.abs(r.getDouble(3) - expect) < 1e-6)
        assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
      }
    }
  }
}
