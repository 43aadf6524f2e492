package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Model-eval and pattern-mining readouts: tie-aware rank AUC and
  * market-basket association rules.
  */
class MlEvalSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  private def auc(rows: Seq[(Double, Double)]): (Long, Long, Double) = {
    val r = Similarity.aucOf(rows.toDF("y", "sc")).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  describe("q_auc_probe rank AUC") {

    it("perfectly separated scores give AUC 1, inverted give 0") {
      assert(auc(Seq((1.0, 10.0), (1.0, 9.0), (0.0, 2.0), (0.0, 1.0)))
        == ((2L, 2L, 1.0)))
      assert(auc(Seq((0.0, 10.0), (0.0, 9.0), (1.0, 2.0), (1.0, 1.0)))
        == ((2L, 2L, 0.0)))
    }

    it("all-tied scores give AUC 0.5 via average ranks") {
      assert(auc(Seq((1.0, 5.0), (1.0, 5.0), (0.0, 5.0), (0.0, 5.0)))._3 == 0.5)
    }

    it("matches the O(n²) pair count on a mixed fixture with ties") {
      val rows = Seq((1.0, 3.0), (1.0, 2.0), (1.0, 2.0), (0.0, 2.0),
        (0.0, 1.0), (0.0, 4.0))
      val pos = rows.filter(_._1 == 1.0).map(_._2)
      val neg = rows.filter(_._1 == 0.0).map(_._2)
      val brute = (for { p <- pos; n <- neg } yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
      assert(math.abs(auc(rows)._3 - brute) < 1e-6) // output is 6dp-rounded
    }

    it("the probe's corpus AUC is consistent with its above-prior accuracy") {
      val r = Similarity.qAucProbe(spark, sfDir).collect().head
      val a = r.getDouble(2)
      assert(r.getLong(0) > 0 && r.getLong(1) > 0)
      assert(a > 0.5 && a <= 1.0, s"trained probe must rank better than chance, got $a")
      assert(math.abs(r.getDouble(3) - (2.0 * a - 1.0)) < 2e-6,
        "gini must be 2*AUC - 1")
    }
  }

  describe("q_assoc_rules") {

    it("support/confidence/lift agree with per-rule recomputation from raw baskets") {
      val rules = MlPrep.qAssocRules(spark, sfDir).collect()
      assert(rules.length > 0)
      val baskets = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.dim(spark, sfDir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("bid"), col("p_brand").as("brand"))
        .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
      val byBasket = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val nB = byBasket.size.toDouble
      val itemN = baskets.groupBy(_._2).view.mapValues(_.length).toMap
      rules.foreach { r =>
        val (ant, cons, nBoth) = (r.getString(0), r.getString(1), r.getLong(2))
        val expectBoth = byBasket.valuesIterator.count(s => s(ant) && s(cons))
        assert(nBoth == expectBoth, s"$ant->$cons n_both")
        assert(math.abs(r.getDouble(3) - nBoth / nB) < 1e-12)
        assert(math.abs(r.getDouble(4) - nBoth.toDouble / itemN(ant)) < 1e-12)
        assert(math.abs(r.getDouble(5) -
          nBoth * nB / (itemN(ant).toDouble * itemN(cons))) < 1e-9)
      }
    }

    it("rules come out lift-descending and above the support floor") {
      val rules = MlPrep.qAssocRules(spark, sfDir).collect()
      val lifts = rules.map(_.getDouble(5))
      assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
      assert(rules.forall(_.getDouble(3) >= 0.01))
    }
  }
}
