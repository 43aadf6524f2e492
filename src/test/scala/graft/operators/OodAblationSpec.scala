package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** q_ood_score (diagonal-Mahalanobis embedding outliers) and
  * q_filter_ablation (per-rule marginal drop attribution): both pinned
  * by full driver-side replays independent of the DataFrame plan; the
  * DuckDB oracle re-checks cross-engine at sf0.01.
  */
class OodAblationSpec extends AnyFunSpec with SparkTestBase {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  describe("q_ood_score") {
    lazy val rows = Similarity.qOodScore(spark, sfDir).collect()

    lazy val replay: Map[Long, Double] = {
      val embs = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      val dim = embs.head._2.length
      val n = embs.length.toDouble
      val stats = (0 until dim).map { p =>
        val vs = embs.map(_._2(p))
        val mu = vs.sum / n
        val sd = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / n)
        (r6(mu), r6(sd))
      }
      embs.map { case (id, v) =>
        val micros = (0 until dim).flatMap { p =>
          val (mu, sd) = stats(p)
          if (sd != 0.0) {
            val z = (v(p) - mu) / sd
            Some(math.round(z * z * 1e6))
          } else None
        }.sum
        id -> r6(math.sqrt(micros / 1e6))
      }.toMap
    }

    it("reports the true top-20 by Mahalanobis distance") {
      assert(rows.length == Similarity.OOD_TOP)
      val expected = replay.toSeq.sortBy { case (id, m) => (-m, id) }
        .take(Similarity.OOD_TOP)
      rows.zip(expected).foreach { case (r, (id, m)) =>
        assert(r.getLong(0) == id, s"rank order diverges at vec $id")
        assert(math.abs(r.getDouble(2) - m) < 2e-6,
          s"vec $id mahal ${r.getDouble(2)} vs replay $m")
      }
    }

    it("scores are positive and descending") {
      val ms = rows.map(_.getDouble(2))
      assert(ms.forall(_ > 0))
      assert(ms.zip(ms.tail).forall { case (a, b) => a >= b })
    }
  }

  describe("q_filter_ablation") {
    lazy val rows = Pipeline.qFilterAblation(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap

    lazy val flags: Array[(Boolean, Boolean, Boolean, Boolean)] = {
      val stop = Set("the", "a", "or", "and", "of")
      Tables.documents(spark, sfDir).select("text").collect().map { r =>
        val words = r.getString(0).split(" ", -1)
        val nw = words.length.toDouble
        val nStop = words.count(stop)
        val ttr = words.distinct.length / nw
        val mwl = words.map(_.length).sum / nw
        (nw < 20, nStop / nw < 0.02, ttr < 0.33, mwl > 4.75)
      }
    }

    it("per-rule flag and only counts match a driver-side replay") {
      val asSeq = flags.map(f => Seq(f._1, f._2, f._3, f._4))
      val names = Seq("short", "low_stop", "low_ttr", "long_words")
      assert(rows.keySet == names.toSet)
      names.zipWithIndex.foreach { case (name, i) =>
        val n = asSeq.count(_(i))
        val only = asSeq.count(f => f(i) && f.zipWithIndex.forall {
          case (v, j) => j == i || !v
        })
        val (gotN, gotOnly, _, _, _) = rows(name)
        assert(gotN == n, s"$name n_flagged")
        assert(gotOnly == only, s"$name n_only")
      }
    }

    it("marginal counts never exceed totals and union bounds hold") {
      val anyCount = flags.count(f => f._1 || f._2 || f._3 || f._4)
      rows.foreach { case (name, (n, only, fr, or_, nAny)) =>
        assert(only <= n, s"$name only > flagged")
        assert(or_ <= fr + 1e-9)
        assert(nAny == anyCount)
        assert(n <= nAny, s"$name flagged exceeds union")
      }
      val onlySum = rows.values.map(_._2).sum
      assert(onlySum <= anyCount,
        "exclusive sets are disjoint, their sum is bounded by the union")
    }
  }
}
