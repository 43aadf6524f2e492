package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** q_theil (Theil-T inequality decomposition) and q_silhouette
  * (centroid-based cluster separation): both pinned by full driver-side
  * replays — the Theil telescoping identity against a direct scan, the
  * silhouette against a plain-Scala cosine recomputation — independent
  * of the DataFrame plans; the DuckDB oracle re-checks cross-engine.
  */
class TheilSilhouetteSpec extends AnyFunSpec with SparkTestBase {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  describe("q_theil") {
    lazy val rows = Stats.qTheil(spark, sfDir).collect()

    lazy val cents = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"),
        round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0)

    it("within + between components telescope to the ungrouped Theil-T") {
      val n = cents.length.toDouble
      val x = cents.map(_._2.toDouble)
      val tot = x.sum
      val tTotal = x.map(v => v / tot * math.log(v * n / tot)).sum
      val decomposed =
        rows.map(_.getDouble(5)).sum + rows.map(_.getDouble(6)).sum
      assert(math.abs(decomposed - tTotal) < 1e-4,
        s"decomposition $decomposed vs direct $tTotal")
    }

    it("per-nation within terms match a direct replay") {
      val byNation = cents.groupBy(_._1)
      assert(rows.length == byNation.size)
      rows.foreach { r =>
        val xs = byNation(r.getLong(0)).map(_._2.toDouble)
        val (ng, xg) = (xs.length.toDouble, xs.sum)
        val tg = xs.map(v => v / xg * math.log(v * ng / xg)).sum
        assert(r.getLong(1) == xs.length)
        assert(math.abs(r.getDouble(3) - tg) < 1e-4,
          s"nation ${r.getLong(0)} theil_within")
        assert(r.getDouble(3) > -1e-6, "Theil is non-negative")
      }
    }

    it("revenue shares form a distribution and between-sum is a KL >= 0") {
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
      assert(rows.map(_.getDouble(5)).sum > -1e-6,
        "between component is a KL divergence, necessarily non-negative")
    }
  }

  describe("q_silhouette") {
    lazy val rows = Similarity.qSilhouette(spark, sfDir).collect()

    lazy val replay: Map[Int, (Long, Long, Double, Long)] = {
      val cent = Similarity.trainedCentroidsFor(spark, sfDir)
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      val embs = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](1).toArray)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      val per = embs.map { e =>
        val scored = cent.map { case (cl, c) => (r6(cos(e, c)), cl) }
          .sortBy { case (c, cl) => (-c, cl) }
        val (c1, own) = scored(0)
        val c2 = scored(1)._1
        (own, if (1.0 - c2 != 0.0) Some(r6((c1 - c2) / (1.0 - c2))) else None)
      }
      per.groupBy(_._1).view.mapValues { g =>
        val sils = g.flatMap(_._2)
        val micros = sils.map(s => math.round(s * 1e6)).sum
        (g.length.toLong, sils.length.toLong,
          r6(micros / 1e6 / sils.length), sils.count(_ < 0).toLong)
      }.toMap
    }

    it("matches a plain-Scala full replay per cell") {
      assert(rows.nonEmpty && rows.length == replay.size)
      rows.foreach { r =>
        val (n, nScored, meanSil, nNeg) = replay(r.getInt(0))
        assert(r.getLong(1) == n, s"cell ${r.getInt(0)} n")
        assert(r.getLong(2) == nScored)
        assert(r.getDouble(3) == meanSil, s"cell ${r.getInt(0)} mean_sil")
        assert(r.getLong(5) == nNeg)
      }
    }

    it("silhouettes are bounded and the corpus is fully covered") {
      val total = Tables.embeddings(spark, sfDir).count()
      assert(rows.map(_.getLong(1)).sum == total)
      rows.foreach { r =>
        assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
        assert(r.getDouble(4) <= r.getDouble(3) + 1e-9,
          "min cannot exceed mean")
      }
    }
  }
}
