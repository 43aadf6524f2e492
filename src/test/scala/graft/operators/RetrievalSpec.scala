package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Retrieval-stack readouts: calibration curve, MMR diversified
  * reranking, RRF hybrid fusion, and winsorized robust scaling.
  */
class RetrievalSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  describe("q_calibration") {

    it("bins partition the corpus and pos_rate is n_pos/n") {
      val rows = Similarity.qCalibration(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
      assert(rows.nonEmpty)
      val nEmb = graft.Tables.embeddings(spark, sfDir).count()
      assert(rows.map(_._2).sum == nEmb, "bins must partition the corpus")
      rows.foreach { case (_, n, np, rate) =>
        assert(np <= n && math.abs(rate - np.toDouble / n) < 1e-15)
      }
      assert(rows.map(_._1).sorted.toSeq == rows.map(_._1).toSeq, "ordered by bin")
    }

    it("positive rate trends upward along the margin axis (the probe is calibrated-ish)") {
      val rows = Similarity.qCalibration(spark, sfDir).collect()
        .filter(_.getLong(2) >= 20).map(r => r.getDouble(4))
      assert(rows.length >= 2)
      assert(rows.last > rows.head,
        "high-margin bins must be positive more often than low-margin bins")
    }
  }

  describe("q_mmr_rerank") {

    it("round 0 is the pure-relevance argmax (the brute-force top-1)") {
      val top1 = Similarity.qKnnBrute(spark, sfDir).collect().head.getLong(0)
      val sel = Similarity.qMmrRerank(spark, sfDir).collect()
      assert(sel.head.getInt(0) == 0 && sel.head.getLong(1) == top1)
      assert(sel.length == Similarity.MMR_K)
      assert(sel.map(_.getLong(1)).distinct.length == sel.length, "picks are distinct")
    }

    it("matches a driver-side greedy MMR replay over the same pool") {
      val pool = Similarity.knnScores(spark, sfDir)
        .join(graft.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb")), "vec_id")
        .orderBy(desc("cos"), col("vec_id")).limit(Similarity.MMR_POOL)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / math.sqrt(na * nb)
      }
      def r9(x: Double): Double = math.round(x * 1e9) / 1e9
      val lam = 0.7
      var cands = pool.map(p => (p._1, p._2, p._3, Double.NegativeInfinity)).toBuffer
      val sel = scala.collection.mutable.ArrayBuffer[Long]()
      for (r <- 0 until Similarity.MMR_K) {
        val pick =
          if (r == 0) cands.minBy(c => (-r9(c._2), c._1))
          else cands.minBy(c => (-r9(lam * c._2 - (1 - lam) * c._4), c._1))
        sel += pick._1
        cands = cands.filter(_._1 != pick._1)
          .map(c => (c._1, c._2, c._3, math.max(c._4, cos(c._3, pick._3))))
      }
      val got = Similarity.qMmrRerank(spark, sfDir).collect().map(_.getLong(1)).toSeq
      assert(got == sel.toSeq)
    }
  }

  describe("q_rrf_fusion") {

    it("fused ranks agree with each ranker and scores decompose into unit fractions") {
      val rows = MlPrep.qRrfFusion(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      assert(rows.nonEmpty && rows.length <= 10)
      val bmTop = TextAnalysis.qBm25(spark, sfDir).collect().map(_.getLong(0))
      val knTop = Similarity.qKnnBrute(spark, sfDir).collect().map(_.getLong(0))
      rows.foreach { case (id, rt, rv, rrf) =>
        assert(rt != -1 || rv != -1)
        if (rt != -1 && rt <= 10) assert(bmTop(rt - 1) == id)
        if (rv != -1 && rv <= 10) assert(knTop(rv - 1) == id)
        val expect = (if (rt == -1) 0.0 else 1.0 / (60 + rt)) +
          (if (rv == -1) 0.0 else 1.0 / (60 + rv))
        assert(math.abs(rrf - expect) < 1e-15)
      }
      val scores = rows.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }

    it("a doc ranked by both lists outranks the same-rank single-list doc") {
      val rows = MlPrep.qRrfFusion(spark, sfDir).collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getDouble(3)))
      val both = rows.filter(r => r._1 != -1 && r._2 != -1)
      val single = rows.filter(r => r._1 == -1 || r._2 == -1)
      if (both.nonEmpty && single.nonEmpty)
        assert(both.map(_._3).max > single.map(_._3).max)
    }
  }

  describe("q_winsorize") {

    it("clipping counts and winsorized mean match a driver-side recomputation") {
      val bounds = MlPrep.qWinsorize(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      assert(bounds.nonEmpty)
      val raw = graft.Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_extendedprice").collect()
        .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      bounds.foreach { case (g, n, nLo, nHi, p01, p99, meanW) =>
        val xs = raw(g).map(_._2)
        assert(n == xs.length)
        assert(nLo == xs.count(_ < p01) && nHi == xs.count(_ > p99))
        assert(p01 < p99)
        val clamped = xs.map(x => BigDecimal(math.max(p01, math.min(p99, x)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP))
        val expect = (clamped.sum / n).toDouble
        assert(math.abs(meanW - expect) < 1e-9, s"group $g mean")
        assert(meanW > p01 && meanW < p99)
      }
    }
  }

  describe("q_label_noise") {

    it("reports only sign-disagreements, ranked by |margin|, consistent with the probe") {
      val rows = Similarity.qLabelNoise(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      assert(rows.nonEmpty && rows.length <= 10)
      rows.foreach { case (_, label, y, margin, susp) =>
        assert((label < 5) == (y == 1.0))
        assert((margin > 0.0) != (y == 1.0), "every reported row disagrees with its label")
        assert(math.abs(susp - math.abs(margin)) < 1e-12)
      }
      val susps = rows.map(_._5)
      assert(susps.zip(susps.tail).forall { case (a, b) => a >= b }, "descending suspicion")
      // replay the margins from the trained weights collected once
      val w = Similarity.probeWeights(spark, sfDir).collect()(0).getSeq[Double](0).toArray
      val feats = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      rows.foreach { case (id, _, _, margin, _) =>
        val x = 1.0 +: feats(id)
        val m = BigDecimal(x.zip(w).map { case (a, b) => a * b }.sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(m - margin) < 2e-6, s"margin of vec $id")
      }
    }
  }
}
