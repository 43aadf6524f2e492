package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Scalar quantization audit + uncertainty sampling: both replayed
  * sequentially driver-side (same fold order, same rounding) over the
  * sf0.001 fixture.
  */
class QuantizeSampleSpec extends AnyFunSpec with SparkTestBase {

  def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  lazy val vecs = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))

  describe("q_uncertainty_sample") {

    it("returns exactly the K smallest |margin| vectors of a full driver-side scoring") {
      val w = Similarity.probeWeights(spark, sfDir).collect().head
        .getSeq[Double](0).toArray
      val margins = vecs.map { case (id, label, emb) =>
        var acc = 0.0
        acc += 1.0 * w(0)
        var i = 0
        while (i < emb.length) { acc += emb(i) * w(i + 1); i += 1 }
        (id, label, r6(acc))
      }
      val expected = margins.sortBy { case (id, _, m) => (math.abs(m), id) }
        .take(Similarity.UNC_K).toSeq
      val got = Similarity.qUncertaintySample(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(got == expected)
      // uncertainty head must be closer to the boundary than the rest
      val cut = expected.map(t => math.abs(t._3)).max
      val rest = margins.filterNot(m => expected.exists(_._1 == m._1))
      assert(rest.forall(m => math.abs(m._3) >= cut))
    }
  }

  describe("q_gains_curve") {

    it("matches a driver-side ranked-decile replay and lift decreases to 1") {
      val w = Similarity.probeWeights(spark, sfDir).collect().head
        .getSeq[Double](0).toArray
      val scored = vecs.map { case (id, label, emb) =>
        var acc = 1.0 * w(0)
        var i = 0
        while (i < emb.length) { acc += emb(i) * w(i + 1); i += 1 }
        (id, if (label < 5) 1L else 0L,
          -BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val ranked = scored.sortBy { case (id, _, negm) => (negm, id) }
      val n = ranked.length
      // exact SQL ntile sizing: first (n mod 10) deciles get ceil(n/10)
      val base = n / 10; val extra = n % 10
      val sizes = (1 to 10).map(t => base + (if (t <= extra) 1 else 0))
      val bounds = sizes.scanLeft(0)(_ + _)
      val perDec = (0 until 10).map { t =>
        val xs = ranked.slice(bounds(t), bounds(t + 1))
        (t + 1, xs.length.toLong, xs.map(_._2).sum)
      }
      val totPos = perDec.map(_._3).sum.toDouble
      val totN = n.toDouble
      var cumP = 0L; var cumN = 0L
      val expected = perDec.map { case (d, cnt, pos) =>
        cumP += pos; cumN += cnt
        (d, cnt, pos,
          r6(cumP / totPos), r6((cumP.toDouble / cumN) / (totPos / totN)))
      }
      val got = Similarity.qGainsCurve(spark, sfDir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4))).toSeq
      assert(got == expected, s"\n$got\nvs\n$expected")
      // gains curve sanity: capture is monotone to 1, lift ends at 1
      assert(got.last._4 == 1.0 && got.last._5 == 1.0)
      val caps = got.map(_._4)
      assert(caps.zip(caps.tail).forall { case (a, b) => b >= a })
    }
  }

  describe("q_embedding_sq") {

    it("matches a driver-side 256-level round-trip and zero-span dims cost nothing") {
      val dim = vecs.head._3.length
      val mins = (0 until dim).map(j => vecs.map(_._3(j)).min).toArray
      val maxs = (0 until dim).map(j => vecs.map(_._3(j)).max).toArray
      val errs = vecs.map { case (_, label, emb) =>
        var acc = 0.0
        var j = 0
        while (j < dim) {
          val span = maxs(j) - mins(j)
          val recon =
            if (span > 0) {
              val code = BigDecimal((emb(j) - mins(j)) / span * 255d)
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
              mins(j) + code / 255d * span
            } else mins(j)
          acc += (emb(j) - recon) * (emb(j) - recon)
          j += 1
        }
        label -> acc
      }
      val got = Similarity.qEmbeddingSq(spark, sfDir).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      errs.groupBy(_._1).foreach { case (label, xs) =>
        val es = xs.map(_._2)
        val (n, mse, mx) = got(label)
        assert(n == es.length, s"label $label n")
        assert(math.abs(mse - r6(es.map(_ / dim).sum / es.length)) <= 1e-6,
          s"label $label mse")
        assert(mx == r6(es.max), s"label $label max")
        // the 256-level grid keeps per-coordinate error under span/255/2 + ulp
        val worstSpan = (0 until dim).map(j => maxs(j) - mins(j)).max
        val bound = dim * math.pow(worstSpan / 255d / 2 * 1.0001 + 1e-12, 2)
        assert(es.max <= bound, s"label $label err ${es.max} above bound $bound")
      }
    }
  }
}
