package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** χ² term selection, PSI drift and dwell-time: each re-derived by a
  * sequential Scala replay of the closed-form definition over the sf0.001
  * fixture; the DuckDB oracle re-checks cross-engine at sf0.01.
  */
class DriftSelectionSpec extends AnyFunSpec with SparkTestBase {

  def r(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  describe("q_chi2_terms") {

    it("matches a full driver-side contingency replay") {
      val got = TextAnalysis.qChi2Terms(spark, sfDir).collect()
        .map(row => (row.getString(0), row.getLong(1)) ->
          (row.getString(2), row.getLong(3), row.getLong(4), row.getDouble(5)))
        .toMap
      val docs = Tables.documents(spark, sfDir)
        .select("source", "text").collect()
        .map(row => row.getString(0) -> row.getString(1))
      val sw = docs.flatMap { case (src, t) => t.split(" ").map(src -> _) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val wc = sw.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
        .filter(_._2 >= TextAnalysis.CHI2_MIN_C)
      val st = sw.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val n = sw.values.sum.toDouble
      val expected = sw.toSeq.collect {
        case ((src, word), c) if wc.contains(word) =>
          val a = c.toDouble; val w = wc(word).toDouble; val s0 = st(src).toDouble
          val dif = a * (n - s0 - w + a) - (w - a) * (s0 - a)
          (src, word, c, wc(word), dif,
            (n * dif * dif) / (w * (n - w) * s0 * (n - s0)))
      }.filter(_._5 > 0)
        .groupBy(_._1)
        .flatMap { case (src, cands) =>
          cands.sortBy(t => (-t._6, t._2)).take(TextAnalysis.CHI2_TOP)
            .zipWithIndex.map { case ((_, word, c, w, _, chi2), i) =>
              (src, i + 1L) -> (word, c, w, r(chi2, 4))
            }
        }
      assert(got.nonEmpty && got.size == expected.size)
      expected.foreach { case (k, v) =>
        assert(got(k) == v, s"mismatch at $k: got ${got(k)}, want $v")
      }
    }
  }

  describe("q_psi") {

    lazy val rows = Pipeline.qPsi(spark, sfDir).collect()
      .map(row => row.getString(0) ->
        (row.getLong(1), row.getDouble(2), row.getBoolean(3))).toMap

    it("matches a driver-side decile-bin replay") {
      val nw = Tables.documents(spark, sfDir)
        .select("source", "text").collect()
        .map(row => row.getString(0) -> row.getString(1).split(" ").length.toDouble)
      val sorted = nw.map(_._2).sorted
      val n = sorted.length
      val cuts = (1 to 9).map { i =>
        val pos = (n - 1) * (i / 10.0)
        val lo = sorted(pos.toInt)
        val hi = sorted(math.min(pos.toInt + 1, n - 1))
        r(lo + (pos - math.floor(pos)) * (hi - lo), 4)
      }
      def bin(v: Double) = cuts.count(v > _)
      val byBin = nw.groupBy(e => bin(e._2)).view.mapValues(_.length).toMap
      nw.groupBy(_._1).foreach { case (src, es) =>
        val stot = es.length.toDouble
        val srcBin = es.groupBy(e => bin(e._2)).view.mapValues(_.length).toMap
        val psi = byBin.toSeq.map { case (b, gc) =>
          val p = math.max(srcBin.getOrElse(b, 0) / stot, Pipeline.PSI_EPS)
          val q = math.max(gc / n.toDouble, Pipeline.PSI_EPS)
          (p - q) * math.log(p / q)
        }.sum
        val (gn, gpsi, gdrift) = rows(src)
        assert(gn == es.length, s"$src n_docs")
        assert(math.abs(gpsi - r(psi, 6)) <= 1e-6, s"$src psi: $gpsi vs $psi")
        assert(gdrift == (gpsi > Pipeline.PSI_T), s"$src drifted flag")
      }
    }

    it("PSI is non-negative and doc counts partition the corpus") {
      assert(rows.values.forall(_._2 >= 0), s"negative psi: $rows")
      val total = Tables.documents(spark, sfDir).count()
      assert(rows.values.map(_._1).sum == total)
    }
  }

  describe("q_dwell_time") {

    it("matches a sequential per-user timeline replay") {
      val got = EventOps.qDwellTime(spark, sfDir).collect()
        .map(row => row.getString(0) ->
          (row.getLong(1), row.getLong(2), row.getDouble(3), row.getDouble(4),
            row.getDouble(5))).toMap
      val ev = EventOps.events(spark, sfDir)
        .select(col("user_id"), col("event_type"),
          col("ts").cast("double"), col("event_id"))
        .collect()
        .map(row => (row.getLong(0), row.getString(1), row.getDouble(2), row.getLong(3)))
      val dwells = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        val sortedEs = es.sortBy(e => (e._3, e._4))
        sortedEs.zipWithIndex.map { case (e, i) =>
          val gap = if (i + 1 < sortedEs.length) Some(sortedEs(i + 1)._3 - e._3) else None
          e._2 -> gap.filter(_ <= 1800d)
        }
      }
      dwells.groupBy(_._1).foreach { case (typ, xs) =>
        val ds = xs.flatMap(_._2)
        val (n, nd, mean, mx, exit) = got(typ)
        assert(n == xs.length, s"$typ n_events")
        assert(nd == ds.length, s"$typ n_with_dwell")
        assert(math.abs(mean - r(ds.sum / ds.length, 4)) <= 1e-4, s"$typ mean")
        assert(mx == r(ds.max, 4), s"$typ max")
        assert(math.abs(exit - r(1d - ds.length.toDouble / xs.length, 6)) <= 1e-6,
          s"$typ exit_rate")
      }
    }
  }
}
