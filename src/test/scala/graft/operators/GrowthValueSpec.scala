package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Growth-accounting / customer-value operators (q_user_lifecycle,
  * q_burstiness, q_cohort_ltv, q_rfm): each pinned by flow-conservation
  * invariants or a sequential Scala replay, independent of the DataFrame
  * plan that produced it; the DuckDB oracle re-checks cross-engine at
  * sf0.01.
  */
class GrowthValueSpec extends AnyFunSpec with SparkTestBase {

  describe("q_user_lifecycle") {

    lazy val rows = EventOps.qUserLifecycle(spark, sfDir)
      .select(col("day").cast("date").cast("string").as("day"),
        col("n_new"), col("n_retained"), col("n_resurrected"),
        col("n_churned"), col("quick_ratio"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap

    lazy val dau = EventOps.events(spark, sfDir)
      .select(date_trunc("day", col("ts")).cast("date").cast("string").as("day"),
        col("user_id"))
      .distinct().groupBy("day").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    it("splits each day's actives exactly into new + retained + resurrected") {
      assert(rows.nonEmpty, "vacuous: no lifecycle rows")
      dau.foreach { case (d, n) =>
        val (nw, ret, res, _, _) = rows(d)
        assert(nw + ret + res == n, s"day $d: $nw+$ret+$res != dau $n")
      }
    }

    it("new users over all days sum to the distinct user count") {
      val users = EventOps.events(spark, sfDir)
        .select("user_id").distinct().count()
      assert(rows.values.map(_._1).sum == users)
    }

    it("conserves flow: churned(d) = dau(d-1) - retained(d)") {
      val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
      rows.foreach { case (d, (_, ret, _, ch, _)) =>
        val prev = java.time.LocalDate.parse(d, fmt).minusDays(1).toString
        dau.get(prev).foreach { prevDau =>
          assert(ch == prevDau - ret, s"day $d: churned $ch != $prevDau - $ret")
        }
      }
    }

    it("quick ratio is null exactly when churn is zero") {
      rows.values.foreach { case (nw, _, res, ch, qr) =>
        if (ch == 0) assert(qr.isEmpty)
        else assert(qr.contains(BigDecimal((nw + res).toDouble / ch)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
  }

  describe("q_burstiness") {

    it("matches a sequential per-(user, type) gap replay") {
      val got = EventOps.qBurstiness(spark, sfDir).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
            r.getDouble(5)))
        .toMap
      val ev = EventOps.events(spark, sfDir)
        .select(col("user_id"), col("event_type"),
          col("ts").cast("double"), col("event_id"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      val gapsByType = ev.groupBy(e => (e._1, e._2)).toSeq
        .flatMap { case ((_, typ), es) =>
          es.sortBy(e => (e._3, e._4)).sliding(2).collect {
            case Array(a, b) => typ -> (b._3 - a._3)
          }
        }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.keySet == gapsByType.keySet)
      gapsByType.foreach { case (typ, gaps) =>
        val n = gaps.size
        val mu = gaps.sum / n
        val sd = math.sqrt(gaps.map(g => (g - mu) * (g - mu)).sum / (n - 1))
        val (gn, gmu, gsd, gcv, gb) = got(typ)
        assert(gn == n, s"$typ n_gaps")
        assert(math.abs(gmu - r4(mu)) <= 1e-4, s"$typ mean")
        assert(math.abs(gsd - r4(sd)) <= 1e-4, s"$typ sd")
        assert(math.abs(gcv - r6(sd / mu)) <= 1e-6, s"$typ cv")
        assert(math.abs(gb - r6((sd - mu) / (sd + mu))) <= 1e-6, s"$typ burstiness")
        assert(gb > -1 && gb < 1, s"$typ burstiness out of range")
      }
    }
  }

  describe("q_stl_decompose") {

    it("matches a driver-side MA/seasonal replay and seasonal indices center on 1") {
      def r(x: Double, sc: Int) =
        BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
      val daily = EventOps.events(spark, sfDir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("day").cast("date").cast("string"), col("n"),
          (dayofweek(col("day")) - 1))
        .collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2)))
        .sortBy(_._1)
      val n = daily.length
      val trend = daily.indices.map { i =>
        val lo = math.max(0, i - 3); val hi = math.min(n - 1, i + 3)
        val win = (lo to hi).map(j => daily(j)._2)
        win.sum.toDouble / win.size
      }
      val ratios = daily.indices.map(i => daily(i)._2 / trend(i))
      val seasonal = daily.indices.groupBy(i => daily(i)._3).view
        .mapValues(is => r(is.map(ratios).sum / is.size, 6)).toMap
      val got = EventOps.qStlDecompose(spark, sfDir)
        .select(col("day").cast("date").cast("string"), col("n"), col("trend"),
          col("dow"), col("seasonal"), col("resid"), col("anomaly"))
        .collect()
        .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2), x.getInt(3),
          x.getDouble(4), x.getDouble(5), x.getBoolean(6))).toMap
      daily.indices.foreach { i =>
        val (d, cnt, dow) = daily(i)
        val (gn, gt, gd, gs, gr, ga) = got(d)
        assert(gn == cnt && gd == dow, s"$d basic")
        assert(math.abs(gt - r(trend(i), 4)) <= 1e-4, s"$d trend")
        assert(gs == seasonal(dow), s"$d seasonal")
        val resid = r(cnt / (trend(i) * seasonal(dow)), 6)
        assert(math.abs(gr - resid) <= 1e-6, s"$d resid")
        assert(ga == (gr > 1 + EventOps.STL_BAND || gr < 1 - EventOps.STL_BAND))
      }
      // seasonal indices average ~1 (they are mean detrended ratios)
      val meanIdx = seasonal.values.sum / seasonal.size
      assert(math.abs(meanIdx - 1.0) < 0.1, s"seasonal indices off-center: $seasonal")
    }
  }

  describe("q_cohort_ltv") {

    lazy val got = Relational.qCohortLtv(spark, sfDir)
      .select(col("cohort_month").cast("date").cast("string"),
        col("month_offset"), col("n_customers"), col("revenue"),
        col("cum_ltv_per_cust"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    it("cell revenues partition total order revenue exactly (cents)") {
      val totalCents = Tables.orders(spark, sfDir)
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head().getLong(0)
      val gotCents = got.values.map(v => math.round(v._2 * 100)).sum
      assert(gotCents == totalCents)
    }

    it("every cohort starts at offset 0 and LTV is non-decreasing") {
      val byCohort = got.toSeq.groupBy(_._1._1)
      byCohort.foreach { case (c, cells) =>
        assert(cells.exists(_._1._2 == 0L), s"cohort $c missing offset 0")
        val curve = cells.sortBy(_._1._2).map(_._2._3)
        assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
          s"cohort $c LTV not monotone")
      }
    }

    it("final cumulative LTV times cohort size recovers cohort revenue to the cent") {
      val byCohort = got.toSeq.groupBy(_._1._1)
      byCohort.foreach { case (c, cells) =>
        val n = cells.head._2._1
        val totCents = cells.map(v => math.round(v._2._2 * 100)).sum
        val lastLtvCents = math.round(cells.maxBy(_._1._2)._2._3 * 100)
        // floor division truncates at most (n-1) cents
        assert(lastLtvCents * n <= totCents && totCents - lastLtvCents * n < n,
          s"cohort $c: $lastLtvCents * $n vs $totCents")
      }
    }
  }

  describe("q_rfm") {

    lazy val seg = Relational.qRfm(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap

    it("segments partition the customer base with balanced marginals") {
      val nCust = Tables.orders(spark, sfDir)
        .select("o_custkey").distinct().count()
      assert(seg.values.map(_._1).sum == nCust)
      Seq[((Int, Int, Int)) => Int](_._1, _._2, _._3).foreach { dim =>
        val marg = seg.toSeq.groupBy(kv => dim(kv._1))
          .view.mapValues(_.map(_._2._1).sum).toMap
        assert(marg.keySet == (1 to 5).toSet, s"missing scores: ${marg.keySet}")
        assert(marg.values.max - marg.values.min <= 1,
          s"ntile marginals unbalanced: $marg")
      }
    }

    it("monetary score is monotone in segment mean spend") {
      // avg monetary of all m_score=k segments must rise with k
      val byM = seg.toSeq.groupBy(_._1._3).view
        .mapValues { cells =>
          cells.map(c => c._2._2 * c._2._1).sum / cells.map(_._2._1).sum
        }.toMap
      (1 to 4).foreach { k =>
        assert(byM(k) < byM(k + 1), s"m_score mean not monotone at $k: $byM")
      }
    }

    it("recency score 1 holds the most recent customers on average") {
      val byR = seg.toSeq.groupBy(_._1._1).view
        .mapValues { cells =>
          cells.map(c => c._2._3 * c._2._1).sum / cells.map(_._2._1).sum
        }.toMap
      assert(byR(1) == byR.values.min, s"r_score 1 not most recent: $byR")
    }
  }
}
