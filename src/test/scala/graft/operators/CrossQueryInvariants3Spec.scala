package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Third-session cross-query invariants: every new operator must agree
  * with the established surface on the totals they share — two
  * independent plan shapes reaching the same number is a far stronger
  * pin than either alone.
  */
class CrossQueryInvariants3Spec extends AnyFunSpec with SparkTestBase {

  it("growth accounting, retention cohorts and the raw stream agree on the user base") {
    val users = EventOps.events(spark, sfDir).select("user_id").distinct().count()
    val lifecycleNew = EventOps.qUserLifecycle(spark, sfDir)
      .agg(sum("n_new")).head().getLong(0)
    val cohortBase = EventOps.qRetentionCohorts(spark, sfDir)
      .filter(col("week_offset") === 0)
      .agg(sum("n_active")).head().getLong(0)
    assert(lifecycleNew == users, "lifecycle new-user total != distinct users")
    assert(cohortBase == users, "cohort week-0 actives != distinct users")
  }

  it("dwell-time, burstiness and STL partition the same event stream") {
    val total = EventOps.events(spark, sfDir).count()
    val dwell = EventOps.qDwellTime(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dwell.values.map(_._1).sum == total,
      "dwell per-type n_events do not partition the stream")
    val burst = EventOps.qBurstiness(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    burst.foreach { case (t, gaps) =>
      assert(gaps < dwell(t)._1,
        s"$t: gaps $gaps must be < events ${dwell(t)._1} (one series minimum)")
    }
    val stlDays = EventOps.qStlDecompose(spark, sfDir)
      .agg(sum("n")).head().getLong(0)
    assert(stlDays == total, "STL daily volumes do not sum to the stream")
  }

  it("Welch arms, CUPED base and RFM segments cover the same customers/orders") {
    val orders = Tables.orders(spark, sfDir).count()
    val custs = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    val welch = Stats.qAbWelch(spark, sfDir).head()
    assert(welch.getLong(0) + welch.getLong(1) == orders,
      "Welch arm order counts do not partition the fact")
    assert(Stats.qCuped(spark, sfDir).head().getLong(0) == custs)
    val rfm = Relational.qRfm(spark, sfDir).agg(sum("n_customers")).head().getLong(0)
    assert(rfm == custs, "RFM segments do not partition the customer base")
    val km = Stats.qSurvivalKm(spark, sfDir).collect()
    assert(km.map(_.getLong(2)).sum <= custs)
    assert(km.head.getLong(1) == custs,
      "KM initial at-risk set != customer base")
  }

  it("gains curve, probe confusion and uncertainty sampling share one scored corpus") {
    val nVec = Tables.embeddings(spark, sfDir).count()
    val nPos = Tables.embeddings(spark, sfDir).filter(col("label") < 5).count()
    val g = Similarity.qGainsCurve(spark, sfDir)
      .agg(sum("n"), sum("n_pos")).head()
    assert(g.getLong(0) == nVec && g.getLong(1) == nPos,
      "gains deciles do not partition the scored corpus")
    val probeN = Similarity.qEmbeddingProbe(spark, sfDir)
      .agg(sum("n")).head().getLong(0)
    assert(probeN == nVec)
    val unc = Similarity.qUncertaintySample(spark, sfDir).count()
    assert(unc == Similarity.UNC_K)
  }

  it("the forecast backtest holds out exactly the months the trend fit uses minus three") {
    val nMonths = Relational.qTrendForecast(spark, sfDir).head().getLong(0)
    val bkt = Relational.qForecastBacktest(spark, sfDir).collect()
    assert(bkt.length == Relational.BKT_HOLDOUT)
    val months = Tables.orders(spark, sfDir)
      .select(date_trunc("month", col("o_orderdate"))).distinct().count()
    assert(nMonths == months, "trend fit does not see every month")
    assert(bkt.forall(_.getDouble(3) >= 0))
  }

  it("modularity, HITS and label propagation describe the same trade graph") {
    val mod = Graph.qGraphModularity(spark, sfDir).head()
    val lpaFinal = Graph.qLabelProp(spark, sfDir)
      .orderBy(desc("round")).limit(1).head()
    assert(mod.getLong(1) == lpaFinal.getLong(1),
      "modularity community count != final LPA census")
    val hits = Graph.qHits(spark, sfDir).collect()
    assert(hits.length == 2 * Graph.HITS_TOP)
    // HITS runs on the UNthresholded graph — its node universe is a
    // superset of the k-core-thresholded LPA graph's
    assert(hits.map(_.getString(0)).distinct.length == hits.length)
  }
}
