package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** HITS hub/authority ranking (full driver-side power-iteration replay)
  * and the window-function battery (sequential per-customer replay).
  */
class WindowHitsSpec extends AnyFunSpec with SparkTestBase {

  def r(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  describe("q_hits") {

    it("matches a driver-side max-normalized power iteration and splits sides cleanly") {
      val pairs = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("s"))
        .groupBy("c", "s").agg(count(lit(1)).cast("double").as("w"))
        .collect().map(row => (row.getString(0), row.getString(1), row.getDouble(2)))
      var auth = pairs.map(_._2).distinct.map(_ -> 1.0).toMap
      var hubs = Map.empty[String, Double]
      for (_ <- 1 to Graph.HITS_ITERS) {
        val hRaw = pairs.groupBy(_._1).view
          .mapValues(_.map(e => e._3 * auth(e._2)).sum).toMap
        val hMax = hRaw.values.max
        hubs = hRaw.view.mapValues(v => r(v / hMax, 9)).toMap
        val aRaw = pairs.groupBy(_._2).view
          .mapValues(_.map(e => e._3 * hubs(e._1)).sum).toMap
        val aMax = aRaw.values.max
        auth = aRaw.view.mapValues(v => r(v / aMax, 9)).toMap
      }
      val expH = hubs.toSeq.map { case (n, v) => (n, r(v, 6)) }
        .sortBy { case (n, v) => (-v, n) }.take(Graph.HITS_TOP)
      val expA = auth.toSeq.map { case (n, v) => (n, r(v, 6)) }
        .sortBy { case (n, v) => (-v, n) }.take(Graph.HITS_TOP)
      val got = Graph.qHits(spark, sfDir).collect()
        .map(row => (row.getString(0), row.getString(1), row.getDouble(2)))
      val gotH = got.filter(_._2 == "hub").map(t => (t._1, t._3)).toSeq
      val gotA = got.filter(_._2 == "authority").map(t => (t._1, t._3)).toSeq
      assert(gotH == expH, s"hubs: $gotH vs $expH")
      assert(gotA == expA, s"authorities: $gotA vs $expA")
      assert(gotH.forall(_._1.startsWith("c")) && gotA.forall(_._1.startsWith("s")),
        "bipartite sides mixed")
      assert(gotH.head._2 == 1.0 && gotA.head._2 == 1.0,
        "max normalization must pin the top score to 1")
      assert(got.forall(t => t._3 > 0 && t._3 <= 1.0))
    }
  }

  describe("q_forecast_backtest") {

    it("matches a driver-side OLS refit on the training months only") {
      val monthly = Tables.orders(spark, sfDir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(sum("o_totalprice").as("rev"))
        .select(col("m").cast("date").cast("string"),
          months_between(col("m"), lit("1995-01-01").cast("timestamp"))
            .cast("double"),
          col("rev"))
        .collect().map(x => (x.getString(0), x.getDouble(1), x.getDouble(2)))
        .sortBy(_._2)
      val maxT = monthly.map(_._2).max
      val train = monthly.filter(_._2 <= maxT - Relational.BKT_HOLDOUT)
      val n = train.length.toDouble
      val st = train.map(_._2).sum; val sy = train.map(_._3).sum
      val stt = train.map(t => t._2 * t._2).sum
      val sty = train.map(t => t._2 * t._3).sum
      val slope = r((n * sty - st * sy) / (n * stt - st * st), 6)
      val icept = r((sy - ((n * sty - st * sy) / (n * stt - st * st)) * st) / n, 6)
      val expected = monthly.filter(_._2 > maxT - Relational.BKT_HOLDOUT)
        .map { case (m, t, rev) =>
          (m, r(rev, 2), r(icept + slope * t, 2),
            r(math.abs(rev - (icept + slope * t)) / rev, 6))
        }.toSeq
      val got = Relational.qForecastBacktest(spark, sfDir)
        .select(col("month").cast("date").cast("string"), col("actual"),
          col("predicted"), col("ape"))
        .collect().map(x => (x.getString(0), x.getDouble(1), x.getDouble(2),
          x.getDouble(3))).toSeq
      assert(got.length == Relational.BKT_HOLDOUT)
      got.zip(expected).foreach { case (g, e) =>
        assert(g._1 == e._1 && g._2 == e._2, s"$g vs $e")
        assert(math.abs(g._3 - e._3) <= 0.02 && math.abs(g._4 - e._4) <= 1e-5,
          s"$g vs $e")
      }
      // the holdout months were NOT in the fit (refit on all months
      // would produce different coefficients — guard against leakage)
      val all = monthly
      val nA = all.length.toDouble
      val stA = all.map(_._2).sum; val syA = all.map(_._3).sum
      val sttA = all.map(t => t._2 * t._2).sum
      val styA = all.map(t => t._2 * t._3).sum
      val slopeAll = r((nA * styA - stA * syA) / (nA * sttA - stA * stA), 6)
      assert(slope != slopeAll, "backtest fit leaked the holdout months")
    }
  }

  describe("q_window_battery") {

    it("matches a sequential per-customer replay of every window function") {
      val got = Relational.qWindowBattery(spark, sfDir).collect()
        .map(row => (row.getLong(0), row.getLong(1)) -> row).toMap
      val orders = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long"), col("o_totalprice"))
        .collect()
        .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3)))
      assert(got.size == orders.length)
      orders.groupBy(_._1).foreach { case (cust, rows) =>
        val seq0 = rows.sortBy(t => (t._3, t._2))
        val n = seq0.length
        seq0.zipWithIndex.foreach { case (o, i) =>
          val row = got((cust, o._2))
          assert(row.getInt(3) == i + 1, s"rn $cust/${o._2}")
          val prev = if (i > 0) Some(seq0(i - 1)._4) else None
          val next = if (i + 1 < n) Some(seq0(i + 1)._4) else None
          assert((if (row.isNullAt(4)) None else Some(row.getDouble(4))) == prev)
          assert((if (row.isNullAt(5)) None else Some(row.getDouble(5))) == next)
          assert(row.getDouble(6) == seq0.head._4, "first_price")
          assert(row.getDouble(7) == seq0.last._4, "last_price")
          val second = if (n >= 2) Some(seq0(1)._4) else None
          assert((if (row.isNullAt(8)) None else Some(row.getDouble(8))) == second)
          // ties: dates+keys are unique per construction here, so
          // cume_dist = rank/n and percent_rank = (rank-1)/(n-1)
          assert(row.getDouble(9) == r((i + 1).toDouble / n, 6), "cume")
          val pr = if (n == 1) 0.0 else i.toDouble / (n - 1)
          assert(row.getDouble(10) == r(pr, 6), "prank")
        }
      }
    }
  }
}
