package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Trend forecast + skew diagnostic: closed-form OLS against a driver
  * replay; skew indicators against direct recomputation.
  */
class OpsDiagnosticsSpec extends AnyFunSpec with SparkTestBase {

  it("q_trend_forecast matches a driver-side least-squares replay") {
    val r = Relational.qTrendForecast(spark, sfDir).collect().head
    val pts = Tables.orders(spark, sfDir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum("o_totalprice").as("rev"))
      .select(months_between(col("m"), lit("1995-01-01").cast("timestamp"))
        .cast("double").as("t"), col("rev"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    val n = pts.length.toDouble
    val st = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val stt = pts.map(p => p._1 * p._1).sum; val sty = pts.map(p => p._1 * p._2).sum
    val slope = (n * sty - st * sy) / (n * stt - st * st)
    val icept = (sy - slope * st) / n
    assert(r.getLong(0) == pts.length)
    assert(math.abs(r.getDouble(1) - slope) < 1e-2, s"slope ${r.getDouble(1)} vs $slope")
    assert(math.abs(r.getDouble(2) - icept) < 1.0, s"intercept ${r.getDouble(2)} vs $icept")
    assert(math.abs(r.getDouble(4) - (icept + slope * n)) < 1.0, "forecast formula")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "r2 range")
  }

  it("q_skew_report indicators match direct recomputation and flag the stopword head") {
    val r = SkewOps.qSkewReport(spark, sfDir).collect().head
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("k"))
      .groupBy("k").count().collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.getLong(0) == counts.length)
    assert(r.getLong(1) == counts.map(_._2).sum)
    assert(r.getLong(2) == counts.map(_._2).max)
    val top10 = counts.sortBy(t => (-t._2, t._1)).take(10).map(_._2).sum.toDouble
    val share = BigDecimal(top10 / counts.map(_._2).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == share)
    assert(r.getDouble(4) >= 1.0, "max/avg ratio below 1 is impossible")
  }
}
