package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** EWMA spike monitor + CMS join-size estimation. */
class MonitorSpec extends AnyFunSpec with SparkTestBase {

  it("q_events_ewma matches a sequential driver-side replay per type") {
    val got = EventOps.qEventsEwma(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val hourly = EventOps.events(spark, sfDir)
      .groupBy(col("event_type"),
        floor(col("ts").cast("double") / 3600).cast("long").as("hr"))
      .agg(count(lit(1)).cast("double").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(got.keySet == hourly.keySet)
    hourly.foreach { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      var e = xs.head; var spikes = 0L
      xs.tail.foreach { x =>
        if (x > e * 2.0) spikes += 1
        e = 0.3 * x + 0.7 * e
      }
      val eR = BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(tpe) == ((xs.length.toLong, eR, spikes)), s"EWMA replay mismatch for $tpe")
    }
  }

  it("q_join_size_est overcounts but stays within the epsilon bound, and exact is the real join size") {
    val row = Relational.qJoinSizeEst(spark, sfDir).collect().head
    val exact = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(row.getLong(0) == exact)
    assert(row.getBoolean(2), "CM inner product must never undercount")
    assert(row.getBoolean(3), s"estimate ${row.getLong(1)} outside the epsilon bound")
  }
}
