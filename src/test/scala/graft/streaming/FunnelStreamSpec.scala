package graft.streaming

import graft.SparkTestBase
import graft.operators.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import StreamOps.{FunnelEvent, FunnelSnapshot}

/** transformWithState conversion funnel: O(1) per-user state, and
  * count-level parity with the batch q_events_funnel when the driver
  * events replay in event-time order across micro-batches.
  */
class FunnelStreamSpec extends AnyFunSpec with SparkTestBase {

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def finalSnapshots(batches: Seq[Seq[FunnelEvent]]): Map[Long, FunnelSnapshot] = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[FunnelEvent]
      val q = StreamOps.funnelStream(in.toDS())
        .writeStream.format("memory").queryName("funnel_out")
        .outputMode("update").start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        // last snapshot per user wins (Update mode emits one per batch)
        spark.table("funnel_out").as[FunnelSnapshot].collect()
          .zipWithIndex.groupBy(_._1.user_id)
          .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
      } finally q.stop()
    }
  }

  it("matches the batch funnel's stage counts and conversion time on the driver data") {
    val evs = EventOps.events(spark, sfDir) // the loader's ts normalization
      .select(col("user_id"), col("event_type"), col("ts").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._3)
      .zipWithIndex
      .map { case ((u, t, ts), i) => FunnelEvent(u, t, ts, i.toLong) }
    val (b1, b2) = evs.splitAt(evs.length / 2) // ordered chunks
    val snaps = finalSnapshots(Seq(b1.toSeq, b2.toSeq))
    val batch = EventOps.qEventsFunnel(spark, sfDir).head
    assert(snaps.values.count(_.stage >= 1) == batch.getLong(0), "users_view")
    assert(snaps.values.count(_.stage >= 2) == batch.getLong(1), "users_click_1d")
    assert(snaps.values.count(_.stage >= 3) == batch.getLong(2), "users_purchase_1d")
    val conv = snaps.values.filter(_.stage >= 3).map(s => s.t3 - s.t1)
    if (conv.nonEmpty) {
      val avg = BigDecimal(conv.sum / conv.size)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(avg - batch.getDouble(3)) <= 0.01, "avg_sec_to_convert")
    }
  }

  it("stages are monotone and set-once across batches") {
    val evs = Seq(
      FunnelEvent(1L, "view", 100.0, 0),
      FunnelEvent(1L, "click", 200.0, 1),
      FunnelEvent(1L, "view", 300.0, 2)) // later view must not move t1
    val more = Seq(
      FunnelEvent(1L, "purchase", 400.0, 3),
      FunnelEvent(2L, "click", 50.0, 4)) // click with no view: stage 0
    val snaps = finalSnapshots(Seq(evs, more))
    assert(snaps(1L).stage == 3)
    assert(snaps(1L).t1 == 100.0 && snaps(1L).t2 == 200.0 && snaps(1L).t3 == 400.0)
    assert(snaps(2L).stage == 0)
  }

  it("the horizon gates stage progression") {
    val snaps = finalSnapshots(Seq(Seq(
      FunnelEvent(9L, "view", 0.0, 0),
      FunnelEvent(9L, "click", EventOps.FUNNEL_HORIZON_SEC + 1.0, 1))))
    assert(snaps(9L).stage == 1, "click past the horizon must not count")
  }
}
