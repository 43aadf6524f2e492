package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import StreamOps.{TwapSnapshot, ValueArrival}

/** transformWithState streaming TWAP: cross-batch state accumulation and
  * exact parity with the batch lead-window query on the replayed table.
  */
class TwapStreamSpec extends AnyFunSpec with SparkTestBase {

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

  /** Feed batches; returns the latest snapshot per key after the run. */
  private def run(batches: Seq[Seq[ValueArrival]]): Map[String, (Double, Long)] = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[ValueArrival]
      val q = StreamOps.twapStream(in.toDS())
        .writeStream.format("memory").queryName("twap_out")
        .outputMode("update").start()
      try {
        val latest = scala.collection.mutable.Map.empty[String, (Double, Long)]
        var seen = 0
        batches.foreach { b =>
          in.addData(b: _*)
          q.processAllAvailable()
          val all = spark.table("twap_out").as[TwapSnapshot].collect()
          all.drop(seen).foreach(s => latest(s.key) = (s.twap, s.n_seg))
          seen = all.length
        }
        latest.toMap
      } finally q.stop()
    }
  }

  it("matches the batch lead-window TWAP when the events table is replayed in time order") {
    val arrivals = graft.operators.EventOps.events(spark, sfDir)
      .select(concat_ws("|", col("event_type"), to_date(col("ts"))).as("key"),
        col("ts").cast("double").as("tsSec"), col("event_id"), col("value"))
      .collect()
      .map(r => ValueArrival(r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
      .sortBy(a => (a.tsSec, a.eventId))
    // three batches split on global time: per-key arrival order holds,
    // and most keys accumulate state across batch boundaries
    val cut = arrivals.length / 3
    val got = run(Seq(
      arrivals.slice(0, cut).toSeq,
      arrivals.slice(cut, 2 * cut).toSeq,
      arrivals.slice(2 * cut, arrivals.length).toSeq))
    val want = graft.operators.EventOps.qTimeWeightedAvg(spark, sfDir).collect()
      .map(r => s"${r.getString(0)}|${r.getDate(1)}" -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got.keySet == want.keySet,
      s"key sets differ: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
    want.foreach { case (k, (twap, nSeg)) =>
      val (gt, gn) = got(k)
      assert(gn == nSeg, s"$k segments: got $gn want $nSeg")
      // batch rounds to 6dp; the sequential fold agrees to summation noise
      assert(math.abs(gt - twap) < 1e-5, s"$k twap: got $gt want $twap")
    }
  }

  it("streaming CUSUM under batch-trained limits matches the batch fold exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // train control limits in batch — the nightly job
    val daily = graft.operators.EventOps.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
    val limits = daily.groupBy("event_type")
      .agg(round(avg("x"), 6).as("mu"), round(stddev_samp("x"), 6).as("sd"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val series = daily.orderBy("event_type", "d").collect()
      .map(r => StreamOps.CusumArrival(r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getDouble(2)))
    val cut = series.length / 2
    withRocksDb {
      val in = MemoryStream[StreamOps.CusumArrival]
      val q = StreamOps.cusumStream(in.toDS(), limits)
        .writeStream.format("memory").queryName("cusum_out")
        .outputMode("update").start()
      try {
        in.addData(series.take(cut).toSeq: _*); q.processAllAvailable()
        in.addData(series.drop(cut).toSeq: _*); q.processAllAvailable()
        // max_s and n_alarms are monotone across snapshots, so the
        // latest snapshot is the max — no reliance on sink row order
        val latest = spark.table("cusum_out").as[StreamOps.CusumSnapshot].collect()
          .groupBy(_.key).map { case (k, xs) =>
            k -> xs.maxBy(s => (s.max_s, s.n_alarms))
          }
        val batch = graft.operators.Stats.qCusumChangepoint(spark, sfDir).collect()
          .map(r => r.getString(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
        assert(latest.keySet == batch.keySet)
        batch.foreach { case (k, (maxS, alarms)) =>
          assert(math.abs(latest(k).max_s - maxS) < 1e-6,
            s"$k max_s: got ${latest(k).max_s} want $maxS")
          assert(latest(k).n_alarms == alarms, s"$k alarms")
        }
      } finally q.stop()
    }
  }

  it("accumulates state across batches: a key's snapshot refines, single events emit nothing") {
    val a = Seq(ValueArrival("k", 0.0, 1L, 10.0))
    val b = Seq(ValueArrival("k", 10.0, 2L, 20.0))
    val c = Seq(ValueArrival("k", 30.0, 3L, 40.0), ValueArrival("lone", 5.0, 9L, 1.0))
    val after1 = run(Seq(a))
    assert(after1.isEmpty, "a single observation has no closed segment")
    val after3 = run(Seq(a, b, c))
    // segments: 10.0 held 10s, 20.0 held 20s -> (100+400)/30
    assert(math.abs(after3("k")._1 - 500.0 / 30.0) < 1e-12)
    assert(after3("k")._2 == 2L)
    assert(!after3.contains("lone"))
  }
}
