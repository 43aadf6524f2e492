package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import StreamOps.{HoltArrival, HoltSnapshot}

/** Streaming Holt forecaster: cross-batch (level, trend) state parity
  * with the batch fold (`EventOps.qHoltWinters`) regardless of how the
  * series splits into micro-batches, and per-key state independence.
  */
class HoltStreamSpec extends AnyFunSpec with SparkTestBase {

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

  private def run(batches: Seq[Seq[HoltArrival]]): Map[String, HoltSnapshot] = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[HoltArrival]
      val q = StreamOps.holtStream(in.toDS())
        .writeStream.format("memory").queryName("holt_out")
        .outputMode("update").start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        spark.table("holt_out").as[HoltSnapshot].collect()
          .groupBy(_.key).map { case (k, xs) => k -> xs.maxBy(_.n_obs) }
      } finally q.stop()
    }
  }

  it("replaying the daily series matches the batch fold bit-for-bit at 6dp") {
    val daily = graft.operators.EventOps.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
      .orderBy("day").collect()
      .zipWithIndex.map { case (r, i) => HoltArrival("all", i.toLong, r.getDouble(1)) }
    val cut = daily.length / 3
    val got = run(Seq(daily.slice(0, cut).toSeq,
      daily.slice(cut, 2 * cut).toSeq, daily.drop(2 * cut).toSeq))("all")
    val batch = graft.operators.EventOps.qHoltWinters(spark, sfDir)
      .orderBy(desc("day")).limit(1).collect()(0)
    assert(got.n_obs == daily.length.toLong)
    assert(math.abs(got.level - batch.getDouble(2)) < 1e-6,
      s"level: stream ${got.level} vs batch ${batch.getDouble(2)}")
    assert(math.abs(got.trend - batch.getDouble(3)) < 1e-6,
      s"trend: stream ${got.trend} vs batch ${batch.getDouble(3)}")
    assert(math.abs(got.last_err - batch.getDouble(5)) < 1e-6,
      s"err: stream ${got.last_err} vs batch ${batch.getDouble(5)}")
    assert(math.abs(got.next_forecast - (got.level + got.trend)) < 1e-9)
  }

  it("keys smooth independently; a lone first observation seeds without emitting error") {
    val got = run(Seq(
      Seq(HoltArrival("a", 1, 100.0), HoltArrival("b", 1, 10.0)),
      Seq(HoltArrival("a", 2, 120.0))))
    assert(got("b").level == 10.0 && got("b").trend == 0.0 && got("b").n_obs == 1L)
    // a: seed (100, 0); step: f=100, level=.5*120+.5*100=110, trend=.3*10=3
    assert(got("a").level == 110.0 && got("a").trend == 3.0)
    assert(got("a").next_forecast == 113.0 && got("a").last_err == 20.0)
  }
}
