package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Streaming A/B monitor: exact batch/stream parity on real events, the
  * same arm assignment as the batch Welch test, and a constructed
  * separation that the per-window t detects.
  */
class AbMonitorStreamSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  it("scores a stream identically to the same frame evaluated as a batch") {
    implicit val sql = spark.sqlContext
    val ev = graft.operators.EventOps.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("timestamp"), col("value"))
      .limit(400).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val batch = StreamOps.abMonitor(ev.toSeq.toDF("user_id", "ts", "value"))
      .collect().map(_.toSeq).toSet

    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamOps.abMonitor(stream.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("abmon_out")
      .outputMode("append").start()
    try {
      stream.addData(ev.toSeq: _*)
      q.processAllAvailable()
      val horizon = ev.map(_._2.getTime).max / 1000 + 7200
      stream.addData((0L, ts(horizon), 0.0)) // advance watermark
      q.processAllAvailable()
      val streamed = spark.table("abmon_out").collect().map(_.toSeq).toSet
      assert(batch.subsetOf(streamed), "stream/batch A/B monitor divergence")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  it("flags a constructed treatment effect inside one window") {
    // users 1 (arm by h60 parity) get value 10, others 1 — find two
    // users on opposite arms and give one side a big lift
    val arm = (u: Long) => graft.functions.HashFns.h60Local(u.toString) % 2
    val armA = (1L to 50L).filter(arm(_) == 0).take(10)
    val armB = (1L to 50L).filter(arm(_) == 1).take(10)
    val rows = armA.flatMap(u => Seq.fill(5)((u, ts(100), 10.0))) ++
      armB.flatMap(u => Seq.fill(5)((u, ts(100), 1.0)))
    val out = StreamOps.abMonitor(rows.toDF("user_id", "ts", "value"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("mean_a") == 10.0 && r.getAs[Double]("mean_b") == 1.0)
    // zero within-arm variance makes t undefined (division by zero →
    // null or infinity depending on engine path); perturb instead
    val jit = rows.zipWithIndex.map { case ((u, t0, v), i) =>
      (u, t0, v + (i % 3) * 0.01)
    }
    val out2 = StreamOps.abMonitor(jit.toDF("user_id", "ts", "value")).collect().head
    assert(!out2.isNullAt(out2.fieldIndex("welch_t")))
    assert(out2.getAs[Double]("welch_t") > 100,
      s"constructed lift must dominate: $out2")
  }
}
