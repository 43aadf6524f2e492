package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Streaming content-drift scoring off the trained term distribution:
  * exact batch/stream parity (one stateless projection, same artifact),
  * closed-form endpoints (0 for a mirror of the reference, ln 2 for
  * fully-disjoint content), and the windowed monitor's append-mode
  * window close.
  */
class DriftStreamSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  it("scores a stream identically to batch off the same trained distribution") {
    implicit val sql = spark.sqlContext
    val ref = graft.Tables.documents(spark, sfDir).filter(col("source") === "src0")
    val dist = graft.operators.Pipeline.trainTermDistribution(ref)
    assert(math.abs(dist.values.sum - 1.0) < 1e-9, "trained shares must sum to 1")
    assert(dist.contains(graft.operators.Pipeline.JS_OOV))

    val probe = graft.Tables.documents(spark, sfDir)
      .filter(col("source") =!= "src0").select("doc_id", "text").limit(120)
    val rows = probe.collect().map(r => (r.getLong(0), r.getString(1)))
    val batch = StreamOps.driftScore(probe, dist)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("js")))).toMap

    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.driftScore(stream.toDF().toDF("doc_id", "text"), dist)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      stream.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("drift_out")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Double]("js")))).toMap
      assert(streamed == batch, "stream/batch drift divergence")
      assert(batch.values.forall { case (_, js) =>
        js >= 0.0 && js <= math.log(2.0) + 1e-9 })
    } finally q.stop()
  }

  it("hits the closed-form endpoints: 0 on a reference mirror, ln 2 on disjoint text") {
    val dist = graft.operators.Pipeline.trainTermDistribution(
      Seq((1L, "a a b b")).toDF("doc_id", "text"))
    assert(dist == Map("a" -> 0.5, "b" -> 0.5, graft.operators.Pipeline.JS_OOV -> 0.0))
    val scored = StreamOps.driftScore(
        Seq((1L, "b a b a"), (2L, "z z z")).toDF("doc_id", "text"), dist)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("js")).toMap
    assert(scored(1L) == 0.0, s"reference mirror must score 0: $scored")
    val ln2 = BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored(2L) == ln2, s"disjoint text must score ln2=$ln2: $scored")
  }

  it("the windowed monitor closes hourly windows in append mode with the right stats") {
    implicit val sql = spark.sqlContext
    val dist = graft.operators.Pipeline.trainTermDistribution(
      Seq((1L, "a a b b")).toDF("doc_id", "text"))
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamOps.driftMonitor(
        stream.toDF().toDF("doc_id", "text", "ts"), dist)
      .writeStream.format("memory").queryName("driftmon_out")
      .outputMode("append").start()
    try {
      // hour 0: one mirror (js 0), one disjoint (js ln2)
      stream.addData((1L, "a b a b", ts(100)), (2L, "z z z", ts(200)))
      q.processAllAvailable()
      stream.addData((3L, "a b", ts(20000))) // advance watermark, close hour 0
      q.processAllAvailable()
      val rows = spark.table("driftmon_out").collect()
      val ln2 = BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val avg = BigDecimal(ln2 / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows.exists { r =>
        r.getAs[java.time.LocalDateTime]("hour_start") ==
          java.time.LocalDateTime.ofEpochSecond(0, 0, java.time.ZoneOffset.UTC) &&
          r.getAs[Long]("n_docs") == 2 &&
          r.getAs[Double]("max_js") == ln2 &&
          math.abs(r.getAs[Double]("avg_js") - avg) < 1e-6
      }, s"hour-0 drift window missing/wrong: ${rows.mkString(", ")}")
    } finally q.stop()
  }
}
