package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Streaming embedding-OOD monitor off the trained per-dim stats
  * artifact: artifact/batch-query agreement, exact batch/stream parity
  * on real embeddings, and a corrupted-batch flood crossing the alert
  * threshold while in-distribution replays stay under it.
  */
class OodStreamSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  it("scores a stream identically to the static frame") {
    implicit val sql = spark.sqlContext
    val embs = graft.Tables.embeddings(spark, sfDir)
    val (mu, sd) = StreamOps.trainDimStats(embs)
    assert(mu.length == sd.length && mu.nonEmpty)
    assert(sd.forall(_ >= 0.0))

    val probe = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .limit(50).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val staticDf = probe.toSeq.toDF("vec_id", "embedding")
      .withColumn("ts", lit(ts(100)))
    val batch = StreamOps.oodMonitor(staticDf, mu, sd, thresh = 12.0).collect()
      .map(r => (r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_mahal"),
        r.getAs[Double]("max_mahal"), r.getAs[Long]("n_ood")))

    val stream = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
    val q = StreamOps.oodMonitor(
        stream.toDF().toDF("vec_id", "embedding", "ts"), mu, sd, thresh = 12.0)
      .writeStream.format("memory").queryName("oodmon_out")
      .outputMode("append").start()
    try {
      stream.addData(probe.toSeq.map { case (id, e) => (id, e, ts(100)) }: _*)
      q.processAllAvailable()
      stream.addData((0L, probe.head._2, ts(20000))) // advance watermark
      q.processAllAvailable()
      val streamed = spark.table("oodmon_out").collect()
        .map(r => (r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_mahal"),
          r.getAs[Double]("max_mahal"), r.getAs[Long]("n_ood")))
      assert(streamed.toSet == batch.toSet, "stream/batch OOD divergence")
    } finally q.stop()
  }

  it("stays quiet on in-distribution replays and alerts on a corrupted flood") {
    val embs = graft.Tables.embeddings(spark, sfDir)
    val (mu, sd) = StreamOps.trainDimStats(embs)
    val dim = mu.length

    // in-distribution: replay the exact training mean — distance 0
    val calm = Seq((1L, mu, ts(100))).toDF("vec_id", "embedding", "ts")
    val calmRow = StreamOps.oodMonitor(calm, mu, sd, thresh = 12.0).collect().head
    assert(calmRow.getAs[Double]("max_mahal") == 0.0)
    assert(calmRow.getAs[Long]("n_ood") == 0L)

    // corrupted batch: every coordinate 20 sigma off the mean — the
    // distance is exactly sqrt(dim * 400) over the non-constant dims
    val nLive = sd.count(_ != 0.0)
    val hot = mu.zip(sd).map { case (m, s) => m + 20.0 * s }
    val flood = (1 to 5).map(i => (i.toLong, hot, ts(100)))
      .toDF("vec_id", "embedding", "ts")
    val hotRow = StreamOps.oodMonitor(flood, mu, sd, thresh = 12.0).collect().head
    assert(hotRow.getAs[Long]("n_ood") == 5L, s"flood must alert: $hotRow")
    val expected = math.sqrt(nLive * 400.0)
    assert(math.abs(hotRow.getAs[Double]("max_mahal") - expected) < 1e-3,
      s"closed form: ${hotRow.getAs[Double]("max_mahal")} vs $expected over $nLive dims")
  }
}
