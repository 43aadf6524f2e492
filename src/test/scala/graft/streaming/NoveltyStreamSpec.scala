package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Streaming novelty scoring off the trained reference bloom: exact
  * batch/stream parity (same projection, same artifact), zero novelty for
  * text composed of reference grams (bloom has no false negatives), and
  * high novelty for unseen text.
  */
class NoveltyStreamSpec extends AnyFunSpec with SparkTestBase {

  it("scores a stream identically to batch off the same trained bloom artifact") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val ref = graft.Tables.documents(spark, sfDir).filter(col("source") === "src0")
    val bloom = graft.operators.TextAnalysis.trainNoveltyBloom(spark, ref)

    val probe = graft.Tables.documents(spark, sfDir)
      .filter(col("source") =!= "src0")
      .select("doc_id", "text").limit(120)
    val rows = probe.collect().map(r => (r.getLong(0), r.getString(1)))

    val batch = StreamOps.noveltyScore(probe, bloom)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.noveltyScore(
        stream.toDF().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("novelty_out")
      .outputMode("append").start()
    try {
      stream.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("novelty_out")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(streamed == batch, "stream/batch novelty divergence")
    } finally q.stop()

    // a doc stitched from reference text scores EXACTLY 0 (no false
    // negatives); a gibberish doc scores high (fp can only shave ~1%)
    val refText = ref.orderBy("doc_id").select("text").head().getString(0)
    val planted = Seq(
      (9001L, refText),
      (9002L, (1 to 30).map(i => s"zxqv${i}jk").mkString(" "))).toDF("doc_id", "text")
    val scored = StreamOps.noveltyScore(planted, bloom)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(9001L) == 0.0, s"reference re-crawl must score 0: $scored")
    assert(scored(9002L) > 0.9, s"unseen text must score ~1: $scored")
  }
}
