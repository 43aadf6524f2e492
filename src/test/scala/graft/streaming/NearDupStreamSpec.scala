package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Streaming MinHash near-dup: replaying the documents table through
  * `nearDupStream` must reproduce `q_dedup_minhash_lsh`'s pair set
  * (doc_a, doc_b, est_jaccard) exactly, within the watermark horizon —
  * signatures come from the same affine arithmetic, banding from the
  * same geometry, and the lowest-agreeing-band rule de-duplicates
  * multi-band collisions without a second stateful operator.
  */
class NearDupStreamSpec extends AnyFunSpec with SparkTestBase {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  describe("nearDupStream") {

    it("replayed documents reproduce the batch MinHash-LSH pairs exactly") {
      import spark.implicits._
      implicit val sql = spark.sqlContext

      // batch ground truth (rep-level pairs over collapsed exact dups)
      val batch = graft.operators.Dedup.qDedupMinhashLsh(spark, sfDir)
        .select("doc_a", "doc_b", "est_jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      // replay the SAME rep set (streaming exact-dedup is its own op) in
      // doc_id order, one timestamp tick apart — all inside the horizon
      val reps = graft.operators.Dedup
        .collapseExact(graft.Tables.documents(spark, sfDir))
        .select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

      val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
      val q = StreamOps.nearDupStream(
          stream.toDF().toDF("doc_id", "ts", "text"), delaySec = 36000)
        .writeStream.format("memory").queryName("ndp_out")
        .outputMode("append").start()
      try {
        stream.addData(reps.zipWithIndex.map { case ((id, text), i) =>
          (id, ts(1000 + i), text)
        }.toIndexedSeq)
        q.processAllAvailable()
        // advance the watermark so buffered pairs flush
        stream.addData((999999L, ts(999999), "watermark advance row only"))
        q.processAllAvailable()
        val streamed = spark.table("ndp_out")
          .select("doc_a", "doc_b", "est_jaccard")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(streamed == batch,
          s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
        assert(batch.nonEmpty, "vacuous parity: batch pair set is empty")
      } finally q.stop()
    }

    it("emits a multi-band-agreeing pair once and evicts state past the horizon") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      // identical long texts agree on ALL bands (signature equality)
      val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
      val q = StreamOps.nearDupStream(
          stream.toDF().toDF("doc_id", "ts", "text"), delaySec = 60)
        .writeStream.format("memory").queryName("ndp_once")
        .outputMode("append").start()
      try {
        stream.addData((1L, ts(100), text), (2L, ts(101), text))
        q.processAllAvailable()
        val rows = spark.table("ndp_once").collect()
        assert(rows.length == 1, s"expected exactly one pair, got ${rows.length}")
        assert(rows.head.getAs[Long]("doc_a") == 1L)
        assert(rows.head.getAs[Long]("doc_b") == 2L)
        assert(rows.head.getAs[Double]("est_jaccard") == 1.0)

        // push the watermark beyond ts(101)+60s, then replay doc 3 with
        // the same text: state must have been evicted, so NO pair with
        // docs 1/2 appears (a fresh bucket holds only doc 3)
        stream.addData((9L, ts(10000), "unrelated words that do not shingle match"))
        q.processAllAvailable()
        stream.addData((3L, ts(10001), text))
        q.processAllAvailable()
        val after = spark.table("ndp_once").collect()
        assert(after.length == 1,
          s"evicted members still pairing: ${after.mkString(", ")}")
      } finally q.stop()
    }
  }
}
