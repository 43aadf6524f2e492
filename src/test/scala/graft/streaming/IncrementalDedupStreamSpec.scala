package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Streaming ingest-dedup probe against the static corpus band index:
  * exact batch/stream parity, stateless exactly-once emission across
  * multi-band agreement, and per-doc-best agreement with the batch
  * incremental probe.
  */
class IncrementalDedupStreamSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  it("probes a stream identically to batch and agrees with the batch incremental probe") {
    implicit val sql = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).cache()
    val probe = docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")

    val batch = StreamOps.incrementalDedupStream(probe, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exactly-once: no (doc, match) appears twice
    assert(batch.map(p => (p._1, p._2)).distinct.length == batch.length)

    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.incrementalDedupStream(
        stream.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("incdedup_out")
      .outputMode("append").start()
    try {
      stream.addData(probe.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("incdedup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(streamed.toSet == batch.toSet, "stream/batch probe divergence")
    } finally q.stop()

    // per-doc best (est desc, match asc) must equal the batch
    // q_dedup_incremental near channel (same candidates, same verify)
    val best = batch.groupBy(_._1).view.mapValues(
      _.minBy(p => (-p._3, p._2))).toMap
    val nearRows = graft.operators.Dedup.qDedupIncremental(spark, sfDir).collect()
      .filter(_.getString(2) == "near")
      .map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1), r.getDouble(3)))).toMap
    assert(best == nearRows, s"stream best ${best.size} vs batch near ${nearRows.size}")
  }

  it("an exact re-crawl agrees on every band but emits exactly one row at est 1.0") {
    val base = (1 to 40).map(i => s"base$i").mkString(" ")
    val other = (1 to 40).map(i => s"other$i").mkString(" ")
    val corpus = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val arrival = Seq((10L, base)).toDF("doc_id", "text")
    val got = StreamOps.incrementalDedupStream(arrival, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((10L, 1L, 1.0)), got.mkString(", "))
  }
}
