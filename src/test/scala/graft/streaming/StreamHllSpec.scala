package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import StreamOps.{DistinctArrival, DistinctEstimate}

/** transformWithState HLL distinct-count monitor: O(1) state per source,
  * EXACT estimate parity with the batch `hll_sketch_agg` on any stream
  * prefix (same lgK, HLL_8, long updates — not merely "close"), the
  * batch family's ±5% tolerance vs exact distinct, and replay
  * invariance (HLL updates are idempotent per item).
  */
class StreamHllSpec extends AnyFunSpec with SparkTestBase {

  private val LG_K = 12

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

  private def lastEstimates(batches: Seq[Seq[DistinctArrival]]): Map[String, (Long, Long)] = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[DistinctArrival]
      val q = StreamOps.distinctStream(in.toDS(), LG_K)
        .writeStream.format("memory").queryName("hll_out")
        .outputMode("update").start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        // per source, the snapshot with the largest arrival count is final
        spark.table("hll_out").as[DistinctEstimate].collect().toSeq
          .groupBy(_.source)
          .map { case (s, rows) =>
            val last = rows.maxBy(_.n_arrivals)
            s -> ((last.estimate, last.n_arrivals))
          }
      } finally q.stop()
    }
  }

  it("matches hll_sketch_agg EXACTLY per source on the full documents table") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("source", "doc_id").as[(String, Long)]
      .collect().map { case (s, id) => DistinctArrival(s, id) }.toSeq
    // split mid-source so sketch state must serialize across batches
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val got = lastEstimates(Seq(b1, b2))
    val batch = Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(doc_id, $LG_K))").as("est"),
        countDistinct("doc_id").as("exact"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (s, (est, _)) =>
      assert(est == batch(s)._1,
        s"source $s: stream estimate $est != batch sketch ${batch(s)._1}")
      // the batch family's verdict discipline: within ±5% of exact
      val exact = batch(s)._2
      assert(math.abs(est - exact) <= exact * 0.05,
        s"source $s: estimate $est outside 5% of exact $exact")
    }
    assert(got.values.map(_._2).sum == docs.length.toLong)
  }

  it("is invariant to re-delivered ids: a replayed batch moves no estimate") {
    val docs = (1L to 500L).map(i => DistinctArrival("s", i))
    val clean = lastEstimates(Seq(docs))
    val replayed = lastEstimates(Seq(docs.take(300), docs.slice(100, 300) ++ docs.drop(300)))
    assert(clean("s")._1 == replayed("s")._1,
      s"replay moved the estimate: ${clean("s")._1} -> ${replayed("s")._1}")
  }

  it("keeps O(1) state: a long stream emits one bounded-size snapshot per batch") {
    val docs = (1L to 3000L).map(i => DistinctArrival("s", i))
    val est = lastEstimates(Seq(docs.take(1000), docs.slice(1000, 2000), docs.drop(2000)))
    val (e, n) = est("s")
    assert(n == 3000L)
    assert(math.abs(e - 3000L) <= 3000L * 0.05, s"estimate $e off exact 3000")
  }
}
