package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.operators.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funspec.AnyFunSpec

import StreamOps.{DocArrival, ReservoirSnapshot}

/** transformWithState exact-k reservoir: O(k) state per source, and —
  * the property Algorithm R cannot give — EXACT row-for-row parity with
  * the batch q_sample_reservoir on any stream prefix, independent of
  * arrival order and batch partitioning.
  */
class StreamReservoirSpec extends AnyFunSpec with SparkTestBase {

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

  private def lastSnapshot(batches: Seq[Seq[DocArrival]], k: Int): Seq[ReservoirSnapshot] = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[DocArrival]
      val q = StreamOps.reservoirStream(in.toDS(), k)
        .writeStream.format("memory").queryName("res_out")
        .outputMode("update").start()
      try {
        var lastCount = 0
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        val all = spark.table("res_out").as[ReservoirSnapshot].collect().toSeq
        // per source, the LAST emitted generation is the final reservoir:
        // take rows whose n_source equals the max for that source
        all.groupBy(_.source).flatMap { case (_, rows) =>
          val maxN = rows.map(_.n_source).max
          rows.filter(_.n_source == maxN)
        }.toSeq
      } finally q.stop()
    }
  }

  it("matches q_sample_reservoir row-for-row on the full documents table") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("source", "doc_id").as[(String, Long)]
      .collect().map { case (s, id) => DocArrival(s, id) }.toSeq
    // split mid-source so state must carry across batches
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val got = lastSnapshot(Seq(b1, b2), Pipeline.RES_K)
      .map(r => (r.source, r.rank, r.doc_id, r.hk, r.n_source)).toSet
    val want = Pipeline.qSampleReservoir(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(1)))
      .map { case (src, rank, id, hk, n) => (src, rank, id, hk, n) }.toSet
    assert(got == want, s"stream reservoir diverged from batch:\n got=$got\nwant=$want")
  }

  it("is invariant to arrival order (hash-order reservoir, not Algorithm R)") {
    val docs = (1L to 40L).map(i => DocArrival("s", i))
    val a = lastSnapshot(Seq(docs), 5).map(r => (r.rank, r.doc_id)).toSet
    val b = lastSnapshot(Seq(docs.reverse.take(20), docs.reverse.drop(20)), 5)
      .map(r => (r.rank, r.doc_id)).toSet
    assert(a == b)
  }

  it("dedupes re-delivered ids: an overlapping backfill never perturbs the sample") {
    val docs = (1L to 60L).map(i => DocArrival("s", i))
    val clean = lastSnapshot(Seq(docs), 5)
    val cleanSample = clean.map(r => (r.rank, r.doc_id, r.hk)).toSet
    // at-least-once replay: a later batch re-delivers 30 already-ingested
    // ids — without the seen-set guard a duplicate (hk, id) occupied TWO
    // reservoir slots, evicting a legitimate k-th element
    val replayed = lastSnapshot(
      Seq(docs.take(40), docs.slice(10, 40) ++ docs.drop(40)), 5)
    assert(replayed.map(r => (r.rank, r.doc_id, r.hk)).toSet == cleanSample,
      s"replay perturbed the sample:\n clean=$clean\n replayed=$replayed")
    // re-delivering ids RESIDENT in the reservoir also leaves n exact
    // (only a replay of an already-evicted id re-counts — the documented
    // O(k)-state boundary)
    val residentReplay = lastSnapshot(
      Seq(docs, clean.map(r => DocArrival("s", r.doc_id)).toSeq), 5)
      .map(r => (r.rank, r.doc_id, r.hk, r.n_source)).toSet
    assert(residentReplay == clean.map(r => (r.rank, r.doc_id, r.hk, r.n_source)).toSet,
      "replay of reservoir-resident ids must change nothing, including n")
    assert(clean.forall(_.n_source == 60L))
  }

  it("pins the replay bound: an evicted-id replay over-counts n by exactly its " +
      "count and never perturbs the sample") {
    // The documented O(k)-state boundary (r12 VERDICT item 8): the SAMPLE
    // is exact min-k over distinct ids under ANY replay; `n` is exact
    // except for replays of already-EVICTED ids, each of which re-counts
    // once per re-delivery (exact distinct-n needs O(n) state). This test
    // pins both halves of that contract so a future "fix" can't silently
    // change it.
    val docs = (1L to 60L).map(i => DocArrival("s", i))
    val clean = lastSnapshot(Seq(docs), 5)
    val cleanSample = clean.map(r => (r.rank, r.doc_id, r.hk)).toSet
    val evictedIds = (1L to 60L).filterNot(clean.map(_.doc_id).toSet)
    assert(evictedIds.size == 55)
    // replay 3 evicted ids in a later batch
    val replayed = lastSnapshot(
      Seq(docs, evictedIds.take(3).map(DocArrival("s", _))), 5)
    // the sample is untouched...
    assert(replayed.map(r => (r.rank, r.doc_id, r.hk)).toSet == cleanSample,
      "evicted-id replay must not perturb the sample")
    // ...and n over-counts by EXACTLY the replayed-evicted arrivals
    assert(replayed.forall(_.n_source == 63L),
      s"n must over-count by exactly 3: ${replayed.map(_.n_source)}")
  }

  it("keeps O(k) state: a long stream still emits exactly k rows with the true n") {
    val docs = (1L to 200L).map(i => DocArrival("s", i))
    val snap = lastSnapshot(Seq(docs.take(90), docs.slice(90, 170), docs.drop(170)), 7)
    assert(snap.size == 7)
    assert(snap.forall(_.n_source == 200L))
    assert(snap.map(_.rank).sorted == (1 to 7))
  }
}
