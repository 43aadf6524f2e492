package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funspec.AnyFunSpec

import StreamOps.{HitterEstimate, TokenArrival}

/** transformWithState Misra–Gries heavy hitters: the MG guarantees
  * (never overcounts, the > N/(k+1) survivor rule, bounded undercount),
  * cross-batch state accumulation, and shard routing.
  */
class HeavyHittersStreamSpec extends AnyFunSpec with SparkTestBase {

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

  /** Run batches through the processor; returns every emitted snapshot
    * row in emission order. */
  private def run(k: Int, batches: Seq[Seq[String]]): Seq[Seq[HitterEstimate]] = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[TokenArrival]
      val q = StreamOps.heavyHittersStream(in.toDS(), k)
        .writeStream.format("memory").queryName("hh_out")
        .outputMode("update").start()
      try {
        val out = Seq.newBuilder[Seq[HitterEstimate]]
        var seen = 0L
        batches.foreach { b =>
          in.addData(b.map(t => TokenArrival(math.floorMod(t.hashCode, 2), t)))
          q.processAllAvailable()
          val all = spark.table("hh_out").as[HitterEstimate].collect().toSeq
          out += all.drop(seen.toInt)
          seen = all.size.toLong
        }
        out.result()
      } finally q.stop()
    }
  }

  it("is an exact counter while distinct tokens fit k, accumulating across batches") {
    val snaps = run(k = 10, Seq(
      Seq.fill(5)("hot") ++ Seq("a", "b"),
      Seq.fill(3)("hot") ++ Seq("c")))
    val last = snaps.last.map(h => h.token -> h.est).toMap
    assert(last("hot") == 8L, s"expected hot=8 in $last") // 5 + 3 across batches
    assert(last("c") == 1L)
  }

  it("evicts via the (k+1)-th-largest dock and keeps every guaranteed hitter") {
    val batch = Seq.fill(6)("x") ++ Seq.fill(4)("y") ++ Seq.fill(3)("z") ++ Seq("w")
    // single shard so the summary math is checkable by hand
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val snaps = withRocksDb {
      val in = MemoryStream[TokenArrival]
      val q = StreamOps.heavyHittersStream(in.toDS(), 2)
        .writeStream.format("memory").queryName("hh_one")
        .outputMode("update").start()
      try {
        in.addData(batch.map(t => TokenArrival(0, t)))
        q.processAllAvailable()
        spark.table("hh_one").as[HitterEstimate].collect().toSeq
      } finally q.stop()
    }
    val got = snaps.map(h => h.token -> h.est).toMap
    // merged: x=6 y=4 z=3 w=1; k=2 -> dock by 3rd largest (z=3): x->3, y->1
    assert(got == Map("x" -> 3L, "y" -> 1L), s"unexpected summary $got")
    // MG guarantee: N=14, k=2 -> anything with freq > 14/3 must survive (x)
    assert(got.contains("x"))
    // estimates never exceed true counts
    assert(got("x") <= 6 && got("y") <= 4)
  }

  it("routes a token to one shard only (counts never split)") {
    val snaps = run(k = 4, Seq(Seq.fill(7)("solo") ++ Seq("p", "q", "r")))
    val soloRows = snaps.last.filter(_.token == "solo")
    assert(soloRows.map(_.shard).distinct.length == 1)
    assert(soloRows.head.est == 7L)
  }
}
