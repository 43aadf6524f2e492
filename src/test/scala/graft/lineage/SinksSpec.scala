package graft.lineage

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

import scala.jdk.CollectionConverters._

class SinksSpec extends AnyFunSpec with SparkTestBase {

  private def record(id: String) = LineageRecord(
    appId = id, appName = "graft \"quoted\"\nname\t!", user = "tester",
    funcName = "save", status = "success", error = Some("line1\nline2"),
    durationNs = 42L, timestampMs = 1700000000000L,
    inputs = Seq(InputEntity("path", "/data/a.parquet", Some("parquet"), Seq("x", "y"))),
    output = Some(OutputEntity("path", "/out", Some("parquet"), Some("overwrite"))),
    outputColumns = Seq("x"),
    columnLineage = Seq(ColumnMapping("x", Seq("/data/a.parquet.x"))),
    schemaFingerprint = "ab" * 32, rowsWritten = Some(7L),
    bytesWritten = Some(1024L), bytesRead = Some(2048L))

  describe("JsonlFileSink") {
    it("writes strict one-record-per-line JSON that a standard parser accepts") {
      withTempDir { dir =>
        val path = s"${dir.getAbsolutePath}/lineage.jsonl"
        val sink = new JsonlFileSink(path)
        (0 until 3).foreach(i => sink.emit(record(s"app-$i")))
        sink.close()
        val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).asScala
        assert(lines.size == 3)
        val om = new ObjectMapper()
        lines.zipWithIndex.foreach { case (line, i) =>
          val node = om.readTree(line) // throws on malformed JSON
          assert(node.get("appId").asText() == s"app-$i")
          assert(node.get("appName").asText().contains("\"quoted\"\nname"))
          assert(node.get("rowsWritten").asLong() == 7L)
          assert(node.get("bytesWritten").asLong() == 1024L)
          assert(node.get("bytesRead").asLong() == 2048L)
          assert(node.get("inputs").get(0).get("columnsRead").get(1).asText() == "y")
          assert(node.get("columnLineage").get(0).get("output").asText() == "x")
        }
      }
    }
  }

  describe("AsyncSink") {
    it("delivers all records off-thread and drains on demand") {
      val mem = new InMemorySink
      val async = new AsyncSink(mem)
      val n = 200
      (0 until n).foreach(i => async.emit(record(s"a-$i")))
      async.drain()
      assert(mem.records.size == n)
      assert(mem.records.map(_.appId).toSet == (0 until n).map(i => s"a-$i").toSet)
      async.close()
    }

    it("survives a throwing delegate without propagating") {
      val async = new AsyncSink(new LineageSink {
        override def emit(r: LineageRecord): Unit = throw new RuntimeException("down")
      })
      (0 until 10).foreach(i => async.emit(record(s"x-$i")))
      async.drain()
      async.close() // no exception reaches the caller
    }

    it("counts drops when the queue is full instead of losing them silently") {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val mem = new InMemorySink
      val blocking = new LineageSink {
        override def emit(r: LineageRecord): Unit = { gate.await(); mem.emit(r) }
      }
      val async = new AsyncSink(blocking, capacity = 4)
      // worker takes 1 record and blocks in emit; 4 fill the queue; the
      // rest must be rejected-and-counted, never blocked on
      val sent = 20
      (0 until sent).foreach(i => async.emit(record(s"d-$i")))
      assert(eventually() { async.droppedCount > 0 })
      val droppedAtPeak = async.droppedCount
      assert(droppedAtPeak >= sent - 4 - 1 - 1) // queue + in-flight + race slack
      gate.countDown()
      async.drain()
      assert(eventually() { mem.records.size.toLong == sent - async.droppedCount })
      async.close()
      assert(async.abandonedCount == 0)
    }

    it("close() freezes the queue: abandoned records are never also delivered") {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val mem = new InMemorySink
      val blockFirst = new LineageSink {
        private val first = new java.util.concurrent.atomic.AtomicBoolean(true)
        override def emit(r: LineageRecord): Unit = {
          if (first.getAndSet(false)) gate.await()
          mem.emit(r)
        }
      }
      val async = new AsyncSink(blockFirst)
      val sent = 6
      (0 until sent).foreach(i => async.emit(record(s"c-$i")))
      // worker blocks inside emit on the first record; the rest stay
      // queued, so close()'s bounded drain gives up and must DISCARD
      // them — the pre-fix worker loop kept draining after close counted
      // them abandoned, delivering into a closed delegate (overcount)
      async.close()
      val abandonedAtClose = async.abandonedCount
      assert(abandonedAtClose >= sent - 2, s"abandoned=$abandonedAtClose")
      gate.countDown() // in-flight record (at most one) may still complete
      assert(eventually() {
        mem.records.size.toLong + async.abandonedCount == sent.toLong
      }, s"delivered=${mem.records.size} abandoned=${async.abandonedCount}")
      Thread.sleep(300) // and the accounting must STAY exact — no late redelivery
      assert(mem.records.size.toLong + async.abandonedCount == sent.toLong,
        s"late redelivery: delivered=${mem.records.size} abandoned=${async.abandonedCount}")
    }
  }
}
