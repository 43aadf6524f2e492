package graft.lineage

import graft.SparkTestBase
import graft.streaming.StreamOps.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** A streaming write must land in the SAME lineage feed as batch writes:
  * `QueryExecutionListener` never fires for Structured Streaming, so
  * this is the surface [[StreamingLineageListener]] exists for.
  */
class StreamingLineageSpec extends AnyFunSpec with SparkTestBase {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  describe("StreamingLineageListener") {
    it("records per-batch lineage (sources, sink, rows) for a streaming write") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      val sink = new InMemorySink
      val l = Lineage.installSync(spark, sink)
      val stream = MemoryStream[Ev]
      val q = stream.toDF()
        .select(col("user_id"), col("value"))
        .writeStream.format("memory").queryName("sl_out")
        .outputMode("append").start()
      try {
        stream.addData(Ev(1, 1, ts(100), 1.0), Ev(2, 2, ts(200), 2.0), Ev(3, 3, ts(300), 3.0))
        q.processAllAvailable()

        // the streaming listener bus is async — poll for the batch record
        assert(eventually()(sink.records.exists(r =>
          r.funcName.startsWith("streaming:") && r.rowsWritten.exists(_ > 0L))),
          s"no streaming progress record: ${sink.records.map(_.funcName)}")

        val rec = sink.records
          .find(r => r.funcName.startsWith("streaming:") && r.rowsWritten.exists(_ > 0L)).get
        assert(rec.status == "success")
        assert(rec.funcName.contains("sl_out"), rec.funcName)
        // input entity: the MemoryStream source, with its batch row count
        assert(rec.inputs.nonEmpty)
        val in = rec.inputs.head
        assert(in.kind == "stream")
        assert(in.name.contains("MemoryStream"), in.name)
        assert(in.rowsRead.contains(3L), s"rowsRead=${in.rowsRead}")
        // output entity: the memory sink
        assert(rec.output.exists(_.kind == "stream"))
        assert(rec.output.exists(_.name.toLowerCase.contains("memory")),
          rec.output.map(_.name).toString)
        assert(rec.rowsWritten.contains(3L))
        // column lineage: resolved from the micro-batch's
        // IncrementalExecution, same walk as batch writes
        assert(rec.outputColumns == Seq("user_id", "value"),
          s"outputColumns=${rec.outputColumns}")
        val byCol = rec.columnLineage.map(m => m.output -> m.sources).toMap
        assert(byCol.keySet == Set("user_id", "value"), byCol.toString)
        assert(byCol("user_id").exists(_.endsWith(".user_id")), byCol.toString)
        assert(byCol("value").exists(_.endsWith(".value")), byCol.toString)
        assert(rec.schemaFingerprint.nonEmpty)
      } finally {
        q.stop()
        Lineage.uninstall(spark, l)
      }
    }
  }
}
