package graft.lineage

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funspec.AnyFunSpec

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** OpenLineage RunEvent rendering: spec-shaped envelope, facet mapping,
  * deterministic runId, and wire delivery through the HTTP sink.
  */
class OpenLineageSpec extends AnyFunSpec {

  private val rich = LineageRecord(
    appId = "app-1", appName = "graft-app", user = "tester",
    funcName = "save", status = "success", error = None,
    durationNs = 5L, timestampMs = 1700000000000L,
    inputs = Seq(InputEntity("path", "/data/in.parquet", Some("parquet"),
      Seq("a", "b"), bytesRead = Some(2048L), rowsRead = Some(100L))),
    output = Some(OutputEntity("path", "/data/out.parquet", Some("parquet"), Some("overwrite"))),
    outputColumns = Seq("total"),
    columnLineage = Seq(ColumnMapping("total", Seq("/data/in.parquet.a", "/data/in.parquet.b"))),
    schemaFingerprint = "cd" * 32, rowsWritten = Some(42L), bytesWritten = Some(4096L))

  private def parse(s: String): JValue = JsonMethods.parse(s)

  describe("OpenLineage.toRunEvent") {

    it("renders a spec-shaped COMPLETE event with schema/stats/columnLineage facets") {
      val j = parse(OpenLineage.toRunEvent(rich))
      assert((j \ "eventType") == JString("COMPLETE"))
      assert((j \ "eventTime") == JString("2023-11-14T22:13:20Z"))
      assert((j \ "job" \ "namespace") == JString("graft"))
      assert((j \ "job" \ "name") == JString("graft-app.save"))
      // runId must be a UUID
      val JString(runId) = (j \ "run" \ "runId"): @unchecked
      assert(java.util.UUID.fromString(runId).toString == runId)
      // input dataset: file namespace, schema facet lists the pruned columns
      val JArray(List(in)) = (j \ "inputs"): @unchecked
      assert((in \ "namespace") == JString("file"))
      assert((in \ "name") == JString("/data/in.parquet"))
      val inCols = (in \ "facets" \ "schema" \ "fields" \\ "name")
      assert(inCols.children.collect { case JString(s) => s } == List("a", "b"))
      assert((in \ "inputFacets" \ "inputStatistics" \ "rowCount") == JInt(100))
      // output: statistics + per-field column lineage with split dataset/field
      val JArray(List(out)) = (j \ "outputs"): @unchecked
      assert((out \ "outputFacets" \ "outputStatistics" \ "rowCount") == JInt(42))
      assert((out \ "outputFacets" \ "outputStatistics" \ "size") == JInt(4096))
      val fields = out \ "facets" \ "columnLineage" \ "fields" \ "total" \ "inputFields"
      val srcs = fields.children.map(f =>
        ((f \ "name"), (f \ "field")))
      assert(srcs == List(
        (JString("/data/in.parquet"), JString("a")),
        (JString("/data/in.parquet"), JString("b"))))
      // every facet carries the spec's _producer/_schemaURL pair
      val JString(facetUrl) = (out \ "facets" \ "schema" \ "_schemaURL"): @unchecked
      assert(facetUrl.contains("openlineage.io/spec/facets"))
    }

    it("maps failures to FAIL with the errorMessage run facet") {
      val failed = rich.copy(status = "failure", error = Some("boom: stage 3"))
      val j = parse(OpenLineage.toRunEvent(failed))
      assert((j \ "eventType") == JString("FAIL"))
      assert((j \ "run" \ "facets" \ "errorMessage" \ "message") == JString("boom: stage 3"))
    }

    it("is deterministic: the same record renders byte-identical events") {
      assert(OpenLineage.toRunEvent(rich) == OpenLineage.toRunEvent(rich))
    }

    it("pairs a back-dated START with the terminal event under one runId") {
      val timed = rich.copy(durationNs = 2500000000L) // 2.5 s run
      val Array(startLine, completeLine) =
        OpenLineage.toRunEventPair(timed).split("\n")
      val start = parse(startLine)
      val complete = parse(completeLine)
      assert((start \ "eventType") == JString("START"))
      assert((complete \ "eventType") == JString("COMPLETE"))
      // matching runIds — the duration-computing consumer's join key
      assert((start \ "run" \ "runId") == (complete \ "run" \ "runId"))
      assert((start \ "run" \ "runId") != JNothing)
      // START is back-dated by the run duration
      assert((start \ "eventTime") == JString("2023-11-14T22:13:17.500Z"))
      assert((complete \ "eventTime") == JString("2023-11-14T22:13:20Z"))
      // inputs (known at start) present; outputs empty until the run ends
      assert((start \ "inputs").children.nonEmpty)
      assert((start \ "outputs").children.isEmpty)
      assert((start \ "job" \ "name") == JString("graft-app.save"))
    }

    it("pairs FAIL runs too, START at the same instant (failure records carry no duration)") {
      val failed = rich.copy(status = "failure", error = Some("boom"), durationNs = 0L)
      val Array(s, f) = OpenLineage.toRunEventPair(failed).split("\n")
      assert((parse(s) \ "eventType") == JString("START"))
      assert((parse(f) \ "eventType") == JString("FAIL"))
      assert((parse(s) \ "run" \ "runId") == (parse(f) \ "run" \ "runId"))
    }
  }

  describe("HttpSink with the OpenLineage dialect") {

    it("delivers parseable RunEvents to an in-process collector") {
      val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      val lines = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
      server.createContext("/api/v1/lineage", new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          body.split("\n").filter(_.nonEmpty).foreach(lines.add)
          ex.sendResponseHeaders(200, -1); ex.close()
        }
      })
      server.start()
      try {
        val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/lineage"
        val sink = HttpSink.asyncOpenLineage(url, batchSize = 2)
        sink.emit(rich)
        sink.emit(rich.copy(appId = "app-2"))
        sink.close()
        // each record ships as a START + COMPLETE pair
        assert(lines.size() == 4)
        val events = new java.util.ArrayList(lines)
        val types = events.stream().map(l => (parse(l) \ "eventType"))
          .toArray.toList
        assert(types == List(JString("START"), JString("COMPLETE"),
          JString("START"), JString("COMPLETE")))
        events.forEach { l =>
          val j = parse(l)
          assert((j \ "schemaURL") != JNothing)
          assert((j \ "run" \ "runId") != JNothing)
        }
        // within each pair the runIds match across the wire
        assert((parse(events.get(0)) \ "run" \ "runId") ==
          (parse(events.get(1)) \ "run" \ "runId"))
        assert((parse(events.get(2)) \ "run" \ "runId") ==
          (parse(events.get(3)) \ "run" \ "runId"))
        assert((parse(events.get(0)) \ "run" \ "runId") !=
          (parse(events.get(2)) \ "run" \ "runId"))
      } finally server.stop(0)
    }
  }
}
