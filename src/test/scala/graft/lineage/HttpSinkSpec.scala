package graft.lineage

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funspec.AnyFunSpec

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

/** HttpSink against an in-process catalog stand-in (zero egress): batch
  * delivery, retry-then-success on 5xx, retry-then-drop accounting, 4xx
  * permanent rejection, and the non-blocking AsyncSink composition.
  */
class HttpSinkSpec extends AnyFunSpec {

  private def record(i: Int): LineageRecord = LineageRecord(
    appId = s"run-$i", appName = "graft-test", user = "tester",
    funcName = "save", status = "success", error = None,
    durationNs = i.toLong, timestampMs = 1700000000000L,
    inputs = Seq(InputEntity("path", "/data/a.parquet", Some("parquet"), Seq("x"))),
    output = None, outputColumns = Seq("x"),
    columnLineage = Nil, schemaFingerprint = "ab" * 32, rowsWritten = None)

  /** Start a one-endpoint server; `status` decides each response code.
    * Returns (url, received-lines buffer, request counter, stop fn). */
  private def withServer[T](status: Int => Int)(
      f: (String, java.util.List[String], AtomicInteger) => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val lines = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val requests = new AtomicInteger()
    server.createContext("/lineage", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val code = status(requests.incrementAndGet())
        if (code >= 200 && code < 300)
          body.split("\n").filter(_.nonEmpty).foreach(lines.add)
        ex.sendResponseHeaders(code, -1)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/lineage", lines, requests)
    finally server.stop(0)
  }

  describe("HttpSink") {

    it("batches records into ndjson POSTs and flushes the remainder on close") {
      withServer(_ => 200) { (url, lines, requests) =>
        val sink = new HttpSink(url, batchSize = 4)
        (1 to 10).foreach(i => sink.emit(record(i)))
        sink.close()
        assert(lines.size() == 10)
        assert(requests.get() == 3) // 4 + 4 + 2 (close flush)
        assert(sink.deliveredCount == 10 && sink.failedCount == 0)
        assert(lines.asScala.exists(_.contains("\"run-1\"")))
      }
    }

    it("retries 5xx with backoff and delivers once the catalog recovers") {
      withServer(n => if (n <= 2) 503 else 200) { (url, lines, _) =>
        val sink = new HttpSink(url, batchSize = 1, retryBackoffMs = 1)
        sink.emit(record(1))
        assert(lines.size() == 1)
        assert(sink.deliveredCount == 1)
        assert(sink.retriedCount == 2)
        assert(sink.failedCount == 0)
      }
    }

    it("drops and counts the batch after retries are exhausted, without throwing") {
      withServer(_ => 500) { (url, lines, requests) =>
        val sink = new HttpSink(url, batchSize = 2, maxRetries = 2, retryBackoffMs = 1)
        (1 to 4).foreach(i => sink.emit(record(i)))
        sink.close()
        assert(lines.size() == 0)
        assert(sink.failedCount == 4)
        assert(sink.deliveredCount == 0)
        assert(requests.get() == 6) // 2 batches x (1 try + 2 retries)
      }
    }

    it("treats 4xx as a permanent rejection: no retry, counted dropped") {
      withServer(_ => 400) { (url, _, requests) =>
        val sink = new HttpSink(url, batchSize = 1, retryBackoffMs = 1)
        sink.emit(record(1))
        assert(sink.failedCount == 1 && sink.retriedCount == 0)
        assert(requests.get() == 1)
      }
    }

    it("counts connection failures as retryable then dropped (no listening server)") {
      // a bound-then-closed port: connection refused is an IOException
      val dead = {
        val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p
      }
      val sink = new HttpSink(s"http://127.0.0.1:$dead/lineage",
        batchSize = 1, maxRetries = 1, retryBackoffMs = 1)
      sink.emit(record(1)) // must not throw
      assert(sink.failedCount == 1 && sink.retriedCount == 1)
    }

    it("sends configured auth headers on every request") {
      val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      val auths = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
      server.createContext("/lineage", new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          auths.add(String.valueOf(ex.getRequestHeaders.getFirst("Authorization")))
          ex.sendResponseHeaders(200, -1); ex.close()
        }
      })
      server.start()
      try {
        val url = s"http://127.0.0.1:${server.getAddress.getPort}/lineage"
        val sink = new HttpSink(url, batchSize = 1,
          headers = Map("Authorization" -> "Bearer tok-123"))
        sink.emit(record(1))
        sink.emit(record(2))
        assert(auths.asScala.toList == List("Bearer tok-123", "Bearer tok-123"))
      } finally server.stop(0)
    }

    it("derives auth headers from the environment map: bearer wins, empty values ignored") {
      assert(HttpSink.authHeaders(Map.empty) == Map.empty)
      assert(HttpSink.authHeaders(Map("GRAFT_CATALOG_BEARER_TOKEN" -> "t1")) ==
        Map("Authorization" -> "Bearer t1"))
      assert(HttpSink.authHeaders(Map("GRAFT_CATALOG_API_KEY" -> "k1")) ==
        Map("X-API-Key" -> "k1"))
      assert(HttpSink.authHeaders(Map(
        "GRAFT_CATALOG_BEARER_TOKEN" -> "t1", "GRAFT_CATALOG_API_KEY" -> "k1")) ==
        Map("Authorization" -> "Bearer t1"))
      assert(HttpSink.authHeaders(Map("GRAFT_CATALOG_BEARER_TOKEN" -> "")) == Map.empty)
    }

    it("composes with AsyncSink: emit never blocks on the wire, close drains") {
      withServer(_ => 200) { (url, lines, _) =>
        val sink = HttpSink.async(url, batchSize = 8)
        (1 to 20).foreach(i => sink.emit(record(i)))
        sink.close() // drains the queue, flushes the HTTP buffer
        assert(lines.size() == 20)
        assert(sink.droppedCount == 0 && sink.abandonedCount == 0)
      }
    }
  }
}
