package graft.lineage

import java.io.{BufferedWriter, FileWriter}
import scala.collection.mutable.ListBuffer

/** Pluggable lineage sinks. Emission must never fail or slow the query:
  * the listener wraps every emit in a catch-all, and file writes are
  * line-buffered appends on the driver (lineage volume is per-query, not
  * per-row — O(queries), trivially cheap even on a 1000-executor cluster).
  */
trait LineageSink {
  def emit(record: LineageRecord): Unit
  def close(): Unit = ()
}

/** Test/inspection sink. */
final class InMemorySink extends LineageSink {
  private val buf = ListBuffer.empty[LineageRecord]
  override def emit(r: LineageRecord): Unit = synchronized { buf += r }
  def records: Seq[LineageRecord] = synchronized { buf.toList }
  def clear(): Unit = synchronized { buf.clear() }
}

/** Newline-delimited JSON file sink (append). */
final class JsonlFileSink(path: String) extends LineageSink {
  private lazy val writer = new BufferedWriter(new FileWriter(path, true))
  override def emit(r: LineageRecord): Unit = synchronized {
    writer.write(r.toJson); writer.newLine(); writer.flush()
  }
  override def close(): Unit = synchronized { writer.close() }
}

/** Log sink (driver log line per query). */
final class Slf4jSink extends LineageSink {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.lineage")
  override def emit(r: LineageRecord): Unit = log.info(r.toJson)
}

/** HTTP catalog sink: POSTs lineage records to a catalog service as
  * newline-delimited JSON batches, with bounded retry.
  *
  * Batching is the scale story: lineage volume is O(queries), but a
  * 1000-session fleet pointed at one catalog endpoint still benefits
  * from amortizing connections — records accumulate until `batchSize`
  * (or `close()`/`flush()`), then ship as ONE request. Each batch is
  * retried up to `maxRetries` times with exponential backoff on IO
  * errors and 5xx; a 4xx is a permanent rejection (malformed/unauthorized
  * — retrying cannot help) and drops immediately. After retries are
  * exhausted the batch is dropped and COUNTED — same contract as
  * [[AsyncSink]]: lineage must never fail or backpressure the workload,
  * but lost records are always distinguishable from no records.
  *
  * `emit` blocks on I/O when it triggers a flush, so production use is
  * `HttpSink.async(...)` — the [[AsyncSink]] decorator moves all I/O to
  * its daemon thread and the query path costs one queue offer.
  *
  * Auth: real catalog endpoints sit behind a bearer token or API key.
  * `headers` is sent verbatim on every request; it defaults to
  * [[HttpSink.envAuthHeaders]], which reads `GRAFT_CATALOG_BEARER_TOKEN`
  * (→ `Authorization: Bearer ...`) / `GRAFT_CATALOG_API_KEY`
  * (→ `X-API-Key: ...`) from the environment — so pointing an installed
  * pipeline at an authenticated catalog is an env var, not a code change.
  */
final class HttpSink(
    endpoint: String,
    batchSize: Int = 64,
    maxRetries: Int = 3,
    retryBackoffMs: Long = 100,
    connectTimeoutMs: Int = 2000,
    readTimeoutMs: Int = 5000,
    format: LineageRecord => String = _.toJson,
    headers: Map[String, String] = HttpSink.envAuthHeaders) extends LineageSink {
  require(batchSize > 0 && maxRetries >= 0)
  private val url = java.net.URI.create(endpoint).toURL
  private val log = org.slf4j.LoggerFactory.getLogger("graft.lineage")
  private val buf = ListBuffer.empty[String]
  private val delivered = new java.util.concurrent.atomic.AtomicLong()
  private val retried = new java.util.concurrent.atomic.AtomicLong()
  private val failed = new java.util.concurrent.atomic.AtomicLong()

  override def emit(r: LineageRecord): Unit = synchronized {
    buf += format(r)
    if (buf.size >= batchSize) flushLocked()
  }

  /** Ship anything buffered now (close() calls this). */
  def flush(): Unit = synchronized { flushLocked() }

  private def flushLocked(): Unit = {
    if (buf.nonEmpty) {
      val batch = buf.toList
      buf.clear()
      val body = batch.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var attempt = 0
      var done = false
      while (!done) {
        post(body) match {
          case PostOk =>
            delivered.addAndGet(batch.size.toLong); done = true
          case PostReject(code) =>
            failed.addAndGet(batch.size.toLong)
            log.warn(s"HttpSink: catalog rejected batch with HTTP $code; ${batch.size} records dropped")
            done = true
          case PostRetryable(why) if attempt < maxRetries =>
            attempt += 1
            retried.incrementAndGet()
            Thread.sleep(retryBackoffMs << (attempt - 1))
            log.info(s"HttpSink: retry $attempt/$maxRetries after $why")
          case PostRetryable(why) =>
            failed.addAndGet(batch.size.toLong)
            log.warn(s"HttpSink: giving up after $maxRetries retries ($why); ${batch.size} records dropped")
            done = true
        }
      }
    }
  }

  private sealed trait PostResult
  private case object PostOk extends PostResult
  private case class PostReject(code: Int) extends PostResult
  private case class PostRetryable(why: String) extends PostResult

  private def post(body: Array[Byte]): PostResult =
    try {
      val c = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      try {
        c.setConnectTimeout(connectTimeoutMs)
        c.setReadTimeout(readTimeoutMs)
        c.setRequestMethod("POST")
        c.setRequestProperty("Content-Type", "application/x-ndjson")
        headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
        c.setFixedLengthStreamingMode(body.length)
        c.setDoOutput(true)
        val os = c.getOutputStream
        try { os.write(body); os.flush() } finally os.close()
        val code = c.getResponseCode
        if (code >= 200 && code < 300) PostOk
        else if (code >= 400 && code < 500) PostReject(code)
        else PostRetryable(s"HTTP $code")
      } finally c.disconnect()
    } catch { case e: java.io.IOException => PostRetryable(e.getClass.getSimpleName) }

  /** Records acknowledged (2xx) by the catalog. */
  def deliveredCount: Long = delivered.get()
  /** Batch retry attempts performed. */
  def retriedCount: Long = retried.get()
  /** Records dropped: 4xx-rejected or retries exhausted. */
  def failedCount: Long = failed.get()

  override def close(): Unit = flush()
}

object HttpSink {
  /** Auth headers from an env map: bearer token wins over API key; no
    * env → no extra headers. Factored over the raw map so the parse is
    * unit-testable without mutating the JVM's environment. */
  private[lineage] def authHeaders(env: Map[String, String]): Map[String, String] =
    env.get("GRAFT_CATALOG_BEARER_TOKEN").filter(_.nonEmpty)
      .map(t => Map("Authorization" -> s"Bearer $t"))
      .orElse(env.get("GRAFT_CATALOG_API_KEY").filter(_.nonEmpty)
        .map(k => Map("X-API-Key" -> k)))
      .getOrElse(Map.empty)

  /** The default `headers`: auth read from the process environment. */
  def envAuthHeaders: Map[String, String] = authHeaders(sys.env)

  /** The production composition: buffered+retrying HTTP behind the
    * non-blocking bounded queue. */
  def async(endpoint: String, batchSize: Int = 64, capacity: Int = 4096): AsyncSink =
    new AsyncSink(new HttpSink(endpoint, batchSize), capacity)

  /** Same composition speaking the OpenLineage RunEvent wire format —
    * point it at any OpenLineage-compatible collector (Marquez-style
    * `/api/v1/lineage` endpoints). Each record ships as a START +
    * COMPLETE/FAIL pair sharing a runId, so consumers compute run
    * durations server-side. */
  def asyncOpenLineage(endpoint: String, batchSize: Int = 64, capacity: Int = 4096): AsyncSink =
    new AsyncSink(new HttpSink(endpoint, batchSize, format = OpenLineage.toRunEventPair), capacity)
}

/** Async decorator: emits enqueue onto a bounded buffer drained by one
  * daemon thread, so the query path never blocks on sink I/O (a slow
  * HTTP/file sink costs the query an array offer, nothing more). Records
  * are dropped, never blocked on, if the buffer is full — lineage must
  * not backpressure the workload — but every drop is COUNTED and logged,
  * so lost lineage is distinguishable from no lineage: `droppedCount` is
  * offers rejected by a full queue, `abandonedCount` is records still
  * queued when close()'s bounded drain gave up.
  */
final class AsyncSink(delegate: LineageSink, capacity: Int = 4096) extends LineageSink {
  private val queue = new java.util.concurrent.LinkedBlockingQueue[LineageRecord](capacity)
  private val dropped = new java.util.concurrent.atomic.AtomicLong()
  private val abandoned = new java.util.concurrent.atomic.AtomicLong()
  private val log = org.slf4j.LoggerFactory.getLogger("graft.lineage")
  @volatile private var running = true
  private val worker = new Thread(new Runnable {
    def run(): Unit = while (running || !queue.isEmpty) {
      val r = queue.poll(50, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (r != null) try delegate.emit(r) catch { case _: Throwable => () }
    }
  }, "graft-lineage-async-sink")
  worker.setDaemon(true)
  worker.start()

  override def emit(r: LineageRecord): Unit =
    if (!queue.offer(r)) {
      val n = dropped.incrementAndGet()
      // log the first and every 1000th drop — a flood of drops must not
      // itself become the backpressure it exists to prevent
      if (n == 1L || n % 1000L == 0L)
        log.warn(s"AsyncSink queue full: $n lineage records dropped so far")
    }

  /** Offers rejected because the queue was full (records never enqueued). */
  def droppedCount: Long = dropped.get()

  /** Records still queued when close() abandoned its bounded drain. */
  def abandonedCount: Long = abandoned.get()

  /** Block (bounded) until everything enqueued so far is delivered. */
  def drain(timeoutMs: Long = 5000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!queue.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(5)
  }

  override def close(): Unit = {
    drain()
    // Stop the worker BEFORE closing the delegate and counting leftovers:
    // its loop keeps draining while the queue is non-empty, so counting
    // first would (a) overcount abandonment for records it still delivers
    // and (b) let it emit into an already-closed delegate. After the join
    // the queue is frozen; what drainTo removes is exactly what was
    // discarded.
    running = false
    worker.join(1000)
    val left = new java.util.ArrayList[LineageRecord]()
    queue.drainTo(left)
    if (!left.isEmpty) {
      abandoned.addAndGet(left.size.toLong)
      log.warn(s"AsyncSink closed with ${left.size} undelivered lineage records (drain timed out)")
    }
    delegate.close()
  }
}
