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
