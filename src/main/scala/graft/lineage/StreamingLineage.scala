package graft.lineage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming half of the lineage surface: `QueryExecutionListener` never
  * fires for Structured Streaming writes, so without this bridge every
  * incremental pipeline runs invisible to the engine's own lineage
  * records. Each `StreamingQueryProgress` (one per micro-batch) becomes a
  * `LineageRecord`: sources with per-source rows read, the sink as output
  * entity, rows written, and the trigger's execution time. A terminated
  * query with an exception emits a failure record.
  *
  * Installed alongside the batch listener by [[Lineage.install]] (and so
  * by `graft.plans.GraftExtensions`); shares the same sinks, so one
  * consumer sees batch and streaming lineage in one feed.
  */
final class StreamingLineageListener private (
    appId: String, appName: String, user: String, sinks: Seq[LineageSink])
  extends StreamingQueryListener {

  // capture identity STRINGS, never the session: streaming listeners end
  // up on the SparkContext-wide listener bus, so a session reference here
  // would pin every churned session against GC (and defeat the weak-keyed
  // registries in Lineage/GraftExtensions)
  def this(spark: SparkSession, sinks: Seq[LineageSink]) =
    this(spark.sparkContext.applicationId, spark.sparkContext.appName,
      spark.sparkContext.sparkUser, sinks)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    safeEmit {
      val p = e.progress
      val inputs = p.sources.toSeq.map { s =>
        InputEntity("stream", s.description, None, Nil,
          rowsRead = Some(s.numInputRows).filter(_ >= 0L))
      }
      val rowsOut = Option(p.sink).map(_.numOutputRows).filter(_ >= 0L)
      val durNs = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue() * 1000000L).getOrElse(0L)
      LineageRecord(
        appId = appId,
        appName = appName,
        user = user,
        funcName = s"streaming:${p.name}:batch=${p.batchId}",
        status = "success",
        error = None,
        durationNs = durNs,
        timestampMs = System.currentTimeMillis(),
        inputs = inputs,
        output = Option(p.sink).map(s => OutputEntity("stream", s.description, None, None)),
        outputColumns = Nil,
        columnLineage = Nil,
        schemaFingerprint = "",
        rowsWritten = rowsOut)
    }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    e.exception.foreach { err =>
      safeEmit(LineageRecord(
        appId = appId,
        appName = appName,
        user = user,
        funcName = s"streaming:run=${e.runId}",
        status = "failure",
        error = Some(err),
        durationNs = 0L,
        timestampMs = System.currentTimeMillis(),
        inputs = Nil, output = None, outputColumns = Nil,
        columnLineage = Nil, schemaFingerprint = "", rowsWritten = None))
    }

  private def safeEmit(r: => LineageRecord): Unit =
    try {
      val rec = r
      sinks.foreach(s => try s.emit(rec) catch { case _: Throwable => () })
    } catch { case _: Throwable => () }
}
