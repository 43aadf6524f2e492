package graft.lineage

import graft.meta.MetadataExtractor
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** The engine's heart: a `QueryExecutionListener` that turns every Spark
  * SQL action into a `LineageRecord` — inputs (with pruned columns),
  * output target, column-level lineage, schema fingerprint, run metrics —
  * and fans it out to the configured sinks.
  *
  * Guarantees: never throws into the query path; extraction is
  * driver-side plan walking only (zero executor/data-path overhead).
  */
final class LineageListener(sinks: Seq[LineageSink]) extends QueryExecutionListener {

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    safeEmit(build(funcName, qe, durationNs, None))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    safeEmit(build(funcName, qe, 0L, Some(exception)))

  private def safeEmit(r: => Option[LineageRecord]): Unit =
    try r.foreach(rec => sinks.foreach(s => try s.emit(rec) catch { case _: Throwable => () }))
    catch { case _: Throwable => () }

  private def build(
      funcName: String,
      qe: QueryExecution,
      durationNs: Long,
      error: Option[Exception]): Option[LineageRecord] = {
    val spark = qe.sparkSession
    val analyzed = qe.analyzed
    val body = PlanExtractor.queryBody(analyzed)
    val rows = try {
      qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    } catch { case _: Throwable => None }
    // Executed-plan metrics: numOutputBytes is populated by the write-path
    // stats tracker on the root command node; filesSize is each scan's
    // post-pruning input size — summed over scans = bytes read.
    val bytesOut = try {
      qe.executedPlan.metrics.get("numOutputBytes").map(_.value)
    } catch { case _: Throwable => None }
    val bytesIn = try {
      val vals = qe.executedPlan.collect {
        case p if p.metrics.contains("filesSize") => p.metrics("filesSize").value
      }
      if (vals.nonEmpty) Some(vals.sum) else None
    } catch { case _: Throwable => None }
    Some(LineageRecord(
      appId = spark.sparkContext.applicationId,
      appName = spark.sparkContext.appName,
      user = spark.sparkContext.sparkUser,
      funcName = funcName,
      status = if (error.isEmpty) "success" else "failure",
      error = error.map(e => Option(e.getMessage).getOrElse(e.getClass.getName)),
      durationNs = durationNs,
      timestampMs = System.currentTimeMillis(),
      inputs = PlanExtractor.inputs(analyzed),
      output = PlanExtractor.output(analyzed),
      outputColumns = body.output.map(_.name),
      columnLineage = ColumnLineage.forPlan(analyzed),
      schemaFingerprint = MetadataExtractor.schemaFingerprint(body.schema),
      rowsWritten = rows,
      bytesWritten = bytesOut,
      bytesRead = bytesIn))
  }
}

/** One-line enablement, mirroring the reference's install-and-forget UX.
  * Sinks are wrapped in [[AsyncSink]] so emission is non-blocking for the
  * query path; use `installSync` when deterministic in-line delivery is
  * wanted (tests).
  */
object Lineage {
  def install(spark: SparkSession, sinks: LineageSink*): LineageListener = {
    val effective = if (sinks.nonEmpty) sinks else Seq(new Slf4jSink)
    val l = new LineageListener(effective.map(new AsyncSink(_)))
    spark.listenerManager.register(l)
    l
  }

  /** Synchronous variant: records reach the given sinks on the listener
    * bus thread itself (still off the query's action thread). */
  def installSync(spark: SparkSession, sinks: LineageSink*): LineageListener = {
    val effective = if (sinks.nonEmpty) sinks else Seq(new Slf4jSink)
    val l = new LineageListener(effective)
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: LineageListener): Unit =
    spark.listenerManager.unregister(l)
}
