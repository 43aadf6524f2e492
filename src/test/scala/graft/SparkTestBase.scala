package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** One shared local SparkSession for the whole forked test JVM — session
  * startup is ~5 s, so suites must not build their own.
  */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // nanosAsLong: no-op on TIMESTAMP(MICROS) data, kept so a regenerated
    // TIMESTAMP(NANOS) events file still reads; see EventOps.events
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .getOrCreate()
}

trait SparkTestBase { self: Suite =>
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smallest driver-generated dataset — correctness, not throughput. */
  val sfDir = "/root/testdata/sf0.001"

  /** Poll until `cond` holds (the execution-listener bus is async).
    * 30 s default: late in the full suite the shared session's listener
    * bus can lag well past 10 s under co-tenant load — a one-flake-per-
    * hundred-runs class observed on the listener specs. */
  def eventually(timeoutMs: Long = 30000, intervalMs: Long = 20)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var ok = cond
    while (!ok && System.currentTimeMillis() < deadline) {
      Thread.sleep(intervalMs); ok = cond
    }
    ok
  }

  def withTempDir[T](f: java.io.File => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-test").toFile
    try f(dir)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(dir)
    }
  }
}
