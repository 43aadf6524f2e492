package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funspec.AnyFunSpec

/** Versioned-table lifecycle around [[StreamOps.upsertStream]]: the
  * pointer-flip crash window (offsets not yet committed but `_CURRENT`
  * already moved — the replayed batch must short-circuit, not try to
  * overwrite the version dir it is reading), time-travel reads of
  * historical versions, and retention GC that never deletes the version
  * `_CURRENT` names.
  */
class UpsertTableVersionsSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  type Ch = (Long, String, Double, Long) // key, op, value, seq

  def table(dir: java.io.File): Map[Long, Double] =
    StreamOps.upsertTableRead(spark, dir.getAbsolutePath)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  it("recovers from a crash between pointer flip and offsets commit") {
    implicit val sql = spark.sqlContext
    withTempDir { dir =>
      withTempDir { ckpt =>
        val stream = MemoryStream[Ch]
        def run() = StreamOps.upsertStream(
            stream.toDF().toDF("key", "op", "value", "seq"),
            dir.getAbsolutePath)
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .start()
        val q1 = run()
        try {
          stream.addData((1L, "U", 1.0, 1L), (2L, "U", 2.0, 2L))
          q1.processAllAvailable()
        } finally q1.stop()
        val committed = table(dir)
        assert(committed == Map(1L -> 1.0, 2L -> 2.0))
        // Simulate the documented crash window: the table committed
        // (v0 written, _CURRENT flipped) but the engine died before the
        // offsets commit landed — deleting commits/0 makes the restart
        // replay batch 0 while _CURRENT already names v0. Without the
        // short-circuit, the replay reads v0 via upsertTableRead and
        // overwrites the same path in one job, which Spark rejects and
        // recovery crash-loops.
        val commit0 = new java.io.File(ckpt, "commits/0")
        assert(commit0.exists(), "test setup: expected commits/0")
        assert(commit0.delete())
        new java.io.File(ckpt, "commits/.0.crc").delete() // stale checksum
        val q2 = run()
        try {
          q2.processAllAvailable()
          assert(table(dir) == committed,
            "replayed batch mutated the committed table")
          // and the stream keeps working after the recovery
          stream.addData((3L, "U", 3.0, 3L))
          q2.processAllAvailable()
          assert(table(dir) == committed + (3L -> 3.0))
        } finally q2.stop()
      }
    }
  }

  it("time-travels to any retained version and lists versions ascending") {
    implicit val sql = spark.sqlContext
    withTempDir { dir =>
      withTempDir { ckpt =>
        val stream = MemoryStream[Ch]
        val q = StreamOps.upsertStream(
            stream.toDF().toDF("key", "op", "value", "seq"),
            dir.getAbsolutePath)
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .start()
        try {
          stream.addData((1L, "U", 1.0, 1L))
          q.processAllAvailable()
          stream.addData((1L, "U", 9.0, 2L), (2L, "U", 2.0, 3L))
          q.processAllAvailable()
        } finally q.stop()
        val path = dir.getAbsolutePath
        assert(StreamOps.upsertTableVersions(path) == Seq(0L, 1L))
        val v0 = StreamOps.upsertTableReadVersion(spark, path, 0L)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(v0 == Map(1L -> 1.0), "version-0 snapshot drifted")
        assert(table(dir) == Map(1L -> 9.0, 2L -> 2.0))
      }
    }
  }

  it("vacuum keeps the newest K versions and never the _CURRENT target") {
    implicit val sql = spark.sqlContext
    withTempDir { dir =>
      withTempDir { ckpt =>
        val stream = MemoryStream[Ch]
        val q = StreamOps.upsertStream(
            stream.toDF().toDF("key", "op", "value", "seq"),
            dir.getAbsolutePath)
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .start()
        try {
          (0 to 2).foreach { i =>
            stream.addData((i.toLong, "U", i.toDouble, i.toLong))
            q.processAllAvailable()
          }
        } finally q.stop()
        val path = dir.getAbsolutePath
        assert(StreamOps.upsertTableVersions(path) == Seq(0L, 1L, 2L))
        val deleted = StreamOps.vacuumUpsertTable(path, keep = 1)
        assert(deleted == Seq(0L, 1L))
        assert(StreamOps.upsertTableVersions(path) == Seq(2L))
        assert(table(dir) == Map(0L -> 0.0, 1L -> 1.0, 2L -> 2.0),
          "vacuum changed the current table contents")
        // a stale _CURRENT (reader-in-flight model) is never deleted:
        // point it back at the oldest surviving version, add more, GC
        java.nio.file.Files.write(
          new java.io.File(dir, "_CURRENT").toPath, "v2".getBytes)
        java.nio.file.Files.createDirectories(
          new java.io.File(dir, "v9").toPath)
        val deleted2 = StreamOps.vacuumUpsertTable(path, keep = 1)
        assert(!deleted2.contains(2L) &&
          StreamOps.upsertTableVersions(path).contains(2L),
          "_CURRENT's version must survive any retention policy")
      }
    }
  }
}
