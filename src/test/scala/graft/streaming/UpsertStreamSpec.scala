package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funspec.AnyFunSpec

/** foreachBatch streaming MERGE sink: per-batch latest-change reduction,
  * full-outer merge with the current table version, pointer-swap commit.
  * Proves cross-batch upsert/delete semantics, within-batch seq ordering,
  * and exactly-once table state across a checkpoint restart that replays
  * the stream.
  */
class UpsertStreamSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  type Ch = (Long, String, Double, Long) // key, op, value, seq

  def table(dir: java.io.File): Map[Long, Double] =
    StreamOps.upsertTableRead(spark, dir.getAbsolutePath)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  it("merges upserts and deletes across micro-batches with latest-seq-wins") {
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
          // batch 0: inserts, including a same-key conflict resolved by seq
          stream.addData((1L, "U", 10.0, 1L), (2L, "U", 20.0, 2L),
            (3L, "U", 30.0, 3L), (3L, "U", 31.0, 4L))
          q.processAllAvailable()
          assert(table(dir) == Map(1L -> 10.0, 2L -> 20.0, 3L -> 31.0),
            s"batch-0 state wrong: ${table(dir)}")
          // batch 1: update 1, delete 2, insert 4; late-seq delete of 3
          // loses to a later update in the same batch
          stream.addData((1L, "U", 11.0, 5L), (2L, "D", 0.0, 6L),
            (4L, "U", 40.0, 7L), (3L, "D", 0.0, 8L), (3L, "U", 32.0, 9L))
          q.processAllAvailable()
          assert(table(dir) == Map(1L -> 11.0, 3L -> 32.0, 4L -> 40.0),
            s"batch-1 state wrong: ${table(dir)}")
        } finally q.stop()
      }
    }
  }

  it("a restarted query replaying the last batch leaves the table unchanged (exactly-once)") {
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
          stream.addData((2L, "D", 0.0, 3L), (5L, "U", 5.0, 4L))
          q1.processAllAvailable()
        } finally q1.stop()
        val before = table(dir)
        assert(before == Map(1L -> 1.0, 5L -> 5.0), s"pre-restart state: $before")
        // restart on the same checkpoint: committed offsets replay nothing
        // new; the committed table version must be byte-stable
        val q2 = run()
        try q2.processAllAvailable()
        finally q2.stop()
        assert(table(dir) == before, "restart mutated the committed table")
      }
    }
  }

  it("refuses a FRESH checkpoint attached to a live table instead of dropping its first batch") {
    implicit val sql = spark.sqlContext
    withTempDir { dir =>
      withTempDir { ckpt1 =>
        val s1 = MemoryStream[Ch]
        val q1 = StreamOps.upsertStream(
            s1.toDF().toDF("key", "op", "value", "seq"), dir.getAbsolutePath)
          .option("checkpointLocation", ckpt1.getAbsolutePath).start()
        try {
          s1.addData((1L, "U", 1.0, 1L))
          q1.processAllAvailable()
        } finally q1.stop()
        val committed = table(dir)
        assert(committed == Map(1L -> 1.0))
        // A brand-new checkpoint restarts batchIds at 0 while _CURRENT
        // still names v0. Pre-fix this skipped "replay" and silently
        // discarded the batch; now the foreign owner is refused and the
        // committed state is untouched.
        withTempDir { ckpt2 =>
          val s2 = MemoryStream[Ch]
          val q2 = StreamOps.upsertStream(
              s2.toDF().toDF("key", "op", "value", "seq"), dir.getAbsolutePath)
            .option("checkpointLocation", ckpt2.getAbsolutePath).start()
          s2.addData((9L, "U", 9.0, 1L))
          val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            q2.processAllAvailable()
            q2.awaitTermination()
          }
          def causes(t: Throwable): Seq[Throwable] =
            Option(t).toSeq.flatMap(c => c +: causes(c.getCause))
          assert(causes(failed).exists(_.isInstanceOf[IllegalStateException]),
            s"expected ownership refusal, got: $failed")
          assert(table(dir) == committed,
            "a refused foreign stream must not mutate the table")
        }
      }
    }
  }
}
