package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Session path mining (`q_session_paths`): gap-splitting, event-time
  * ordering, path truncation, and census conservation against the
  * sessionizer.
  */
class SessionPathsSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def pathsOf(rows: Seq[(Long, Long, java.sql.Timestamp, String)]) =
    EventOps.sessionPathsOf(rows.toDF("user_id", "event_id", "ts", "event_type"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  describe("sessionPathsOf") {

    it("splits on the 30-minute gap and orders by event time within a session") {
      val got = pathsOf(Seq(
        (1L, 2L, ts(100), "B"), // out-of-order arrival: ts decides the path
        (1L, 1L, ts(50), "A"),
        (1L, 3L, ts(50 + 1801 + 100), "C"))) // past the gap -> new session
      assert(got == Map("A>B" -> ((1L, 2.0)), "C" -> ((1L, 1.0))))
    }

    it("truncates the path at PATH_CAP but counts the full session length") {
      val rows = (1 to 12).map(i => (1L, i.toLong, ts(i * 10L), s"e$i"))
      val got = pathsOf(rows)
      val (path, (n, len)) = got.head
      assert(got.size == 1 && n == 1L && len == 12.0)
      assert(path == (1 to EventOps.PATH_CAP).map(i => s"e$i").mkString(">"),
        s"path must keep the first ${EventOps.PATH_CAP} events: $path")
    }

    it("ties (same ts) break by event_id, deterministically") {
      val got = pathsOf(Seq(
        (1L, 2L, ts(100), "B"), (1L, 1L, ts(100), "A")))
      assert(got.keySet == Set("A>B"))
    }

    it("q_active_users: wau bounds dau, first day has no history, and a spot day recomputes") {
      val rows = EventOps.qActiveUsers(spark, sfDir).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(2) >= r.getLong(1), s"wau < dau: $r"))
      val first = rows.minBy(_.getAs[java.time.LocalDateTime](0))
      assert(first.getLong(1) == first.getLong(2), "day 1's trailing week IS day 1")
      // spot-check one mid-series day against a direct trailing-window count
      val mid = rows(rows.length / 2)
      val d = mid.getAs[java.time.LocalDateTime](0)
      val ev = EventOps.events(spark, sfDir)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      val direct = ev.filter(
          col("day") <= lit(java.sql.Timestamp.valueOf(d)) &&
          col("day") > lit(java.sql.Timestamp.valueOf(d.minusDays(7))))
        .select("user_id").distinct().count()
      assert(mid.getLong(2) == direct, s"wau(${d}) = ${mid.getLong(2)} vs direct $direct")
    }

    it("bounds per-session agg state at PATH_CAP (10k-event bot session)") {
      // one bot emitting every 10 s forever is ONE session; the collect
      // must buffer only the first PATH_CAP structs, not the history
      val rows = (1 to 10000).map(i => (7L, i.toLong, ts(i * 10L), s"e${i % 5}"))
      val df = EventOps.sessionPathsOf(
        rows.toDF("user_id", "event_id", "ts", "event_type"))
      val got = df.collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got.size == 1)
      val (path, (n, len)) = got.head
      assert(n == 1L && len == 10000.0, "len must still count the whole session")
      assert(path == (1 to EventOps.PATH_CAP).map(i => s"e${i % 5}").mkString(">"))
      // and the PLAN proves it: the collected struct is gated by the
      // row_number cap, so per-group state is O(PATH_CAP) by construction
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("collect_list(CASE WHEN"),
        s"collect_list must be capped by the rank predicate:\n$plan")
    }

    it("on the sf events: session census conserves against the sessionizer") {
      val full = EventOps.sessionPathsOf(EventOps.events(spark, sfDir))
      val nSessions = full.agg(sum("n_sessions")).head().getLong(0)
      val direct = EventOps.qEventsSessionize(spark, sfDir).count()
      assert(nSessions == direct,
        s"paths cover $nSessions sessions, sessionizer has $direct")
      // every reported path depth respects the cap
      val maxDepth = full
        .select(max(size(split(col("path"), ">")))).head().getInt(0)
      assert(maxDepth <= EventOps.PATH_CAP)
    }
  }
}
