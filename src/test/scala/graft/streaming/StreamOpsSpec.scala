package graft.streaming

import graft.SparkTestBase
import graft.streaming.StreamOps.{Ev, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

class StreamOpsSpec extends AnyFunSpec with SparkTestBase {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  describe("windowCounts (streaming)") {
    it("emits closed 1-hour windows in append mode once the watermark passes") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      val stream = MemoryStream[Ev]
      val q = StreamOps.windowCounts(
          stream.toDF().withColumn("event_type", lit("view")))
        .writeStream.format("memory").queryName("wc_out")
        .outputMode("append").start()
      try {
        // hour 0: three events; hour 1: one event
        stream.addData(Ev(1, 1, ts(100), 1.0), Ev(1, 2, ts(200), 2.0),
          Ev(2, 3, ts(300), 3.0), Ev(2, 4, ts(3700), 4.0))
        q.processAllAvailable()
        // advance watermark far past hour0+delay -> hour-0 window closes
        stream.addData(Ev(1, 5, ts(20000), 5.0))
        q.processAllAvailable()
        val rows = spark.table("wc_out")
          .select("hour_start", "event_type", "n", "sum_value").collect()
        assert(rows.exists { r =>
          r.getAs[java.time.LocalDateTime]("hour_start") ==
            java.time.LocalDateTime.ofEpochSecond(0, 0, java.time.ZoneOffset.UTC) &&
            r.getAs[Long]("n") == 3 && r.getAs[Double]("sum_value") == 6.0
        }, s"hour-0 window missing/wrong: ${rows.mkString(", ")}")
      } finally q.stop()
    }
  }

  describe("windowCounts (batch/stream parity)") {
    it("the same transform on the static events table matches the batch groupBy") {
      val ev = graft.operators.EventOps.events(spark, sfDir)
      val viaShared = StreamOps.windowCounts(ev)
        .orderBy("hour_start", "event_type").collect()
      val direct = ev
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour_start", "event_type").collect()
      assert(viaShared.sameElements(direct))
    }
  }

  describe("attributionJoin (stream-stream time-bounded join)") {
    it("joins purchases to in-horizon views only, across batches") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      val views = MemoryStream[Ev]
      val purchases = MemoryStream[Ev]
      val q = StreamOps.attributionJoin(views.toDF(), purchases.toDF())
        .writeStream.format("memory").queryName("attr_out")
        .outputMode("append").start()
      try {
        views.addData(Ev(1, 10, ts(1000), 0), Ev(1, 11, ts(2000), 0),
          Ev(2, 12, ts(1000), 0))
        purchases.addData(Ev(1, 90, ts(2500), 9.99)) // user 1, both views in range
        q.processAllAvailable()
        // a view 2h before the purchase must NOT match
        views.addData(Ev(3, 13, ts(10000), 0))
        purchases.addData(Ev(3, 91, ts(17500), 5.0)) // 7500s > 1h after view
        q.processAllAvailable()
        val rows = spark.table("attr_out")
          .select("purchase_id", "view_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(rows == Set((90L, 10L), (90L, 11L)),
          s"unexpected attribution set: $rows")
      } finally q.stop()
    }
  }

  describe("attributionJoinOuter (left-outer stream-stream join)") {
    it("emits unmatched purchases null-padded once the watermark closes their window") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      val views = MemoryStream[Ev]
      val purchases = MemoryStream[Ev]
      val q = StreamOps.attributionJoinOuter(views.toDF(), purchases.toDF())
        .writeStream.format("memory").queryName("attr_outer_out")
        .outputMode("append").start()
      try {
        views.addData(Ev(1, 10, ts(1000), 0))
        purchases.addData(
          Ev(1, 90, ts(2500), 9.99), // view 10 in range -> matched
          Ev(2, 91, ts(2500), 5.0))  // user 2 never views -> unmatched
        q.processAllAvailable()
        // advance BOTH watermarks far past purchase-ts + horizon so the
        // unmatched row's state is released null-padded
        views.addData(Ev(9, 98, ts(50000), 0))
        purchases.addData(Ev(9, 99, ts(50000), 0))
        q.processAllAvailable()
        val rows = spark.table("attr_outer_out")
          .select("purchase_id", "view_id").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
        assert(rows.contains((90L, 10L)), s"matched purchase missing: $rows")
        assert(rows.contains((91L, -1L)),
          s"unmatched purchase not emitted null-padded after watermark: $rows")
      } finally q.stop()
    }
  }

  describe("dedupStream (dropDuplicatesWithinWatermark)") {
    it("emits each key once, dropping re-arrivals within the horizon") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      val stream = MemoryStream[Ev]
      val q = StreamOps.dedupStream(stream.toDF(), "ts", Seq("event_id"))
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").start()
      try {
        stream.addData(Ev(1, 100, ts(10), 1.0), Ev(1, 100, ts(20), 2.0),
          Ev(2, 200, ts(30), 3.0))
        q.processAllAvailable()
        stream.addData(Ev(3, 100, ts(40), 4.0)) // dup again, same horizon
        q.processAllAvailable()
        val ids = spark.table("dedup_out").select("event_id", "value").collect()
          .map(r => (r.getLong(0), r.getDouble(1)))
        assert(ids.count(_._1 == 100) == 1, s"dup not dropped: ${ids.mkString(",")}")
        assert(ids.contains((100L, 1.0)), "must keep the FIRST arrival")
        assert(ids.exists(_._1 == 200L))
      } finally q.stop()
    }
  }

  describe("sessionize (flatMapGroupsWithState)") {
    it("closes sessions on gap and on event-time timeout") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      val stream = MemoryStream[Ev]
      val q = StreamOps.sessionize(stream.toDS(), gapSec = 1800)
        .writeStream.format("memory").queryName("sess_out")
        .outputMode("append").start()
      try {
        // user 7: two events 10 min apart -> one session; then an event
        // 2h later -> closes session 1 in-stream, opens session 2
        stream.addData(Ev(7, 1, ts(1000), 1.0), Ev(7, 2, ts(1600), 1.0))
        q.processAllAvailable()
        stream.addData(Ev(7, 3, ts(9000), 1.0))
        q.processAllAvailable()
        val afterGap = spark.table("sess_out").as[SessionOut].collect()
        assert(afterGap.exists(s =>
          s.user_id == 7 && s.sess_id == 1 && s.n_events == 2 &&
            s.duration_sec == 600.0 && s.sum_value == 2.0),
          s"gap-closed session missing: ${afterGap.mkString(", ")}")

        // advance watermark way past 9000+gap -> session 2 closes by TIMEOUT
        stream.addData(Ev(8, 9, ts(100000), 1.0))
        q.processAllAvailable()
        stream.addData(Ev(8, 10, ts(200000), 1.0))
        q.processAllAvailable()
        val afterTimeout = spark.table("sess_out").as[SessionOut].collect()
        assert(afterTimeout.exists(s =>
          s.user_id == 7 && s.sess_id == 2 && s.n_events == 1 && s.sum_value == 1.0),
          s"timeout-closed session missing: ${afterTimeout.mkString(", ")}")
      } finally q.stop()
    }

    it("matches the batch sessionizer on a replayed slice of real events") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      // take a deterministic slice of the real events table
      val slice = graft.operators.EventOps.events(spark, sfDir)
        .filter(col("user_id") <= 5)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
      assert(slice.nonEmpty)
      val stream = MemoryStream[Ev]
      val q = StreamOps.sessionize(stream.toDS())
        .writeStream.format("memory").queryName("sess_parity")
        .outputMode("append").start()
      try {
        stream.addData(slice.toIndexedSeq)
        q.processAllAvailable()
        // sentinel far in the future closes every open session via timeout
        stream.addData(Ev(-1, 0, ts(slice.last.ts.getTime / 1000 + 100000000), 0.0))
        q.processAllAvailable()
        stream.addData(Ev(-1, 1, ts(slice.last.ts.getTime / 1000 + 200000000), 0.0))
        q.processAllAvailable()
        val streamed = spark.table("sess_parity").as[SessionOut].collect()
          .filter(_.user_id >= 0)
          .map(s => (s.user_id, s.sess_id, s.n_events, math.round(s.duration_sec)))
          .toSet
        val batch = graft.operators.EventOps.qEventsSessionize(spark, sfDir)
          .filter(col("user_id") <= 5)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), math.round(r.getDouble(3))))
          .toSet
        assert(streamed == batch,
          s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
      } finally q.stop()
    }
  }

  describe("curateStream (incremental corpus curation)") {
    it("applies the batch quality gate, dedup and split rules incrementally") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      // low-quality text (no stopwords, tiny) must be gated; the
      // duplicated text must survive exactly once; splits must follow
      // the deterministic h60 rule
      val good = "the data of a table and the rows of a scan " * 5
      val docs = Seq(
        (1L, good + "one", 100L), (2L, "zz", 200L),
        (3L, good + "three", 300L), (4L, good + "one", 400L)) // dup of doc 1
      val stream = MemoryStream[(Long, String, Long)]
      val q = stream.toDF().toDF("doc_id", "text", "sec")
        .select(col("doc_id"), col("text"),
          col("sec").cast("timestamp").as("ts"))
        .transform(StreamOps.curateStream(_))
        .writeStream.format("memory").queryName("curate_out")
        .outputMode("append").start()
      try {
        stream.addData(docs: _*)
        q.processAllAvailable()
        val out = spark.table("curate_out")
          .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
        // doc 2 fails the quality gate; doc 4 is a duplicate of doc 1
        assert(out.keySet == Set(1L, 3L), s"curated set wrong: $out")
        // split matches the shared deterministic rule, engine-independent
        val expected = Seq(1L, 3L).toDF("doc_id")
          .select(col("doc_id"), graft.operators.Pipeline.splitCol.as("split"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(out == expected)
      } finally q.stop()
    }
  }

  describe("stateless transforms on streams") {
    it("Privacy.scrub redacts identically on a stream (projection = stream-safe)") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      val inputs = Seq(
        "reach me at a.b@mail.net",
        "hotline 555-867-5309 now",
        "server 10.1.2.3 down",
        "nothing sensitive here")
      val stream = MemoryStream[String]
      val q = stream.toDF().select(graft.operators.Privacy.scrub(col("value")).as("clean"))
        .writeStream.format("memory").queryName("scrub_out")
        .outputMode("append").start()
      try {
        stream.addData(inputs: _*)
        q.processAllAvailable()
        val streamed = spark.table("scrub_out").as[String].collect().sorted.toSeq
        val batch = inputs.toDF("value")
          .select(graft.operators.Privacy.scrub(col("value")).as("clean"))
          .as[String].collect().sorted.toSeq
        assert(streamed == batch, "stream/batch scrub divergence")
        assert(streamed.exists(_.contains("<EMAIL>")) &&
          streamed.exists(_.contains("<PHONE>")) && streamed.exists(_.contains("<IP>")))
      } finally q.stop()
    }

    it("batch-derived anomaly thresholds apply unchanged on a stream (stream-static join)") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      // thresholds trained in batch on the real events table — the
      // production shape: nightly stats, streamed probe
      val stats = graft.Tables.events(spark, sfDir)
        .groupBy("event_type")
        .agg(round(avg("value"), 6).as("mean_v"),
          round(stddev_samp("value"), 6).as("sd_v"))
      val replay = graft.Tables.events(spark, sfDir)
        .select("event_id", "event_type", "value")
        .limit(500)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      val stream = MemoryStream[(Long, String, Double)]
      val probed = stream.toDF().toDF("event_id", "event_type", "value")
        .join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"),
          (abs(col("value") - col("mean_v")) > col("sd_v") * 3).as("is_outlier"))
      val q = probed.writeStream.format("memory").queryName("anom_out")
        .outputMode("append").start()
      try {
        stream.addData(replay.toSeq: _*)
        q.processAllAvailable()
        val streamed = spark.table("anom_out")
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        val batch = graft.Tables.events(spark, sfDir)
          .select("event_id", "event_type", "value").limit(500)
          .join(broadcast(stats), Seq("event_type"))
          .select(col("event_id"),
            (abs(col("value") - col("mean_v")) > col("sd_v") * 3).as("is_outlier"))
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        assert(streamed == batch, "stream/batch anomaly verdict divergence")
        assert(streamed.values.exists(identity), "no outliers in the replayed slice")
      } finally q.stop()
    }

    it("the batch-trained linear probe scores a stream with identical margin signs") {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      // weights trained in batch (the nightly job); served as literals on
      // the stream — a 65-double artifact, the train-offline/score-online
      // shape for the embedding probe
      val wts = graft.operators.Similarity.probeWeights(spark, sfDir)
        .collect().head.getSeq[Double](0)
      val wArr = array(wts.map(lit): _*)
      def margin(x: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, wArr, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)
      val vecs = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      val stream = MemoryStream[(Long, Seq[Double])]
      val scored = stream.toDF().toDF("vec_id", "e")
        .select(col("vec_id"),
          (margin(concat(array(lit(1.0)), col("e"))) > 0.0).as("pred"))
      val q = scored.writeStream.format("memory").queryName("probe_out")
        .outputMode("append").start()
      try {
        stream.addData(vecs.toSeq: _*)
        q.processAllAvailable()
        val streamed = spark.table("probe_out")
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        val batch = graft.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"),
            (margin(concat(array(lit(1.0)), col("embedding").cast("array<double>"))) > 0.0)
              .as("pred"))
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        assert(streamed == batch, "stream/batch probe prediction divergence")
        assert(streamed.values.exists(identity) && streamed.values.exists(!_),
          "probe predictions degenerate on the replayed corpus")
      } finally q.stop()
    }
  }
}
