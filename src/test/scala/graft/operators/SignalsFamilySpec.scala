package graft.operators

import graft.{SparkTestBase, Tables}
import graft.functions.HashFns
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Entropy signal, native session_window, fixed-budget sampling. */
class SignalsFamilySpec extends AnyFunSpec with SparkTestBase {

  it("q_text_entropy is bounded by ln(distinct) and matches a hand replay") {
    val rows = TextAnalysis.qTextEntropy(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, nd, h) =>
      assert(h >= -1e-9, s"negative entropy for doc $doc")
      assert(h <= math.log(nd.toDouble) + 1e-6, s"entropy above ln(distinct) for doc $doc")
    }
    // hand replay of the first doc
    val (doc, _, h) = rows.head
    val words = Tables.documents(spark, sfDir).filter(col("doc_id") === doc)
      .select("text").collect().head.getString(0).split(" ")
    val n = words.length.toDouble
    val exp = words.groupBy(identity).values.map(_.length / n)
      .map(p => -p * math.log(p)).sum
    val expR = BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(h - expR) <= 1e-6, s"doc $doc: $h vs $expR")
  }

  it("q_session_window sessions partition each user's events with >=30min separation") {
    val sessions = EventOps.qSessionWindow(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1), r.getAs[java.time.LocalDateTime](2),
        r.getLong(3)))
    val totalEvents = EventOps.events(spark, sfDir).count()
    assert(sessions.map(_._4).sum == totalEvents, "sessions must partition all events")
    sessions.groupBy(_._1).foreach { case (u, ss) =>
      val sorted = ss.sortBy(_._2.toString)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!b._2.isBefore(a._3),
            s"user $u sessions overlap/violate the gap: ${a._3} vs ${b._2}")
        case _ =>
      }
    }
  }

  it("q_sample_fixed returns exactly K docs and they are the true min-K of the hash order") {
    val got = Pipeline.qSampleFixed(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert(got.size == 100)
    val all = Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0))
    val expected = all.map(d => (HashFns.h60Local(s"fix:$d"), d))
      .sortBy(identity).take(100).map(_._2).toSet
    assert(got == expected)
  }
}
