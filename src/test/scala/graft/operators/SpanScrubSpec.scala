package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Applied unaligned span scrub (`q_span_scrub`): the canonical doc
  * keeps its text, later copies lose exactly the copied span, unique
  * text survives, and the census reconciles with the span report.
  */
class SpanScrubSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  private def words(n: Int, tag: String) =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  it("cuts the copied span from the later doc only, word-exactly") {
    val copied = words(24, "c")
    val docs = Seq(
      (1L, s"${words(10, "a")} $copied"),
      (2L, s"${words(10, "b")} $copied ${words(5, "z")}"))
      .toDF("doc_id", "text")
    val got = Dedup.spanScrubOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((34L, 34L, 0L)), s"owner doc must keep everything: ${got(1L)}")
    assert(got(2L) == ((39L, 15L, 24L)),
      s"later doc must lose exactly the 24 copied words: ${got(2L)}")
  }

  it("short docs (< SUB_N words) and unique docs pass through untouched") {
    val docs = Seq(
      (1L, "tiny doc here"),
      (2L, words(30, "u"))).toDF("doc_id", "text")
    val got = Dedup.spanScrubOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L), s"nothing shared -> nothing cut: $got")
  }

  it("overlapping shared windows merge into one covered interval (no double-cut)") {
    // doc2's shared window starts are {1, 4}: intervals [1,8] and [4,11]
    // overlap, so the island scan must merge them into ONE covered span
    // 1..11 — doc2 (11 words) is cut in full, exactly once per word.
    val s = (1 to 8).map(i => s"s$i").mkString(" ")
    val owner = s"$s X ${(4 to 8).map(i => s"s$i").mkString(" ")} t1 t2 t3"
    val copier = s"$s t1 t2 t3"
    val docs = Seq((1L, owner), (2L, copier)).toDF("doc_id", "text")
    val got = Dedup.spanScrubOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L)._3 == 0L, s"owner keeps all: ${got(1L)}")
    assert(got(2L) == ((11L, 0L, 11L)),
      s"both overlapping spans cut, each word once: ${got(2L)}")
  }

  it("full copies collapse to the canonical text; cut totals match the span report") {
    val t = words(16, "s")
    val docs = Seq((1L, t), (2L, t), (3L, t)).toDF("doc_id", "text")
    val scrub = Dedup.spanScrubOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scrub == Map(1L -> 0L, 2L -> 16L, 3L -> 16L))
    // spans report says docs 2/3 carry one 16-word span each — the cut
    // word count equals the span coverage (spans don't overlap here)
    val spans = Dedup.spansOf(docs).filter(col("doc_id") > 1).collect()
    spans.foreach(r => assert(r.getLong(2) == 16L))
  }
}
