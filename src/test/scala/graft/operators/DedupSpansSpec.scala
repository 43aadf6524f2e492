package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Maximal duplicated-span merging (`q_dedup_spans`): adjacent shared
  * stride-1 windows merge into ONE span with exact word length/offsets,
  * disjoint copies stay separate spans, and the report reconciles with
  * the window census.
  */
class DedupSpansSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  private def words(n: Int, tag: String) =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  describe("spansOf") {

    it("a planted 40-word copy is ONE 40-word span, not 33 windows") {
      val copied = words(40, "c")
      val docs = Seq(
        (1L, s"${words(20, "a")} $copied ${words(20, "b")}"),
        (2L, s"${words(25, "x")} $copied")).toDF("doc_id", "text")
      val got = Dedup.spansOf(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got(1L) == ((1L, 40L, 40L)),
        s"doc 1 must report exactly one maximal 40-word span: ${got(1L)}")
      assert(got(2L) == ((1L, 40L, 40L)))
    }

    it("two disjoint copies stay two spans; longest picks the bigger") {
      val s1 = words(16, "p"); val s2 = words(24, "q")
      val docs = Seq(
        (1L, s"$s1 ${words(30, "f")} $s2"),
        (2L, s1), (3L, s2)).toDF("doc_id", "text")
      val d1 = Dedup.spansOf(docs).filter(col("doc_id") === 1L).collect()(0)
      assert(d1.getLong(1) == 2L, "two disjoint copies -> two spans")
      assert(d1.getLong(2) == 24L, "longest span is the 24-word copy")
      assert(d1.getLong(3) == 40L, "span words total 16 + 24")
    }

    it("documents with no shared window are absent; census reconciles") {
      val docs = Seq(
        (1L, words(30, "u")), // unique — no spans row
        (2L, words(12, "s")), (3L, words(12, "s"))).toDF("doc_id", "text")
      val spans = Dedup.spansOf(docs)
      assert(spans.filter(col("doc_id") === 1L).isEmpty)
      // doc 2/3 are full 12-word copies: one span of 12 words each, and
      // the census agrees that every window (12-8+1 = 5) is shared
      val d2 = spans.filter(col("doc_id") === 2L).collect()(0)
      assert(d2.getLong(1) == 1L && d2.getLong(2) == 12L)
      val census = Dedup.substringCensus(docs)
        .filter(col("doc_id") === 2L).collect()(0)
      assert(census.getLong(2) == 5L,
        "span of L words must equal L-SUB_N+1 shared windows in the census")
    }
  }
}
