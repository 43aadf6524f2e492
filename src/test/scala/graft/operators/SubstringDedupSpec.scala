package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Unaligned exact-substring duplication (`q_dedup_substring`):
  * overlapping stride-1 8-word windows shared across >=2 documents. The
  * defining property pinned here is the one q_segment_dedup cannot have:
  * a copied span SHIFTED off the 8-word segment grid still surfaces.
  */
class SubstringDedupSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  private def censusMap(docs: org.apache.spark.sql.DataFrame) =
    Dedup.substringCensus(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  describe("windowTable") {

    it("emits one window per stride-1 position and none under 8 words") {
      val doc = (1 to 20).map(i => s"w$i").mkString(" ") // 20 words -> 13 windows
      assert(Dedup.windowTable(Seq((1L, doc)).toDF("doc_id", "text")).count() == 13)
      val short = Seq((1L, "only seven words in this tiny doc")).toDF("doc_id", "text")
      assert(Dedup.windowTable(short).count() == 0)
      val exact = Seq((1L, (1 to 8).map(i => s"e$i").mkString(" "))).toDF("doc_id", "text")
      assert(Dedup.windowTable(exact).count() == 1)
    }

    it("keeps positional multiplicity: a window repeated in one doc counts twice") {
      val run = (1 to 8).map(i => s"r$i").mkString(" ")
      // run ... run: the run's window occurs at two positions
      val doc = run + " " + run
      val wins = Dedup.windowTable(Seq((1L, doc)).toDF("doc_id", "text"))
      assert(wins.count() == 9) // 16 words -> 9 windows
      val dupPos = wins.groupBy("sh").count().filter(col("count") >= 2).count()
      assert(dupPos == 1, "the repeated 8-run window must appear at 2 positions")
    }
  }

  describe("q_dedup_substring (substringCensus)") {

    it("catches a copied span shifted off the segment grid that q_segment_dedup misses") {
      val span = (1 to 16).map(i => s"copied$i").mkString(" ")
      val a = span + " " + (1 to 8).map(i => s"atail$i").mkString(" ")
      val b = "shift " + span + " " + (1 to 7).map(i => s"btail$i").mkString(" ")
      val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      // aligned segments: ZERO shared (the shift breaks every 8-word cell)
      val segShared = Dedup.segmentTable(docs)
        .groupBy("sg").agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2).count()
      assert(segShared == 0, "the shifted copy must be invisible to aligned segments")
      // overlapping windows: the 9 interior windows of the 16-word span shared
      val got = censusMap(docs)
      assert(got(1L) == ((17L, 9L)), s"doc A: ${got(1L)}") // 24 words -> 17 windows
      assert(got(2L) == ((17L, 9L)), s"doc B: ${got(2L)}")
    }

    it("scores exact-duplicate docs 1.0 and disjoint docs 0") {
      val text = (1 to 24).map(i => s"tok$i").mkString(" ")
      val other = (1 to 24).map(i => s"other$i").mkString(" ")
      val got = censusMap(Seq((1L, text), (2L, text), (3L, other)).toDF("doc_id", "text"))
      assert(got(1L) == ((17L, 17L)) && got(2L) == ((17L, 17L)))
      assert(got(3L) == ((17L, 0L)))
    }

    it("on the corpus: window totals equal len-7 per doc and the gauge is non-vacuous") {
      val docs = Tables.documents(spark, sfDir)
      val expected = docs
        .select(col("doc_id"), (size(split(col("text"), " ")) - 7).cast("long").as("nw"))
        .filter(col("nw") >= 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = censusMap(docs)
      assert(got.view.mapValues(_._1).toMap == expected)
      assert(got.values.exists(_._2 > 0), "corpus near-dups must share windows")
      // dup windows never exceed totals
      assert(got.values.forall { case (n, d) => d >= 0 && d <= n })
    }
  }
}
