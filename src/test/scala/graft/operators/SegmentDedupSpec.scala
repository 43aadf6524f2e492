package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Segment-level (substring) duplication: non-overlapping 8-word windows
  * shared across >=2 documents mark copied passages — the span-granular
  * channel document-level dedup misses.
  */
class SegmentDedupSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  describe("segmentTable") {

    it("cuts exact non-overlapping 8-word windows and drops the tail remainder") {
      val doc = (1 to 20).map(i => s"w$i").mkString(" ") // 20 words -> 2 segments
      val segs = Dedup.segmentTable(Seq((1L, doc)).toDF("doc_id", "text"))
      assert(segs.count() == 2)
      val short = Dedup.segmentTable(Seq((1L, "only seven words in this tiny doc")).toDF("doc_id", "text"))
      assert(short.count() == 0)
    }

    it("detects a copied passage embedded in otherwise-distinct documents") {
      val passage = (1 to 16).map(i => s"copied$i").mkString(" ") // 2 aligned segments
      val a = passage + " " + (1 to 8).map(i => s"atail$i").mkString(" ")
      val b = passage + " " + (1 to 8).map(i => s"btail$i").mkString(" ")
      val segs = Dedup.segmentTable(Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      val shared = segs.groupBy("sg").agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2).count()
      assert(shared == 2, s"expected the 2 copied segments to be shared, got $shared")
    }
  }

  describe("q_segment_dedup") {

    it("matches a window-shaped recomputation and exact-duplicate docs score dup_frac 1.0") {
      val got = Dedup.qSegmentDedup(spark, sfDir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // independent shape: distinct-doc count via a window over sg
      val w = org.apache.spark.sql.expressions.Window.partitionBy("sg")
      val viaWindow = Dedup.segmentTable(Tables.documents(spark, sfDir))
        .withColumn("nd", size(collect_set("doc_id").over(w)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"), sum((col("nd") >= 2).cast("long")).as("ndup"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == viaWindow)
      assert(got.nonEmpty)
    }

    it("exact-duplicate docs score every segment duplicated; unique docs score none") {
      val text = (1 to 24).map(i => s"tok$i").mkString(" ") // 3 segments
      val docs = Seq((1L, text), (2L, text),
        (3L, (1 to 24).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
      val segs = Dedup.segmentTable(docs)
      val nd = segs.groupBy("sg").agg(countDistinct("doc_id").as("ndocs"))
      val perDoc = segs.join(nd, "sg").groupBy("doc_id")
        .agg(count(lit(1)).as("n"), sum((col("ndocs") >= 2).cast("long")).as("ndup"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(perDoc(1L) == ((3L, 3L)) && perDoc(2L) == ((3L, 3L)))
      assert(perDoc(3L) == ((3L, 0L)))
    }

    it("q_dedup_by_source rolls the verdict up exactly (totals and drops conserved)") {
      val bySource = Dedup.qDedupBySource(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val verdict = Dedup.qDedupVerdict(spark, sfDir).collect()
      assert(bySource.map(_._2).sum == verdict.length)
      assert(bySource.map(_._3).sum == verdict.count(_.getLong(2) == 0L))
    }

    it("plans no windows and no pair explosion (equality join on the segment hash)") {
      val plan = Dedup.qSegmentDedup(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct"))
      assert(plan.linesIterator.count(_.matches("^\\(\\d+\\) Window.*")) == 0,
        "segment dedup must not window the raw segment stream")
    }
  }

  describe("q_segment_scrub (applied passage removal)") {

    it("keeps only the first global occurrence and reconstructs in original order") {
      val passage = (1 to 8).map(i => s"copied$i").mkString(" ")
      val aTail   = (1 to 8).map(i => s"atail$i").mkString(" ")
      val bTail   = (1 to 8).map(i => s"btail$i").mkString(" ")
      // doc 1: [passage][atail]; doc 2: [btail][passage] — doc 2 loses the
      // passage (doc 1 saw it first) but keeps btail, order preserved.
      val docs = Seq((1L, passage + " " + aTail), (2L, bTail + " " + passage))
        .toDF("doc_id", "text")
      val got = Dedup.segmentScrub(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got(1L) == ((2L, 0L)), "doc 1 holds both first occurrences")
      assert(got(2L) == ((1L, 1L)), "doc 2 drops the copied passage only")
      // fingerprint fidelity: doc 2's clean text must equal btail alone
      val fpGot = Dedup.segmentScrub(docs).filter(col("doc_id") === 2L)
        .select("clean_fp").as[Long].head()
      val fpWant = Seq(bTail).toDF("s").select(graft.functions.HashFns.h60(col("s"))).as[Long].head()
      assert(fpGot == fpWant)
    }

    it("an exact duplicate document scrubs to the empty string") {
      val text = (1 to 24).map(i => s"tok$i").mkString(" ")
      val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val got = Dedup.segmentScrub(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got(1L) == ((3L, 0L)) && got(2L) == ((0L, 3L)))
      val fpEmpty = Seq("").toDF("s").select(graft.functions.HashFns.h60(col("s"))).as[Long].head()
      val fp2 = Dedup.segmentScrub(docs).filter(col("doc_id") === 2L)
        .select("clean_fp").as[Long].head()
      assert(fp2 == fpEmpty)
    }

    it("repeated passage WITHIN one doc keeps only the earliest position") {
      val p = (1 to 8).map(i => s"rep$i").mkString(" ")
      val mid = (1 to 8).map(i => s"mid$i").mkString(" ")
      val docs = Seq((1L, p + " " + mid + " " + p)).toDF("doc_id", "text")
      val r = Dedup.segmentScrub(docs).collect().head
      assert((r.getLong(1), r.getLong(2)) == ((2L, 1L)))
      val fpWant = Seq(p + " " + mid).toDF("s")
        .select(graft.functions.HashFns.h60(col("s"))).as[Long].head()
      assert(r.getLong(3) == fpWant)
    }

    it("plans first-occurrence as a partial-aggregable min — no window, no cartesian") {
      val plan = Dedup.qSegmentScrub(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct"))
      assert(plan.linesIterator.count(_.matches("^\\(\\d+\\) Window.*")) == 0,
        "scrub must not window the raw segment stream")
    }
  }
}
