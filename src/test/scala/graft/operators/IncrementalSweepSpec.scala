package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Incremental batch-vs-corpus dedup probe (`q_dedup_incremental`) and the
  * quality-threshold sweep (`q_quality_sweep`).
  */
class IncrementalSweepSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  // doc_id % 5 == 0 → batch; else corpus
  private def probe(rows: Seq[(Long, String)]) =
    Dedup.incrementalProbe(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getDouble(3))))
      .toMap

  describe("q_dedup_incremental (incrementalProbe)") {

    val base = (1 to 40).map(i => s"base$i").mkString(" ")
    val nearTxt = ((1 to 39).map(i => s"base$i") :+ "CHANGED").mkString(" ")
    val other = (1 to 40).map(i => s"other$i").mkString(" ")

    it("flags a planted exact copy with precedence over its own near match") {
      val got = probe(Seq((1L, base), (5L, base), (3L, other)))
      assert(got == Map(5L -> ((1L, "exact", 1.0))), got.toString)
    }

    it("flags a planted near-dup against the corpus with est >= 0.5") {
      val got = probe(Seq((1L, base), (10L, nearTxt), (3L, other)))
      val (m, v, est) = got(10L)
      assert(m == 1L && v == "near" && est >= 0.5, got.toString)
      assert(got.size == 1)
    }

    it("never reports within-batch or within-corpus pairs") {
      // two identical BATCH docs (5, 10) and two identical CORPUS docs
      // (1, 2) — none may pair with their own side
      val got = probe(Seq((5L, base), (10L, base), (1L, other), (2L, other)))
      assert(got.isEmpty, s"cross-side only: $got")
    }

    it("on the sf corpus: every flagged doc is batch-side, every match corpus-side") {
      val rows = Dedup.qDedupIncremental(spark, sfDir).collect()
      rows.foreach { r =>
        assert(r.getLong(0) % Dedup.INC_MOD == 0, s"non-batch doc flagged: $r")
        assert(r.getLong(1) % Dedup.INC_MOD != 0, s"batch doc as match: $r")
        assert(r.getDouble(3) >= 0.5)
      }
    }
  }

  describe("q_quality_sweep") {

    it("emits the complete 10-row grid, monotone, with threshold 0.0 covering all") {
      val rows = Pipeline.qQualitySweep(spark, sfDir).collect()
      assert(rows.length == 10)
      assert(rows.map(_.getDouble(0)).toSeq == (0 to 9).map(_ / 10.0))
      val docs = rows.map(_.getLong(1))
      val toks = rows.map(_.getLong(2))
      assert(docs.zip(docs.tail).forall { case (a, b) => a >= b }, "docs not monotone")
      assert(toks.zip(toks.tail).forall { case (a, b) => a >= b }, "tokens not monotone")
      assert(rows.head.getDouble(3) == 1.0 && rows.head.getDouble(4) == 1.0)
    }

    it("survivors at t equal a direct quality >= t filter") {
      val direct = Tables.documents(spark, sfDir)
        .filter(Pipeline.qualityScore >= 0.4).count()
      val atT = Pipeline.qQualitySweep(spark, sfDir)
        .filter(col("threshold") === 0.4).head().getLong(1)
      assert(atT == direct)
    }
  }
}
