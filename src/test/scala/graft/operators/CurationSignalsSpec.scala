package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** Behavior specs for the round-4 curation operators, on crafted inputs
  * where the expected values are computable by hand: decontamination
  * (eval-gram overlap), repetition signals, the HLL sketch gauge, and
  * the ordered funnel's horizon/ordering semantics.
  */
class CurationSignalsSpec extends AnyFunSpec with SparkTestBase {

  describe("decontaminate") {
    it("flags exactly the train docs sharing a 5-gram with the eval set") {
      import spark.implicits._
      // eval docs: doc_id % 25 == 3 (ids 3 and 28)
      val docs = Seq(
        3L  -> "alpha beta gamma delta epsilon zeta",
        28L -> "red orange yellow green blue indigo",
        // train: copies eval doc 3's leading 5-gram
        1L  -> "intro alpha beta gamma delta epsilon outro",
        // train: copies two overlapping 5-grams of eval doc 28
        4L  -> "pre red orange yellow green blue indigo post",
        // train: clean
        2L  -> "one two three four five six seven"
      ).toDF("doc_id", "text")
      val got = Dedup.decontaminate(docs).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared"))
      assert(got.toSeq == Seq(1L -> 1L, 4L -> 2L))
    }
  }

  describe("repetitionSignals") {
    it("computes distinct-word ratio, top-word fraction, dup-bigram fraction") {
      import spark.implicits._
      val docs = Seq(
        1L -> "a a a b",  // top word 3/4; bigrams (a a, a a, a b): 1 dup of 3
        2L -> "w x y z",  // all distinct
        3L -> "solo"      // single word: no bigrams, guard path
      ).toDF("doc_id", "text")
      val rows = TextAnalysis.repetitionSignals(docs).collect()
      val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(byId(1L).getAs[Double]("distinct_word_ratio") == 0.5)
      assert(byId(1L).getAs[Double]("top_word_frac") == 0.75)
      assert(byId(1L).getAs[Double]("dup_bigram_frac") == 0.333333)
      assert(byId(2L).getAs[Double]("distinct_word_ratio") == 1.0)
      assert(byId(2L).getAs[Double]("top_word_frac") == 0.25)
      assert(byId(2L).getAs[Double]("dup_bigram_frac") == 0.0)
      assert(byId(3L).getAs[Long]("n_words") == 1L)
      assert(byId(3L).getAs[Double]("dup_bigram_frac") == 0.0)
    }
  }

  describe("sketch distinct gauge") {
    it("HLL++ at rsd 2% lands within the 5% tolerance on 50k distinct keys") {
      import org.apache.spark.sql.functions._
      val approx = spark.range(50000)
        .agg(approx_count_distinct(col("id"), Relational.SKETCH_RSD))
        .collect().head.getLong(0)
      assert(math.abs(approx - 50000L) <= 50000L * Relational.SKETCH_TOL)
    }

    it("q_sketch_distinct reports within_tol for every group on real data") {
      val rows = Relational.qSketchDistinct(spark, sfDir).collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[Boolean]("within_tol")))
    }
  }

  describe("funnel") {
    it("applies per-stage horizon and event ordering") {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
      val events = Seq(
        // u1: full funnel (view -> click +1h -> purchase +2h)
        (1L, "view", at(0)), (1L, "click", at(3600)), (1L, "purchase", at(7200)),
        // u2: click 2 days after view — outside the 1-day horizon
        (2L, "view", at(0)), (2L, "click", at(172800)), (2L, "purchase", at(176400)),
        // u3: no view at all — never enters the funnel
        (3L, "click", at(0)), (3L, "purchase", at(3600)),
        // u4: converts view->click, purchase too late
        (4L, "view", at(0)), (4L, "click", at(3600)), (4L, "purchase", at(180000)),
        // u5: purchase BEFORE the first qualifying click must not count
        (5L, "view", at(0)), (5L, "purchase", at(1800)), (5L, "click", at(3600))
      ).toDF("user_id", "event_type", "ts")
      val r = EventOps.funnel(events).collect().head
      assert(r.getAs[Long]("users_view") == 4L)        // u1 u2 u4 u5
      assert(r.getAs[Long]("users_click_1d") == 3L)    // u1 u4 u5
      assert(r.getAs[Long]("users_purchase_1d") == 1L) // u1
      assert(r.getAs[Double]("avg_sec_to_convert") == 7200.0)
    }
  }
}
