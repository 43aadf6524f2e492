package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** `q_lsh_tune` measures the banding dial; these invariants pin that the
  * sweep is internally consistent and reconciles with the production
  * (6 bands × 2 rows) geometry the dedup family actually runs.
  */
class LshTuneSpec extends AnyFunSpec with SparkTestBase {

  it("candidates widen and t50 falls as bands narrow; kept set saturates") {
    val rows = Dedup.qLshTune(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("bands")).toSeq == Seq(1, 2, 3, 4, 6, 12))
    val cand = rows.map(_.getAs[Long]("n_candidates")).toSeq
    assert(cand == cand.sorted,
      s"candidate count must be monotone in bands: $cand")
    val t50 = rows.map(_.getAs[Double]("t50")).toSeq
    assert(t50 == t50.sorted.reverse, s"t50 must fall as bands narrow: $t50")
    val kept = rows.map(_.getAs[Long]("n_kept")).toSeq
    assert(kept == kept.sorted, s"kept pairs must be monotone: $kept")
    // every candidate the widest-band (exact-signature) config emits is
    // kept: identical signatures have est_jaccard 1.0
    assert(rows.head.getAs[Long]("n_candidates") == rows.head.getAs[Long]("n_kept"))
  }

  it("the (6,2) row reconciles with the production banding's verified pairs") {
    val row62 = Dedup.qLshTune(spark, sfDir).collect()
      .find(_.getAs[Int]("bands") == 6).get
    val prod = Dedup.qDedupMinhashLsh(spark, sfDir).count()
    assert(row62.getAs[Long]("n_kept") == prod,
      s"sweep says ${row62.getAs[Long]("n_kept")} kept at (6,2); " +
        s"q_dedup_minhash_lsh emits $prod pairs")
  }
}
