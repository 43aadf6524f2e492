package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Trained linear probe over embeddings: training must actually reduce
  * the loss, beat the prior, and stay deterministic (the oracle only
  * checks the final confusion numbers).
  */
class ProbeSpec extends AnyFunSpec with SparkTestBase {

  private def featAndW() = {
    val feat = Tables.embeddings(spark, sfDir)
      .select(when(col("label") < 5, 1.0).otherwise(0.0).as("y"),
        concat(array(lit(1.0)), col("embedding").cast("array<double>")).as("x"))
    val w = Similarity.probeWeights(spark, sfDir)
    (feat, w)
  }

  private def dotCol = aggregate(
    zip_with(col("x"), col("w"), (a, b) => a * b), lit(0.0), (acc, v) => acc + v)

  it("training reduces the log-loss below the w=0 baseline (ln 2)") {
    val (feat, w) = featAndW()
    val z = dotCol
    val logloss = feat.crossJoin(broadcast(w))
      .select((-(col("y") * -log(lit(1.0) + exp(-z)) +
        (lit(1.0) - col("y")) * -log(lit(1.0) + exp(z)))).as("nll"))
      .agg(avg("nll")).collect().head.getDouble(0)
    assert(logloss < math.log(2.0) - 1e-4,
      s"3 GD steps did not improve on the uninformed model: $logloss vs ${math.log(2.0)}")
  }

  it("the trained weight vector is 65-long, non-degenerate, and deterministic") {
    val w1 = Similarity.probeWeights(spark, sfDir).collect().head.getSeq[Double](0)
    val w2 = Similarity.probeWeights(spark, sfDir).collect().head.getSeq[Double](0)
    assert(w1 == w2, "training is not deterministic")
    assert(w1.size == 65)
    assert(w1.count(_ != 0.0) > 32, "most weights should move off zero")
  }

  it("overall accuracy beats the 0.5 prior of the balanced target") {
    val rows = Similarity.qEmbeddingProbe(spark, sfDir).collect()
    val n = rows.map(_.getLong(1)).sum
    val correct = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(n > 0)
    val acc = correct / n
    assert(acc > 0.52, s"probe did not learn: overall accuracy $acc")
  }
}
