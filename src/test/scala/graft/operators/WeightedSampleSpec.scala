package graft.operators

import graft.{SparkTestBase, Tables}
import graft.functions.HashFns
import org.scalatest.funspec.AnyFunSpec

/** q_sample_weighted — Sequential Poisson sampling: the k smallest
  * u/w priorities, replayed driver-side, plus the weight-bias property
  * that motivates it.
  */
class WeightedSampleSpec extends AnyFunSpec with SparkTestBase {

  lazy val docs = Tables.documents(spark, sfDir)
    .select("doc_id", "n_chars").collect()
    .map(r => (r.getLong(0), r.getLong(1)))

  lazy val rows = Pipeline.qSampleWeighted(spark, sfDir).collect()

  it("matches a driver-side priority replay, rank for rank") {
    val pri = docs.map { case (id, w) =>
      val u = HashFns.h60Local("ws:" + id) % 1099511627776L
      (u.toDouble / w.toDouble, id)
    }.sorted.take(Pipeline.WS_K)
    assert(rows.length == Pipeline.WS_K)
    rows.zip(pri).foreach { case (r, (p, id)) =>
      assert(r.getLong(2) == id, s"rank ${r.getInt(1)} doc")
      assert(r.getDouble(3) == p, s"rank ${r.getInt(1)} priority")
    }
    assert(rows.head.getLong(0) == docs.length)
  }

  it("selection is weight-biased: sampled docs are longer than the corpus on average") {
    val byId = docs.toMap
    val sampledMean = rows.map(r => byId(r.getLong(2)).toDouble).sum / rows.length
    val corpusMean = docs.map(_._2.toDouble).sum / docs.length
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean should exceed corpus mean $corpusMean")
  }
}
