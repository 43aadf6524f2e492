package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** `q_kmeans_profile`: the trained-quantizer cluster profile must be a
  * true partition of the corpus (counts cover every vector exactly
  * once, shares sum to 1) with internally-consistent cohesion stats.
  */
class KmeansProfileSpec extends AnyFunSpec with SparkTestBase {

  it("is a partition: member counts cover the corpus once; shares sum to 1") {
    val rows = Similarity.qKmeansProfile(spark, sfDir).collect()
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(rows.nonEmpty && rows.length <= Similarity.IVF_K,
      s"${rows.length} cells from a K=${Similarity.IVF_K} quantizer")
    assert(rows.map(_.getLong(1)).sum == corpus,
      s"cell counts ${rows.map(_.getLong(1)).mkString("+")} != corpus $corpus")
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    assert(rows.map(_.getInt(0)).distinct.length == rows.length)
  }

  it("cohesion stats are consistent: min_cos <= mean_cos, both in [-1, 1]") {
    Similarity.qKmeansProfile(spark, sfDir).collect().foreach { r =>
      val (cell, mean, mn) = (r.getInt(0), r.getDouble(3), r.getDouble(4))
      assert(mn <= mean + 1e-9, s"cell $cell: min_cos $mn > mean_cos $mean")
      assert(mn >= -1.0 - 1e-9 && mean <= 1.0 + 1e-9, s"cell $cell out of range")
    }
  }
}
