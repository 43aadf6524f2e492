package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funspec.AnyFunSpec

/** Pins the slim LSH band join: the band-equality self-join must carry
  * only (vec_id, band, bv) — never the 64-double embedding. The r5 shape
  * shuffled BANDS copies of every vector into BOTH sides of that join
  * (~12x corpus vector volume through one exchange at scale); embeddings
  * now rejoin by vec_id only after the pair-level distinct.
  */
class BandShuffleSpec extends AnyFunSpec with SparkTestBase {

  private def bandJoins(df: org.apache.spark.sql.DataFrame): Seq[Join] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "bv")) => j
    }

  it("q_knn_lsh's band join carries no embedding column on either side") {
    val joins = bandJoins(Similarity.qKnnLsh(spark, sfDir))
    assert(joins.nonEmpty, "band-equality join not found in plan")
    joins.foreach { j =>
      val carried = (j.left.output ++ j.right.output).map(_.name.toLowerCase)
      assert(!carried.exists(n => n.contains("emb")),
        s"band join shuffles embeddings: $carried")
    }
  }

  it("q_dedup_embedding's band join carries no embedding column either") {
    val joins = bandJoins(Dedup.qDedupEmbedding(spark, sfDir))
    assert(joins.nonEmpty, "band-equality join not found in plan")
    joins.foreach { j =>
      val carried = (j.left.output ++ j.right.output).map(_.name.toLowerCase)
      assert(!carried.exists(n => n.contains("emb")),
        s"band join shuffles embeddings: $carried")
    }
  }
}
