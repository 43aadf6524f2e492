package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Product-quantization invariants: a complete single-code-per-subspace
  * encoding, a usable ADC approximation, and agreement between the ADC
  * head and exact brute-force neighbors on the fixture corpus.
  */
class PqSpec extends AnyFunSpec with SparkTestBase {

  it("adc approximation tracks the exact cosine on the returned head") {
    val rows = Similarity.qKnnPq(spark, sfDir).collect()
    assert(rows.length == 5)
    // 4 subspaces x 8 codes is a deliberately coarse codebook (the knob
    // scales to 8x256 at volume): individual vectors can quantize badly,
    // so bound the MEAN absolute error plus a loose per-row cap
    val errs = rows.map(r => math.abs(r.getDouble(1) - r.getDouble(2)))
    assert(errs.sum / errs.length < 0.4,
      s"mean ADC error ${errs.sum / errs.length} too large: ${rows.mkString(", ")}")
    errs.foreach(e => assert(e < 0.8, s"single-vector ADC error $e out of range"))
  }

  it("the ADC head overlaps exact brute-force top-10") {
    val adcTop = Similarity.qKnnPq(spark, sfDir).collect().map(_.getLong(0)).toSet
    val bruteTop = Similarity.qKnnBrute(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert((adcTop & bruteTop).nonEmpty,
      s"ADC head $adcTop disjoint from exact top-10 $bruteTop")
  }

  it("every vector gets exactly one code per subspace, in [0, KSUB)") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val n = e.count()
    // rebuild the encoding through the same (package-private) path
    val subs = e.select(col("vec_id"), explode(array((0 until Similarity.PQ_M).map(m =>
        struct(lit(m).as("m"),
          slice(col("emb"), m * Similarity.PQ_SUB + 1, Similarity.PQ_SUB).as("sub"))): _*)).as("ms"))
      .select(col("vec_id"), col("ms.m").as("m"), col("ms.sub").as("sub"))
    val cent = Similarity.pqCodebooks(subs)
    val codes = cent // reuse assignment via codebook join: one argmin row per (vec, m)
    val assigned = subs.join(broadcast(cent), Seq("m"))
      .select(col("vec_id"), col("m"),
        struct(aggregate(zip_with(col("sub"), col("centroid"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, v) => a + v).as("d"), col("code")).as("sc"))
      .groupBy("vec_id", "m").agg(min("sc.code").as("code"), count(lit(1)).as("cands"))
    assert(assigned.count() == n * Similarity.PQ_M)
    val bad = assigned.filter(col("code") < 0 || col("code") >= Similarity.PQ_KSUB).count()
    assert(bad == 0)
  }
}
