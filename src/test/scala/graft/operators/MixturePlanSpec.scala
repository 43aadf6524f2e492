package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Cross-query invariants for the round-9 mixture/curriculum/novelty/
  * soft-dedup additions — the algebra that must hold beyond each query's
  * own oracle hash.
  */
class MixturePlanSpec extends AnyFunSpec with SparkTestBase {

  it("q_sample_temperature: shares sum to 1 and temperature compresses the spread") {
    val rows = Pipeline.qSampleTemperature(spark, sfDir).collect()
    val raw = rows.map(_.getAs[Double]("raw_share"))
    val temp = rows.map(_.getAs[Double]("temp_share"))
    assert(math.abs(raw.sum - 1.0) < 1e-4, s"raw shares sum ${raw.sum}")
    assert(math.abs(temp.sum - 1.0) < 1e-4, s"temp shares sum ${temp.sum}")
    // sqrt-scaling strictly narrows the share ratio between the largest
    // and smallest source (the whole point of temperature sampling)
    assert(temp.max / temp.min < raw.max / raw.min,
      s"temperature did not compress: raw ${raw.max / raw.min}, temp ${temp.max / temp.min}")
    // upsample factor boosts below-average sources, shrinks above-average
    rows.foreach { r =>
      val up = r.getAs[Double]("upsample")
      if (r.getAs[Double]("raw_share") < 1.0 / rows.length) assert(up > 1.0)
    }
  }

  it("q_curriculum: stages partition the corpus with ntile-sized bands and rising difficulty") {
    val rows = Pipeline.qCurriculum(spark, sfDir).collect()
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(n == total, s"stages lost docs: $n vs $total")
    val sizes = rows.sortBy(_.getAs[Int]("stage")).map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1, s"ntile sizing violated: ${sizes.toSeq}")
    // band boundaries are non-decreasing across stages
    val bands = rows.sortBy(_.getAs[Int]("stage"))
      .map(r => (r.getAs[Long]("min_tok"), r.getAs[Long]("max_tok")))
    bands.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2 || hi1 == lo2 || lo2 >= hi1 - 1,
        s"stage bands out of order: ${bands.toSeq}")
    }
  }

  it("q_dedup_soft: weights conserve mass — total effective docs equals the keeper count") {
    val soft = Dedup.qDedupSoft(spark, sfDir).collect()
    val effTotal = soft.map(_.getAs[Double]("eff_docs")).sum
    val nKeepers = Dedup.qDedupVerdict(spark, sfDir)
      .filter(col("keep") === 1).count()
    // each dedup group contributes exactly 1.0 (grp * 1/grp), so the
    // global effective size IS the number of surviving keepers, up to
    // the 9dp per-doc rounding
    assert(math.abs(effTotal - nKeepers) < 0.01,
      s"mass not conserved: eff=$effTotal keepers=$nKeepers")
    soft.foreach { r =>
      assert(r.getAs[Double]("eff_docs") <= r.getAs[Long]("n_docs") + 1e-9)
      val ratio = r.getAs[Double]("eff_ratio")
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-9)
    }
  }

  it("q_ngram_novelty: the bloom-scored stream under-reports exact novelty by at most the fp rate") {
    val exact = TextAnalysis.qNgramNovelty(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("total_grams"), r.getAs[Long]("unseen_grams")))).toMap
    val ref = graft.Tables.documents(spark, sfDir).filter(col("source") === "src0")
    val bloom = TextAnalysis.trainNoveltyBloom(spark, ref)
    val scored = graft.streaming.StreamOps.noveltyScore(
        graft.Tables.documents(spark, sfDir).filter(col("source") =!= "src0"), bloom)
      .join(graft.Tables.documents(spark, sfDir).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(sum("total_grams").as("t"), sum("unseen_grams").as("u"))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("t"), r.getAs[Long]("u")))).toMap
    assert(scored.keySet == exact.keySet)
    exact.foreach { case (src, (t, u)) =>
      val (bt, bu) = scored(src)
      assert(bt == t, s"$src gram totals diverge: $bt vs $t")
      assert(bu <= u, s"$src bloom cannot over-report novelty: $bu > $u")
      // fp rate ~1% at the default sizing; allow 5% slack
      assert(u - bu <= math.max(2L, (t * 0.05).toLong),
        s"$src bloom under-reports too much: exact $u, bloom $bu of $t")
    }
  }
}
