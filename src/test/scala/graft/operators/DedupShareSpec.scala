package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** The dedup verdict is a SHARED ARTIFACT: the shingle → MinHash →
  * banding → iterative-CC pipeline must execute once per (session, dir)
  * however many consumers (`q_dedup_verdict`, `q_dedup_by_source`,
  * `q_dedup_soft`) read it — at 100 TB the verdict is a persisted table
  * joined by every consumer, never recomputed per query.
  */
class DedupShareSpec extends AnyFunSpec with SparkTestBase {

  it("runs the CC pipeline once across verdict + by_source + soft") {
    val before = Dedup.ccRuns.get()
    val v = Dedup.qDedupVerdict(spark, sfDir).count()
    val bs = Dedup.qDedupBySource(spark, sfDir).count()
    val soft = Dedup.qDedupSoft(spark, sfDir).count()
    assert(v > 0 && bs > 0 && soft > 0)
    val runs = Dedup.ccRuns.get() - before
    assert(runs <= 1,
      s"verdict pipeline executed $runs times across three consumers; " +
        "the materialized verdict must be computed at most once " +
        "(0 if an earlier suite already populated the memo)")
    // and a second composite sweep is fully memoized
    val before2 = Dedup.ccRuns.get()
    Dedup.qDedupBySource(spark, sfDir).count()
    Dedup.qDedupSoft(spark, sfDir).count()
    assert(Dedup.ccRuns.get() == before2,
      "re-reading the verdict recomputed the CC pipeline")
  }

  it("consumers agree with the materialized verdict") {
    val verdict = Dedup.qDedupVerdict(spark, sfDir)
    val dropped = verdict.filter(org.apache.spark.sql.functions.col("keep") === 0).count()
    val bySource = Dedup.qDedupBySource(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_dropped")).collect()(0).getLong(0)
    assert(bySource == dropped,
      s"per-source drops ($bySource) must roll up to the verdict's total ($dropped)")
  }
}
