package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** Cross-query invariants for the second-session operators: different
  * plans over the same corpus must agree where their semantics overlap —
  * the cheapest way to catch a silent drift in any one of them.
  */
class CrossQueryInvariants2Spec extends AnyFunSpec with SparkTestBase {

  it("aligned segment duplication implies unaligned window duplication, never the reverse") {
    // a shared aligned 8-word segment IS a shared 8-word window at the
    // same position, so every doc q_segment_dedup flags must also be
    // flagged by the overlapping census; the census may flag MORE
    // (shifted copies are its whole point)
    val seg = Dedup.qSegmentDedup(spark, sfDir).collect()
      .filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    val win = Dedup.qDedupSubstring(spark, sfDir).collect()
      .filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    assert(seg.subsetOf(win),
      s"segment-flagged docs missing from the window census: ${seg -- win}")
  }

  it("JS divergence token totals equal the corpus mixture's per-source word counts") {
    val js = Pipeline.qJsDivergence(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mix = Pipeline.qCorpusMixture(spark, sfDir).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(3)).sum).toMap
    assert(js == mix, "token accounting diverged between the two readouts")
  }

  it("incremental near matches are a subset of the whole-corpus LSH pairs") {
    // same signatures, same est threshold; the incremental probe only
    // restricts candidates to cross-residue pairs
    val lsh = Dedup.qDedupMinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = Dedup.qDedupIncremental(spark, sfDir).collect()
      .filter(_.getString(2) == "near")
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(inc.subsetOf(lsh),
      s"incremental pairs unknown to the LSH pass: ${inc -- lsh}")
  }

  it("the quality sweep's full-coverage row equals the corpus census") {
    val row0 = Pipeline.qQualitySweep(spark, sfDir)
      .orderBy("threshold").collect().head
    val docs = graft.Tables.documents(spark, sfDir)
    assert(row0.getLong(1) == docs.count())
    import org.apache.spark.sql.functions._
    val tokens = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(row0.getLong(2) == tokens)
  }
}
