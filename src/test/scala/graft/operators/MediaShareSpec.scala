package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** The phash pair-scan memo: q_media_phash and q_media_clusters share
  * ONE banded pair census per (session, dir, fingerprint) — the
  * dedup-verdict memo discipline applied to the media family.
  */
class MediaShareSpec extends AnyFunSpec with SparkTestBase {

  it("the pair scan runs at most once across both media consumers") {
    val before = Multimodal.phashRuns.get()
    val pairs = Multimodal.qMediaPhash(spark, sfDir).collect()
    Multimodal.qMediaClusters(spark, sfDir).collect()
    Multimodal.qMediaPhash(spark, sfDir).collect()
    val after = Multimodal.phashRuns.get()
    // 0 if another suite already warmed this dir; never more than 1
    assert(after - before <= 1, s"pair scan ran ${after - before} times")
    assert(pairs.nonEmpty || pairs.isEmpty) // collect() sanity, no throw
  }

  it("the memoized frame and a fresh computation agree row-for-row") {
    val memo = Multimodal.qMediaPhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fresh = Multimodal.phashPairs(graft.Tables.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(memo == fresh)
  }
}
