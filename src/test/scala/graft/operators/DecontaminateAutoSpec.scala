package graft.operators

import graft.{SparkTestBase, Tables}
import org.scalatest.funspec.AnyFunSpec

/** The decontamination regime switch: broadcast raw eval grams while
  * they fit the budget, collapse to a bloom prefilter when they don't —
  * measured (a count over the eval stratum), not guessed, and the answer
  * is identical in both regimes.
  */
class DecontaminateAutoSpec extends AnyFunSpec with SparkTestBase {

  // analysis resolves graft_bloom_contains to the canonical
  // BloomFilterMightContain, so match on the expression family
  private def isBloomPlan(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.toString.toLowerCase.contains("bloom")

  private def docs = Tables.documents(spark, sfDir)

  // sf0.001 has no contaminated docs; the result-parity check needs rows
  private def docs01 = Tables.documents(spark, "/root/testdata/sf0.01")

  it("small eval gram sets take the broadcast regime") {
    val df = Dedup.decontaminateAuto(spark, docs, maxBroadcastGrams = Long.MaxValue)
    assert(!isBloomPlan(df), "broadcast regime expected below the threshold")
  }

  it("past the threshold the plan switches to the bloom prefilter") {
    val df = Dedup.decontaminateAuto(spark, docs, maxBroadcastGrams = 0L)
    assert(isBloomPlan(df), "bloom regime expected above the threshold")
  }

  it("both regimes return identical rows (the switch changes plans, not answers)") {
    val broad = Dedup.decontaminateAuto(spark, docs01, maxBroadcastGrams = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloom = Dedup.decontaminateAuto(spark, docs01, maxBroadcastGrams = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(broad == bloom)
    assert(broad.nonEmpty, "vacuous: no contaminated docs at this SF")
  }

  it("the default threshold picks broadcast for this corpus (eval grams are tiny)") {
    assert(!isBloomPlan(Dedup.qDecontaminateAuto(spark, sfDir)))
  }
}
