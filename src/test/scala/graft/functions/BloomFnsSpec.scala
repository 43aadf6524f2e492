package graft.functions

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

class BloomFnsSpec extends AnyFunSpec with SparkTestBase {

  describe("graft_bloom_agg / graft_bloom_contains") {
    it("has no false negatives and a bounded false-positive rate") {
      BloomFns.register(spark)
      // might_contain takes its bloom as a scalar subquery (Spark
      // injects its runtime filters the same way)
      spark.range(0, 10000).select(col("id")).createOrReplaceTempView("bloom_members")
      spark.range(1000000, 1100000).select(col("id")).createOrReplaceTempView("bloom_probes")
      val bloomSq = "(SELECT graft_bloom_agg(id) FROM bloom_members)"
      val misses = spark.sql(
        s"SELECT count(*) FROM bloom_members WHERE NOT graft_bloom_contains($bloomSq, id)")
        .head.getLong(0)
      assert(misses == 0L, s"$misses false negatives — bloom contract broken")
      // non-members may probe true, but rarely; assert a loose 5%
      // ceiling so the test pins the order of magnitude, not the exact
      // hash geometry
      val fp = spark.sql(
        s"SELECT count(*) FROM bloom_probes WHERE graft_bloom_contains($bloomSq, id)")
        .head.getLong(0)
      assert(fp < 5000L, s"false-positive rate ${fp / 1000.0}% — sizing badly off")
    }

    it("bloom-prefiltered decontamination equals the exact broadcast version") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val exact = Dedup.decontaminate(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val bloomed = Dedup.decontaminateBloom(spark, docs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bloomed == exact,
        "bloom prefilter changed the decontamination verdict (must be exact after confirm join)")
    }
  }
}
