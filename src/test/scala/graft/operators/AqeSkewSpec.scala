package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** AQE skew-join evidence: the runtime lever that complements
  * `SkewOps.saltedJoin` (the static one). A pathologically skewed key
  * must be SPLIT by AQE's OptimizeSkewedJoin at execution time —
  * asserted on the executed plan, not the static one, because skew
  * handling is a runtime re-plan.
  */
class AqeSkewSpec extends AnyFunSpec with SparkTestBase {

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  it("OptimizeSkewedJoin splits the hot key's partition at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the fixture's hot key counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8") {
      import spark.implicits._
      // 100k rows on one key vs a near-uniform remainder
      val left = spark.range(120000)
        .select(when(col("id") < 100000, 0L).otherwise(col("id")).as("k"),
          concat(lit("padpadpadpadpadpadpadpad-"), col("id")).as("payload"))
      val right = spark.range(2000).select(col("id").as("k"), lit("dim").as("v"))
      val joined = left.join(right, "k")
      // materialize THIS QueryExecution — count() would plan a separate
      // one, and AQE marks skew only on the executed (final) plan
      assert(joined.queryExecution.toRdd.count() == 100000L) // only k=0 matches
      // query stages hide their subtrees from TreeNode.collect, so
      // assert on the rendered final plan
      val rendered = joined.queryExecution.executedPlan.toString
      assert(rendered.contains("isFinalPlan=true"), rendered)
      assert(rendered.contains("SortMergeJoin(skew=true)"),
        s"no skew-marked SortMergeJoin in:\n$rendered")
      assert(rendered.contains("AQEShuffleRead skewed"),
        s"hot partition was not split:\n$rendered")
    }
  }
}
