package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

class SimHashAggregatorSpec extends AnyFunSpec with SparkTestBase {

  describe("SimHashAggregator (typed Aggregator)") {
    it("produces the identical signature to the columnar qDedupSimhash") {
      import spark.implicits._
      val words = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .select(col("doc_id"), HashFns.h60(col("w")).as("h"))
        .as[(Long, Long)]
      val viaAggregator = words.groupByKey(_._1).mapValues(_._2)
        .agg(SimHashAggregator.toColumn.name("simhash"))
        .toDF("doc_id", "simhash")
      val viaColumns = graft.operators.Dedup.qDedupSimhash(spark, sfDir)
      assert(viaAggregator.count() == viaColumns.count())
      val diff = viaAggregator.join(viaColumns, Seq("doc_id", "simhash"), "left_anti").count()
      assert(diff == 0, s"$diff docs disagree between aggregator and columnar simhash")
    }
  }
}
