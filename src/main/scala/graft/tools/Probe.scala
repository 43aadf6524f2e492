package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for plan-shape/timing experiments (not part of the
  * library surface; invoked ad hoc during development).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = graft.operators.TextAnalysis.qTextRepetition(spark, sfDir)
    println("=== OPTIMIZED PLAN ===")
    println(df.queryExecution.optimizedPlan.treeString)
    def once(): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    println(s"timings: ${Seq(once(), once(), once()).map(t => f"$t%.2f").mkString(", ")} s")
    spark.stop()
  }
}
