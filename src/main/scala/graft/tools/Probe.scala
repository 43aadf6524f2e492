package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for plan-shape/timing experiments (not part of the
  * library surface): times named SparkEntry queries on
  * SPARK_GRAFT_SF_DIR, optionally printing the optimized plan with
  * `-explain` as the first arg.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.headOption.contains("-explain")
    val names = args.dropWhile(_ == "-explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // nanosAsLong is a no-op on TIMESTAMP(MICROS) data but kept so a
      // regenerated TIMESTAMP(NANOS) events file still reads (the vectorized
      // reader hard-rejects NANOS without it); EventOps.events branches on
      // the loaded dtype either way.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) {
        println(s"=== $name OPTIMIZED PLAN ===")
        println(fn(spark, sfDir).queryExecution.optimizedPlan.treeString)
      }
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      println(f"$name timings: ${Seq(once(), once(), once()).map(t => f"$t%.2f").mkString(", ")} s")
    }
    spark.stop()
  }
}
