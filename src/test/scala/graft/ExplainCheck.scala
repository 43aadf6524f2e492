package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
        .toString.split("\n").filter(l =>
          l.contains("Exchange") || l.contains("Broadcast") ||
          l.contains("Scan parquet") || l.contains("Window")).mkString("\n"))
    }
    spark.stop()
  }
}
