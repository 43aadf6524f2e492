package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Table-maintenance levers a 100 TB deployment lives by: small-file
  * compaction, schema-evolution reads, and dynamic partition overwrite
  * (rewrite only the partitions you touched).
  */
class LayoutMaintenanceSpec extends AnyFunSpec with SparkTestBase {

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(dir)
  }

  describe("compaction") {
    it("rewrites a many-small-files table into few uniform files, content-identical") {
      withTempDir { dir =>
        val src = s"$dir/small"
        val dest = s"$dir/compacted"
        spark.range(0, 10000).repartition(32).write.parquet(src)
        assert(parquetFiles(new java.io.File(src)).size == 32)
        Sources.compact(spark, src, dest, 2)
        assert(parquetFiles(new java.io.File(dest)).size == 2, "wrong output file count")
        val a = spark.read.parquet(src).agg(count(lit(1)), sum("id")).head
        val b = spark.read.parquet(dest).agg(count(lit(1)), sum("id")).head
        assert(a == b, "compaction changed the data")
      }
    }
  }

  describe("schema evolution") {
    it("mergeSchema unions drifted file schemas, null-padding old files") {
      withTempDir { dir =>
        val p = s"$dir/evolving"
        spark.range(0, 5).selectExpr("id", "id * 2 AS a")
          .write.parquet(s"$p/batch=1")
        spark.range(5, 10).selectExpr("id", "id * 2 AS a", "'x' AS b")
          .write.parquet(s"$p/batch=2")
        val merged = Sources.readMerged(spark, p)
        assert(merged.columns.toSet == Set("id", "a", "b", "batch"))
        assert(merged.count() == 10)
        // old files surface the new column as null, not as an error
        assert(merged.filter(col("batch") === 1 && col("b").isNull).count() == 5)
        assert(merged.filter(col("batch") === 2 && col("b") === "x").count() == 5)
      }
    }
  }

  describe("dynamic partition overwrite") {
    it("overwrites only the partitions present in the incoming batch") {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      withTempDir { dir =>
        val p = s"$dir/events_by_day"
        try {
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          spark.range(0, 100).selectExpr("id", "id % 4 AS day")
            .write.partitionBy("day").mode("overwrite").parquet(p)
          // re-process ONLY day=1 (late data): static overwrite would
          // wipe days 0/2/3; dynamic must leave them in place
          spark.range(1000, 1010).selectExpr("id", "1 AS day")
            .write.partitionBy("day").mode("overwrite").parquet(p)
          val byDay = spark.read.parquet(p).groupBy("day").count()
            .collect().map(r => r.getAs[Int]("day") -> r.getAs[Long]("count")).toMap
          assert(byDay(1) == 10L, s"day=1 not replaced: $byDay")
          assert(byDay(0) == 25L && byDay(2) == 25L && byDay(3) == 25L,
            s"untouched partitions wiped: $byDay")
        } finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
    }
  }
}
