package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Partition-level lineage: a Hive-partitioned write records its layout
  * columns and how many partition directories the commit touched; a
  * pruned read records the partition predicates and the post-pruning
  * partition count; both survive the JSONL catalog round-trip.
  */
class PartitionLineageSpec extends AnyFunSpec with SparkTestBase {

  it("captures partitions written, pruned read filters+counts, and persists them") {
    withTempDir { dir =>
      val base = dir.getAbsolutePath
      val sink = new InMemorySink
      val l = Lineage.installSync(spark, sink)
      try {
        val nParts = spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderpriority").distinct().count()

        // dynamic-partitioned write
        spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
          .write.mode("overwrite").partitionBy("o_orderpriority")
          .parquet(s"$base/t")
        assert(eventually()(sink.records.exists(_.output.exists(_.name.endsWith("/t")))),
          "partitioned write not captured")
        val wrec = sink.records.find(_.output.exists(_.name.endsWith("/t"))).get
        val out = wrec.output.get
        assert(out.partitionColumns == Seq("o_orderpriority"),
          s"layout columns wrong: $out")
        assert(out.partitionsWritten.contains(nParts),
          s"expected $nParts partition dirs, got ${out.partitionsWritten}")

        // pruned read: one partition of the five
        val n = spark.read.parquet(s"$base/t")
          .filter(col("o_orderpriority") === "1-URGENT")
          .count()
        assert(n > 0)
        assert(eventually()(sink.records.exists(r =>
          r.output.isEmpty && r.inputs.exists(_.partitionsRead.isDefined))),
          "pruned read not captured")
        val rrec = sink.records.filter(r => r.output.isEmpty &&
          r.inputs.exists(i => i.name.endsWith("/t"))).last
        val in = rrec.inputs.find(_.name.endsWith("/t")).get
        assert(in.partitionsRead.contains(1L),
          s"pruning not reflected: ${in.partitionsRead}")
        assert(in.partitionFilters.exists(_.contains("o_orderpriority")),
          s"partition predicate missing: ${in.partitionFilters}")

        // an unpruned read of the same layout reads every partition
        spark.read.parquet(s"$base/t").count()
        assert(eventually()(sink.records.exists(r => r.output.isEmpty &&
          r.inputs.exists(_.partitionsRead.contains(nParts)))),
          "full-scan partition count not captured")

        // persistence round-trip keeps the partition evidence
        val path = s"$base/catalog.jsonl"
        val fileSink = new JsonlFileSink(path)
        Seq(wrec, rrec).foreach(fileSink.emit)
        fileSink.close()
        val reloaded = LineageCatalog.load(spark, path)
        assert(reloaded.toSet == Set(wrec, rrec),
          "partition fields mutated in the round-trip")
      } finally Lineage.uninstall(spark, l)
    }
  }
}
