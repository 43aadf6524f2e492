package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Persistence round-trip: a captured pipeline's records written through
  * [[JsonlFileSink]], reloaded via [[LineageCatalog]], must drive the
  * SAME impact analysis as the in-memory records — lineage outliving the
  * session that emitted it (the r7/r8 catalog gap).
  */
class LineageCatalogSpec extends AnyFunSpec with SparkTestBase {

  /** Capture a chain+diamond pipeline: raw → a; a → b; a → c; (b,c) → d. */
  private def capture(dir: java.io.File): Seq[LineageRecord] = {
    val sink = new InMemorySink
    val l = Lineage.installSync(spark, sink)
    try {
      val base = dir.getAbsolutePath
      spark.read.parquet(s"$sfDir/region.parquet")
        .write.mode("overwrite").parquet(s"$base/a")
      spark.read.parquet(s"$base/a").filter(col("r_regionkey") >= 0)
        .write.mode("overwrite").parquet(s"$base/b")
      spark.read.parquet(s"$base/a")
        .select(col("r_regionkey"), upper(col("r_name")).as("uname"))
        .write.mode("overwrite").parquet(s"$base/c")
      spark.read.parquet(s"$base/b")
        .join(spark.read.parquet(s"$base/c"), "r_regionkey")
        .write.mode("overwrite").parquet(s"$base/d")
      assert(eventually()(sink.records.count(_.output.isDefined) >= 4),
        "pipeline writes not captured")
      sink.records
    } finally Lineage.uninstall(spark, l)
  }

  it("records survive the JSONL round-trip field-for-field") {
    withTempDir { dir =>
      val records = capture(dir)
      val path = new java.io.File(dir, "catalog.jsonl").getAbsolutePath
      val sink = new JsonlFileSink(path)
      records.foreach(sink.emit)
      sink.close()
      val reloaded = LineageCatalog.load(spark, path)
      assert(reloaded.size == records.size)
      // JSON reader may reorder across partitions: compare keyed
      def keyed(rs: Seq[LineageRecord]) =
        rs.map(r => (r.timestampMs, r.funcName) -> r).toMap
      val (orig, back) = (keyed(records), keyed(reloaded))
      assert(back.keySet == orig.keySet)
      orig.foreach { case (k, r) =>
        assert(back(k) == r, s"record $k mutated in the round-trip")
      }
    }
  }

  it("impact analysis over the reloaded catalog equals the in-memory run") {
    withTempDir { dir =>
      val records = capture(dir)
      val path = new java.io.File(dir, "catalog.jsonl").getAbsolutePath
      val sink = new JsonlFileSink(path)
      records.foreach(sink.emit)
      sink.close()
      val reloaded = LineageCatalog.load(spark, path)
      val a = records.flatMap(_.output).map(_.name).find(_.endsWith("/a")).get
      def cone(rs: Seq[LineageRecord]) =
        LineageGraph.downstream(spark, rs, a).collect()
          .map(r => r.getString(0) -> r.getInt(1)).toSet
      assert(cone(reloaded) == cone(records), "dataset cone diverged")
      def colEdges(rs: Seq[LineageRecord]) =
        LineageGraph.columnEdges(spark, rs).collect()
          .map(r => r.getString(0) -> r.getString(1)).toSet
      assert(colEdges(reloaded) == colEdges(records), "column edges diverged")
      // the derivation expression survives persistence too
      val upperExpr = reloaded.flatMap(_.columnLineage)
        .filter(_.output == "uname").flatMap(_.expression)
      assert(upperExpr.exists(_.toLowerCase.contains("upper")),
        s"expression lost: ${reloaded.flatMap(_.columnLineage).map(m => m.output -> m.expression)}")
    }
  }
}
