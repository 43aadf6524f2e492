package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Run-over-run drift detection: two REAL captured runs of the same
  * output with deliberate changes must yield exactly the expected
  * findings, and the synthetic edge branches (type change, plan change,
  * row-count swing) are pinned at the unit level.
  */
class LineageDiffSpec extends AnyFunSpec with SparkTestBase {

  it("names exactly what changed between two captured runs of one output") {
    withTempDir { dir =>
      val sink = new InMemorySink
      val l = Lineage.installSync(spark, sink)
      try {
        val base = dir.getAbsolutePath
        // run 1: identity columns plus one derived column v2 will drop
        spark.read.parquet(s"$sfDir/region.parquet")
          .select(col("r_regionkey"), col("r_name"),
            (col("r_regionkey") * 2).as("twice"))
          .write.mode("overwrite").parquet(s"$base/out")
        // run 2: 'twice' dropped, r_name becomes a DERIVED column,
        // a new column appears, and nation joins in as a second input
        spark.read.parquet(s"$sfDir/region.parquet")
          .join(spark.read.parquet(s"$sfDir/nation.parquet"),
            col("r_regionkey") === col("n_regionkey"))
          .groupBy(col("r_regionkey"), upper(col("r_name")).as("r_name"))
          .agg(count(lit(1)).as("n_nations"))
          .write.mode("overwrite").parquet(s"$base/out")
        assert(eventually()(sink.records.count(_.output.isDefined) >= 2),
          "writes not captured")
        val runs = sink.records.filter(_.output.exists(_.name.endsWith("/out")))
        assert(runs.size == 2, s"expected 2 runs, got ${runs.size}")

        val findings = LineageDiff.compareRuns(runs.head, runs.last)
        val byKind = findings.groupBy(_.kind).view.mapValues(_.map(_.subject)).toMap
        assert(byKind("column-added").contains("n_nations"), findings)
        assert(byKind("column-removed") == Seq("twice"), findings)
        assert(byKind("derivation-changed") == Seq("r_name"), findings)
        assert(byKind("input-added").exists(_.contains("nation")), findings)
        // latestDiffs keyed by output resolves the same two runs
        val latest = LineageDiff.latestDiffs(sink.records)
        val key = runs.head.output.get.name
        assert(latest(key).toSet == findings.toSet)
      } finally Lineage.uninstall(spark, l)
    }
  }

  it("pins the synthetic branches: type change, plan change, row-count swing, pruning drift") {
    def rec(cols: Seq[String], fp: String, plan: String, rows: Long,
        inputs: Seq[InputEntity] = Nil) =
      LineageRecord("app", "app", "u", "save", "success", None, 1L, 1L,
        inputs, Some(OutputEntity("path", "/t", None, None)), cols, Nil,
        fp, Some(rows), planFingerprint = plan)
    // same columns, different schema fingerprint -> the type moved
    val t = LineageDiff.compareRuns(
      rec(Seq("a"), "fp1", "p", 10), rec(Seq("a"), "fp2", "p", 10))
    assert(t.map(_.kind) == Seq("type-changed"))
    // nothing else moved but the plan fingerprint did
    val p = LineageDiff.compareRuns(
      rec(Seq("a"), "fp", "p1", 10), rec(Seq("a"), "fp", "p2", 10))
    assert(p.map(_.kind) == Seq("plan-changed"))
    // 2x row swing and the to-zero edge both flag
    assert(LineageDiff.compareRuns(rec(Seq("a"), "fp", "p", 10),
      rec(Seq("a"), "fp", "p", 20)).exists(_.kind == "rowcount-swing"))
    assert(LineageDiff.compareRuns(rec(Seq("a"), "fp", "p", 10),
      rec(Seq("a"), "fp", "p", 0)).exists(_.kind == "rowcount-swing"))
    // a quiet rerun (1.5x) stays quiet
    assert(LineageDiff.compareRuns(rec(Seq("a"), "fp", "p", 10),
      rec(Seq("a"), "fp", "p", 15)).isEmpty)
    // same input entity, narrowed pruned column set -> pruning drift
    def in(colsRead: Seq[String]) =
      Seq(InputEntity("path", "/in", Some("parquet"), colsRead))
    val pr = LineageDiff.compareRuns(
      rec(Seq("a"), "fp", "p", 10, in(Seq("x", "y"))),
      rec(Seq("a"), "fp", "p", 10, in(Seq("x"))))
    assert(pr.map(_.kind) == Seq("columns-read-changed") &&
      pr.head.detail.contains("-y"), pr)
  }
}
