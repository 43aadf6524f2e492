package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** The dedup verdict is a SHARED ARTIFACT: the shingle → MinHash →
  * banding → iterative-CC pipeline must execute once per (session, dir)
  * however many consumers (`q_dedup_verdict`, `q_dedup_by_source`,
  * `q_dedup_soft`) read it — at 100 TB the verdict is a persisted table
  * joined by every consumer, never recomputed per query.
  */
class DedupShareSpec extends AnyFunSpec with SparkTestBase {

  it("runs the CC pipeline once across verdict + by_source + soft") {
    val before = Dedup.ccRuns.get()
    val v = Dedup.qDedupVerdict(spark, sfDir).count()
    val bs = Dedup.qDedupBySource(spark, sfDir).count()
    val soft = Dedup.qDedupSoft(spark, sfDir).count()
    assert(v > 0 && bs > 0 && soft > 0)
    val runs = Dedup.ccRuns.get() - before
    assert(runs <= 1,
      s"verdict pipeline executed $runs times across three consumers; " +
        "the materialized verdict must be computed at most once " +
        "(0 if an earlier suite already populated the memo)")
    // and a second composite sweep is fully memoized
    val before2 = Dedup.ccRuns.get()
    Dedup.qDedupBySource(spark, sfDir).count()
    Dedup.qDedupSoft(spark, sfDir).count()
    assert(Dedup.ccRuns.get() == before2,
      "re-reading the verdict recomputed the CC pipeline")
  }

  it("a dataset regenerated in place invalidates the memo instead of serving stale rows") {
    withTempDir { dir =>
      val src = new java.io.File(sfDir, "documents.parquet").toPath
      val dst = new java.io.File(dir, "documents.parquet").toPath
      java.nio.file.Files.copy(src, dst)
      val before = Dedup.ccRuns.get()
      val n1 = Dedup.qDedupVerdict(spark, dir.getAbsolutePath).count()
      assert(Dedup.ccRuns.get() - before == 1)
      // rewrite the file in place (same path, new mtime) — the memo key's
      // fingerprint changes, so the next read recomputes
      java.nio.file.Files.copy(src, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
      val n2 = Dedup.qDedupVerdict(spark, dir.getAbsolutePath).count()
      assert(Dedup.ccRuns.get() - before == 2,
        "an in-place rewrite must invalidate the memoized verdict")
      assert(n1 == n2)
    }
  }

  it("consumers agree with the materialized verdict") {
    val verdict = Dedup.qDedupVerdict(spark, sfDir)
    val dropped = verdict.filter(org.apache.spark.sql.functions.col("keep") === 0).count()
    val bySource = Dedup.qDedupBySource(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_dropped")).collect()(0).getLong(0)
    assert(bySource == dropped,
      s"per-source drops ($bySource) must roll up to the verdict's total ($dropped)")
  }
}
