package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Executes the z-order write recipe (`q_zorder_layout` only QUANTIFIES
  * the layout) and proves min/max file skipping on the result: a point
  * predicate on either interleaved dimension must admit a small fraction
  * of files, while the orderkey-laid-out control admits ~all of them —
  * and the pruned read must return exactly the full scan's rows.
  */
class ZorderWriteSpec extends AnyFunSpec with SparkTestBase {

  private val NFILES = 16

  it("z-order write prunes files on both dimensions; natural layout cannot") {
    withTempDir { dir =>
      val li = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey", "l_suppkey")
      val zPath = s"${dir.getAbsolutePath}/z"
      val nPath = s"${dir.getAbsolutePath}/n"
      Layout.zorderWrite(li, "l_partkey", "l_suppkey", zPath, NFILES)
      // control: the natural ingest layout, ranged by orderkey
      li.repartitionByRange(NFILES, col("l_orderkey"))
        .write.mode("overwrite").parquet(nPath)

      val zFiles = Layout.fileStats(spark, zPath, Seq("l_partkey", "l_suppkey"))
        .cache()
      val nFilesStats = Layout.fileStats(spark, nPath, Seq("l_partkey", "l_suppkey"))
        .cache()
      val zCount = zFiles.count()
      assert(zCount >= NFILES / 2, s"write produced only $zCount files")

      // probe several point values across the domain on BOTH dimensions
      val probes = Seq(("l_partkey", 10L), ("l_partkey", 150L),
        ("l_suppkey", 3L), ("l_suppkey", 9L))
      probes.foreach { case (c, v) =>
        val zCand = Layout.candidateFiles(zFiles, c, v).size
        val nCand = Layout.candidateFiles(nFilesStats, c, v).size
        // natural layout: partkey/suppkey are uncorrelated with orderkey,
        // so every file's range covers the probe value
        assert(nCand >= (zCount * 3) / 4,
          s"control layout unexpectedly prunes $c=$v ($nCand of $zCount)")
        assert(zCand * 2 <= nCand,
          s"z-order admits $zCand files vs natural $nCand for $c=$v — no skipping win")
      }

      // pruning is CORRECT: pruned read == full filter, for each probe
      probes.foreach { case (c, v) =>
        val full = spark.read.parquet(zPath).filter(col(c) === v)
          .orderBy("l_orderkey", "l_partkey", "l_suppkey").collect()
        val pruned = Layout.prunedRead(spark, zPath, c, v)
          .orderBy("l_orderkey", "l_partkey", "l_suppkey").collect()
        assert(pruned.sameElements(full), s"pruned read wrong for $c=$v")
        assert(full.nonEmpty, s"vacuous probe $c=$v")
      }

      zFiles.unpersist(); nFilesStats.unpersist()
    }
  }

  it("prunedRead returns empty (not an error) when no file range matches") {
    withTempDir { dir =>
      val path = s"${dir.getAbsolutePath}/z2"
      Layout.zorderWrite(
        Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey", "l_suppkey"),
        "l_partkey", "l_suppkey", path, 4)
      assert(Layout.prunedRead(spark, path, "l_partkey", -5L).count() == 0)
    }
  }
}
