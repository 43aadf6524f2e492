package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** `q_source_overlap`: the one-shuffle pair expansion (per-gram sorted
  * source sets) must equal a naive driver-side recomputation of the
  * source-pair gram overlap exactly, and the matrix must be internally
  * consistent (ordered pairs, Jaccard in (0, 1]).
  */
class SourceOverlapSpec extends AnyFunSpec with SparkTestBase {

  private def referenceOverlap: Map[(String, String), Int] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).map { case (src, rows) =>
      src -> rows.flatMap { case (_, text) =>
        val w = text.split(" ")
        if (w.length < Dedup.DECON_N) Array.empty[String]
        else (0 to w.length - Dedup.DECON_N)
          .map(i => w.slice(i, i + Dedup.DECON_N).mkString(" ")).toArray
      }.toSet
    }
    val srcs = bySource.keys.toSeq.sorted
    (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      shared = (bySource(srcs(i)) & bySource(srcs(j))).size
      if shared > 0
    } yield (srcs(i), srcs(j)) -> shared).toMap
  }

  it("matches a naive driver-side source-pair gram overlap exactly") {
    val got = Dedup.qSourceOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toInt).toMap
    val ref = referenceOverlap
    assert(got == ref,
      s"matrix diverged; missing=${(ref.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- ref.keySet).take(3)}")
    assert(got.nonEmpty, "vacuous: no overlapping source pairs in testdata")
  }

  it("emits ordered pairs with Jaccard in (0, 1]") {
    Dedup.qSourceOverlap(spark, sfDir).collect().foreach { r =>
      val (a, b, j) = (r.getString(0), r.getString(1), r.getDouble(3))
      assert(a < b, s"unordered pair ($a, $b)")
      assert(j > 0 && j <= 1, s"jaccard $j out of range for ($a, $b)")
    }
  }
}
