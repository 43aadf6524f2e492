package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** `Similarity.lshTopK`'s contract: on a corpus with exact-duplicate
  * embeddings (the verbatim-copy amplification every re-crawled corpus
  * carries), the duplicate-collapsed top-k equals the naive
  * rank-over-all-candidate-pairs result row for row — while the banding
  * join only ever sees one representative per distinct embedding.
  */
class LshDupCollapseSpec extends AnyFunSpec with SparkTestBase {

  /** sf0.001 embeddings ×3: copy c of vector v re-enters as
    * vec_id + c·(max+1) with the IDENTICAL embedding. */
  private def dupDir: java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lshdup").toFile
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1
    e.withColumn("cp", explode(sequence(lit(0L), lit(2L))))
      .withColumn("vec_id", col("vec_id") + col("cp") * off)
      .drop("cp")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  it("collapsed top-3 equals the naive all-pairs ranking on a 3x-duplicated corpus") {
    val dir = dupDir.getAbsolutePath
    val naive = {
      val w = Window.partitionBy("vec_id").orderBy(desc("cos"), col("cand_id"))
      Similarity.lshCandidates(spark, dir)
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select(col("vec_id"), col("cand_id"), col("rnk"),
          round(col("cos"), 6).as("cos"))
    }
    val collapsed = Similarity.lshTopK(spark, dir, 3)
      .select(col("vec_id"), col("cand_id"), col("rnk"),
        round(col("cos"), 6).as("cos"))
    val n = naive.count()
    assert(n > 0)
    assert(collapsed.count() == n,
      s"row counts differ: naive=$n collapsed=${collapsed.count()}")
    assert(naive.exceptAll(collapsed).isEmpty &&
      collapsed.exceptAll(naive).isEmpty,
      "collapsed top-k diverged from the naive ranking on duplicated data")
    // every copy group's nearest neighbor is a sibling copy (cos 1.0)
    val top1 = collapsed.filter(col("rnk") === 1)
    assert(top1.filter(col("cos") === 1.0).count() == top1.count(),
      "with 3 copies of every vector, each top-1 must be an exact copy")
  }
}
