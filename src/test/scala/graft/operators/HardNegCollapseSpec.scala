package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** `Similarity.hardNegativesOf`'s contract: on a corpus with exact-
  * duplicate (embedding, label) rows — ScaleUp's verbatim-copy
  * amplification — the representative-collapsed mining equals the naive
  * member-level within-cell pair scan row for row, while the pair join
  * only ever sees one representative per distinct (embedding, label).
  */
class HardNegCollapseSpec extends AnyFunSpec with SparkTestBase {

  /** sf0.001 embeddings ×3: copy c of vector v re-enters as
    * vec_id + c·(max+1) with identical embedding AND label. */
  private def dupEmb = {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1
    e.withColumn("cp", explode(sequence(lit(0L), lit(2L))))
      .withColumn("vec_id", col("vec_id") + col("cp") * off)
      .drop("cp")
  }

  it("collapsed mining equals the naive member-level scan on a 3x-duplicated corpus") {
    val emb = dupEmb.cache()
    val naive = Similarity.hardNegativesNaive(spark, emb)
    val collapsed = Similarity.hardNegativesOf(spark, emb)
    val n = naive.count()
    assert(n > 0)
    assert(collapsed.count() == n,
      s"row counts differ: naive=$n collapsed=${collapsed.count()}")
    assert(naive.exceptAll(collapsed).isEmpty &&
      collapsed.exceptAll(naive).isEmpty,
      "collapsed hard negatives diverged from the naive member-level scan")
    // every copy's hardest negative is shared with its siblings: the
    // chosen neg_id is always a group representative (a minimum member
    // id), so the distinct neg set must not exceed the distinct groups
    val distinctNegs = collapsed.select("neg_id").distinct().count()
    val groups = emb.select("embedding", "label").distinct().count()
    assert(distinctNegs <= groups,
      s"neg ids must be group representatives: $distinctNegs > $groups")
  }
}
