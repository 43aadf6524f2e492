package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** BPE training: the greedy argmax must match an independent bigram
  * count, and applying the learned merges must shrink the corpus by
  * exactly the counted occurrences (pa != pb makes matches disjoint).
  */
class BpeTrainSpec extends AnyFunSpec with SparkTestBase {

  it("step-1 pair is the corpus's top non-self adjacent bigram") {
    val learned = TextAnalysis.qBpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(learned.length == TextAnalysis.BPE_TRAIN_STEPS)
    val w = col("w")
    val top = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("w"))
      .select(explode(when(size(w) >= 2,
        transform(sequence(lit(0), size(w) - 2),
          i => struct(element_at(w, i + 1).as("a"), element_at(w, i + 2).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .filter(col("p.a") =!= col("p.b"))
      .groupBy("p.a", "p.b").count()
      .orderBy(desc("count"), col("a"), col("b"))
      .limit(1).collect().head
    assert((learned.head._2, learned.head._3, learned.head._4) ==
      ((top.getString(0), top.getString(1), top.getLong(2))))
    // learned pairs are distinct and never self-pairs
    assert(learned.map(t => (t._2, t._3)).distinct.length == learned.length)
    assert(learned.forall(t => t._2 != t._3))
  }

  it("applying the learned merges shrinks the corpus by exactly the counted occurrences") {
    val learned = TextAnalysis.qBpeTrain(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    var toks = Tables.documents(spark, sfDir).select(split(col("text"), " ").as("t"))
    val before = toks.select(sum(size(col("t")))).collect().head.getLong(0)
    learned.foreach { case (a, b, _) =>
      toks = toks.select(TextAnalysis.bpeMergePass(col("t"), a, b).as("t"))
    }
    val after = toks.select(sum(size(col("t")))).collect().head.getLong(0)
    assert(before - after == learned.map(_._3).sum,
      s"merged-token accounting off: $before -> $after vs ${learned.map(_._3).sum}")
  }
}
