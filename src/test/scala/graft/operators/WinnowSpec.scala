package graft.operators

import graft.SparkTestBase
import graft.functions.HashFns
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Winnowing invariants: the MOSS detection guarantee (a shared run of
  * ≥ W+K-1 words ⇒ ≥1 shared fingerprint), agreement with a sequential
  * reference implementation, and non-vacuous near-dup pairs on the
  * fixture corpus.
  */
class WinnowSpec extends AnyFunSpec with SparkTestBase {

  private val K = TextAnalysis.WIN_K
  private val W = TextAnalysis.WIN_W

  /** Sequential reference winnow: gram h60s, then distinct window minima. */
  private def refWinnow(text: String): Set[Long] = {
    val words = text.split(" ")
    val grams = words.sliding(K).filter(_.length == K).map(_.mkString(" ")).toArray
    val gh = grams.map(HashFns.h60Local)
    if (gh.isEmpty) Set.empty
    else if (gh.length < W) Set(gh.min)
    else gh.sliding(W).map(_.min).toSet
  }

  private def sparkWinnow(texts: Seq[String]): Map[Long, Set[Long]] = {
    import scala.jdk.CollectionConverters._
    val rows = texts.zipWithIndex.map { case (t, i) =>
      org.apache.spark.sql.Row(i.toLong, t)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows.asJava, schema)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("gh", TextAnalysis.gramHashes(col("w"), K))
      .select(col("doc_id"), TextAnalysis.winnowFromGrams(col("gh"), W).as("fps"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
  }

  it("matches the sequential reference implementation, including short docs") {
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "one two three four",            // exactly K words → 1 gram → 1 fp
      "tiny doc",                      // < K words → no fingerprints
      "x y z w v u t s r q p o n m l k j i h g f e d c b a")
    val got = sparkWinnow(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refWinnow(t), s"doc $i diverged")
    }
  }

  it("detection guarantee: a shared run of W+K-1 words shares a fingerprint") {
    val run = (1 to (W + K - 1)).map(i => s"shared$i").mkString(" ")
    val docA = s"prefix words here $run and then something else entirely"
    val docB = s"totally different opening $run closing words differ too"
    val fps = sparkWinnow(Seq(docA, docB))
    assert((fps(0L) & fps(1L)).nonEmpty,
      "documents sharing a guarantee-length run produced disjoint fingerprints")
  }

  it("q_dedup_winnow finds non-vacuous pairs agreeing with high-jaccard truth") {
    val pairs = Dedup.qDedupWinnow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty, "no winnow near-dup pairs on the fixture corpus")
    // every exact-Jaccard>=0.8 pair (the jaccard query's output) should
    // also be winnow-detected: near-identical docs share most windows
    val strong = Dedup.qDedupNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.subsetOf(pairs),
      s"winnow missed strong near-dups: ${strong -- pairs}")
  }
}
