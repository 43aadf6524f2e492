package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** BPE merge-application semantics: left-to-right non-overlapping
  * passes, chained merges, and parity with a sequential reference.
  */
class BpeSpec extends AnyFunSpec with SparkTestBase {

  /** Sequential reference: one left-to-right merge pass. */
  private def refPass(tokens: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = tokens
    while (rest.nonEmpty) rest match {
      case x :: y :: tail if x == a && y == b => out += s"${a}_$b"; rest = tail
      case x :: tail => out += x; rest = tail
      case Nil => ()
    }
    out.result()
  }

  private def sparkTokens(texts: Seq[String]): Seq[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    val rows = texts.zipWithIndex.map { case (t, i) => org.apache.spark.sql.Row(i.toLong, t, "en") }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(rows.asJava, schema)
    withTempDir { dir =>
      df.write.parquet(s"$dir/documents.parquet")
      // run the full pipeline but read back the final token arrays via a
      // re-tokenization of the emitted merged strings: recompute through
      // the public query is aggregate-only, so rebuild the stages here
      val start = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), split(col("text"), " ").as("t0"))
      val merged = TextAnalysis.BPE_MERGES.zipWithIndex.foldLeft(start) {
        case (d, ((a, b), i)) =>
          d.withColumn(s"t${i + 1}", TextAnalysis.bpeMergePass(col(s"t$i"), a, b))
      }
      merged.orderBy("doc_id")
        .select(col(s"t${TextAnalysis.BPE_MERGES.size}"))
        .collect().map(_.getSeq[String](0).toSeq).toSeq
    }
  }

  it("matches the sequential reference on overlap-heavy inputs") {
    val texts = Seq(
      "table hash table hash table hash",       // repeated pair
      "table table hash hash",                  // overlapping prefix
      "customer join part filter table hash",   // all three merges
      "table",                                  // single token
      "hash table hash")                        // pair not at position 0
    val got = sparkTokens(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      val expected = TextAnalysis.BPE_MERGES.foldLeft(t.split(" ").toList) {
        case (toks, (a, b)) => refPass(toks, a, b)
      }
      assert(got(i) == expected, s"doc $i: ${got(i)} != $expected")
    }
  }

  it("compression strictly below 1 on the fixture corpus (merges fire)") {
    val rows = TextAnalysis.qTokenizeBpe(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val before = rows.map(_.getAs[Long]("tokens_before")).sum
    val after = rows.map(_.getAs[Long]("tokens_after")).sum
    assert(after < before, "no merge fired on the fixture corpus")
    rows.foreach(r => assert(r.getAs[Double]("compression") <= 1.0))
  }
}
