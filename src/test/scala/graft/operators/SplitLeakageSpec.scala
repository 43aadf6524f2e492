package graft.operators

import graft.SparkTestBase
import graft.functions.HashFns
import org.scalatest.funspec.AnyFunSpec

/** Split-leakage audit semantics: the exact channel fires when copies of
  * one text land in different splits, and stays zero when they do not.
  */
class SplitLeakageSpec extends AnyFunSpec with SparkTestBase {

  private def splitOf(id: Long): String = {
    val b = HashFns.h60Local(id.toString) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  private def runWith(docs: Seq[(Long, String)]): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val rows = docs.map { case (id, t) =>
      org.apache.spark.sql.Row(id, t, "en", "src0", t.length.toLong)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    withTempDir { dir =>
      spark.createDataFrame(rows.asJava, schema).write.parquet(s"$dir/documents.parquet")
      val r = Dedup.qSplitLeakage(spark, dir.toString).collect().head
      Map("near_pairs" -> r.getLong(0), "near_leaked" -> r.getLong(1),
        "exact_leaky" -> r.getLong(2))
    }
  }

  private val fillers = Seq.tabulate(6)(i =>
    (1000L + i, s"completely unrelated filler document number $i about topic $i only"))

  it("copies of one text in different splits are flagged as exact leakage") {
    val trainId = (0L until 300L).find(splitOf(_) == "train").get
    val testId = (0L until 300L).find(splitOf(_) == "test").get
    val shared = "the exact same benchmark answer text repeated verbatim in two splits"
    val got = runWith(fillers ++ Seq((trainId, shared), (testId, shared)))
    assert(got("exact_leaky") == 1L, s"exact channel missed the straddle: $got")
  }

  it("copies within one split do not flag") {
    val ids = (0L until 500L).filter(splitOf(_) == "train").take(2)
    val shared = "the exact same benchmark answer text repeated verbatim in one split"
    val got = runWith(fillers ++ ids.map(id => (id, shared)))
    assert(got("exact_leaky") == 0L, s"false positive: $got")
  }

  it("fixture corpus: leaked near-dup pairs are a subset of all near-dup pairs") {
    val r = Dedup.qSplitLeakage(spark, sfDir).collect().head
    assert(r.getLong(1) <= r.getLong(0))
    assert(r.getLong(0) > 0, "no near-dup pairs at sf0.001 — audit vacuous")
  }
}
