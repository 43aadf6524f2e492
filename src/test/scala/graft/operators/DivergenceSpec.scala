package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Jensen–Shannon source-vs-corpus divergence (`q_js_divergence`):
  * closed-form pins on constructed corpora plus range/total invariants
  * on the driver corpus.
  */
class DivergenceSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  private def js(docs: org.apache.spark.sql.DataFrame) =
    Pipeline.jsDivergence(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  describe("jsDivergence") {

    it("is exactly 0 when one source IS the corpus") {
      val docs = Seq(("alpha beta gamma delta", "s1"), ("beta gamma alpha alpha", "s1"))
        .toDF("text", "source")
      val got = js(docs)
      assert(got.keySet == Set("s1"))
      assert(got("s1") == ((8L, 0.0)))
    }

    it("matches the closed form (3/4)ln(4/3) for two disjoint equal-mass sources") {
      // 8 distinct words per source (16 total < JS_V: no OOV), equal token counts
      val a = (1 to 8).map(i => s"aw$i").mkString(" ")
      val b = (1 to 8).map(i => s"bw$i").mkString(" ")
      val got = js(Seq((a, "sa"), (b, "sb")).toDF("text", "source"))
      val expect = 0.75 * math.log(4.0 / 3.0)
      assert(got.keySet == Set("sa", "sb"))
      got.values.foreach { case (n, v) =>
        assert(n == 8L)
        assert(math.abs(v - expect) < 1e-6, s"js=$v expect=$expect")
      }
    }

    it("on the corpus: 0 <= js <= ln 2 and token totals conserve") {
      val docs = Tables.documents(spark, sfDir)
      val rows = Pipeline.jsDivergence(docs).collect()
      val ln2 = math.log(2.0)
      rows.foreach { r =>
        val v = r.getDouble(2)
        assert(v >= 0.0 && v <= ln2 + 1e-9, s"${r.getString(0)}: js=$v out of [0, ln2]")
      }
      val totalTokens = docs
        .select(sum(size(split(col("text"), " ")))).as[Long].head()
      assert(rows.map(_.getLong(1)).sum == totalTokens)
      assert(rows.map(_.getDouble(2)).exists(_ > 0.0), "gauge must be non-vacuous")
    }
  }
}
