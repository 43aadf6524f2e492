package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funspec.AnyFunSpec

/** Property-style checks over GENERATED inputs (scalacheck Gen with a
  * fixed seed, evaluated in single Spark jobs): the algebraic laws the
  * operators rely on but example-based specs can't pin —
  * scrub idempotency, Morton-key injectivity, and the rolling hash's
  * composition identity.
  */
class AlgebraicPropertySpec extends AnyFunSpec with SparkTestBase {

  /** Deterministic sample of `n` values from a Gen (fixed seed so the
    * suite never flakes on generator luck). */
  private def sample[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate((rng.Seed(42L), List.empty[T])) { case (seed, acc) =>
      val r = g.pureApply(params, seed)
      (seed.next, r :: acc)
    }.drop(n).next()._2
  }

  describe("Privacy.scrub") {
    it("is idempotent over generated text with embedded PII fragments") {
      import spark.implicits._
      val word = Gen.oneOf("data", "call", "now", "at", "x1", "mail-to", "10", "1.2", "a@b", "..")
      val pii = Gen.oneOf(
        "bob@example.com", "a.b-c@d.co", "555-123-4567", "10.0.0.1", "255.255.255.255")
      val frag = Gen.frequency(4 -> word, 2 -> pii)
      val text = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, frag)).map(_.mkString(" "))
      val rows = sample(text, 300)
      val df = rows.toDF("t").select(
        Privacy.scrub(col("t")).as("once"),
        Privacy.scrub(Privacy.scrub(col("t"))).as("twice"))
      val bad = df.filter(col("once") =!= col("twice")).as[(String, String)].collect()
      assert(bad.isEmpty, s"scrub not idempotent on: ${bad.take(3).toSeq}")
    }
  }

  describe("Layout.morton") {
    it("is injective over the full 8-bit x 8-bit domain") {
      // 65536 distinct (x, y) pairs must map to 65536 distinct keys —
      // bit interleaving is a bijection onto 0..65535
      val pairs = spark.range(65536).selectExpr("id div 256 AS x", "id % 256 AS y")
      val keyed = pairs.select(Layout.morton(col("x"), col("y")).as("z"))
      val stats = keyed.agg(
        countDistinct("z").as("d"), min("z").as("lo"), max("z").as("hi")).head
      assert(stats.getAs[Long]("d") == 65536L, "morton key collided")
      assert(stats.getAs[Long]("lo") == 0L && stats.getAs[Long]("hi") == 65535L)
    }
  }

  describe("TextAnalysis.rollingHash") {
    it("composes: h(a ++ b) == (h(a) * B^|b| + h(b)) mod P on generated word lists") {
      val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "key", "42")
      val list = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
      val rows = sample(Gen.zip(list, list), 200)
      val df = spark.createDataFrame(rows).toDF("a", "b")
      val wa = split(col("a"), " ")
      val wb = split(col("b"), " ")
      // split("") yields [""], not [] — concat the word ARRAYS, not the
      // strings, so empty sides behave as identity elements
      val awords = when(col("a") === "", array().cast("array<string>")).otherwise(wa)
      val bwords = when(col("b") === "", array().cast("array<string>")).otherwise(wb)
      val bPow = aggregate(bwords, lit(1L), (acc, _) => (acc * TextAnalysis.RH_B) % TextAnalysis.RH_P)
      val lhs = TextAnalysis.rollingHash(concat(awords, bwords))
      val rhs = (TextAnalysis.rollingHash(awords) * bPow + TextAnalysis.rollingHash(bwords)) % TextAnalysis.RH_P
      val bad = df.select(col("a"), col("b"), lhs.as("l"), rhs.as("r"))
        .filter(col("l") =!= col("r")).collect()
      assert(bad.isEmpty, s"composition law broken on: ${bad.take(3).toSeq}")
    }
  }
}
