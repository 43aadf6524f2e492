package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** Randomized property spec for [[Relational.percentilesTwoPhase]] — the
  * bucketed exact-quantile machinery behind q_percentiles /
  * q_corpus_drift / q_winsorize / the ntileExact sibling — against a
  * driver-side quantile_cont replica (sort, pos = (n−1)p, linear
  * interpolation, same 4dp HALF_UP round). Covers duplicate-heavy data,
  * integer (n−1)p positions (the hi-null coalesce path), single-row
  * groups, all-equal groups (span 0), and buckets ≪ distinct values so
  * brackets genuinely land mid-bucket.
  */
class PercentilesTwoPhaseSpec extends AnyFunSpec with SparkTestBase {

  private val PS = Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5,
    "p75" -> 0.75, "p90" -> 0.9)

  private def refQuantile(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val pos = (s.length - 1) * p
    val lo = s(pos.toInt)
    val hi = if (pos.toInt + 1 < s.length) s(pos.toInt + 1) else lo
    val v = lo + (pos - math.floor(pos)) * (hi - lo)
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def check(groups: Map[String, Seq[Double]], buckets: Int, label: String): Unit = {
    import spark.implicits._
    val src = groups.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }
      .toDF("g", "v")
    val got = Relational.percentilesTwoPhase(src, "g", "v", PS, buckets)
      .collect().map { r =>
        r.getString(0) -> PS.indices.map(i => r.getDouble(i + 1))
      }.toMap
    val expected = groups.map { case (g, vs) =>
      g -> PS.map { case (_, p) => refQuantile(vs, p) }
    }
    assert(got.keySet == expected.keySet, label)
    expected.foreach { case (g, exp) =>
      assert(got(g) == exp, s"$label group $g: ${got(g)} vs $exp")
    }
  }

  it("matches the quantile_cont replica over randomized duplicate-heavy groups") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 6) {
      val groups = (1 to (1 + rnd.nextInt(4))).map { gi =>
        val n = 1 + rnd.nextInt(300)
        // small value domain -> heavy duplicates and sparse buckets
        s"g$gi" -> Seq.fill(n)(rnd.nextInt(25).toDouble / 2.0)
      }.toMap
      check(groups, buckets = 16, s"trial $trial")
    }
  }

  it("integer (n-1)p positions take the hi-null coalesce path exactly") {
    // n = 5: (n-1)p is integer for p in {0.25, 0.5, 0.75}
    check(Map("a" -> Seq(10.0, 20.0, 30.0, 40.0, 50.0)), 8, "n=5 exact positions")
    // n = 11: integer for p in {0.1, 0.5, 0.9}
    check(Map("b" -> (1 to 11).map(_.toDouble)), 8, "n=11 exact positions")
  }

  it("degenerate groups: single row, all-equal values, two rows") {
    check(Map(
      "one" -> Seq(7.5),
      "flat" -> Seq.fill(40)(3.0),
      "pair" -> Seq(1.0, 2.0)), 8, "degenerate groups")
  }

  it("brackets landing mid-bucket when buckets << distinct values") {
    val rnd = new scala.util.Random(29)
    val vs = Seq.fill(400)(rnd.nextDouble() * 1000)
    check(Map("wide" -> vs), buckets = 4, "B=4 forces in-bucket ranking")
  }
}
