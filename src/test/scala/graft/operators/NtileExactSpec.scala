package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** [[Relational.ntileExact]] vs literal `ntile(n) OVER (ORDER BY v, k)`
  * over randomized frames: sizes with N mod n ≠ 0, heavy value ties
  * (id tie-break), all-equal values (span 0 — single-bucket degenerate
  * path), N < n, and a bucket count far smaller than N so boundary ranks
  * genuinely land mid-bucket.
  */
class NtileExactSpec extends AnyFunSpec with SparkTestBase {

  private def check(vs: Seq[Double], n: Int, buckets: Int, label: String): Unit = {
    import spark.implicits._
    val src = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("v", "k")
    val expected = src
      .withColumn("tile", ntile(n).over(Window.orderBy("v", "k")))
      .collect().map(r => (r.getDouble(0), r.getLong(1)) -> r.getInt(2)).toMap
    val got = Relational.ntileExact(src, "v", "k", n, "tile", buckets)
      .collect().map(r => (r.getDouble(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == expected, s"$label (N=${vs.size}, n=$n, B=$buckets)")
  }

  it("matches literal ntile over randomized sizes and tile counts") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val size = 1 + rnd.nextInt(400)
      val n = 2 + rnd.nextInt(7) // N mod n != 0 in most draws
      // values drawn from a small set → heavy ties, id tie-break exercised
      val vs = Seq.fill(size)(rnd.nextInt(20).toDouble)
      check(vs, n, buckets = 16, s"trial $trial")
    }
  }

  it("N mod n edge: exact multiples and one-off sizes") {
    val vs = (1 to 12).map(_.toDouble)
    check(vs, 4, 8, "N=12 n=4 (exact)")
    check(vs :+ 13.0, 4, 8, "N=13 n=4 (one extra -> first tile bigger)")
    check(vs.take(11), 4, 8, "N=11 n=4")
  }

  it("degenerate inputs: all-equal values (span 0) and N < n") {
    check(Seq.fill(9)(5.0), 4, 8, "all-equal values")
    check(Seq(3.0, 1.0), 5, 8, "N < n (tiles 1..N occupied)")
    check(Seq(1.0), 2, 8, "single row")
  }

  it("boundary ranks landing mid-bucket (buckets << N)") {
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(500)(rnd.nextDouble() * 100)
    check(vs, 7, 4, "B=4 forces in-bucket ranking")
  }

  it("rejects n < 2 and reserved column collisions") {
    import spark.implicits._
    val src = Seq((1.0, 1L)).toDF("v", "k")
    intercept[IllegalArgumentException](
      Relational.ntileExact(src, "v", "k", 1, "tile"))
    val bad = Seq((1.0, 1L, 0)).toDF("v", "k", "__ntx_bucket")
    intercept[IllegalArgumentException](
      Relational.ntileExact(bad, "v", "k", 4, "tile"))
  }
}
