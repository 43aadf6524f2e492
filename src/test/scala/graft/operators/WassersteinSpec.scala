package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** q_wasserstein: binned earth-mover distance between the two segments'
  * order values — driver replay + the mean-difference lower bound.
  */
class WassersteinSpec extends AnyFunSpec with SparkTestBase {

  lazy val xs = Tables.orders(spark, sfDir)
    .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
    .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
    .select("c_mktsegment", "o_totalprice")
    .collect().map(r => (r.getString(0), r.getDouble(1)))

  lazy val row = Stats.qWasserstein(spark, sfDir).head

  it("matches a driver-side binned W1 replay") {
    val bin = 1000.0
    def binned(g: String) = xs.filter(_._1 == g)
      .map(x => math.floor(x._2 / bin).toLong)
    val a = binned("BUILDING"); val b = binned("MACHINERY")
    val buckets = (a ++ b).distinct.sorted
    var cumA = 0L; var cumB = 0L; var g = BigInt(0)
    buckets.zipWithIndex.foreach { case (bk, i) =>
      cumA += a.count(_ == bk); cumB += b.count(_ == bk)
      if (i + 1 < buckets.length) {
        val width = buckets(i + 1) - bk // empty buckets still carry the gap
        g += (BigInt(cumA) * b.length - BigInt(cumB) * a.length).abs * width
      }
    }
    val w1 = bin * g.toDouble / (a.length.toDouble * b.length)
    assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
    assert(math.abs(row.getDouble(2) - w1) < 1e-3,
      s"w1 ${row.getDouble(2)} vs replay $w1")
  }

  it("W1 dominates the absolute difference of binned means") {
    val bin = 1000.0
    def meanBinned(g: String) = {
      val v = xs.filter(_._1 == g).map(x => math.floor(x._2 / bin) * bin)
      v.sum / v.length
    }
    // W1(F_a, F_b) >= |E[a] - E[b]| for any coupling; binned both sides
    // (bucket floor, not center, so the identity holds exactly on the grid)
    val lb = math.abs(meanBinned("BUILDING") - meanBinned("MACHINERY"))
    assert(row.getDouble(2) >= lb - 1e-6)
  }
}
