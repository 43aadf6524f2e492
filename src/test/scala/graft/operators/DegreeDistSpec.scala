package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Degree distribution of the trading graph (`q_degree_dist`):
  * integer-exact log2 binning and census conservation.
  */
class DegreeDistSpec extends AnyFunSpec with SparkTestBase {

  describe("q_degree_dist") {

    it("bins are the highest-set-bit position and bounds sit inside [2^bin, 2^(bin+1))") {
      val rows = Graph.qDegreeDist(spark, sfDir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (bin, minD, maxD) = (r.getLong(1), r.getLong(3), r.getLong(4))
        assert(minD <= maxD)
        assert(minD >= (1L << bin) && maxD < (1L << (bin + 1)),
          s"bin $bin holds degrees [$minD,$maxD] outside [${1L << bin},${1L << (bin + 1)})")
        assert(bin == 63 - java.lang.Long.numberOfLeadingZeros(minD),
          s"bin $bin disagrees with the bit position of $minD")
      }
    }

    it("the node census conserves: per-side totals equal the distinct node counts") {
      val rows = Graph.qDegreeDist(spark, sfDir).collect()
      val bySide = rows.groupBy(_.getString(0))
        .view.mapValues(_.map(_.getLong(2)).sum).toMap
      val pairs = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct()
      val nCust = pairs.select("o_custkey").distinct().count()
      val nSupp = pairs.select("l_suppkey").distinct().count()
      assert(bySide("c") == nCust && bySide("s") == nSupp,
        s"census $bySide vs direct ($nCust, $nSupp)")
    }
  }
}
