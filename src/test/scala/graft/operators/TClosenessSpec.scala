package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** t-closeness audit (`q_t_closeness`): ordered-categorical EMD between
  * each QI group's sensitive distribution and the global one.
  */
class TClosenessSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  private def pop(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("c_nationkey", "c_mktsegment", "bal_band", "pri")

  private def audit(rows: Seq[(Long, String, Long, String)]) = {
    val r = Privacy.tClosenessOf(pop(rows)).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
  }

  describe("tClosenessOf") {

    it("groups mirroring the global distribution score EMD 0") {
      // two groups, identical 50/50 split over two priorities
      val rows = Seq(
        (1L, "A", 0L, "1-URGENT"), (1L, "A", 0L, "5-LOW"),
        (2L, "A", 0L, "1-URGENT"), (2L, "A", 0L, "5-LOW"))
      val (nGroups, kCats, maxEmd, avgEmd, nViol) = audit(rows)
      assert(nGroups == 2 && kCats == 2)
      assert(maxEmd == 0.0 && avgEmd == 0.0 && nViol == 0)
    }

    it("fully-polarized groups score the closed-form EMD 0.5 (k=2) and violate t") {
      // group1 all URGENT, group2 all LOW, equal sizes -> global 50/50;
      // cum gap |1-0.5| at the first category, /(k-1)=1 -> EMD 0.5 each
      val rows = Seq(
        (1L, "A", 0L, "1-URGENT"), (1L, "A", 0L, "1-URGENT"),
        (2L, "A", 0L, "5-LOW"), (2L, "A", 0L, "5-LOW"))
      val (nGroups, kCats, maxEmd, avgEmd, nViol) = audit(rows)
      assert(nGroups == 2 && kCats == 2)
      assert(math.abs(maxEmd - 0.5) < 1e-9 && math.abs(avgEmd - 0.5) < 1e-9)
      assert(nViol == 2)
    }

    it("EMD is order-aware: adjacent-category skew scores below far-category skew") {
      // k=3 ordered cats; one balanced group fixes the global near-uniform.
      // A group skewed to the NEAR category must sit closer than one
      // skewed to the FAR category (the reason t-closeness uses EMD, not
      // variational distance, on ordered attributes).
      def emdOf(skewPri: String): Double = {
        val base = (1 to 12).flatMap { i =>
          Seq((1L, "A", 0L, "1-URGENT"), (1L, "A", 0L, "3-MEDIUM"), (1L, "A", 0L, "5-LOW"))
        }
        val skew = (1 to 12).map(_ => (2L, "A", 0L, skewPri))
        val df = Privacy.tClosenessOf(pop(base ++ skew))
        df.collect().head.getDouble(2) // max_emd = the skewed group's
      }
      val near = emdOf("3-MEDIUM") // middle category
      val far  = emdOf("5-LOW")    // extreme category
      assert(near < far, s"near=$near must be < far=$far")
    }

    it("runs green on the sf table shape (non-vacuous group census)") {
      val r = Privacy.qTCloseness(spark, sfDir).collect().head
      assert(r.getLong(0) > 0, "must audit at least one QI group")
      assert(r.getLong(1) == 5, "orderpriority is a 5-value enum")
      assert(r.getDouble(2) >= r.getDouble(3), "max >= avg")
      assert(r.getDouble(2) <= 1.0 + 1e-9, "normalized EMD is <= 1")
    }
  }
}
