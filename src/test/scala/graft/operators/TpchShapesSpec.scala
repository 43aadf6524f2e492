package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Q14/Q19 shapes: share bounds, disjunctive-band recomputation, and the
  * pushable predicate envelope.
  */
class TpchShapesSpec extends AnyFunSpec with SparkTestBase {

  it("q_promo_share yields a share strictly inside (0, 100) with consistent parts") {
    val r = Relational.qPromoShare(spark, sfDir).collect().head
    val (promo, total, pct) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(total > 0 && promo > 0 && promo < total, s"degenerate shares: $r")
    assert(pct > 0 && pct < 100)
    val recomputed = BigDecimal(100.0 * promo / total)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pct == recomputed)
  }

  it("q_band_revenue equals the union of the three single-band queries") {
    val got = Relational.qBandRevenue(spark, sfDir).collect().head
    val joined = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
    def band(brand: String, s1: Int, s2: Int, q1: Int, q2: Int) =
      joined.filter(col("p_brand") === brand && col("p_size").between(s1, s2) &&
        col("l_quantity").between(q1, q2))
    val n = band("Brand#4", 1, 15, 1, 15).count() +
      band("Brand#2", 10, 30, 10, 25).count() +
      band("Brand#19", 20, 50, 25, 40).count()
    assert(got.getLong(0) == n, s"band union mismatch: ${got.getLong(0)} vs $n")
    assert(n > 0, "vacuous band predicate")
  }

  it("q_band_revenue pushes the quantity envelope into the fact scan") {
    val plan = Relational.qBandRevenue(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_quantity[^\\]]*\\].*"),
      s"quantity envelope not pushed:\n$plan")
  }
}
