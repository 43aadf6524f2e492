package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Pearson matrix (`q_corr_matrix`): bounds, pair coverage, and
  * agreement with Spark's built-in `corr` on the same scaled measures
  * (the exact-decimal moment fold must reproduce the double-precision
  * estimator to well under the 6dp output grain).
  */
class CorrMatrixSpec extends AnyFunSpec with SparkTestBase {

  it("six pairs, |r| <= 1, and each r matches functions.corr") {
    val rows = Stats.qCorrMatrix(spark, sfDir).collect()
    assert(rows.length == 6, "4 measures -> C(4,2) = 6 pairs")
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0, r.toString))
    val li = graft.Tables.lineitem(spark, sfDir).select(
      round(col("l_quantity") * 100).as("qty"),
      round(col("l_extendedprice") * 100).as("price"),
      round(col("l_discount") * 10000).as("disc"),
      round(col("l_tax") * 10000).as("tax"))
    rows.foreach { r =>
      val direct = li.agg(corr(r.getString(0), r.getString(1))).head().getDouble(0)
      assert(math.abs(r.getDouble(2) - direct) < 1e-5,
        s"${r.getString(0)}~${r.getString(1)}: exact-moment r=${r.getDouble(2)} vs corr()=$direct")
    }
  }
}
