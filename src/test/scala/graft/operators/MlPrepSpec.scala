package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Feature-engineering prep: leave-one-out target encoding (leakage-free
  * by construction) and hashing-trick feature bucketing.
  */
class MlPrepSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  private def fixture(rows: Seq[(Long, Int, String)]) =
    rows.toDF("o_orderkey", "cat", "ts")
      .select(col("o_orderkey"), col("cat"), col("ts").cast("decimal(18,2)").as("t"))

  describe("q_target_encode") {

    it("encodes each row by the mean of the OTHER rows in its category") {
      // cat 1: targets 10, 20, 30 -> LOO enc of the 10-row is (20+30)/2 = 25
      val enc = MlPrep.targetEncode(fixture(Seq(
        (1L, 1, "10.00"), (2L, 1, "20.00"), (3L, 1, "30.00"))))
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(enc(1L) == 25.0 && enc(2L) == 20.0 && enc(3L) == 15.0)
    }

    it("is leakage-free: a row's own target never moves its own encoding") {
      val base    = Seq((1L, 1, "10.00"), (2L, 1, "20.00"), (3L, 1, "30.00"))
      val mutated = Seq((1L, 1, "999.99"), (2L, 1, "20.00"), (3L, 1, "30.00"))
      def encOf(rows: Seq[(Long, Int, String)], id: Long) =
        MlPrep.targetEncode(fixture(rows)).filter(col("o_orderkey") === id)
          .select("te").as[Double].head()
      assert(encOf(base, 1L) == encOf(mutated, 1L),
        "row 1's encoding must depend only on the other rows")
      assert(encOf(base, 2L) != encOf(mutated, 2L),
        "other rows' encodings must see row 1's target")
    }

    it("singleton categories fall back to the leave-one-out GLOBAL mean") {
      // cat 9 has one row (t=50); global others are 10 and 20 -> enc 15
      val enc = MlPrep.targetEncode(fixture(Seq(
        (1L, 1, "10.00"), (2L, 1, "20.00"), (3L, 9, "50.00"))))
        .filter(col("o_orderkey") === 3L).select("te").as[Double].head()
      assert(enc == 15.0)
    }

    it("runs on the real tables with one encoding per order") {
      val df = MlPrep.qTargetEncode(spark, sfDir)
      val n = df.count()
      assert(n > 0 && df.select("o_orderkey").distinct().count() == n)
    }
  }

  describe("q_feature_hash") {

    it("emits exactly 3 tokens per customer into buckets [0, FH_DIM)") {
      val df = MlPrep.qFeatureHash(spark, sfDir).cache()
      val nCust = graft.Tables.dim(spark, sfDir, "customer").count()
      assert(df.agg(sum("n_tokens")).as[Long].head() == 3 * nCust)
      val buckets = df.select("bucket").as[Long].collect()
      assert(buckets.forall(b => b >= 0 && b < MlPrep.FH_DIM))
      df.unpersist()
    }

    it("records collisions (some bucket holds >1 distinct feature) and signs cancel") {
      val df = MlPrep.qFeatureHash(spark, sfDir).cache()
      assert(df.filter(col("n_feats") > 1).count() > 0,
        "FH_DIM is sized so the audit exercises real collisions")
      // |net_weight| <= n_tokens, with strict inequality somewhere a
      // collision mixes signs
      assert(df.filter(abs(col("net_weight")) > col("n_tokens")).count() == 0)
      df.unpersist()
    }

    it("is deterministic across runs") {
      val a = MlPrep.qFeatureHash(spark, sfDir).collect().toSeq
      val b = MlPrep.qFeatureHash(spark, sfDir).collect().toSeq
      assert(a == b)
    }
  }

  describe("q_woe_iv") {

    it("matches a driver-side smoothed WOE replay and IV terms are non-negative") {
      val got = MlPrep.qWoeIv(spark, sfDir).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      val rows = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.part(spark, sfDir),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), (col("l_returnflag") === "R").cast("long"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val byBrand = rows.groupBy(_._1).view
        .mapValues(xs => (xs.map(_._2).sum, xs.length - xs.map(_._2).sum)).toMap
      val gEvt = byBrand.values.map(_._1).sum.toDouble
      val gNon = byBrand.values.map(_._2).sum.toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.keySet == byBrand.keySet)
      byBrand.foreach { case (brand, (ne, nn)) =>
        val pe = (ne + MlPrep.WOE_SMOOTH) / (gEvt + MlPrep.WOE_SMOOTH)
        val pn = (nn + MlPrep.WOE_SMOOTH) / (gNon + MlPrep.WOE_SMOOTH)
        val (ge, gn, gwoe, giv) = got(brand)
        assert(ge == ne && gn == nn, s"$brand counts")
        assert(math.abs(gwoe - r6(math.log(pe / pn))) <= 1e-6, s"$brand woe")
        assert(math.abs(giv - r6((pe - pn) * math.log(pe / pn))) <= 1e-6,
          s"$brand iv")
        // (p_evt - p_non) and ln(p_evt/p_non) always share a sign
        assert(giv >= 0, s"$brand iv_term negative")
      }
    }
  }
}
