package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Round-11 TPC-H-shape completions (q_top_supplier, q_supplier_breadth,
  * q_disjunctive_revenue, q_dominant_supplier, q_mix_shift): each pinned
  * by an invariant recomputed through an independent path; the DuckDB
  * oracle re-checks cross-engine at sf0.01.
  */
class SupplyShapesSpec extends AnyFunSpec with SparkTestBase {

  private def revCents = round(col("l_extendedprice")
    * (lit(1) - col("l_discount")) * 100).cast("long")

  describe("q_top_supplier") {
    lazy val rows = Relational.qTopSupplier(spark, sfDir).collect()

    lazy val perSupp = Tables.lineitem(spark, sfDir)
      .select((year(col("l_shipdate")) * 10 + quarter(col("l_shipdate"))).as("q"),
        col("l_suppkey"), revCents.as("c"))
      .groupBy("q", "l_suppkey").agg(sum("c").as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

    it("covers every ship quarter exactly once per winning supplier") {
      val quarters = perSupp.map(_._1).distinct.sorted
      assert(rows.map(_.getInt(0)).distinct.sorted.sameElements(quarters))
    }

    it("each winner's revenue equals the quarter max; ALL ties are kept") {
      val maxByQ = perSupp.groupBy(_._1).view
        .mapValues(g => g.map(_._3).max).toMap
      val winners = perSupp
        .filter { case (q, _, c) => c == maxByQ(q) }
        .map { case (q, k, _) => (q, k) }.toSet
      assert(rows.length == winners.size, "winner multiset differs")
      rows.foreach { r =>
        val (q, k) = (r.getInt(0), r.getLong(1))
        assert(winners.contains((q, k)), s"($q,$k) is not a true winner")
        assert(math.round(r.getDouble(3) * 100) == maxByQ(q),
          s"quarter $q revenue is not the max")
      }
    }
  }

  describe("q_supplier_breadth") {
    lazy val rows = Relational.qSupplierBreadth(spark, sfDir).collect()

    it("counts distinct non-excluded suppliers per (type, band) exactly") {
      val excluded = Tables.supplier(spark, sfDir)
        .filter(col("s_acctbal") < 0)
        .collect().map(_.getLong(0)).toSet
      val direct = Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
        .select(col("p_type"),
          floor((col("p_size") - 1) / lit(10.0)).cast("long").as("b"),
          col("l_suppkey"))
        .collect()
        .filter(r => !excluded.contains(r.getLong(2)))
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.length).toMap
      assert(rows.nonEmpty && rows.length == direct.size)
      rows.foreach { r =>
        assert(r.getLong(2) == direct((r.getString(0), r.getLong(1))))
      }
    }
  }

  describe("q_disjunctive_revenue") {
    lazy val rows = Relational.qDisjunctiveRevenue(spark, sfDir).collect()

    it("branch totals match independent single-branch queries") {
      val li = Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      val branches = Seq(
        (1, "Brand#12", 10, 1, 11), (2, "Brand#23", 15, 10, 20),
        (3, "Brand#5", 25, 20, 30))
      val expected = branches.flatMap { case (b, brand, szHi, qLo, qHi) =>
        val hit = li.filter(col("p_brand") === brand &&
          col("p_size").between(1, szHi) && col("l_quantity").between(qLo, qHi))
        val agg = hit.agg(count(lit(1)), sum(revCents)).head
        if (agg.getLong(0) == 0) None
        else Some(b -> (agg.getLong(0), agg.getLong(1)))
      }.toMap
      assert(rows.length == expected.size)
      rows.foreach { r =>
        val (n, cents) = expected(r.getInt(0))
        assert(r.getLong(1) == n)
        assert(math.round(r.getDouble(2) * 100) == cents)
      }
    }

    it("branches are disjoint: tagged rows sum to the OR-filter count") {
      val li = Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      val orCount = li.filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#5" && col("p_size").between(1, 25) &&
          col("l_quantity").between(20, 30))).count()
      assert(rows.map(_.getLong(1)).sum == orCount)
    }
  }

  describe("q_dominant_supplier") {
    lazy val rows = Relational.qDominantSupplier(spark, sfDir).collect()

    it("reconciles with a driver-side fair-share replay") {
      val ps = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_suppkey"),
          round(col("l_quantity")).cast("long").as("q"))
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val byPart = ps.groupBy(_._1._1).view
        .mapValues(g => (g.values.sum, g.size)).toMap
      val led = ps.toSeq.collect {
        case ((part, supp), q)
          if q * byPart(part)._2 >= 2 * byPart(part)._1 => (supp, q)
      }
      val expected = led.groupBy(_._1).view
        .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
      assert(rows.nonEmpty && rows.length == expected.size)
      rows.foreach { r =>
        val (n, q) = expected(r.getLong(0))
        assert(r.getLong(2) == n && r.getLong(3) == q,
          s"supplier ${r.getLong(0)}")
      }
    }

    it("orders by parts-led descending") {
      val ns = rows.map(_.getLong(2))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    }
  }

  describe("q_mix_shift") {
    lazy val rows = Relational.qMixShift(spark, sfDir).collect()

    it("per-segment effects telescope to the overall mean delta") {
      val byYear = Tables.orders(spark, sfDir)
        .filter(year(col("o_orderdate")).isin(1997, 1998))
        .select(year(col("o_orderdate")).as("yr"),
          round(col("o_totalprice") * 100).cast("long").as("c"))
        .groupBy("yr").agg(count(lit(1)).as("n"), sum("c").as("c"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val m1 = byYear(1997)._2.toDouble / byYear(1997)._1 / 100.0
      val m2 = byYear(1998)._2.toDouble / byYear(1998)._1 / 100.0
      val effectSum = rows.map(r => r.getDouble(7) + r.getDouble(8)).sum
      // each of the 5 segments carries two 6dp-rounded terms
      assert(math.abs(effectSum - (m2 - m1)) < 1e-5,
        s"telescoping broke: $effectSum vs ${m2 - m1}")
    }

    it("weights per year form a distribution") {
      val w1 = rows.map(_.getDouble(3)).sum
      val w2 = rows.map(_.getDouble(4)).sum
      assert(math.abs(w1 - 1.0) < 1e-5 && math.abs(w2 - 1.0) < 1e-5)
    }
  }
}
