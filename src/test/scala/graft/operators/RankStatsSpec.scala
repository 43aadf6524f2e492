package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** The rank-statistics family: Ranks.avgRank2 (distributed two-pass
  * ranking), q_mannwhitney, q_spearman, q_anova, plus the session's
  * relational/privacy/text additions — each pinned by an independent
  * driver-side replay; the DuckDB oracle re-checks cross-engine at
  * sf0.01.
  */
class RankStatsSpec extends AnyFunSpec with SparkTestBase {

  describe("Ranks.avgRank2") {
    it("matches a driver-side sort-rank with average ties on a planted frame") {
      import spark.implicits._
      // values with heavy ties across partition boundaries
      val vals = Seq(5.0, 1.0, 3.0, 3.0, 2.0, 3.0, 1.0, 5.0, 4.0, 4.0)
      val got = Ranks.avgRank2(spark, vals.toDF("v")).collect()
        .map(r => (r.getDouble(0), (r.getLong(1), r.getLong(2)))).toMap
      // avg rank of value v = |{x < v}| + (cnt+1)/2; rank2 doubles it
      val sorted = vals.sorted
      vals.distinct.foreach { v =>
        val below = sorted.count(_ < v)
        val cnt = sorted.count(_ == v)
        assert(got(v) == ((cnt.toLong, 2L * below + cnt + 1)), s"value $v")
      }
    }

    it("rank sums telescope: sum(cnt*rank2) == n*(n+1) over any column") {
      val ranks = Ranks.avgRank2(spark,
        Tables.orders(spark, sfDir).select("o_totalprice"))
      val row = ranks.agg(
        sum(col("cnt")).as("n"),
        sum(col("cnt") * col("rank2")).as("s2")).head
      val n = row.getLong(0)
      assert(row.getLong(1) == n * (n + 1), "2*sum(ranks) must be n(n+1)")
    }
  }

  describe("q_mannwhitney") {
    lazy val row = Stats.qMannWhitney(spark, sfDir).head

    it("matches a driver-side replay of U and z") {
      val xs = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment"), col("o_totalprice"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      val all = xs.map(_._2).sorted
      def avgRank(v: Double): Double =
        all.count(_ < v) + (all.count(_ == v) + 1) / 2.0
      val ra = xs.filter(_._1 == "BUILDING").map(x => avgRank(x._2)).sum
      val na = xs.count(_._1 == "BUILDING")
      val nb = xs.count(_._1 == "MACHINERY")
      val ua = ra - na.toLong * (na + 1) / 2.0
      assert(row.getLong(0) == na && row.getLong(1) == nb)
      assert(math.abs(row.getDouble(3) - ua) < 1e-6, s"u_a ${row.getDouble(3)} vs $ua")
      assert(math.abs(row.getDouble(4) - (na.toDouble * nb - ua)) < 1e-6)
      val counts = all.groupBy(identity).view.mapValues(_.length.toLong)
      val tsum = counts.values.map(t => t * t * t - t).sum.toDouble
      val nTot = (na + nb).toDouble
      val z = (ua - na.toDouble * nb / 2.0) /
        math.sqrt(na.toDouble * nb / 12.0 * ((nTot + 1) - tsum / (nTot * (nTot - 1))))
      assert(math.abs(row.getDouble(5) - z) < 1e-5, s"z ${row.getDouble(5)} vs $z")
    }

    it("U_a + U_b = n_a * n_b (the rank-sum identity)") {
      assert(row.getDouble(3) + row.getDouble(4) ==
        row.getLong(0).toDouble * row.getLong(1))
    }
  }

  describe("q_spearman") {
    it("matches a driver-side Spearman with average ties") {
      val xs = Tables.lineitem(spark, sfDir)
        .select("l_quantity", "l_extendedprice")
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      def avgRanks(vs: Array[Double]): Array[Double] = {
        val sorted = vs.sorted
        val below = vs.map(v => sorted.count(_ < v))
        val cnt = vs.map(v => sorted.count(_ == v))
        below.zip(cnt).map { case (b, c) => b + (c + 1) / 2.0 }
      }
      val rq = avgRanks(xs.map(_._1))
      val rp = avgRanks(xs.map(_._2))
      val n = xs.length.toDouble
      val (mq, mp) = (rq.sum / n, rp.sum / n)
      val cov = rq.zip(rp).map { case (a, b) => (a - mq) * (b - mp) }.sum
      val vq = rq.map(a => (a - mq) * (a - mq)).sum
      val vp = rp.map(a => (a - mp) * (a - mp)).sum
      val rho = cov / math.sqrt(vq * vp)
      val row = Stats.qSpearman(spark, sfDir).head
      assert(row.getLong(0) == xs.length)
      assert(math.abs(row.getDouble(1) - rho) < 1e-5,
        s"rho ${row.getDouble(1)} vs replay $rho")
    }

    it("reports near-zero association (this generator draws qty and price independently)") {
      // unlike real TPC-H (price = qty x unit price), the driver's synthetic
      // generator samples the two columns independently — a correct Spearman
      // must say so, |rho| ~ 0 under the null
      assert(math.abs(Stats.qSpearman(spark, sfDir).head.getDouble(1)) < 0.05)
    }
  }

  describe("q_anova") {
    it("matches a driver-side one-way ANOVA over segments") {
      val xs = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), round(col("o_totalprice") * 100).cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
      val groups = xs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val k = groups.size
      val nTot = xs.length
      val grand = xs.map(_._2).sum / nTot
      val ssb = groups.values.map { g =>
        val m = g.sum / g.length; g.length * (m - grand) * (m - grand)
      }.sum
      val ssw = groups.values.flatMap { g =>
        val m = g.sum / g.length; g.map(v => (v - m) * (v - m))
      }.sum
      val f = (ssb / (k - 1)) / (ssw / (nTot - k))
      val row = Stats.qAnova(spark, sfDir).head
      assert(row.getLong(0) == k && row.getLong(1) == nTot)
      assert(math.abs(row.getDouble(4) - f) / f < 1e-6,
        s"F ${row.getDouble(4)} vs replay $f")
      val eta = ssb / (ssb + ssw)
      assert(math.abs(row.getDouble(5) - eta) < 1e-6)
    }
  }

  describe("q_l_diversity") {
    it("distinct-l and entropy match a direct replay, and entropy_l <= l_distinct") {
      val rows = Privacy.qLDiversity(spark, sfDir).collect()
      val cells = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "c_nationkey", "o_orderpriority")
        .count().collect()
        .map(r => ((r.getString(0), r.getInt(1).toLong), (r.getString(2), r.getLong(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(rows.length == cells.size)
      rows.foreach { r =>
        val key = (r.getString(0), r.getLong(1))
        val parts = cells(key)
        assert(r.getLong(3) == parts.length, s"$key l_distinct")
        val n = parts.map(_._2).sum.toDouble
        val ent = parts.map(_._2).map { c =>
          -(c / n) * math.log(c / n)
        }.sum
        assert(math.abs(r.getDouble(4) - math.exp(ent)) < 1e-4, s"$key entropy")
        // entropy l-diversity is bounded above by distinct l
        assert(r.getDouble(4) <= r.getLong(3) + 1e-9)
      }
    }
  }

  describe("q_min_price_supplier and q_returned_customers") {
    it("every min-price row carries its part's true minimum offer") {
      val offers = Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir).filter(col("p_size") === 25),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(min(round(col("l_extendedprice") / col("l_quantity") * 1e6).cast("long"))
          .as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val bests = offers.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      Relational.qMinPriceSupplier(spark, sfDir).collect().foreach { r =>
        val micros = math.round(r.getDouble(4) * 1e6)
        assert(micros == bests(r.getLong(0)), s"part ${r.getLong(0)}")
      }
    }

    it("returned-customer revenue only counts R lines and ranks descending") {
      val rows = Relational.qReturnedCustomers(spark, sfDir).collect()
      assert(rows.nonEmpty)
      val revs = rows.map(_.getDouble(3))
      assert(revs.sameElements(revs.sortBy(-_)), "must rank by revenue desc")
      val expected = Tables.lineitem(spark, sfDir)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")) / 100.0).as("rev"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.foreach(r => assert(expected(r.getLong(0)) == r.getDouble(3)))
    }
  }

  describe("q_readability") {
    it("counts words/sentences/syllables exactly on a planted doc") {
      import spark.implicits._
      withTempDir { dir =>
        val doc = "The quick fox. It jumped! Really? Extraordinary syllables abound."
        Seq((1L, doc, "en", "web", doc.length.toLong))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.parquet(s"$dir/documents.parquet")
        val r = TextAnalysis.qReadability(spark, dir.toString).head
        assert(r.getLong(2) == 9, "words")   // 9 whitespace tokens
        assert(r.getLong(3) == 4, "sentences")
        // vowel groups: e-ui-o (3) + i-u-e (3) + ea-y (2) + e-ao-i-a-y (5)
        //   + y-a-e-ou (4) = manual count below
        val syl = "aeiouy+".r
        val manual = "[aeiouy]+".r.findAllIn(doc.toLowerCase).length
        assert(r.getLong(4) == manual, "syllables")
      }
    }

    it("flesch derives from the summed integer counts") {
      TextAnalysis.qReadability(spark, sfDir).collect().foreach { r =>
        val w = r.getLong(2).toDouble
        val s = r.getLong(3).toDouble
        val syl = r.getLong(4).toDouble
        val expected = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        assert(math.abs(r.getDouble(9) - expected) < 5e-5)
      }
    }
  }
}
