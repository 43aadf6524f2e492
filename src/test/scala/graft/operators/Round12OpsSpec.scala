package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Round-12 additions: each checked against an independent recomputation
  * through a DIFFERENT shape (driver-side replay or alternative plan) on
  * the same session; the DuckDB oracle re-checks cross-engine at sf0.01.
  */
class Round12OpsSpec extends AnyFunSpec with SparkTestBase {

  describe("q_fd_discovery (functional-dependency profile)") {

    it("agrees with a naive per-dependency recomputation and flags key FDs as holding") {
      val got = Warehouse.qFdDiscovery(spark, sfDir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5), r.getBoolean(6)))
        .toMap
      assert(got.size == 6)
      // a primary key determines everything: holds, zero repair cost
      val (nk, vk, g3k, holdsK) = got("orders: o_orderkey -> o_custkey")
      assert(holdsK && vk == 0L && g3k == 0L)
      assert(nk == Tables.orders(spark, sfDir).count()) // one group per key
      // the naive replay of a genuinely violated FD
      val naive = Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey").agg(countDistinct("l_suppkey").as("k"))
      val nLhs = naive.count()
      val nViol = naive.filter(col("k") > 1).count()
      val (n2, v2, _, holds2) = got("lineitem: l_orderkey -> l_suppkey")
      assert(n2 == nLhs && v2 == nViol && holds2 == (nViol == 0))
      assert(v2 > 0, "vacuous: the multi-supplier-order FD should be violated")
      // g3 repair cost replay: rows - majority-rhs rows per group
      val g3 = Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey", "l_suppkey").agg(count(lit(1)).as("c"))
        .groupBy("l_orderkey").agg((sum("c") - max("c")).as("fix"))
        .agg(sum("fix")).head.getLong(0)
      val g3got = Warehouse.qFdDiscovery(spark, sfDir)
        .filter(col("dependency") === "lineitem: l_orderkey -> l_suppkey")
        .head.getLong(5)
      assert(g3got == g3)
    }
  }

  describe("q_ar_fit (Yule-Walker AR(2))") {

    it("r1/r2 equal the ACF's lags and phi solves the closed form exactly") {
      val row = Stats.qArFit(spark, sfDir).head
      val (r1, r2) = (row.getDouble(1), row.getDouble(2))
      val acf = Stats.qAutocorr(spark, sfDir).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(r1 == acf(1) && r2 == acf(2), "AR moments differ from the ACF's")
      val det = 1.0 - r1 * r1
      val phi1 = BigDecimal(r1 * (1.0 - r2) / det)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val phi2 = BigDecimal((r2 - r1 * r1) / det)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getDouble(3) == phi1 && row.getDouble(4) == phi2)
      // an AR(2) cannot explain negative variance; ratio in (0, 1]
      val ratio = row.getDouble(5)
      assert(ratio > 0.0 && ratio <= 1.0)
    }
  }

  describe("q_ols_multi (two-regressor OLS)") {

    it("coefficients solve the normal equations recomputed from double moments") {
      val rows = Stats.qOlsMulti(spark, sfDir).collect()
      assert(rows.nonEmpty)
      val li = Tables.lineitem(spark, sfDir).select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("double").as("x1"),
        round(col("l_discount") * 10000).cast("double").as("x2"),
        round(col("l_extendedprice") * 100).cast("double").as("y"))
      val m = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
        sum(col("x1") * col("x1")).as("s11"), sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"), sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"), sum(col("y") * col("y")).as("syy"))
        .collect().map(r => r.getString(0) -> r).toMap
      rows.foreach { r =>
        val q = m(r.getString(0))
        val (n, s1, s2, sy) = (q.getDouble(1), q.getDouble(2), q.getDouble(3), q.getDouble(4))
        val (s11, s22, s12, s1y, s2y, syy) =
          (q.getDouble(5), q.getDouble(6), q.getDouble(7), q.getDouble(8), q.getDouble(9), q.getDouble(10))
        val (c11, c22, c12) = (n * s11 - s1 * s1, n * s22 - s2 * s2, n * s12 - s1 * s2)
        val (c1y, c2y, cyy) = (n * s1y - s1 * sy, n * s2y - s2 * sy, n * syy - sy * sy)
        val det = c11 * c22 - c12 * c12
        val b1 = (c22 * c1y - c12 * c2y) / det
        val b2 = (c11 * c2y - c12 * c1y) / det
        // float replay vs exact-integer path: equal to ~1e-6 relative
        assert(math.abs(r.getDouble(2) - b1) <= 1e-4 * math.max(1.0, math.abs(b1)))
        assert(math.abs(r.getDouble(3) - b2) <= 1e-4 * math.max(1.0, math.abs(b2)))
        val r2v = r.getDouble(4)
        assert(r2v >= 0.0 && r2v <= 1.0)
        assert(cyy > 0.0)
      }
      // NOTE: this generator draws quantity ⟂ price (r11 finding, ρ ≈ −0.01),
      // so R² is legitimately small — assert the fit is non-degenerate, not strong
      assert(rows.forall(r => !r.isNullAt(2) && !r.isNullAt(3)), "degenerate det")
    }
  }

  describe("q_periodogram (fixed-frequency seasonality)") {

    it("explained-variance fractions are valid and exactly one period family dominates") {
      val rows = EventOps.qPeriodogram(spark, sfDir).collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(12, 24, 168))
      val nHours = rows.map(_.getLong(1)).distinct
      assert(nHours.length == 1 && nHours.head > 0, "hour frame must be shared")
      rows.foreach { r =>
        val v = r.getDouble(2)
        assert(v >= -1e-9 && v <= 1.0 + 1e-9, s"R² out of range: $v")
      }
      assert(rows.count(_.getBoolean(3)) >= 1)
      val best = rows.filter(_.getBoolean(3)).map(_.getDouble(2)).head
      assert(rows.forall(_.getDouble(2) <= best))
    }
  }

  describe("q_changepoint_split (binary segmentation)") {

    it("the split day matches a driver-side BSS argmax replay") {
      val row = Stats.qChangepointSplit(spark, sfDir).head
      val daily = Tables.orders(spark, sfDir)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy("d")
        .collect().map(r => (r.getDate(0), r.getLong(1)))
      val total = daily.map(_._2).sum
      val n = daily.length
      var best = (Double.MinValue, -1)
      var s1 = 0L
      daily.zipWithIndex.foreach { case ((_, c), i) =>
        s1 += c
        val n1 = i + 1
        if (n1 >= 7 && n - n1 >= 7) {
          val (s1d, s2d, n1d, n2d) = (s1.toDouble, (total - s1).toDouble, n1.toDouble, (n - n1).toDouble)
          val bss = BigDecimal(s1d * s1d / n1d + s2d * s2d / n2d - total.toDouble * total.toDouble / n)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (bss > best._1) best = (bss, i) // strict: earlier day wins ties
        }
      }
      assert(row.getDate(0) == daily(best._2)._1,
        s"split ${row.getDate(0)} != replay ${daily(best._2)._1}")
      assert(row.getAs[Number](1).longValue == best._2 + 1 &&
        row.getAs[Number](2).longValue == n - best._2 - 1)
      // the two segment means must actually differ at the found split
      assert(row.getDouble(3) != row.getDouble(4))
    }
  }

  describe("q_did (difference-in-differences)") {

    it("matches an independent groupBy-cells recomputation") {
      val row = Stats.qDid(spark, sfDir).head
      val ev = EventOps.events(spark, sfDir)
        .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
          col("value"))
      val mid = ev.agg((min("us") + max("us")).as("mm")).head.getLong(0) / 2
      val cells = ev.groupBy((col("user_id") % 3 === 0).as("t"), (col("us") > mid).as("p"))
        .agg(avg("value").as("m"), count(lit(1)).as("n"))
        .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> (r.getDouble(2), r.getLong(3)))
        .toMap
      val did = (cells((true, true))._1 - cells((true, false))._1) -
        (cells((false, true))._1 - cells((false, false))._1)
      assert(math.abs(row.getAs[Double]("did") - did) < 1e-5)
      assert(row.getLong(0) == cells((true, true))._2)
      assert(row.getLong(3) == cells((false, false))._2)
      Seq(0, 1, 2, 3).foreach(i => assert(row.getLong(i) > 0, s"empty DiD cell $i"))
    }
  }

  describe("q_ndcg (BM25 ranking quality)") {

    it("DCG replays from the top-10 and nDCG is a valid fraction") {
      val row = TextAnalysis.qNdcg(spark, sfDir).head
      val (nm, dcg, idcg, ndcg) =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
      assert(nm > 0 && dcg > 0 && idcg >= dcg)
      assert(ndcg > 0.0 && ndcg <= 1.0)
      // driver replay of DCG: rel = distinct query terms in the doc
      val rel = Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term").isin("spark", "window", "merge"))
        .select("doc_id", "term").distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("rel"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val disc = (1 to 10).map(i => Math.round(1e6 / (Math.log(i + 1.0) / Math.log(2.0))))
      val top = TextAnalysis.qBm25(spark, sfDir).collect().map(_.getLong(0))
      val wantDcg = top.zipWithIndex.map { case (d, i) => rel(d) * disc(i) }.sum
      assert(dcg == wantDcg)
      val wantIdcg = rel.values.toSeq.sortBy(-_).take(10)
        .zipWithIndex.map { case (r, i) => r * disc(i) }.sum
      assert(idcg == wantIdcg)
    }
  }

  describe("q_closeness_sample (sampled harmonic closeness)") {

    it("matches a driver-side BFS replay on the collected graph") {
      val got = Graph.qClosenessSample(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.nonEmpty, "vacuous: thresholded graph has no reachable pairs")
      // rebuild the same graph driver-side
      val pairs = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("s"))
        .groupBy("c", "s").agg(count(lit(1)).as("w")).filter(col("w") >= 3)
        .select("c", "s").collect().map(r => (r.getString(0), r.getString(1)))
      val adj = scala.collection.mutable.Map.empty[String, List[String]]
        .withDefaultValue(Nil)
      pairs.foreach { case (c, su) => adj(c) ::= su; adj(su) ::= c }
      val sources = adj.keys.filter(_.startsWith("c")).toSeq
        .sortBy(v => v.drop(1).toLong).take(8)
      val harmonic = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      val reach = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      sources.foreach { s0 =>
        val dist = scala.collection.mutable.Map(s0 -> 0)
        var frontier = List(s0)
        for (d <- 1 to 4) {
          frontier = frontier.flatMap(adj).distinct.filterNot(dist.contains)
          frontier.foreach(v => dist(v) = d)
        }
        dist.foreach { case (v, d) =>
          if (d > 0) { harmonic(v) += 1000000L / d; reach(v) += 1L }
        }
      }
      val want = harmonic.toSeq.map { case (v, h) => (v, reach(v), h) }
        .sortBy { case (v, _, h) => (-h, v) }.take(20)
      assert(got.toSeq == want, s"closeness mismatch:\n got=${got.toSeq}\nwant=$want")
    }
  }
}
