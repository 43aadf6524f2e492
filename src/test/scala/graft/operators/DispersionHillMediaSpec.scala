package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** q_dispersion (per-user overdispersion + NB moments), q_hill_tail
  * (top-order Hill estimator), q_media_clusters (phash pair-graph
  * components) — driver-side replays; DuckDB re-checks at sf0.01.
  */
class DispersionHillMediaSpec extends AnyFunSpec with SparkTestBase {

  describe("q_dispersion") {
    it("matches a driver-side moment replay and the NB identities") {
      val counts = Tables.events(spark, sfDir)
        .groupBy("user_id").count().collect().map(_.getLong(1).toDouble)
      val n = counts.length.toDouble
      val mean = counts.sum / n
      val vr = counts.map(c => c * c).sum / n - mean * mean
      val row = Stats.qDispersion(spark, sfDir).head
      assert(row.getLong(0) == counts.length)
      assert(math.abs(row.getDouble(1) - mean) < 1e-5)
      assert(math.abs(row.getDouble(2) - vr) < 1e-4)
      assert(math.abs(row.getDouble(3) - vr / mean) < 1e-5)
      // NB identities: r = m^2/(v-m), p = m/v
      assert(math.abs(row.getDouble(4) - mean * mean / (vr - mean)) < 1e-3)
      assert(math.abs(row.getDouble(5) - mean / vr) < 1e-5)
    }
  }

  describe("q_hill_tail") {
    lazy val row = Stats.qHillTail(spark, sfDir).head

    it("matches a driver-side Hill estimator over the top 201 cents") {
      val top = Tables.orders(spark, sfDir)
        .select(round(col("o_totalprice") * 100).cast("long").as("c"), col("o_orderkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy { case (c, k) => (-c, k) }.take(201).map(_._1.toDouble)
      val xref = top.last
      val logs = top.init.map(x => math.log(x / xref))
      val alpha = 200.0 / logs.sum
      assert(math.abs(row.getDouble(1) - xref / 100.0) < 1e-9, "x_kth")
      assert(math.abs(row.getDouble(2) - alpha) < 1e-4,
        s"alpha ${row.getDouble(2)} vs replay $alpha")
      assert(math.abs(row.getDouble(3) - logs.sum / 200.0) < 1e-6)
    }

    it("alpha is positive (upper order statistics exceed the threshold)") {
      assert(row.getDouble(2) > 0.0)
    }
  }

  describe("q_media_clusters") {
    it("components partition the pair graph: every pair endpoint shares a cluster") {
      val pairs = Multimodal.qMediaPhash(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val clusters = Dedup.ccLabels(
        Multimodal.qMediaPhash(spark, sfDir).select("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      pairs.foreach { case (a, b) =>
        assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
      }
      val rows = Multimodal.qMediaClusters(spark, sfDir).collect()
      // member counts per label agree with the label map
      val byLabel = clusters.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(rows.length == byLabel.size)
      rows.foreach(r => assert(r.getLong(1) == byLabel(r.getLong(0))))
      // cluster id is the component's min member (the keeper convention)
      rows.foreach { r =>
        val members = clusters.filter(_._2 == r.getLong(0)).keys
        assert(members.min == r.getLong(0))
      }
    }
  }
}
