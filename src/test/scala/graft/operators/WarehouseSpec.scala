package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Warehouse family (r6, second session): data-quality constraint suite,
  * CDC merge/upsert, incremental aggregate maintenance. Each query is
  * re-checked against an independent recomputation through a different
  * plan shape; the DuckDB oracle re-checks cross-engine at sf0.01.
  */
class WarehouseSpec extends AnyFunSpec with SparkTestBase {

  describe("q_data_quality (one-scan constraint suite)") {

    it("emits one row per constraint with metrics matching independent recomputation") {
      val rows = Warehouse.qDataQuality(spark, sfDir).collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
      assert(rows.size == 7)
      // constraints that must hold on the driver data
      assert(rows("completeness_l_shipdate") == ((1.0, true)))
      assert(rows("returnflag_domain") == ((0.0, true)))
      assert(rows("partkey_ref_integrity") == ((0.0, true)))
      assert(rows("quantity_in_1_50")._2)
      // the uniqueness metric must equal a direct distinct/count recompute
      val li = Tables.lineitem(spark, sfDir)
      val n = li.count().toDouble
      val nPk = li.select("l_orderkey", "l_linenumber").distinct().count().toDouble
      val expected = BigDecimal(nPk / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows("pk_unique_orderkey_linenumber")._1 == expected)
      assert(rows("pk_unique_orderkey_linenumber")._2 == (nPk == n))
    }

    it("computes the scan-side metrics in a single aggregate (no per-constraint rescan)") {
      // 7 constraints must not mean 7 scans: the plan reads lineitem twice
      // (metric aggregate + distinct-partkey referential probe), never more
      val plan = Warehouse.qDataQuality(spark, sfDir)
        .queryExecution.executedPlan.toString()
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans <= 3, s"constraint suite rescans the fact table: $scans scans\n$plan")
    }
  }

  describe("q_merge_upsert (CDC MERGE semantics)") {

    it("applies deletes, updates, and inserts exactly and keeps everything else") {
      val base = Tables.orders(spark, sfDir)
      val merged = Warehouse.qMergeUpsert(spark, sfDir)
      val byAction = merged.groupBy("action").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val nBase = base.count()
      val nDel = base.filter(col("o_orderkey") % 13 === 3).count()
      val nUpd = base.filter(col("o_orderkey") % 13 =!= 3 && col("o_orderkey") % 7 === 0).count()
      val nIns = base.filter(col("o_orderkey") % 11 === 5).count()
      assert(nDel > 0 && nUpd > 0 && nIns > 0, "vacuous change feed")
      assert(byAction("U") == nUpd)
      assert(byAction("I") == nIns)
      assert(byAction("K") == nBase - nDel - nUpd)
      assert(merged.count() == nBase - nDel + nIns)
      // no deleted key survives; every inserted key is in the offset range
      assert(merged.join(base.filter(col("o_orderkey") % 13 === 3)
        .select("o_orderkey"), Seq("o_orderkey"), "left_semi").count() == 0)
      assert(merged.filter(col("action") === "I" && col("o_orderkey") <= 10000000L).count() == 0)
    }

    it("updated rows carry base price + 10.00 bit-exactly") {
      val base = Tables.orders(spark, sfDir)
      val diffs = Warehouse.qMergeUpsert(spark, sfDir)
        .filter(col("action") === "U")
        .join(base.select(col("o_orderkey"), col("o_totalprice").as("base_price")), "o_orderkey")
        .filter(col("o_totalprice") =!= col("base_price") + 10.0)
        .count()
      assert(diffs == 0)
    }
  }

  describe("q_incremental_agg (delta-merge == full recompute)") {

    it("every month matches the full recompute and covers the whole range") {
      val out = Warehouse.qIncrementalAgg(spark, sfDir).collect()
      assert(out.nonEmpty)
      assert(out.forall(_.getBoolean(3)), "a merged month diverged from full recompute")
      // total row count equals a direct count over the same date range
      val expected = Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") < lit("2001-07-01").cast("timestamp")).count()
      assert(out.map(_.getLong(2)).sum == expected)
      // the delta month itself is present (the merge actually added it)
      // month is TIMESTAMP_NTZ → LocalDateTime on collect
      val months = out.map(_.getAs[java.time.LocalDateTime](0).toString).toSet
      assert(months.exists(_.startsWith("2001-06")), s"delta month missing: $months")
    }
  }
}
