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

  describe("q_cdc_apply (multi-version log compaction)") {

    it("is invariant to arrival order and honors tombstone/resurrection semantics") {
      import spark.implicits._
      // key 1: insert then two corrections — latest correction wins
      // key 2: insert then tombstone — gone
      // key 3: insert, tombstone, later re-insert — resurrected
      val entries = Seq(
        (1L, 1, "I", Some(10.0)), (1L, 2, "U", Some(11.0)), (1L, 3, "U", Some(12.0)),
        (2L, 1, "I", Some(20.0)), (2L, 2, "D", None),
        (3L, 1, "I", Some(30.0)), (3L, 2, "D", None), (3L, 3, "I", Some(33.0)))
      def run(order: Seq[(Long, Int, String, Option[Double])]) =
        Warehouse.compactCdc(order.toDF("k", "version", "op", "price"))
          .orderBy("k")
          .collect().map(r => (r.getLong(0), r.getDouble(3), r.getInt(1), r.getLong(4)))
          .toSeq
      val expected = Seq((1L, 12.0, 3, 3L), (3L, 33.0, 3, 3L))
      assert(run(entries) == expected)
      assert(run(entries.reverse) == expected)
      assert(run(scala.util.Random.shuffle(entries)) == expected)
    }

    it("end-to-end: superseded versions invisible, n_ops counts full history") {
      val out = Warehouse.qCdcApply(spark, sfDir).collect()
      val byKey = out.map(r => r.getLong(0) -> r).toMap
      val base = Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_totalprice").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      base.keys.foreach { k =>
        val deleted = k % 9 == 4 && k % 27 != 4
        assert(byKey.contains(k) != deleted, s"key $k presence")
      }
      byKey.foreach { case (k, r) =>
        val want =
          if (k % 27 == 4) base(k) + 100.0
          else if (k % 15 == 2) base(k) + 12.0
          else if (k % 5 == 2) base(k) + 5.0
          else base(k)
        assert(r.getDouble(1) == want, s"key $k final price")
      }
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

  describe("q_snapshot_diff (keyed two-snapshot diff)") {

    import spark.implicits._

    def diffRow(t0: org.apache.spark.sql.DataFrame, t1: org.apache.spark.sql.DataFrame) = {
      val r = Warehouse.snapshotDiff(t0, t1, Seq("price", "status")).collect().head
      (0 to 7).map(r.getLong).toList // t0, t1, add, rem, chg, unchg, pchg, schg
    }

    it("an identical snapshot diffs to all-unchanged") {
      val t = Seq((1L, 1.0, "A"), (2L, 2.0, "B")).toDF("k", "price", "status")
      assert(diffRow(t, t) == List(2, 2, 0, 0, 0, 2, 0, 0))
    }

    it("classifies add/remove/change and counts per-column moves once each") {
      val t0 = Seq((1L, 1.0, "A"), (2L, 2.0, "B"), (3L, 3.0, "C")).toDF("k", "price", "status")
      // 1: both columns change (counted once in n_changed, once per column);
      // 2: removed; 4: added
      val t1 = Seq((1L, 9.0, "Z"), (3L, 3.0, "C"), (4L, 4.0, "D")).toDF("k", "price", "status")
      assert(diffRow(t0, t1) == List(3, 3, 1, 1, 1, 1, 1, 1))
    }

    it("is null-safe: null→value and value→null transitions count as changes") {
      val t0 = Seq((1L, Option(1.0), "A"), (2L, Option.empty[Double], "B"))
        .toDF("k", "price", "status")
      val t1 = Seq((1L, Option.empty[Double], "A"), (2L, Option(2.0), "B"))
        .toDF("k", "price", "status")
      assert(diffRow(t0, t1) == List(2, 2, 0, 0, 2, 0, 2, 0))
    }

    it("on the sf tables the diff algebra closes") {
      val r = Warehouse.qSnapshotDiff(spark, sfDir).collect().head
      val List(t0, t1, add, rem, chg, unchg, pchg, schg) = (0 to 7).map(r.getLong).toList
      assert(t1 == t0 - rem + add)
      assert(chg + unchg == t0 - rem)
      assert(pchg <= chg && schg <= chg && chg <= pchg + schg)
      assert(add > 0 && rem > 0 && chg > 0 && unchg > 0, "every class non-vacuous")
    }
  }
}
