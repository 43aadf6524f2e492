package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse maintenance & governance operators: declarative data-quality
  * constraint checking (Deequ-style, one scan), CDC MERGE/upsert semantics,
  * and incremental aggregate maintenance (the "don't rescan 100 TB to
  * refresh a rollup" pattern).
  *
  * Scale notes:
  *  - `qDataQuality` computes the whole constraint suite in ONE pass over
  *    the fact table (a single hash-aggregate with map-side combine); only
  *    the referential check needs a second, distinct-key-sized anti-join.
  *  - `qMergeUpsert` is one equality-key full-outer join (AQE-splittable);
  *    a real CDC feed is usually tiny relative to the base and would
  *    broadcast — here it is derived from the base itself so both sides
  *    shuffle, the worst case.
  *  - `qIncrementalAgg` merges a persisted aggregate STATE with a
  *    delta-partition aggregate and proves the merge equals a full
  *    recompute — partial sums and counts are mergeable, so refreshing the
  *    rollup costs O(delta), not O(history).
  */
object Warehouse {

  // ---------------------------------------------------------------- quality

  /** One-scan data-quality constraint suite over lineitem: completeness,
    * range bounds, domain membership, key uniqueness, plus a referential-
    * integrity probe against `part`. Output is one row per constraint
    * (check_name, metric, pass). The (l_orderkey, l_linenumber) uniqueness
    * check genuinely FAILS on the driver data (metric ≈ 0.7639) — the suite
    * is non-vacuous by construction.
    */
  def qDataQuality(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val m = li.agg(
      count(lit(1)).as("n"),
      count(col("l_shipdate")).as("n_shipdate"),
      sum(when(col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("n_qty_in_bounds"),
      max(col("l_discount")).as("max_discount"),
      min(col("l_extendedprice")).as("min_price"),
      countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_pk"),
      sum(when(col("l_returnflag").isin("A", "N", "R"), 0L).otherwise(1L)).as("n_flag_bad"))
    // Referential containment: every l_partkey must exist in part. The
    // distinct-key frame is |parts|-sized, the dim broadcasts.
    val orphans = li.select("l_partkey").distinct()
      .join(Tables.dim(s, dir, "part"), col("l_partkey") === col("p_partkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_parts"))
    m.crossJoin(orphans) // 1 row x 1 row, bounded by construction
      .select(explode(array(
        struct(lit("completeness_l_shipdate").as("check_name"),
          round(col("n_shipdate") / col("n"), 6).as("metric"),
          (col("n_shipdate") === col("n")).as("pass")),
        struct(lit("quantity_in_1_50").as("check_name"),
          round(col("n_qty_in_bounds") / col("n"), 6).as("metric"),
          (col("n_qty_in_bounds") === col("n")).as("pass")),
        struct(lit("discount_le_0_10").as("check_name"),
          round(col("max_discount"), 6).as("metric"),
          (col("max_discount") <= 0.10).as("pass")),
        struct(lit("price_positive").as("check_name"),
          round(col("min_price"), 6).as("metric"),
          (col("min_price") > 0.0).as("pass")),
        struct(lit("pk_unique_orderkey_linenumber").as("check_name"),
          round(col("n_pk") / col("n"), 6).as("metric"),
          (col("n_pk") === col("n")).as("pass")),
        struct(lit("returnflag_domain").as("check_name"),
          col("n_flag_bad").cast("double").as("metric"),
          (col("n_flag_bad") === 0L).as("pass")),
        struct(lit("partkey_ref_integrity").as("check_name"),
          col("n_orphan_parts").cast("double").as("metric"),
          (col("n_orphan_parts") === 0L).as("pass")))).as("r"))
      .select(col("r.check_name").as("check_name"), col("r.metric").as("metric"),
        col("r.pass").as("pass"))
      .orderBy("check_name")
  }

  val oracleDataQuality: String =
    """WITH m AS (
      | SELECT count(*) AS n, count(l_shipdate) AS n_shipdate,
      |  sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS n_qty,
      |  max(l_discount) AS max_discount, min(l_extendedprice) AS min_price,
      |  count(DISTINCT (l_orderkey, l_linenumber)) AS n_pk,
      |  sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS n_flag_bad
      | FROM lineitem),
      |o AS (
      | SELECT count(*) AS n_orphan FROM (SELECT DISTINCT l_partkey FROM lineitem) lp
      | LEFT JOIN part ON l_partkey = p_partkey WHERE p_partkey IS NULL)
      |SELECT * FROM (
      | SELECT 'completeness_l_shipdate' AS check_name, round(n_shipdate * 1.0 / n, 6) AS metric, n_shipdate = n AS pass FROM m
      | UNION ALL SELECT 'quantity_in_1_50', round(n_qty * 1.0 / n, 6), n_qty = n FROM m
      | UNION ALL SELECT 'discount_le_0_10', round(max_discount, 6), max_discount <= 0.10 FROM m
      | UNION ALL SELECT 'price_positive', round(min_price, 6), min_price > 0.0 FROM m
      | UNION ALL SELECT 'pk_unique_orderkey_linenumber', round(n_pk * 1.0 / n, 6), n_pk = n FROM m
      | UNION ALL SELECT 'returnflag_domain', n_flag_bad * 1.0, n_flag_bad = 0 FROM m
      | UNION ALL SELECT 'partkey_ref_integrity', n_orphan * 1.0, n_orphan = 0 FROM o
      |) ORDER BY check_name""".stripMargin

  // ------------------------------------------------------------------ merge

  /** CDC MERGE INTO semantics (upsert + delete) expressed as one full-outer
    * equality join. The change feed is synthesized deterministically from
    * the base table so the oracle can rebuild it: keys ≡3 (mod 13) are
    * deletes, keys ≡0 (mod 7) are +10.00 price corrections, and keys ≡5
    * (mod 11) spawn inserts under a disjoint key range (base keys stay far
    * below the +10M offset at every driver SF). Output is the post-merge
    * table with the action that produced each row (K=kept, U=updated,
    * I=inserted; deletes are absent). Price arithmetic is exact IEEE
    * add/pass-through — no rounding, so the cross-engine doubles are
    * bit-identical (round(x*1.1, 2) would tie-break differently in the
    * two engines on .xx5 values).
    */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
    val upd = base.filter(col("o_orderkey") % 13 =!= 3 && col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("c_orderkey"), lit("U").as("op"),
        (col("o_totalprice") + 10.0).as("c_totalprice"))
    val del = base.filter(col("o_orderkey") % 13 === 3)
      .select(col("o_orderkey").as("c_orderkey"), lit("D").as("op"),
        lit(null).cast("double").as("c_totalprice"))
    val ins = base.filter(col("o_orderkey") % 11 === 5)
      .select((col("o_orderkey") + 10000000L).as("c_orderkey"), lit("I").as("op"),
        col("o_totalprice").as("c_totalprice"))
    val changes = upd.unionByName(del).unionByName(ins)
    base.join(changes, col("o_orderkey") === col("c_orderkey"), "full_outer")
      .filter(coalesce(col("op"), lit("K")) =!= "D")
      .select(
        coalesce(col("o_orderkey"), col("c_orderkey")).as("o_orderkey"),
        when(col("op").isin("U", "I"), col("c_totalprice"))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        coalesce(col("op"), lit("K")).as("action"))
      .orderBy("o_orderkey")
  }

  val oracleMergeUpsert: String =
    """WITH changes AS (
      | SELECT o_orderkey AS c_orderkey, 'U' AS op, o_totalprice + 10.0 AS c_totalprice
      |  FROM orders WHERE o_orderkey % 13 <> 3 AND o_orderkey % 7 = 0
      | UNION ALL
      | SELECT o_orderkey, 'D', CAST(NULL AS DOUBLE) FROM orders WHERE o_orderkey % 13 = 3
      | UNION ALL
      | SELECT o_orderkey + 10000000, 'I', o_totalprice
      |  FROM orders WHERE o_orderkey % 11 = 5)
      |SELECT coalesce(o_orderkey, c_orderkey) AS o_orderkey,
      |  CASE WHEN op IN ('U','I') THEN c_totalprice ELSE o_totalprice END AS o_totalprice,
      |  coalesce(op, 'K') AS action
      |FROM orders FULL OUTER JOIN changes ON o_orderkey = c_orderkey
      |WHERE coalesce(op, 'K') <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------- cdc apply

  /** Compact a multi-version CDC log: latest version wins per key,
    * regardless of arrival order. One hash aggregate (`max_by` on the
    * version column — no sort window, map-side combinable), so the log
    * never needs to arrive ordered and no per-key sort happens. Keys
    * whose latest op is a tombstone are dropped AFTER compaction, so a
    * delete can be superseded by a later re-insert (resurrection). */
  private[graft] def compactCdc(log: DataFrame): DataFrame =
    log.groupBy("k")
      .agg(
        max("version").as("final_version"),
        max_by(col("op"), col("version")).as("last_op"),
        max_by(col("price"), col("version")).as("final_price"),
        count(lit(1)).as("n_ops"))
      .filter(col("last_op") =!= "D")

  /** CDC log compaction end-to-end — the multi-version, out-of-order twin
    * of [[qMergeUpsert]] (which applies ONE change set against a base):
    * here the key's whole history (insert → corrections → tombstone →
    * possible re-insert) arrives as log entries with versions, in a
    * deliberately shuffled arrival order, and compaction is latest-wins.
    *
    * Deterministic log, rebuilt identically by the oracle: every key has
    * a v1 INSERT; keys ≡2 (mod 5) a v2 price+5 correction; keys ≡2
    * (mod 15) a v3 price+12 correction on top; keys ≡4 (mod 9) a v4
    * tombstone; keys ≡4 (mod 27) a v5 re-insert at price+100 (the
    * resurrection case). Arrival order in the union is v4,v3,v1,v2,v5 —
    * the result must not depend on it. Exact IEEE adds, no rounding.
    */
  def qCdcApply(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
    def slice(mod: Int, rem: Int, version: Int, op: String, price: Column): DataFrame =
      base.filter(col("o_orderkey") % mod === rem)
        .select(col("o_orderkey").as("k"), lit(version).as("version"),
          lit(op).as("op"), price.as("price"))
    val log = slice(9, 4, 4, "D", lit(null).cast("double"))
      .unionByName(slice(15, 2, 3, "U", col("o_totalprice") + 12.0))
      .unionByName(slice(1, 0, 1, "I", col("o_totalprice")))
      .unionByName(slice(5, 2, 2, "U", col("o_totalprice") + 5.0))
      .unionByName(slice(27, 4, 5, "I", col("o_totalprice") + 100.0))
    compactCdc(log)
      .select(col("k").as("o_orderkey"), col("final_price"),
        col("final_version"), col("n_ops"))
      .orderBy("o_orderkey")
  }

  val oracleCdcApply: String =
    """WITH log AS (
      | SELECT o_orderkey AS k, 4 AS version, 'D' AS op, CAST(NULL AS DOUBLE) AS price
      |  FROM orders WHERE o_orderkey % 9 = 4
      | UNION ALL SELECT o_orderkey, 3, 'U', o_totalprice + 12.0 FROM orders WHERE o_orderkey % 15 = 2
      | UNION ALL SELECT o_orderkey, 1, 'I', o_totalprice FROM orders
      | UNION ALL SELECT o_orderkey, 2, 'U', o_totalprice + 5.0 FROM orders WHERE o_orderkey % 5 = 2
      | UNION ALL SELECT o_orderkey, 5, 'I', o_totalprice + 100.0 FROM orders WHERE o_orderkey % 27 = 4)
      |SELECT k AS o_orderkey,
      |  arg_max(price, version) AS final_price,
      |  max(version) AS final_version,
      |  count(*) AS n_ops
      |FROM log GROUP BY k
      |HAVING arg_max(op, version) <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------ incremental

  /** Incremental aggregate maintenance: a monthly-revenue rollup "state"
    * (everything before the cutoff) is refreshed by merging ONE delta
    * month's partial aggregate — never rescanning history — and the result
    * is proven equal to a full recompute in the same plan. Sum/count
    * partials are mergeable, so the refresh cost is O(delta). The
    * `matches_full` flag compares the two paths with a 1e-4 tolerance
    * (both are double sums of the same addends in different association
    * orders; observed divergence is ~1e-9 at these magnitudes).
    */
  def qIncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val cutoff = lit("2001-06-01").cast("timestamp")
    val next   = lit("2001-07-01").cast("timestamp")
    def monthly(df: DataFrame): DataFrame =
      df.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum("o_totalprice").as("rev"), count(lit(1)).as("n"))
    val state = monthly(ord.filter(col("o_orderdate") < cutoff))
    val delta = monthly(ord.filter(col("o_orderdate") >= cutoff && col("o_orderdate") < next))
    val incr = state.unionByName(delta)
      .groupBy("month").agg(sum("rev").as("rev"), sum("n").as("n"))
    val full = monthly(ord.filter(col("o_orderdate") < next))
      .withColumnRenamed("rev", "full_rev").withColumnRenamed("n", "full_n")
    incr.join(full, "month")
      .select(col("month").cast("timestamp_ntz").as("month"),
        round(col("rev"), 2).as("revenue"),
        col("n").as("n_orders"),
        (abs(col("rev") - col("full_rev")) < 1e-4 && col("n") === col("full_n")).as("matches_full"))
      .orderBy("month")
  }

  val oracleIncrementalAgg: String =
    """SELECT date_trunc('month', o_orderdate) AS month,
      | round(sum(o_totalprice), 2) AS revenue,
      | count(*) AS n_orders,
      | true AS matches_full
      |FROM orders WHERE o_orderdate < TIMESTAMP '2001-07-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------- snapshot diff

  /** Snapshot diff (`q_snapshot_diff`) — the table-regression readout a
    * warehouse runs between two snapshots of the same entity (yesterday's
    * load vs today's): keyed full-outer join, rows classified
    * added/removed/changed/unchanged, plus PER-COLUMN change counts (which
    * columns actually moved — the first question when a diff is nonzero).
    * The second snapshot is synthesized deterministically from the base
    * (the [[qMergeUpsert]] discipline, one extra residue class so TWO
    * columns change independently): keys ≡3 (mod 13) dropped, keys ≡0
    * (mod 7) get +10.00 price, keys ≡7 (mod 19) get status 'X', keys ≡5
    * (mod 11) insert under the disjoint +10M key range.
    *
    * Scale shape: ONE co-partitioned key-equality full-outer shuffle join
    * between the snapshots (the exact plan a bucketed-by-key layout runs
    * with zero exchange — see BucketedJoinSpec), followed by a
    * map-side-combinable fold to a 1-row frame. Null-safe comparisons
    * (`<=>`) make the classifier total; all outputs are exact counts —
    * no float surface.
    */
  def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val t0 = Tables.orders(s, dir)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"))
    val t1 = t0.filter(col("k") % 13 =!= 3)
      .select(col("k"),
        when(col("k") % 7 === 0, col("price") + 10.0).otherwise(col("price")).as("price"),
        when(col("k") % 19 === 7, lit("X")).otherwise(col("status")).as("status"))
      .unionByName(
        t0.filter(col("k") % 11 === 5)
          .select((col("k") + 10000000L).as("k"), col("price"), col("status")))
    snapshotDiff(t0, t1, Seq("price", "status"))
  }

  /** Generic two-snapshot diff over a shared key column `k` and the given
    * compared columns (t1's columns arrive suffixed `_1` internally). */
  private[graft] def snapshotDiff(t0: DataFrame, t1: DataFrame,
      cols: Seq[String]): DataFrame = {
    val r = t1.columns.foldLeft(t1)((d, c) =>
      if (c == "k") d else d.withColumnRenamed(c, c + "_1"))
      .withColumn("__in1", lit(1))
    val j = t0.withColumn("__in0", lit(1)).join(r, Seq("k"), "full_outer")
    val inT0 = col("__in0").isNotNull
    val inT1 = col("__in1").isNotNull
    val anyChange = cols.map(c => !(col(c) <=> col(c + "_1"))).reduce(_ || _)
    val perCol = cols.map(c =>
      sum((inT0 && inT1 && !(col(c) <=> col(c + "_1"))).cast("long"))
        .as(s"n_${c}_changed"))
    val aggs =
      sum(inT0.cast("long")) :: sum(inT1.cast("long")) ::
        sum((!inT0 && inT1).cast("long")) :: sum((inT0 && !inT1).cast("long")) ::
        sum((inT0 && inT1 && anyChange).cast("long")) ::
        sum((inT0 && inT1 && !anyChange).cast("long")) :: perCol.toList
    j.agg(aggs.head, aggs.tail: _*)
      .toDF(Seq("n_t0", "n_t1", "n_added", "n_removed", "n_changed",
        "n_unchanged") ++ cols.map(c => s"n_${c}_changed"): _*)
  }

  val oracleSnapshotDiff: String =
    """WITH t0 AS (
      |  SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
      |  FROM orders),
      |t1 AS (
      |  SELECT k,
      |    CASE WHEN k % 7 = 0 THEN price + 10.0 ELSE price END AS price,
      |    CASE WHEN k % 19 = 7 THEN 'X' ELSE status END AS status
      |  FROM t0 WHERE k % 13 <> 3
      |  UNION ALL
      |  SELECT k + 10000000, price, status FROM t0 WHERE k % 11 = 5),
      |j AS (
      |  SELECT t0.k AS k0, t1.k AS k1,
      |    t0.price AS p0, t1.price AS p1, t0.status AS s0, t1.status AS s1
      |  FROM t0 FULL OUTER JOIN t1 ON t0.k = t1.k)
      |SELECT
      |  CAST(sum(CASE WHEN k0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
      |  CAST(sum(CASE WHEN k1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
      |  CAST(sum(CASE WHEN k0 IS NULL AND k1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(sum(CASE WHEN k0 IS NOT NULL AND k1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN k0 IS NOT NULL AND k1 IS NOT NULL
      |    AND (p0 IS DISTINCT FROM p1 OR s0 IS DISTINCT FROM s1) THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(sum(CASE WHEN k0 IS NOT NULL AND k1 IS NOT NULL
      |    AND p0 IS NOT DISTINCT FROM p1 AND s0 IS NOT DISTINCT FROM s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
      |  CAST(sum(CASE WHEN k0 IS NOT NULL AND k1 IS NOT NULL
      |    AND p0 IS DISTINCT FROM p1 THEN 1 ELSE 0 END) AS BIGINT) AS n_price_changed,
      |  CAST(sum(CASE WHEN k0 IS NOT NULL AND k1 IS NOT NULL
      |    AND s0 IS DISTINCT FROM s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_status_changed
      |FROM j""".stripMargin

  // ------------------------------------------------- functional dependencies
  /** Candidate FDs profiled by `q_fd_discovery` — (label, table, lhs
    * columns, rhs column). The list mixes dependencies that genuinely
    * HOLD on the driver data (key-like lhs) with ones that are genuinely
    * violated, so the profile is non-vacuous in both directions. */
  private val FD_CANDIDATES: Seq[(String, String, Seq[String], String)] = Seq(
    ("orders: o_orderkey -> o_custkey", "orders", Seq("o_orderkey"), "o_custkey"),
    ("orders: o_custkey -> o_orderpriority", "orders", Seq("o_custkey"), "o_orderpriority"),
    ("lineitem: l_orderkey -> l_suppkey", "lineitem", Seq("l_orderkey"), "l_suppkey"),
    ("lineitem: l_partkey -> l_suppkey", "lineitem", Seq("l_partkey"), "l_suppkey"),
    ("lineitem: l_orderkey,l_linenumber -> l_partkey", "lineitem",
      Seq("l_orderkey", "l_linenumber"), "l_partkey"),
    ("customer: c_custkey -> c_nationkey", "customer", Seq("c_custkey"), "c_nationkey"))

  /** Functional-dependency discovery profile (`q_fd_discovery`): for each
    * candidate `lhs -> rhs`, one row with the distinct-lhs group count,
    * how many groups see >1 distinct rhs (violating groups), the max rhs
    * cardinality within a group, the g3 repair cost (minimum rows whose
    * rhs must change for the FD to hold — rows minus the majority-rhs
    * rows, summed over groups), and the holds verdict. This is the
    * schema-profiling primitive behind key inference and CDC-feed
    * validation ("is this column pair safe to use as a merge key").
    *
    * Scale shape per candidate: groupBy(lhs, rhs) count (map-side
    * combinable — the first shuffle carries only distinct (lhs, rhs)
    * groups, never rows) → groupBy(lhs) fold → ONE bounded profile row.
    * The violating-share is exact integer basis points (no float
    * division in the compare path). Candidates run as a union of
    * bounded 1-row aggregates; nothing data-proportional leaves the
    * executors.
    */
  def qFdDiscovery(s: SparkSession, dir: String): DataFrame = {
    val profiles = FD_CANDIDATES.map { case (label, table, lhs, rhs) =>
      val t = table match {
        case "orders"   => Tables.orders(s, dir)
        case "lineitem" => Tables.lineitem(s, dir)
        case _          => Tables.dim(s, dir, table)
      }
      val grouped = t.groupBy(lhs.map(col) :+ col(rhs): _*)
        .agg(count(lit(1)).as("cnt"))
        .groupBy(lhs.map(col): _*)
        .agg(count(lit(1)).as("n_rhs"), sum("cnt").as("nrows"), max("cnt").as("keep"))
      grouped.agg(
        count(lit(1)).as("n_lhs_groups"),
        sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("n_rhs")).as("max_rhs_card"),
        sum(col("nrows") - col("keep")).as("g3_rows_to_fix"))
        .select(lit(label).as("dependency"), col("n_lhs_groups"), col("n_violating"),
          // exact integer basis points — no float division in the compare
          expr("(n_violating * 10000L) div n_lhs_groups").as("violating_bp"),
          col("max_rhs_card"), col("g3_rows_to_fix"),
          (col("n_violating") === 0L).as("holds"))
    }
    profiles.reduce(_.unionByName(_)).orderBy("dependency")
  }

  val oracleFdDiscovery: String = {
    val parts = FD_CANDIDATES.map { case (label, table, lhs, rhs) =>
      val lhsCols = lhs.mkString(", ")
      s"""SELECT '$label' AS dependency, n_lhs_groups, n_violating,
         |  CAST(n_violating * 10000 // n_lhs_groups AS BIGINT) AS violating_bp,
         |  max_rhs_card, g3_rows_to_fix, n_violating = 0 AS holds
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_lhs_groups,
         |    CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         |    CAST(max(n_rhs) AS BIGINT) AS max_rhs_card,
         |    CAST(sum(nrows - keep) AS BIGINT) AS g3_rows_to_fix
         |  FROM (
         |    SELECT $lhsCols, count(*) AS n_rhs, sum(cnt) AS nrows, max(cnt) AS keep
         |    FROM (SELECT $lhsCols, $rhs, count(*) AS cnt FROM $table GROUP BY ALL)
         |    GROUP BY ALL))""".stripMargin
    }
    parts.mkString("\nUNION ALL\n") + "\nORDER BY dependency"
  }
}
