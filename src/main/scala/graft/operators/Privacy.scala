package graft.operators

import graft.Tables
import graft.functions.HashFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection/redaction over text columns — the scrub pass every
  * LLM-training corpus runs before tokenization (emails, phone numbers,
  * IP addresses → typed placeholder tokens).
  *
  * Scale shape: a pure per-row projection — three codegen'd
  * `regexp_replace` passes, no shuffle, no UDF — so it rides along with
  * the scan at any corpus size. The patterns are deliberately
  * ASCII-class-only (`[0-9]`-equivalent `\d`, explicit char classes) so
  * Java regex (Spark) and RE2 (DuckDB oracle) match byte-for-byte.
  *
  * The driver corpus contains no digits at all, so the query plants a
  * DETERMINISTIC PII fixture first (doc_id-derived emails / phones /
  * IPs appended to a doc_id-selected subset), mirrored exactly in the
  * oracle — redaction is then measured against known-dirty rows instead
  * of vacuously scrubbing clean text. The redactor itself
  * ([[scrub]]/[[piiCounts]]) is the reusable operator.
  */
object Privacy {

  /** Redaction order matters: emails first (an address's host part would
    * otherwise be left looking like a dotted quad), then phones, then
    * bare IPs. */
  private[graft] val EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val PHONE_RE = "\\d{3}-\\d{3}-\\d{4}"
  private[graft] val IP_RE    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace every email/phone/IP occurrence with a typed placeholder. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EMAIL_RE, "<EMAIL>"),
        PHONE_RE, "<PHONE>"),
      IP_RE, "<IP>")

  /** (emails, phones, ips) match counts for a text column. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EMAIL_RE)),
      regexp_count(regexp_replace(text, EMAIL_RE, "<EMAIL>"), lit(PHONE_RE)),
      regexp_count(regexp_replace(text, EMAIL_RE, "<EMAIL>"), lit(IP_RE)))

  /** Deterministic dirty fixture: every 5th doc gains an email and a
    * phone, every 7th an IP (doc_id-derived, so both engines plant the
    * identical bytes). */
  private def dirtyCol: Column = {
    val id = col("doc_id").cast("string")
    val withEmail = when(pmod(col("doc_id"), lit(5)) === 0,
      concat(col("text"), lit(" contact user"), id, lit("@example.com or 555-010-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      .otherwise(col("text"))
    when(pmod(col("doc_id"), lit(7)) === 0,
      concat(withEmail, lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".1")))
      .otherwise(withEmail)
  }

  def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val dirty = Tables.documents(s, dir).select(col("doc_id"), dirtyCol.as("dirty"))
    val (emails, phones, ips) = piiCounts(col("dirty"))
    val clean = scrub(col("dirty"))
    dirty.select(
      col("doc_id"),
      emails.cast("long").as("n_emails"),
      phones.cast("long").as("n_phones"),
      ips.cast("long").as("n_ips"),
      // post-scrub residual MUST be 0 — the oracle computes it too, so a
      // pattern that misses its own output shape goes red, not unnoticed
      (regexp_count(clean, lit(EMAIL_RE)) + regexp_count(clean, lit(PHONE_RE))
        + regexp_count(clean, lit(IP_RE))).cast("long").as("residual"),
      HashFns.h60(clean).as("clean_fp"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- k-anonymity audit

  /** Re-identification threshold: a quasi-identifier group smaller than
    * K is "unsafe" (its members are re-identifiable by joining the QI
    * columns against an external dataset). */
  private[graft] val ANON_K = 5
  /** Sensitive-attribute diversity floor: a QI group whose members span
    * fewer than L distinct sensitive values leaks the attribute even
    * when the group is k-anonymous (homogeneity attack). */
  private[graft] val ANON_L = 3
  /** Generalization ladder for the continuous QI: account balance is
    * coarsened from 100-wide bands (level 0) to 2000-wide (level 1) —
    * the release-side knob that trades utility for group size. */
  private[graft] val ANON_BANDS: Seq[(Int, Int)] = Seq(0 -> 100, 1 -> 2000)

  /** k-anonymity + l-diversity audit of the customer table at each
    * generalization level — the privacy gate a data release runs before
    * publishing quasi-identifiable rows.
    *
    * QIs: (c_nationkey, c_mktsegment, banded c_acctbal). Sensitive
    * attribute: o_orderpriority of the customer's orders (joined in for
    * the diversity check; population = customers with ≥1 order).
    *
    * Scale shape: each level is two bounded aggregations — a groupBy
    * over the QI domain (map-side combined, output bounded by
    * |nations|×|segments|×|bands|, thousands of rows at any corpus
    * size) folded to ONE stats row, and an orders⨝customer join (fact
    * shuffles on custkey, or broadcast dim at this SF) folded the same
    * way. The 1-row frames cross-join (broadcast) and the per-level
    * rows union — nothing here grows with the fact table.
    */
  def qKAnonymity(s: SparkSession, dir: String): DataFrame = {
    val levels = ANON_BANDS.map { case (level, width) =>
      val cust = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / width).cast("long").as("bal_band"))
      val groups = cust
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("sz"))
      val kStats = groups.agg(
        count(lit(1)).as("n_groups"),
        min("sz").as("min_group_size"),
        sum((col("sz") < ANON_K).cast("long")).as("n_unsafe_groups"),
        sum(when(col("sz") < ANON_K, col("sz")).otherwise(lit(0L))).as("risky_rows"),
        round(sum(when(col("sz") < ANON_K, col("sz")).otherwise(lit(0L)))
          / sum("sz"), 6).as("risky_frac"))
      val lStats = Tables.orders(s, dir)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(countDistinct("o_orderpriority").as("l"))
        .agg(min("l").as("min_l"),
          sum((col("l") < ANON_L).cast("long")).as("n_low_l_groups"))
      kStats.crossJoin(broadcast(lStats))
        .select(lit(level).as("gen_level"), col("n_groups"),
          col("min_group_size"), col("n_unsafe_groups"), col("risky_rows"),
          col("risky_frac"), col("min_l"), col("n_low_l_groups"))
    }
    levels.reduce(_.union(_)).orderBy("gen_level")
  }

  val oracleKAnonymity: String = {
    val perLevel = ANON_BANDS.map { case (level, width) =>
      s"""SELECT $level AS gen_level, k.n_groups, k.min_group_size,
         |  k.n_unsafe_groups, k.risky_rows, k.risky_frac, l.min_l, l.n_low_l_groups
         |FROM (
         |  SELECT count(*) AS n_groups, min(sz) AS min_group_size,
         |    CAST(sum(CASE WHEN sz < $ANON_K THEN 1 ELSE 0 END) AS BIGINT) AS n_unsafe_groups,
         |    CAST(sum(CASE WHEN sz < $ANON_K THEN sz ELSE 0 END) AS BIGINT) AS risky_rows,
         |    round(sum(CASE WHEN sz < $ANON_K THEN sz ELSE 0 END) * 1.0 / sum(sz), 6) AS risky_frac
         |  FROM (SELECT count(*) AS sz FROM customer
         |        GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / $width) AS BIGINT)) g
         |) k, (
         |  SELECT min(l) AS min_l,
         |    CAST(sum(CASE WHEN l < $ANON_L THEN 1 ELSE 0 END) AS BIGINT) AS n_low_l_groups
         |  FROM (SELECT count(DISTINCT o_orderpriority) AS l
         |        FROM orders JOIN customer ON o_custkey = c_custkey
         |        GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / $width) AS BIGINT)) g
         |) l""".stripMargin
    }
    perLevel.mkString("", "\nUNION ALL\n", "\nORDER BY gen_level")
  }

  // ------------------------------------------------------ t-closeness audit

  /** t-closeness violation threshold: a QI group whose sensitive-value
    * distribution sits further than T (in ordered-EMD) from the global
    * distribution leaks attribute INFORMATION even when it is
    * k-anonymous and l-diverse (skewness attack — "this group is
    * almost all URGENT" re-identifies intent without re-identifying
    * rows). 0.2 flags the skewed tail on the driver data. */
  private[graft] val T_CLOSE = 0.2

  /** t-closeness audit (`q_t_closeness`) — the third rung of the
    * release ladder after [[qKAnonymity]]'s k and l rungs: for every
    * QI group (level-1 generalization: nation × segment × 2000-wide
    * balance band), the Earth Mover's Distance between the group's
    * o_orderpriority distribution and the global one. Priorities are
    * ordered categories with unit spacing, so EMD has the closed form
    * (1/(k−1)) Σᵢ |cumP(i) − cumQ(i)| over the k ordered categories.
    * Output is the release gate's summary: group count, max/mean EMD,
    * and how many groups exceed [[T_CLOSE]].
    *
    * Scale shape: the fact table shuffles ONCE (orders ⨝ customer on
    * custkey — broadcast dim at this SF, FK-partitioned beyond), then
    * one map-side-combinable count to the (QI × k) frame. Everything
    * after — the k-row grid completion per group, cumulative shares,
    * the EMD fold — runs on windows over ≤k-row partitions of an
    * already-aggregated frame, and the global distribution is a
    * broadcast k-row frame. Nothing downstream grows with the fact.
    */
  def qTCloseness(s: SparkSession, dir: String): DataFrame = {
    val width = ANON_BANDS.last._2
    val cust = Tables.customer(s, dir).select(
      col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / width).cast("long").as("bal_band"))
    val pop = Tables.orders(s, dir)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
        col("o_orderpriority").as("pri"))
    tClosenessOf(pop)
  }

  /** [[qTCloseness]] over a prepared population frame with columns
    * (c_nationkey, c_mktsegment, bal_band, pri). */
  private[graft] def tClosenessOf(pop: DataFrame): DataFrame = {
    val cnt = pop.groupBy("c_nationkey", "c_mktsegment", "bal_band", "pri")
      .agg(count(lit(1)).as("c"))
      .cache()
    // global ordered distribution (k rows, broadcast)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val priOrd = org.apache.spark.sql.expressions.Window.partitionBy()
      .orderBy("pri").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val global = cnt.groupBy("pri").agg(sum("c").as("gc"))
      .withColumn("gtot", sum("gc").over(all))
      .withColumn("gcum", sum("gc").over(priOrd) / col("gtot"))
      .select(col("pri"), col("gcum"))
    val kCats = global.count()
    // complete each group's k-row grid (absent priorities = 0)
    val groups = cnt.groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(sum("c").as("tot"))
    val grid = groups.crossJoin(broadcast(global))
      .join(cnt, Seq("c_nationkey", "c_mktsegment", "bal_band", "pri"), "left")
      .withColumn("p", coalesce(col("c"), lit(0L)).cast("double") / col("tot"))
    val byGrp = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey", "c_mktsegment", "bal_band")
      .orderBy("pri").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val emd = grid
      .withColumn("pcum", sum("p").over(byGrp))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg((sum(abs(col("pcum") - col("gcum"))) / (kCats - 1)).as("emd"))
    emd.agg(
      count(lit(1)).as("n_groups"),
      lit(kCats).as("k_cats"),
      round(max("emd"), 6).as("max_emd"),
      round(avg("emd"), 6).as("avg_emd"),
      sum((col("emd") > T_CLOSE).cast("long")).as("n_violating"))
  }

  val oracleTCloseness: String = {
    val width = ANON_BANDS.last._2
    s"""WITH pop AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(floor(c_acctbal / $width) AS BIGINT) AS bal_band,
       |    o_orderpriority AS pri
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |cnt AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band, pri, count(*) AS c
       |  FROM pop GROUP BY 1, 2, 3, 4),
       |gl AS (
       |  SELECT pri,
       |    sum(gc) OVER (ORDER BY pri) / (sum(gc) OVER ()) AS gcum
       |  FROM (SELECT pri, sum(c) AS gc FROM cnt GROUP BY 1)),
       |kc AS (SELECT count(*) AS k FROM gl),
       |grp AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band, CAST(sum(c) AS BIGINT) AS tot
       |  FROM cnt GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT g.c_nationkey, g.c_mktsegment, g.bal_band, gl.pri, gl.gcum,
       |    coalesce(cnt.c, 0)::DOUBLE / g.tot AS p
       |  FROM grp g CROSS JOIN gl
       |  LEFT JOIN cnt ON cnt.c_nationkey = g.c_nationkey
       |    AND cnt.c_mktsegment = g.c_mktsegment
       |    AND cnt.bal_band = g.bal_band AND cnt.pri = gl.pri),
       |emd AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band,
       |    sum(abs(pcum - gcum)) / (SELECT k - 1 FROM kc) AS emd
       |  FROM (SELECT *, sum(p) OVER (
       |          PARTITION BY c_nationkey, c_mktsegment, bal_band
       |          ORDER BY pri) AS pcum
       |        FROM grid)
       |  GROUP BY 1, 2, 3)
       |SELECT count(*) AS n_groups, (SELECT k FROM kc) AS k_cats,
       |  round(max(emd), 6) AS max_emd, round(avg(emd), 6) AS avg_emd,
       |  CAST(sum(CASE WHEN emd > $T_CLOSE THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_violating
       |FROM emd""".stripMargin
  }

  val oraclePiiRedact: String = {
    // DuckDB single-quoted strings keep backslashes literal, so the
    // runtime pattern values interpolate into RE2 unchanged
    val email = EMAIL_RE
    val phone = PHONE_RE
    val ip = IP_RE
    s"""WITH dirty AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN base || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
       |         ELSE base END AS dirty
       |  FROM (
       |    SELECT doc_id,
       |      CASE WHEN doc_id % 5 = 0
       |        THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |        ELSE text END AS base
       |    FROM documents)),
       |scrubbed AS (
       |  SELECT doc_id, dirty,
       |    regexp_replace(regexp_replace(regexp_replace(dirty,
       |      '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'), '$ip', '<IP>', 'g') AS clean
       |  FROM dirty)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(dirty, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(regexp_replace(dirty, '$email', '<EMAIL>', 'g'), '$phone')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(regexp_replace(dirty, '$email', '<EMAIL>', 'g'), '$ip')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(clean, '$email')) + len(regexp_extract_all(clean, '$phone'))
       |     + len(regexp_extract_all(clean, '$ip')) AS BIGINT) AS residual,
       |  ${HashFns.h60Sql("clean")} AS clean_fp
       |FROM scrubbed ORDER BY doc_id""".stripMargin
  }

  /** Every ERASE_MODth customer files an erasure request. */
  private[graft] val ERASE_MOD = 50

  /** Right-to-be-forgotten cascade audit (`q_erasure_audit`): given a
    * deletion list (every ERASE_MODth customer — the deterministic
    * stand-in for a GDPR/CCPA request batch), walk the foreign-key
    * graph customer → orders → lineitem and report, per table, how
    * many rows the erasure removes and — the audit's point — that the
    * SURVIVING rows are referentially closed (zero orders pointing at
    * an erased customer, zero lineitems pointing at an erased order).
    * This is the compliance readout a warehouse produces before and
    * after running the actual deletes.
    *
    * Scale shape: each cascade level is ONE left-semi join on the
    * parent's erased keys (orders keys ≪ orders rows; never a
    * broadcast assumption — at 100 TB the request batch can be
    * millions of keys, and semi joins shuffle-partition on the FK
    * exactly like the production delete would); residual checks are
    * the same joins negated (anti), so the whole audit is two passes
    * over each fact table with map-side-combined counts.
    */
  def qErasureAudit(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(col("c_custkey"))
    val delC = cust.filter(col("c_custkey") % ERASE_MOD === 0)
    val orders = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val delO = orders.join(delC, col("o_custkey") === col("c_custkey"), "left_semi")
    val line = Tables.lineitem(s, dir).select(col("l_orderkey"))
    val delL = line.join(delO.select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    // survivors' referential residuals: must be zero if the cascade is complete
    val survO = orders.join(delC, col("o_custkey") === col("c_custkey"), "left_anti")
    val residO = survO.join(delC, col("o_custkey") === col("c_custkey"), "left_semi")
    val residL = line.join(delO.select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
      .join(delO.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_semi")
    def tbl(name: String, total: DataFrame, erased: DataFrame, resid: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_total")).crossJoin(
        erased.agg(count(lit(1)).as("n_erased"))).crossJoin(
        resid.agg(count(lit(1)).as("n_residual")))
        .select(lit(name).as("tbl"), col("n_total"), col("n_erased"),
          round(col("n_erased") / col("n_total"), 6).as("erased_frac"),
          col("n_residual"))
    tbl("customer", cust, delC, delC.limit(0))
      .unionByName(tbl("orders", orders, delO, residO))
      .unionByName(tbl("lineitem", line, delL, residL))
      .orderBy("tbl")
  }

  /** Per-release ε for the two DP-released statistics. */
  private val DP_EPS1 = "0.5" // literal text shared with the oracle
  private val DP_EPS2 = "0.5"

  /** Differentially-private release (`q_dp_release`): per-nation and
    * per-segment customer counts published with Laplace(1/ε) noise —
    * sensitivity 1 (one customer moves one count by one) — plus the
    * composed privacy budget (sequential composition: ε_total = Σ ε_i),
    * the accounting line a privacy office actually signs off on. Noise
    * is drawn by inverse-CDF from a DETERMINISTIC hash-uniform
    * u ∈ (−0.5, 0.5): noise = −(1/ε)·sign(u)·ln(1−2|u|) — a real
    * Laplace sample, exactly reproducible in both engines (the
    * fixture pattern: auditability here beats unpredictability; swap
    * the hash for a CSPRNG seed in production and NOTHING else
    * changes). The single libm `ln` is rounded to 6dp before release.
    *
    * Scale shape: two map-side-combinable aggregates onto frames
    * bounded by the QI domains (|nations| + |segments| rows), noise a
    * pure projection on those bounded frames, one union. The fact
    * table is scanned twice and never shuffled unaggregated.
    */
  def qDpRelease(s: SparkSession, dir: String): DataFrame = {
    def laplace(key: Column, eps: String): Column = {
      val u = (HashFns.h60(key) % 1999999L + 1L).cast("double") / 2000000.0 - 0.5
      round((lit(-1.0) / expr(eps)) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u)), 6)
    }
    def release(stat: String, keyCol: Column, eps: String): DataFrame =
      Tables.customer(s, dir)
        .groupBy(keyCol.as("qi_key"))
        .agg(count(lit(1)).as("n_true"))
        .select(lit(stat).as("stat"), col("qi_key"),
          col("n_true"),
          laplace(concat(lit(s"$stat:"), col("qi_key")), eps).as("noise"),
          round(col("n_true") + laplace(concat(lit(s"$stat:"), col("qi_key")), eps), 6)
            .as("n_released"),
          expr(eps).as("eps"))
    release("cnt_by_nation", col("c_nationkey").cast("string"), DP_EPS1)
      .unionByName(release("cnt_by_segment", col("c_mktsegment"), DP_EPS2))
      .orderBy("stat", "qi_key")
  }

  val oracleDpRelease: String = {
    def lap(keyExpr: String, eps: String): String = {
      val u = s"((${HashFns.h60Sql(keyExpr)} % 1999999 + 1)::DOUBLE / 2000000.0 - 0.5)"
      s"round((-1.0::DOUBLE / $eps) * sign($u) * ln(1.0 - 2.0 * abs($u)), 6)"
    }
    def rel(stat: String, key: String, eps: String): String = {
      val n = lap(s"'$stat:' || qi_key", eps)
      s"""SELECT '$stat' AS stat, qi_key, n_true, $n AS noise,
         |  round(n_true + $n, 6) AS n_released, $eps::DOUBLE AS eps
         |FROM (SELECT $key AS qi_key, count(*) AS n_true FROM customer GROUP BY 1)""".stripMargin
    }
    s"""SELECT * FROM (
       |${rel("cnt_by_nation", "CAST(c_nationkey AS VARCHAR)", DP_EPS1)}
       |UNION ALL
       |${rel("cnt_by_segment", "c_mktsegment", DP_EPS2)})
       |ORDER BY stat, qi_key""".stripMargin
  }

  val oracleErasureAudit: String =
    s"""WITH delc AS (SELECT c_custkey FROM customer WHERE c_custkey % $ERASE_MOD = 0),
       |delo AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM delc)),
       |dell AS (SELECT l_orderkey FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM delo)),
       |rows_ AS (
       |  SELECT 'customer' AS tbl, (SELECT count(*) FROM customer) AS n_total,
       |    (SELECT count(*) FROM delc) AS n_erased, 0 AS n_residual
       |  UNION ALL
       |  SELECT 'orders', (SELECT count(*) FROM orders), (SELECT count(*) FROM delo),
       |    (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM delc)
       |       AND o_custkey IN (SELECT c_custkey FROM delc))
       |  UNION ALL
       |  SELECT 'lineitem', (SELECT count(*) FROM lineitem), (SELECT count(*) FROM dell),
       |    (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM delo)
       |       AND l_orderkey IN (SELECT o_orderkey FROM delo)))
       |SELECT tbl, n_total, n_erased,
       |  round(CAST(n_erased AS DOUBLE) / n_total, 6) AS erased_frac,
       |  CAST(n_residual AS BIGINT) AS n_residual
       |FROM rows_ ORDER BY tbl""".stripMargin

  /** Re-identification risk profile per generalization level: the three
    * standard attacker models over the (nationkey, mktsegment, balance
    * band) quasi-identifier —
    *   - prosecutor risk: 1 / min group size (attacker knows the target
    *     IS in the data; worst-case record),
    *   - journalist/uniqueness: count and fraction of sample-unique rows
    *     (equivalence class of size 1),
    *   - marketer risk: n_groups / N (expected fraction re-identified
    *     when every record is matched to its class).
    * Complements `q_k_anonymity` (which gates on a fixed k): this is the
    * continuous risk readout a release reviewer reads.
    *
    * All ratios are exact-integer until the 6dp output edge. Scale: one
    * shuffle to class counts, then a second aggregate over the already-
    * reduced |classes|-row frame — the same two-stage reduction as
    * `q_cust_order_dist`.
    */
  def qReidentRisk(s: SparkSession, dir: String): DataFrame = {
    val levels = ANON_BANDS.map { case (level, width) =>
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / width).cast("long").as("bal_band"))
        .agg(count(lit(1)).as("sz"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum("sz").as("n_rows"),
          min("sz").as("min_sz"),
          sum((col("sz") === 1).cast("long")).as("n_unique"))
        .select(
          lit(level).as("gen_level"),
          col("n_groups"), col("min_sz"), col("n_unique"),
          round(col("n_unique") / col("n_rows").cast("double"), 6).as("uniq_frac"),
          round(lit(1.0) / col("min_sz"), 6).as("prosecutor_risk"),
          round(col("n_groups") / col("n_rows").cast("double"), 6).as("marketer_risk"))
    }
    levels.reduce(_.union(_)).orderBy("gen_level")
  }

  val oracleReidentRisk: String = {
    val perLevel = ANON_BANDS.map { case (level, width) =>
      s"""SELECT $level AS gen_level, count(*) AS n_groups, min(sz) AS min_sz,
         |  CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  round(CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    / CAST(CAST(sum(sz) AS BIGINT) AS DOUBLE), 6) AS uniq_frac,
         |  round(CAST(1.0 AS DOUBLE) / min(sz), 6) AS prosecutor_risk,
         |  round(count(*) / CAST(CAST(sum(sz) AS BIGINT) AS DOUBLE), 6) AS marketer_risk
         |FROM (SELECT count(*) AS sz FROM customer
         |      GROUP BY c_nationkey, c_mktsegment,
         |        CAST(floor(c_acctbal / $width) AS BIGINT)) g""".stripMargin
    }
    perLevel.mkString("", "\nUNION ALL\n", "\nORDER BY gen_level")
  }

  // ------------------------------------------------- l-diversity
  /** l-diversity audit (`q_l_diversity`) — the release gate BETWEEN
    * [[qKAnonymity]] (group size) and [[qTCloseness]] (distributional
    * distance): a QI group can be large (k-anonymous) yet still leak if
    * every member shares one sensitive value. Per (segment, nation)
    * quasi-identifier group over the customers' orders: distinct
    * sensitive values (order priority), entropy l-diversity
    * exp(−Σ p·ln p), and the distinct-l ≥ 3 release flag.
    *
    * Scale shape: one fact aggregate to the (QI × sensitive) cell frame
    * (enum-bounded: ≤ |segments|·|nations|·|priorities|), everything
    * after runs on that frame. The entropy fold runs in sorted sensitive
    * order on BOTH engines (≤5 terms — the sorted-fold determinism
    * discipline).
    */
  def qLDiversity(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.dim(s, dir, "customer")
      .select("c_custkey", "c_mktsegment", "c_nationkey")
    val x = Tables.orders(s, dir).select("o_custkey", "o_orderpriority")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("long").as("nation"),
        col("o_orderpriority").as("sensitive"))
    val cells = x.groupBy("segment", "nation", "sensitive")
      .agg(count(lit(1)).as("cnt"))
    cells.groupBy("segment", "nation")
      .agg(sum("cnt").as("n"),
        count(lit(1)).as("l_distinct"),
        collect_list(struct(col("sensitive"), col("cnt"))).as("parts"))
      .withColumn("ent", aggregate(array_sort(col("parts")), lit(0.0d),
        (acc, e) => acc
          - (e.getField("cnt").cast("double") / col("n").cast("double"))
            * log(e.getField("cnt").cast("double") / col("n").cast("double"))))
      .select(col("segment"), col("nation"),
        col("n").cast("long").as("n"),
        col("l_distinct").cast("long").as("l_distinct"),
        round(exp(col("ent")), 6).as("entropy_l"),
        (col("l_distinct") >= 3).as("meets_l3"))
      .orderBy("segment", "nation")
  }

  val oracleLDiversity: String =
    """WITH x AS (
      |  SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT) AS nation,
      |    o_orderpriority AS sensitive
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cells AS (SELECT segment, nation, sensitive, count(*) AS cnt
      |  FROM x GROUP BY segment, nation, sensitive),
      |c2 AS (SELECT segment, nation, sensitive, cnt,
      |  sum(cnt) OVER (PARTITION BY segment, nation) AS n FROM cells)
      |SELECT segment, nation, CAST(max(n) AS BIGINT) AS n,
      |  CAST(count(*) AS BIGINT) AS l_distinct,
      |  round(exp(list_reduce(list_prepend(0.0::DOUBLE,
      |    list(-(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
      |         * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY sensitive)),
      |    (acc, x) -> acc + x)), 6) AS entropy_l,
      |  count(*) >= 3 AS meets_l3
      |FROM c2 GROUP BY segment, nation
      |ORDER BY segment, nation""".stripMargin
}
