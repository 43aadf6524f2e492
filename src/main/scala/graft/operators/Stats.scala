package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust statistics / distribution-audit operators — the monitoring
  * family a data pipeline runs on every ingest batch alongside
  * [[EventOps.qEventsAnomaly]]'s mean/σ z-score: median/MAD outliers
  * (robust to the very outliers a mean-based score absorbs), equi-width
  * histograms, a Benford first-digit audit, a two-sample KS drift test,
  * and mutual information between categorical columns.
  *
  * Scale notes (100 TB): every operator aggregates the fact table ONCE
  * per pass into a bounded frame (|event types|, |buckets|, |digits|,
  * |bins|, |category pairs|) and every join back onto a fact is an
  * explicit broadcast of such a bounded frame. Window functions appear
  * ONLY over aggregated frames (≤ a few hundred rows by construction) —
  * never over a raw fact stream, so no single-task skew partition exists
  * anywhere here. Cross-engine determinism: aggregates are rounded
  * before comparisons/thresholds; libm functions (ln, log10, sqrt) feed
  * only rounded outputs, so a 1-ulp engine difference cannot flip a
  * reported digit.
  */
object Stats {

  /** The lineitem measures [[qCorrMatrix]] correlates, with their
    * integer-unit scaling (cents / basis points / units ×100). */
  private val CORR_COLS = Seq(
    ("qty", "l_quantity", 100),
    ("price", "l_extendedprice", 100),
    ("disc", "l_discount", 10000),
    ("tax", "l_tax", 10000))

  /** Pairwise Pearson correlation matrix (`q_corr_matrix`) over the
    * lineitem measures — the numeric-profiling pass a curation pipeline
    * runs to find redundant or leaking features before training.
    * Every measure is scaled to an exact integer unit first (cents /
    * bps), then ALL moments — Σx, Σx², Σxy for every pair — fold as
    * DECIMAL(38,0) with the operand cast BEFORE the multiply (a cents
    * price squared is ~1e14 per row; BIGINT overflows near 6e5 rows —
    * the r9-advisor overflow class, engineered out here from the
    * start). One map-side-combinable aggregate over one fact scan
    * produces every moment; the correlation arithmetic runs on the
    * single moment row. r is computed in doubles from exact integer
    * moments, so both engines divide identical numbers.
    */
  def qCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val ints = CORR_COLS.map { case (a, c, sc) =>
      round(col(c) * sc).cast("decimal(38,0)").as(a)
    }
    val li = Tables.lineitem(s, dir).select(ints: _*)
    val moments =
      Seq(count(lit(1)).cast("decimal(38,0)").as("n")) ++
      CORR_COLS.map { case (a, _, _) => sum(col(a)).as(s"s_$a") } ++
      CORR_COLS.map { case (a, _, _) => sum(col(a) * col(a)).as(s"ss_$a") } ++
      CORR_COLS.combinations(2).toSeq.map { case Seq((a, _, _), (b, _, _)) =>
        sum(col(a) * col(b)).as(s"sp_${a}_$b")
      }
    // localCheckpoint: the moment row is referenced by all six pair
    // branches — without materialization each branch re-plans the whole
    // fact scan (measured: 6 scans of lineitem), with it the scan runs
    // once and the branches read one cached row
    val m = li.agg(moments.head, moments.tail: _*).localCheckpoint()
    def d(c: String) = col(c).cast("double")
    val pairRows = CORR_COLS.combinations(2).toSeq.map { case Seq((a, _, _), (b, _, _)) =>
      val cov = d("n") * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")
      val va = d("n") * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vb = d("n") * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      m.select(lit(a).as("x"), lit(b).as("y"),
        round(cov / sqrt(va * vb), 6).as("r"))
    }
    pairRows.reduce(_ unionByName _).orderBy("x", "y")
  }

  val oracleCorrMatrix: String = {
    val ints = CORR_COLS.map { case (a, c, sc) =>
      s"CAST(round($c * $sc) AS DECIMAL(38,0)) AS $a"
    }.mkString(", ")
    val moments =
      Seq("count(*)::DECIMAL(38,0) AS n") ++
      CORR_COLS.map { case (a, _, _) => s"sum($a) AS s_$a" } ++
      CORR_COLS.map { case (a, _, _) => s"sum($a * $a) AS ss_$a" } ++
      CORR_COLS.combinations(2).toSeq.map { case Seq((a, _, _), (b, _, _)) =>
        s"sum($a * $b) AS sp_${a}_$b"
      }
    val pairSelects = CORR_COLS.combinations(2).toSeq.map { case Seq((a, _, _), (b, _, _)) =>
      s"""SELECT '$a' AS x, '$b' AS y,
         |  round((n::DOUBLE * sp_${a}_$b::DOUBLE - s_$a::DOUBLE * s_$b::DOUBLE)
         |    / sqrt((n::DOUBLE * ss_$a::DOUBLE - s_$a::DOUBLE * s_$a::DOUBLE)
         |         * (n::DOUBLE * ss_$b::DOUBLE - s_$b::DOUBLE * s_$b::DOUBLE)), 6) AS r
         |  FROM m""".stripMargin
    }.mkString("\n UNION ALL ")
    s"""WITH ints AS (SELECT $ints FROM lineitem),
       |m AS (SELECT ${moments.mkString(", ")} FROM ints)
       |$pairSelects
       |ORDER BY x, y""".stripMargin
  }

  // ------------------------------------------------------------ MAD
  /** Robust outlier detection (`q_mad_outliers`): per event type,
    * median + MAD (median absolute deviation), then |v − med| >
    * 3·1.4826·MAD outlier counts (1.4826 scales MAD to σ under
    * normality). Three fact scans (median, MAD, outlier count) — each a
    * map-side-combinable aggregate or a broadcast-stats probe; the
    * fact table never shuffles. Spark's exact `percentile` and DuckDB's
    * `quantile_cont` both linearly interpolate, and both medians are
    * rounded 6dp before any arithmetic that feeds a threshold.
    */
  def qMadOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("event_type", "value")
    val med = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 6).as("med_v"))
    val mad = ev.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), abs(col("value") - col("med_v")).as("adev"))
      .groupBy("event_type")
      .agg(round(expr("percentile(adev, 0.5)"), 6).as("mad_v"))
    ev.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type", "n", "med_v", "mad_v")
      .agg(coalesce(
        sum((abs(col("value") - col("med_v")) > col("mad_v") * lit(3.0) * lit(1.4826))
          .cast("long")), lit(0L)).as("n_outliers"))
      .select("event_type", "n", "med_v", "mad_v", "n_outliers")
      .orderBy("event_type")
  }

  val oracleMadOutliers: String =
    """WITH med AS (
      |  SELECT event_type, count(*) AS n,
      |    round(quantile_cont(value, 0.5), 6) AS med_v
      |  FROM events GROUP BY event_type),
      |mad AS (
      |  SELECT e.event_type,
      |    round(quantile_cont(abs(e.value - m.med_v), 0.5), 6) AS mad_v
      |  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)
      |SELECT e.event_type, m.n, m.med_v, d.mad_v,
      |  CAST(coalesce(sum(CASE WHEN abs(e.value - m.med_v) > d.mad_v * 3 * 1.4826
      |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers
      |FROM events e JOIN med m USING (event_type) JOIN mad d ON d.event_type = e.event_type
      |GROUP BY e.event_type, m.n, m.med_v, d.mad_v
      |ORDER BY e.event_type""".stripMargin

  // ------------------------------------------------------ histogram
  private[graft] val HIST_W = 25000.0
  private[graft] val HIST_NB = 20

  /** Equi-width histogram (`q_histogram`) of order totals: bucket =
    * min(⌊price/W⌋, NB−1). One hash aggregate over the fact (map-side
    * combined), then the cumulative share via a window over the ≤NB-row
    * aggregated frame (bounded by construction — the only "global"
    * window is over NB rows). Bucket arithmetic is pure IEEE division +
    * floor — identical in both engines.
    */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    val b = least(floor(col("o_totalprice") / HIST_W), lit(HIST_NB - 1)).cast("int")
    val agg = Tables.orders(s, dir).select(b.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg
      .withColumn("lo", col("bucket") * HIST_W)
      .withColumn("cum_share",
        round(sum("n").over(w).cast("double") / sum("n").over(all), 6))
      .select("bucket", "lo", "n", "cum_share")
      .orderBy("bucket")
  }

  val oracleHistogram: String =
    s"""WITH agg AS (
       |  SELECT CAST(least(floor(o_totalprice / $HIST_W), ${HIST_NB - 1}) AS INT) AS bucket,
       |    count(*) AS n
       |  FROM orders GROUP BY 1)
       |SELECT bucket, bucket * $HIST_W AS lo, n,
       |  round((sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING))::DOUBLE
       |    / (sum(n) OVER ()), 6) AS cum_share
       |FROM agg ORDER BY bucket""".stripMargin

  // -------------------------------------------------------- Benford
  /** Benford first-digit audit (`q_benford`) over lineitem prices — the
    * classic fabricated-data / corruption screen. The first significant
    * digit comes from the DECIMAL(12,2) rendering (both engines format
    * decimals identically; no log10-near-integer hazard, no double→
    * string formatting divergence). One fact aggregate to 9 rows, then
    * expected Benford mass log10(1+1/d) and the χ² contribution per
    * digit; obs/exp shares rounded 6dp, χ² terms 4dp (counts are exact
    * ints, so the only cross-engine noise is libm log10 at ≤1 ulp,
    * absorbed by the rounding).
    */
  def qBenford(s: SparkSession, dir: String): DataFrame = {
    val digit = substring(col("l_extendedprice").cast("decimal(12,2)").cast("string"), 1, 1)
    val agg = Tables.lineitem(s, dir).select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg
      .withColumn("total", sum("n").over(all))
      .withColumn("obs_p", col("n").cast("double") / col("total"))
      .withColumn("exp_p", log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double")))
      .select(col("digit"), col("n"),
        round(col("obs_p"), 6).as("obs_p"),
        round(col("exp_p"), 6).as("exp_p"),
        round(pow(col("obs_p") - col("exp_p"), 2) / col("exp_p") * col("total"), 4)
          .as("chi2_term"))
      .orderBy("digit")
  }

  val oracleBenford: String =
    """WITH agg AS (
      |  SELECT substring(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1) AS digit,
      |    count(*) AS n
      |  FROM lineitem GROUP BY 1),
      |x AS (
      |  SELECT digit, n, sum(n) OVER () AS total,
      |    n::DOUBLE / sum(n) OVER () AS obs_p,
      |    log10(1.0 + 1.0 / digit::DOUBLE) AS exp_p
      |  FROM agg)
      |SELECT digit, n, round(obs_p, 6) AS obs_p, round(exp_p, 6) AS exp_p,
      |  round(pow(obs_p - exp_p, 2) / exp_p * total, 4) AS chi2_term
      |FROM x ORDER BY digit""".stripMargin

  // ------------------------------------------------------------- KS
  private[graft] val KS_BIN = 1000.0
  private[graft] val KS_SEG_A = "BUILDING"
  private[graft] val KS_SEG_B = "MACHINERY"

  /** Two-sample Kolmogorov–Smirnov drift test (`q_ks_test`): D =
    * max |F_A − F_B| between two customer segments' order-total
    * distributions, on a fixed value grid (KS_BIN-wide bins — the 100 TB
    * shape: the ECDF support is the bounded bin domain, not the raw
    * value set, so the cumulative window runs over ≤|domain/KS_BIN| rows
    * no matter the fact size). One broadcast dim join + one fact
    * aggregate; the α=0.05 decision uses the standard c(α)=1.358
    * critical value. ECDF ratios are exact-int divisions (identical
    * doubles in both engines); D is rounded 6dp.
    */
  def qKsTest(s: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(s, dir)
      .join(Tables.dim(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B))
    val agg = seg.select(
        floor(col("o_totalprice") / KS_BIN).cast("long").as("b"),
        (col("c_mktsegment") === KS_SEG_A).cast("long").as("ia"),
        (col("c_mktsegment") === KS_SEG_B).cast("long").as("ib"))
      .groupBy("b").agg(sum("ia").as("na"), sum("ib").as("nb"))
    val w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg
      .withColumn("ta", sum("na").over(all))
      .withColumn("tb", sum("nb").over(all))
      .withColumn("gap", abs(
        sum("na").over(w).cast("double") / col("ta") -
          sum("nb").over(w).cast("double") / col("tb")))
      .groupBy("ta", "tb")
      .agg(round(max("gap"), 6).as("d_stat"))
      .select(col("ta").as("n_a"), col("tb").as("n_b"), col("d_stat"),
        (col("d_stat") > lit(1.358) * sqrt((col("ta") + col("tb")).cast("double") /
          (col("ta").cast("double") * col("tb").cast("double"))))
          .cast("int").as("reject_05"))
  }

  val oracleKsTest: String =
    s"""WITH seg AS (
       |  SELECT floor(o_totalprice / $KS_BIN)::BIGINT AS b,
       |    CASE WHEN c_mktsegment = '$KS_SEG_A' THEN 1 ELSE 0 END AS ia,
       |    CASE WHEN c_mktsegment = '$KS_SEG_B' THEN 1 ELSE 0 END AS ib
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment IN ('$KS_SEG_A', '$KS_SEG_B')),
       |agg AS (SELECT b, sum(ia) AS na, sum(ib) AS nb FROM seg GROUP BY b),
       |cum AS (
       |  SELECT sum(na) OVER () AS ta, sum(nb) OVER () AS tb,
       |    abs((sum(na) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING))::DOUBLE / (sum(na) OVER ())
       |      - (sum(nb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING))::DOUBLE / (sum(nb) OVER ())) AS gap
       |  FROM agg)
       |SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b, round(max(gap), 6) AS d_stat,
       |  CAST(round(max(gap), 6) > 1.358 * sqrt((ta + tb)::DOUBLE / (ta::DOUBLE * tb::DOUBLE)) AS INT) AS reject_05
       |FROM cum GROUP BY ta, tb""".stripMargin

  // ---------------------------------------------- mutual information
  /** Mutual information (`q_mutual_info`) between l_returnflag and
    * l_linestatus — the feature-dependence screen a pipeline runs before
    * treating two label columns as independent. One fact aggregate to
    * the |X|·|Y| joint-count frame (≤ a dozen rows); marginals are
    * window sums over that frame, MI/entropies one final aggregate.
    * All probabilities are exact-int ratios; ln is libm (≤1 ulp engine
    * skew) and every reported number is rounded 6dp, so the sums differ
    * by ≤1e-15 before a 1e-6 rounding grid.
    */
  def qMutualInfo(s: SparkSession, dir: String): DataFrame = {
    val joint = Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("nxy"))
    val wx = Window.partitionBy("l_returnflag")
    val wy = Window.partitionBy("l_linestatus")
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val p = col("nxy").cast("double") / col("n")
    joint
      .withColumn("nx", sum("nxy").over(wx))
      .withColumn("ny", sum("nxy").over(wy))
      .withColumn("n", sum("nxy").over(all))
      .select(col("n"),
        (p * log(p / ((col("nx").cast("double") / col("n")) *
          (col("ny").cast("double") / col("n"))))).as("mi_term"),
        (p * log(col("nx").cast("double") / col("n"))).as("hx_term"),
        (p * log(col("ny").cast("double") / col("n"))).as("hy_term"))
      .groupBy("n")
      .agg(round(sum("mi_term"), 6).as("mi"),
        round(-sum("hx_term"), 6).as("h_rf"),
        round(-sum("hy_term"), 6).as("h_ls"),
        round(sum("mi_term") / sqrt(sum("hx_term") * sum("hy_term")), 6).as("nmi"))
  }

  // --------------------------------------------------- Gini / Lorenz
  private[graft] val GINI_BIN = 25000.0
  private[graft] val GINI_NB = 200

  /** Binned Gini coefficient (`q_gini_binned`) of per-customer spend —
    * the concentration audit (how unequal is the corpus/revenue across
    * contributors). Per-customer totals bin onto a fixed spend grid, so
    * the Lorenz curve lives on ≤GINI_NB rows no matter how many
    * customers exist (the global customer sort a textbook Gini needs is
    * exactly the 100 TB killer this avoids); Gini is the trapezoid sum
    * over that bounded frame. Two aggregates + bounded windows only.
    */
  def qGiniBinned(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir).groupBy("o_custkey")
      .agg(sum("o_totalprice").as("spend"))
    val b = least(floor(col("spend") / GINI_BIN), lit(GINI_NB - 1)).cast("int")
    val bins = spend.select(b.as("bucket"), col("spend"))
      .groupBy("bucket").agg(count(lit(1)).as("nc"), sum("spend").as("sp"))
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lorenz = bins
      .withColumn("cx", sum("nc").over(w).cast("double") / sum("nc").over(all))
      .withColumn("cy", sum("sp").over(w) / sum("sp").over(all))
      .withColumn("px", lag("cx", 1, 0.0).over(Window.orderBy("bucket")))
      .withColumn("py", lag("cy", 1, 0.0).over(Window.orderBy("bucket")))
    lorenz
      .agg(sum("nc").as("n_customers"),
        round(lit(1.0) - sum((col("cx") - col("px")) * (col("cy") + col("py"))), 6)
          .as("gini"),
        round(lit(1.0) - min(when(col("cx") >= 0.9, col("py"))), 6).as("top_decile_share"))
  }

  val oracleGiniBinned: String =
    s"""WITH spend AS (
       |  SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY 1),
       |bins AS (
       |  SELECT CAST(least(floor(spend / $GINI_BIN), ${GINI_NB - 1}) AS INT) AS bucket,
       |    count(*) AS nc, sum(spend) AS sp
       |  FROM spend GROUP BY 1),
       |cum AS (
       |  SELECT bucket, nc,
       |    (sum(nc) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING))::DOUBLE / (sum(nc) OVER ()) AS cx,
       |    (sum(sp) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)) / (sum(sp) OVER ()) AS cy
       |  FROM bins),
       |lorenz AS (
       |  SELECT nc, cx, cy,
       |    coalesce(lag(cx) OVER (ORDER BY bucket), 0.0) AS px,
       |    coalesce(lag(cy) OVER (ORDER BY bucket), 0.0) AS py
       |  FROM cum)
       |SELECT CAST(sum(nc) AS BIGINT) AS n_customers,
       |  round(1.0 - sum((cx - px) * (cy + py)), 6) AS gini,
       |  round(1.0 - min(CASE WHEN cx >= 0.9 THEN py END), 6) AS top_decile_share
       |FROM lorenz""".stripMargin

  // ------------------------------------------------- autocorrelation
  private[graft] val ACF_LAGS = 3

  /** Daily-revenue autocorrelation (`q_autocorr`): ACF at lags 1..3 of
    * the day-aggregated order revenue series — the rhythm check before
    * any forecasting (`q_trend_forecast`) is trusted. The raw fact
    * reduces to the |days|-row series in the first aggregate; lags are
    * windows over that bounded frame; r_k = Σ(x_t−μ)(x_{t+k}−μ)/Σ(x_t−μ)²
    * with the full-series mean (standard ACF denominator). One output
    * row per lag via a post-aggregate unpivot.
    */
  def qAutocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum("o_totalprice").as("x"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byD = Window.orderBy("d")
    var f = daily
      .withColumn("mu", avg("x").over(all))
      .withColumn("dx", col("x") - col("mu"))
    for (k <- 1 to ACF_LAGS) f = f.withColumn(s"dx$k", lag("dx", k).over(byD))
    val aggd = f.agg(
      count(lit(1)).as("n_days"),
      sum(col("dx") * col("dx")).as("den") +: (1 to ACF_LAGS).map(k =>
        sum(col("dx") * col(s"dx$k")).as(s"num$k")): _*)
    val lagRows = (1 to ACF_LAGS).map(k =>
      s"struct(CAST($k AS INT) AS lag, round(num$k / den, 6) AS r)").mkString(", ")
    aggd.select(col("n_days"), explode(expr(s"array($lagRows)")).as("a"))
      .select(col("a.lag").as("lag"), col("a.r").as("r"), col("n_days"))
      .orderBy("lag")
  }

  val oracleAutocorr: String = {
    val lagCols = (1 to ACF_LAGS).map(k =>
      s"lag(dx, $k) OVER (ORDER BY d) AS dx$k").mkString(", ")
    val nums = (1 to ACF_LAGS).map(k => s"sum(dx * dx$k) AS num$k").mkString(", ")
    val sel = (1 to ACF_LAGS).map(k =>
      s"SELECT CAST($k AS INT) AS lag, round(num$k / den, 6) AS r, n_days FROM agg").mkString("\nUNION ALL\n")
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS x
       |  FROM orders GROUP BY 1),
       |dev AS (SELECT d, x - avg(x) OVER () AS dx FROM daily),
       |lagged AS (SELECT dx, $lagCols FROM dev),
       |agg AS (
       |  SELECT count(*) AS n_days, sum(dx * dx) AS den, $nums FROM lagged)
       |$sel
       |ORDER BY lag""".stripMargin
  }

  // ------------------------------------------------------------ CUSUM
  /** CUSUM changepoint monitor (`q_cusum_changepoint`) on daily event
    * volumes: S_t = max(0, S_{t−1} + (x_t − μ − 0.5σ)), alarm while
    * S_t > 4σ — the sustained-level-shift detector that complements
    * `q_events_ewma`'s spike monitor (CUSUM integrates small persistent
    * drifts a spike test never fires on). The stream reduces to the
    * |types|·|days| daily frame first; the fold runs left-to-right over
    * each type's bounded day series only (the EWMA shape). μ/σ are
    * rounded 6dp before the fold and the fold arithmetic is written
    * identically in both engines — bit-identical accumulators, so even
    * the alarm comparisons can't diverge.
    */
  def qCusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = EventOps.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
    val st = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(avg("x"), 6).as("mu"), round(stddev_samp("x"), 6).as("sd"))
    val series = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("sx"))
      .select(col("event_type"), expr("transform(sx, e -> e.x)").as("xs"))
    def sNew(acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =
      greatest(lit(0.0), element_at(acc, 1) + (x - col("mu") - lit(0.5) * col("sd")))
    series.join(broadcast(st), Seq("event_type"))
      .select(col("event_type"), col("n_days"),
        aggregate(col("xs"), array(lit(0.0), lit(0.0), lit(0.0)),
          (acc, x) => array(
            sNew(acc, x),
            greatest(element_at(acc, 2), sNew(acc, x)),
            element_at(acc, 3) +
              (sNew(acc, x) > lit(4.0) * col("sd")).cast("double"))).as("f"))
      .select(col("event_type"), col("n_days"),
        round(element_at(col("f"), 2), 6).as("max_cusum"),
        element_at(col("f"), 3).cast("long").as("n_alarms"))
      .orderBy("event_type")
  }

  val oracleCusumChangepoint: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS d,
      |    count(*)::DOUBLE AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, count(*) AS n_days,
      |    round(avg(x), 6) AS mu, round(stddev_samp(x), 6) AS sd
      |  FROM daily GROUP BY 1),
      |series AS (SELECT event_type, list(x ORDER BY d) AS xs FROM daily GROUP BY 1),
      |folded AS (
      |  SELECT s.event_type, st.n_days,
      |    list_reduce(
      |      list_prepend([0.0, 0.0, 0.0], list_transform(xs, x -> [x, 0.0, 0.0])),
      |      (acc, el) -> [
      |        greatest(0.0, acc[1] + (el[1] - mu - 0.5 * sd)),
      |        greatest(acc[2], greatest(0.0, acc[1] + (el[1] - mu - 0.5 * sd))),
      |        acc[3] + CASE WHEN greatest(0.0, acc[1] + (el[1] - mu - 0.5 * sd)) > 4.0 * sd
      |                 THEN 1.0 ELSE 0.0 END]) AS f
      |  FROM series s JOIN st USING (event_type))
      |SELECT event_type, n_days, round(f[2], 6) AS max_cusum,
      |  CAST(f[3] AS BIGINT) AS n_alarms
      |FROM folded ORDER BY event_type""".stripMargin

  // ------------------------------------------------------- Cramér's V
  /** Cramér's V (`q_cramers_v`) between l_returnflag and l_linestatus —
    * the χ²-based twin of `q_mutual_info` on the SAME |X|·|Y| joint
    * frame: χ² against independence margins, V = √(χ²/(n·(min(r,c)−1))).
    * Counts are exact ints; χ² rounded 4dp, V 6dp.
    */
  def qCramersV(s: SparkSession, dir: String): DataFrame = {
    val joint = Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("nxy"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val e = col("nx").cast("double") * col("ny") / col("n")
    joint
      .withColumn("nx", sum("nxy").over(Window.partitionBy("l_returnflag")))
      .withColumn("ny", sum("nxy").over(Window.partitionBy("l_linestatus")))
      .withColumn("n", sum("nxy").over(all))
      .withColumn("r", size(collect_set("l_returnflag").over(all)))
      .withColumn("c", size(collect_set("l_linestatus").over(all)))
      .groupBy("n", "r", "c")
      .agg(sum(pow(col("nxy") - e, 2) / e).as("chi2"))
      .select(col("n"), round(col("chi2"), 4).as("chi2"),
        ((least(col("r"), col("c")) - 1) * (greatest(col("r"), col("c")) - 1))
          .cast("long").as("dof"),
        round(sqrt(col("chi2") / (col("n") * (least(col("r"), col("c")) - 1))), 6)
          .as("cramers_v"))
  }

  val oracleCramersV: String =
    """WITH joint AS (
      |  SELECT l_returnflag, l_linestatus, count(*) AS nxy
      |  FROM lineitem GROUP BY 1, 2),
      |rc AS (
      |  SELECT count(DISTINCT l_returnflag) AS r, count(DISTINCT l_linestatus) AS c
      |  FROM joint),
      |m AS (
      |  SELECT nxy,
      |    sum(nxy) OVER (PARTITION BY l_returnflag) AS nx,
      |    sum(nxy) OVER (PARTITION BY l_linestatus) AS ny,
      |    sum(nxy) OVER () AS n,
      |    rc.r, rc.c
      |  FROM joint, rc),
      |agg AS (
      |  SELECT n, r, c,
      |    sum(pow(nxy - nx::DOUBLE * ny / n, 2) / (nx::DOUBLE * ny / n)) AS chi2
      |  FROM m GROUP BY n, r, c)
      |SELECT CAST(n AS BIGINT) AS n, round(chi2, 4) AS chi2,
      |  CAST((least(r, c) - 1) * (greatest(r, c) - 1) AS BIGINT) AS dof,
      |  round(sqrt(chi2 / (n * (least(r, c) - 1))), 6) AS cramers_v
      |FROM agg""".stripMargin

  // ------------------------------------------------------------- HHI
  /** Herfindahl–Hirschman concentration (`q_hhi`) of supplier revenue
    * within each returnflag class: HHI = Σ share² = Σrev²/(Σrev)² per
    * group — computed with TWO aggregates and NO window at all (the
    * per-group supplier frame can be arbitrarily wide at scale; the
    * sum-of-squares identity needs no per-group ordering or window).
    * effective_n = 1/HHI is the equivalent-equal-suppliers count.
    */
  def qHhi(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_suppkey")
      .agg(sum("l_extendedprice").as("rev"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_suppliers"),
        (sum(col("rev") * col("rev")) / (sum("rev") * sum("rev"))).as("hhi_raw"))
      .select(col("l_returnflag"), col("n_suppliers"),
        round(col("hhi_raw"), 6).as("hhi"),
        round(lit(1.0) / col("hhi_raw"), 2).as("effective_n"))
      .orderBy("l_returnflag")

  val oracleHhi: String =
    """WITH rev AS (
      |  SELECT l_returnflag, l_suppkey, sum(l_extendedprice) AS rev
      |  FROM lineitem GROUP BY 1, 2),
      |agg AS (
      |  SELECT l_returnflag, count(*) AS n_suppliers,
      |    sum(rev * rev) / (sum(rev) * sum(rev)) AS hhi_raw
      |  FROM rev GROUP BY 1)
      |SELECT l_returnflag, n_suppliers, round(hhi_raw, 6) AS hhi,
      |  round(1.0 / hhi_raw, 2) AS effective_n
      |FROM agg ORDER BY l_returnflag""".stripMargin

  val oracleMutualInfo: String =
    """WITH joint AS (
      |  SELECT l_returnflag, l_linestatus, count(*) AS nxy
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT nxy,
      |    sum(nxy) OVER (PARTITION BY l_returnflag) AS nx,
      |    sum(nxy) OVER (PARTITION BY l_linestatus) AS ny,
      |    sum(nxy) OVER () AS n
      |  FROM joint),
      |t AS (
      |  SELECT n,
      |    (nxy::DOUBLE / n) * ln((nxy::DOUBLE / n) / ((nx::DOUBLE / n) * (ny::DOUBLE / n))) AS mi_term,
      |    (nxy::DOUBLE / n) * ln(nx::DOUBLE / n) AS hx_term,
      |    (nxy::DOUBLE / n) * ln(ny::DOUBLE / n) AS hy_term
      |  FROM m)
      |SELECT CAST(n AS BIGINT) AS n, round(sum(mi_term), 6) AS mi,
      |  round(-sum(hx_term), 6) AS h_rf,
      |  round(-sum(hy_term), 6) AS h_ls,
      |  round(sum(mi_term) / sqrt(sum(hx_term) * sum(hy_term)), 6) AS nmi
      |FROM t GROUP BY n""".stripMargin

  // -------------------------------------------------------- A/B testing

  /** A/B experiment readout (`q_ab_welch`) — the two-sample mean test an
    * experimentation platform runs per metric: customers split into
    * arms by the deterministic h60 parity of their key (the real-world
    * assignment rule — stable, uniform, reproducible), order value
    * compared via Welch's t (unequal variances). Both arms' moment
    * sums fold EXACTLY — counts, Σcents (BIGINT) and Σcents²
    * (DECIMAL(38,0): the square overflows BIGINT at fleet scale) — so
    * t and the Welch–Satterthwaite df are single expressions over
    * engine-identical integers; an honest A/A split on synthetic data
    * reports |t| small, and the spec pins that too.
    *
    * Scale shape: ONE map-side-combinable aggregate over the fact scan
    * onto a 2-row arm frame; everything after is constant-size math.
    */
  def qAbWelch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFns.h60
    val arms = Tables.orders(s, dir)
      .select((h60(col("o_custkey").cast("string")) % 2).cast("int").as("arm"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("cents").as("sx"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")).as("sx2"))
    val a = arms.filter(col("arm") === 0)
      .select(col("n").as("na"), col("sx").as("sxa"), col("sx2").as("sx2a"))
    val b = arms.filter(col("arm") === 1)
      .select(col("n").as("nb"), col("sx").as("sxb"), col("sx2").as("sx2b"))
    def meanOf(sx: String, n: String) =
      col(sx).cast("double") / col(n) / 100.0
    // sample variance in dollars²: (Σx² − (Σx)²/n) / (n−1), cents² → /10⁴
    def varOf(sx2: String, sx: String, n: String) =
      (col(sx2).cast("double") -
        col(sx).cast("double") * col(sx).cast("double") / col(n)) /
        (col(n) - 1) / 10000.0
    val va = varOf("sx2a", "sxa", "na"); val vb = varOf("sx2b", "sxb", "nb")
    val sea = va / col("na"); val seb = vb / col("nb")
    val t = (meanOf("sxa", "na") - meanOf("sxb", "nb")) / sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (col("na") - 1) + seb * seb / (col("nb") - 1))
    a.crossJoin(broadcast(b))
      .select(col("na"), col("nb"),
        round(meanOf("sxa", "na"), 4).as("mean_a"),
        round(meanOf("sxb", "nb"), 4).as("mean_b"),
        round(t, 6).as("welch_t"),
        round(df, 2).as("welch_df"),
        (abs(t) > 1.96).as("significant_95"))
  }

  val oracleAbWelch: String = {
    import graft.functions.HashFns.h60Sql
    s"""WITH r AS (
       |  SELECT ${h60Sql("CAST(o_custkey AS VARCHAR)")} % 2 AS arm,
       |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
       |  FROM orders),
       |g AS (
       |  SELECT arm, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sx,
       |    sum((cents::DECIMAL(38,0)) * cents) AS sx2
       |  FROM r GROUP BY arm),
       |ab AS (
       |  SELECT
       |    (SELECT n FROM g WHERE arm = 0) AS na,
       |    (SELECT sx FROM g WHERE arm = 0) AS sxa,
       |    (SELECT sx2 FROM g WHERE arm = 0) AS sx2a,
       |    (SELECT n FROM g WHERE arm = 1) AS nb,
       |    (SELECT sx FROM g WHERE arm = 1) AS sxb,
       |    (SELECT sx2 FROM g WHERE arm = 1) AS sx2b),
       |m AS (
       |  SELECT na, nb,
       |    sxa::DOUBLE / na / 100.0 AS ma, sxb::DOUBLE / nb / 100.0 AS mb,
       |    (sx2a::DOUBLE - sxa::DOUBLE * sxa::DOUBLE / na) / (na - 1) / 10000.0 / na AS sea,
       |    (sx2b::DOUBLE - sxb::DOUBLE * sxb::DOUBLE / nb) / (nb - 1) / 10000.0 / nb AS seb
       |  FROM ab)
       |SELECT na, nb, round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
       |  round((ma - mb) / sqrt(sea + seb), 6) AS welch_t,
       |  round((sea + seb) * (sea + seb)
       |    / (sea * sea / (na - 1) + seb * seb / (nb - 1)), 2) AS welch_df,
       |  abs((ma - mb) / sqrt(sea + seb)) > 1.96 AS significant_95
       |FROM m""".stripMargin
  }

  // ------------------------------------------------- survival analysis

  /** Months of order silence after which a customer counts as churned
    * (the event); quieter customers are right-censored at the dataset
    * horizon. */
  private[graft] val KM_CHURN_M = 6

  /** Kaplan–Meier churn survival curve (`q_survival_km`) — the
    * censoring-correct lifetime readout naive "average customer
    * lifespan" numbers get wrong: customers still active at the data
    * horizon are right-CENSORED, not events. Duration = months from
    * first to last order (event: silent ≥ [[KM_CHURN_M]] months before
    * the horizon) or first-to-horizon (censored). Month arithmetic is
    * y·12+m boundary counting — exact integers, identical in both
    * engines (fractional months_between vs date_diff would disagree on
    * month-end edges).
    *
    * S(t) = Π_{u≤t}(1 − d_u/n_u) folds as a LIST-PRODUCT over the
    * sorted ≤|months| risk table (a bounded frame: one cum window over
    * it, whitelisted; the per-row product is a sequential fold over the
    * same-ordered slice in both engines — no exp/ln round trip, whose
    * libm drift would flip 6dp digits).
    *
    * Scale shape: one o_custkey shuffle to per-customer first/last;
    * everything after lives on the ≤|calendar months| frame.
    */
  def qSurvivalKm(s: SparkSession, dir: String): DataFrame = {
    def y12m(c: org.apache.spark.sql.Column) = year(c) * 12 + month(c)
    val maxd = Tables.orders(s, dir).agg(max("o_orderdate").as("maxd"))
    val perCust = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(min("o_orderdate").as("first_d"), max("o_orderdate").as("last_d"))
      .crossJoin(broadcast(maxd))
      .select(
        (y12m(col("maxd")) - y12m(col("last_d")) >= KM_CHURN_M).as("event"),
        (y12m(col("last_d")) - y12m(col("first_d"))).as("dur_evt"),
        (y12m(col("maxd")) - y12m(col("first_d"))).as("dur_cens"))
      .select(col("event"),
        when(col("event"), col("dur_evt")).otherwise(col("dur_cens")).as("dur"))
    val tbl = perCust.groupBy("dur")
      .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("event"), 1L).otherwise(0L)).as("c"))
    val cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    val tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val risk = tbl
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(tot) -
          coalesce(sum(col("d") + col("c")).over(cum), lit(0L)))
    val arr = risk
      .agg(array_sort(collect_list(struct(col("dur"), col("d"), col("n_risk"))))
        .as("a"))
    arr.select(col("a"), posexplode(col("a")).as(Seq("i", "e")))
      .select(col("e.dur").as("duration_m"),
        col("e.n_risk").as("n_risk"), col("e.d").as("n_churned"),
        round(aggregate(
          slice(col("a"), lit(1), col("i") + 1),
          lit(1.0),
          (acc, x) => acc * (lit(1.0) -
            x.getField("d").cast("double") / x.getField("n_risk"))), 6)
          .as("survival"))
      .orderBy("duration_m")
  }

  val oracleSurvivalKm: String =
    s"""WITH pc AS (
       |  SELECT o_custkey, min(o_orderdate) AS first_d, max(o_orderdate) AS last_d
       |  FROM orders GROUP BY o_custkey),
       |m AS (SELECT max(o_orderdate) AS maxd FROM orders),
       |dur AS (
       |  SELECT
       |    (year(maxd) * 12 + month(maxd)) - (year(last_d) * 12 + month(last_d))
       |      >= $KM_CHURN_M AS event,
       |    CASE WHEN (year(maxd) * 12 + month(maxd)) - (year(last_d) * 12 + month(last_d))
       |           >= $KM_CHURN_M
       |      THEN (year(last_d) * 12 + month(last_d)) - (year(first_d) * 12 + month(first_d))
       |      ELSE (year(maxd) * 12 + month(maxd)) - (year(first_d) * 12 + month(first_d))
       |    END AS dur
       |  FROM pc, m),
       |tbl AS (
       |  SELECT dur, CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |    CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS c
       |  FROM dur GROUP BY dur),
       |risk AS (
       |  SELECT dur, d, c,
       |    CAST(sum(d + c) OVER () -
       |      coalesce(sum(d + c) OVER (ORDER BY dur
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
       |  FROM tbl),
       |a AS (SELECT list(struct_pack(dur := dur, d := d, n_risk := n_risk)
       |        ORDER BY dur) AS a FROM risk),
       |x AS (
       |  SELECT unnest(a) AS e, unnest(generate_series(1, len(a))) AS i, a FROM a)
       |SELECT e.dur AS duration_m, e.n_risk AS n_risk, e.d AS n_churned,
       |  round(list_product(list_transform(a[1:i],
       |    t -> 1.0 - t.d::DOUBLE / t.n_risk)), 6) AS survival
       |FROM x ORDER BY duration_m""".stripMargin

  /** Experiment-period pivot for [[qCuped]] — orders before it are the
    * pre-period covariate, from it on the experiment metric. */
  private[graft] val CUPED_PIVOT = "1996-01-01"

  /** CUPED variance reduction (`q_cuped`) — the adjustment every mature
    * experimentation platform applies before the t-test: each
    * customer's experiment-period spend y is debiased by their
    * PRE-period spend x via θ = cov(x,y)/var(x), which cuts metric
    * variance by exactly ρ² (reported as `var_reduction`) without
    * biasing the treatment contrast. Arms are the same h60-parity
    * assignment as [[qAbWelch]].
    *
    * Every moment folds EXACTLY — per-arm n, Σx, Σy (BIGINT cents),
    * Σxy, Σx², Σy² (DECIMAL(38,0)) — and the global moments are the
    * 2-row arm sums, so θ, ρ², and the adjusted means are single
    * expressions over engine-identical integers. One custkey shuffle
    * (the per-customer x/y fold), then constant-size math.
    */
  def qCuped(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFns.h60
    val perCust = Tables.orders(s, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        (col("o_orderdate") < lit(CUPED_PIVOT).cast("timestamp")).as("pre"))
      .groupBy("o_custkey")
      .agg(sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
      .select((h60(col("o_custkey").cast("string")) % 2).cast("int").as("arm"),
        col("x"), col("y"))
    val arms = perCust.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .localCheckpoint(true)
    val g = arms.agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
      sum("sxy").as("sxy"), sum("sxx").as("sxx"), sum("syy").as("syy"))
    val varX = (col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / col("n")) / (col("n") - 1)
    val varY = (col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / col("n")) / (col("n") - 1)
    val covXY = (col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double") / col("n")) / (col("n") - 1)
    val glob = g.select(col("n"), col("sx"),
      (covXY / varX).as("theta"),
      (covXY * covXY / (varX * varY)).as("rho2"))
    def adjMean(armNo: Int) = {
      val p = s"a$armNo"
      (col(s"${p}_sy").cast("double") / col(s"${p}_n") -
        col("theta") * (col(s"${p}_sx").cast("double") / col(s"${p}_n") -
          col("sx").cast("double") / col("n"))) / 100.0
    }
    val a0 = arms.filter(col("arm") === 0)
      .select(col("n").as("a0_n"), col("sx").as("a0_sx"), col("sy").as("a0_sy"))
    val a1 = arms.filter(col("arm") === 1)
      .select(col("n").as("a1_n"), col("sx").as("a1_sx"), col("sy").as("a1_sy"))
    a0.crossJoin(broadcast(a1)).crossJoin(broadcast(glob))
      .select(col("n").as("n_customers"),
        round(col("theta"), 6).as("theta"),
        round(col("rho2"), 6).as("var_reduction"),
        round(adjMean(0), 4).as("adj_mean_a"),
        round(adjMean(1), 4).as("adj_mean_b"),
        round(adjMean(0) - adjMean(1), 6).as("adj_diff"))
  }

  val oracleCuped: String = {
    import graft.functions.HashFns.h60Sql
    s"""WITH pc AS (
       |  SELECT o_custkey,
       |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '$CUPED_PIVOT'
       |      THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '$CUPED_PIVOT'
       |      THEN 0 ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT) END) AS BIGINT) AS y
       |  FROM orders GROUP BY o_custkey),
       |pa AS (SELECT ${h60Sql("CAST(o_custkey AS VARCHAR)")} % 2 AS arm, x, y FROM pc),
       |arms AS (
       |  SELECT arm, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    sum((x::DECIMAL(38,0)) * y) AS sxy, sum((x::DECIMAL(38,0)) * x) AS sxx,
       |    sum((y::DECIMAL(38,0)) * y) AS syy
       |  FROM pa GROUP BY arm),
       |g AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS sx,
       |    CAST(sum(sy) AS BIGINT) AS sy, sum(sxy) AS sxy, sum(sxx) AS sxx,
       |    sum(syy) AS syy
       |  FROM arms),
       |gm AS (
       |  SELECT n, sx,
       |    ((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n) / (n - 1))
       |      / ((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / (n - 1)) AS theta,
       |    ((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n) / (n - 1))
       |      * ((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n) / (n - 1))
       |      / (((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / (n - 1))
       |         * ((syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n) / (n - 1))) AS rho2
       |  FROM g),
       |ab AS (
       |  SELECT
       |    (SELECT n FROM arms WHERE arm = 0) AS a0_n,
       |    (SELECT sx FROM arms WHERE arm = 0) AS a0_sx,
       |    (SELECT sy FROM arms WHERE arm = 0) AS a0_sy,
       |    (SELECT n FROM arms WHERE arm = 1) AS a1_n,
       |    (SELECT sx FROM arms WHERE arm = 1) AS a1_sx,
       |    (SELECT sy FROM arms WHERE arm = 1) AS a1_sy)
       |SELECT gm.n AS n_customers,
       |  round(gm.theta, 6) AS theta,
       |  round(gm.rho2, 6) AS var_reduction,
       |  round((a0_sy::DOUBLE / a0_n - gm.theta * (a0_sx::DOUBLE / a0_n - gm.sx::DOUBLE / gm.n)) / 100.0, 4) AS adj_mean_a,
       |  round((a1_sy::DOUBLE / a1_n - gm.theta * (a1_sx::DOUBLE / a1_n - gm.sx::DOUBLE / gm.n)) / 100.0, 4) AS adj_mean_b,
       |  round((a0_sy::DOUBLE / a0_n - gm.theta * (a0_sx::DOUBLE / a0_n - gm.sx::DOUBLE / gm.n)) / 100.0
       |    - (a1_sy::DOUBLE / a1_n - gm.theta * (a1_sx::DOUBLE / a1_n - gm.sx::DOUBLE / gm.n)) / 100.0, 6) AS adj_diff
       |FROM ab, gm""".stripMargin
  }

  // -------------------------------------------------- Poisson bootstrap

  private[graft] val BOOT_B = 32

  /** LCG modulus (2³¹) for the bootstrap's replicate-weight draws. */
  private[graft] val LCG_M = 2147483648L

  /** Poisson(1) inverse-CDF ladder, cumulative e⁻¹·Σ1/k! at 6dp — the
    * per-replicate weight is the count of times a row enters the
    * resample, capped at 5 (P(>5) ≈ 0.06%). */
  private[graft] val POIS_CDF = Seq(0.367879, 0.735759, 0.919699, 0.981012, 0.996340)

  /** Poisson-bootstrap confidence interval for mean order value
    * (`q_bootstrap_ci`) — THE at-scale bootstrap: classic multinomial
    * resampling needs a global shuffle per replicate, while Poisson
    * bootstrap gives each row an independent Poisson(1) inclusion
    * count, so ALL [[BOOT_B]] replicates fold in ONE map-side pass.
    * Weights come from the deterministic h60 of (orderkey, replicate) —
    * both engines draw identical resamples. Revenue folds in integer
    * cents (exact sums), each replicate mean is one int division, and
    * the spread statistics fold over the SORTED 32-element mean array —
    * deterministic order on both sides, no float-summation drift
    * anywhere. CI = drop-extremes empirical interval (2nd..31st of 32,
    * a 93.75% interval, documented rather than interpolated).
    *
    * Scale shape: a constant 32× row fan-out into a map-side-combinable
    * (replicate) aggregate — 32 rows out — then driver-free array math.
    */
  def qBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val point = rows.agg(count(lit(1)).as("n_rows"), sum("cents").as("tot"))
    // two-round 31-bit LCG mix of (key, replicate) — pure integer
    // arithmetic with overflow-safe operands, identical in both engines;
    // a cryptographic md5 per (row × replicate) measured 5× slower for
    // zero statistical benefit in resampling weights. The key folds to
    // 31 bits first so billion-scale keys can't overflow the product.
    val h1 = ((col("o_orderkey") % LCG_M) * 1103515245L +
      col("b") * 2654435761L + 12345L) % LCG_M
    val h2 = (h1 * 1103515245L + 12345L) % LCG_M
    val u = (((h2 / 2048L).cast("long")) % 1000000L).cast("double") / 1000000d
    val w = POIS_CDF.zipWithIndex
      .foldRight(lit(5): org.apache.spark.sql.Column) { case ((p, k), acc) =>
        when(u < p, k).otherwise(acc)
      }
    val means = rows
      .select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(0), lit(BOOT_B - 1))).as("b"))
      .withColumn("w", w)
      .groupBy("b")
      .agg(sum(col("w") * col("cents")).as("swx"), sum("w").as("sw"))
      .select((col("swx").cast("double") / col("sw") / 100.0).as("m"))
    val arr = means.agg(array_sort(collect_list("m")).as("ms"))
    val mMean = aggregate(col("ms"), lit(0d), (a, x) => a + x) / BOOT_B
    arr.crossJoin(broadcast(point))
      .withColumn("mm", mMean)
      .select(col("n_rows"),
        round(col("tot").cast("double") / col("n_rows") / 100.0, 4)
          .as("point_mean"),
        round(element_at(col("ms"), 2), 4).as("ci_lo"),
        round(element_at(col("ms"), BOOT_B - 1), 4).as("ci_hi"),
        round(sqrt(aggregate(col("ms"), lit(0d),
          (a, x) => a + (x - col("mm")) * (x - col("mm"))) / (BOOT_B - 1)), 4)
          .as("boot_se"))
  }

  val oracleBootstrapCi: String = {
    val h1Sql = s"(((o_orderkey % $LCG_M) * 1103515245 + b * 2654435761 + 12345) % $LCG_M)"
    val h2Sql = s"(($h1Sql * 1103515245 + 12345) % $LCG_M)"
    val uSql = s"($h2Sql // 2048 % 1000000 / 1000000.0)"
    val wSql = POIS_CDF.zipWithIndex
      .map { case (p, k) => s"WHEN u < $p THEN $k" }
      .mkString("CASE ", " ", " ELSE 5 END")
    s"""WITH r AS (
       |  SELECT o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
       |  FROM orders),
       |pt AS (SELECT count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS tot FROM r),
       |x AS (
       |  SELECT o_orderkey, cents, unnest(generate_series(0, ${BOOT_B - 1})) AS b
       |  FROM r),
       |uw AS (SELECT cents, b, $wSql AS w FROM (SELECT *, $uSql AS u FROM x)),
       |bm AS (
       |  SELECT b, CAST(sum(w * cents) AS BIGINT) AS swx, CAST(sum(w) AS BIGINT) AS sw
       |  FROM uw GROUP BY b),
       |ms AS (SELECT list(swx::DOUBLE / sw / 100.0 ORDER BY swx::DOUBLE / sw / 100.0) AS ms
       |       FROM bm),
       |mm AS (SELECT ms, list_sum(ms) / $BOOT_B AS m_mean FROM ms)
       |SELECT pt.n_rows,
       |  round(pt.tot::DOUBLE / pt.n_rows / 100.0, 4) AS point_mean,
       |  round(ms[2], 4) AS ci_lo,
       |  round(ms[${BOOT_B - 1}], 4) AS ci_hi,
       |  round(sqrt(list_sum(list_transform(ms, x -> (x - m_mean) * (x - m_mean)))
       |    / ${BOOT_B - 1}), 4) AS boot_se
       |FROM mm, pt""".stripMargin
  }

  // ------------------------------------------------------------ Theil index
  /** Theil-T inequality decomposition of positive customer balances into
    * BETWEEN-nation and WITHIN-nation components — the property the
    * inequality family's other members lack (`q_hhi` has no grouping
    * decomposition; `q_gini_binned` is not additively decomposable at
    * all): T_total = Σ_g between_term_g + Σ_g share_g · T_g, so a
    * reviewer reads exactly how much inequality nations explain.
    *
    * Cross-engine exactness: per-row `x·ln(x)` is rounded to integer
    * MILLIS before the group sum (BIGINT-exact fold — a raw double sum
    * is order-dependent and Spark/DuckDB aggregate in different orders);
    * a 1-ulp libm `ln` disagreement can flip a row's milli by 1, which
    * moves T by ~1e-11 — far under the 6dp edge. Group/total counts and
    * cent sums are exact BIGINTs; every double expression mirrors the
    * oracle token-for-token.
    *
    * Scale: one nation-keyed aggregate with map-side partials; totals
    * re-aggregate the nation-sized frame and crossJoin back as a 1-row
    * broadcast.
    */
  def qTheil(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(col("c_nationkey").cast("long").as("nation"),
        round(col("c_acctbal") * 100).cast("long").as("x"))
      .filter(col("x") > 0)
    val xd = col("x").cast("double")
    val per = cust
      .select(col("nation"), col("x"),
        round(xd * log(xd) * 1000).cast("long").as("w_milli"))
      .groupBy("nation")
      .agg(count(lit(1)).as("n_cust"), sum("x").as("xg"),
        sum("w_milli").as("w_milli"))
    val tot = per.agg(sum("n_cust").as("tot_n"), sum("xg").as("tot_x"))
    // T_g = (Σ x ln x)/X_g + ln(n_g) − ln(X_g); scale cancels, so cents
    // give the same Theil as dollars
    val tg = col("w_milli") / lit(1000.0) / col("xg") +
      log(col("n_cust").cast("double")) - log(col("xg").cast("double"))
    val share = col("xg") / col("tot_x").cast("double")
    val nshare = col("n_cust") / col("tot_n").cast("double")
    per.crossJoin(broadcast(tot))
      .select(col("nation"), col("n_cust"),
        (col("xg") / 100.0).as("balance"),
        round(tg, 6).as("theil_within"),
        round(share, 6).as("share"),
        round(share * (log(share) - log(nshare)), 6).as("between_term"),
        round(share * tg, 6).as("within_contrib"))
      .orderBy("nation")
  }

  val oracleTheil: String =
    """WITH cust AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS x
      |  FROM customer WHERE round(c_acctbal * 100) > 0),
      |per AS (
      |  SELECT nation, count(*) AS n_cust, CAST(sum(x) AS BIGINT) AS xg,
      |    CAST(sum(CAST(round(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE)) * 1000) AS BIGINT)) AS BIGINT) AS w_milli
      |  FROM cust GROUP BY nation),
      |t AS (SELECT CAST(sum(n_cust) AS BIGINT) AS tot_n,
      |  CAST(sum(xg) AS BIGINT) AS tot_x FROM per)
      |SELECT nation, n_cust, xg / 100.0 AS balance,
      |  round(w_milli / 1000.0 / xg
      |    + ln(CAST(n_cust AS DOUBLE)) - ln(CAST(xg AS DOUBLE)), 6) AS theil_within,
      |  round(xg / CAST(tot_x AS DOUBLE), 6) AS share,
      |  round(xg / CAST(tot_x AS DOUBLE)
      |    * (ln(xg / CAST(tot_x AS DOUBLE)) - ln(n_cust / CAST(tot_n AS DOUBLE))), 6) AS between_term,
      |  round(xg / CAST(tot_x AS DOUBLE)
      |    * (w_milli / 1000.0 / xg
      |       + ln(CAST(n_cust AS DOUBLE)) - ln(CAST(xg AS DOUBLE))), 6) AS within_contrib
      |FROM per, t ORDER BY nation""".stripMargin

  // ------------------------------------------------- Mann-Whitney U
  /** The two market segments [[qMannWhitney]] compares — shared with the
    * oracle so both engines filter identically. */
  private val MW_A = "BUILDING"
  private val MW_B = "MACHINERY"

  /** Mann-Whitney U rank-sum test (`q_mannwhitney`): does order value
    * distribute differently between two market segments? The
    * nonparametric sibling of [[qAbWelch]] — the test a curation pipeline
    * reaches for when the metric is heavy-tailed and a mean-based t-test
    * is driven by its outliers.
    *
    * Scale shape: ranks come from [[Ranks.avgRank2]] (range-partitioned
    * two-pass ranking — no global sort, no single-task window), returned
    * as exact integer `rank2 = 2·avg_rank`. Rank sums and the tie
    * correction Σ(t³−t) fold as DECIMAL(38,0) — zero float error until
    * the final z division, which both engines perform on identical
    * integers. The fact never shuffles except for the rank join (a
    * |distinct values|-row frame, AQE-broadcastable).
    */
  def qMannWhitney(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.dim(s, dir, "customer")
      .filter(col("c_mktsegment").isin(MW_A, MW_B))
      .select("c_custkey", "c_mktsegment")
    val x = Tables.orders(s, dir).select("o_custkey", "o_totalprice")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
    val ranks = Ranks.avgRank2(s, x.select("v"))
    val ties = ranks.agg(
      sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt") - col("cnt")).as("tsum"),
      sum(col("cnt")).as("n_tot"),
      sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("tie_vals"))
    val byG = x.join(ranks.select("v", "rank2"), Seq("v"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("rank2").cast("decimal(38,0)")).as("rs2"))
    // two 1-row frames crossJoin (whitelisted bounded shape)
    val wide = byG.agg(
      sum(when(col("g") === MW_A, col("n"))).as("n_a"),
      sum(when(col("g") === MW_B, col("n"))).as("n_b"),
      sum(when(col("g") === MW_A, col("rs2"))).as("rs2_a"))
      .crossJoin(ties)
    def d(c: String) = col(c).cast("double")
    val u2a = (col("rs2_a") - col("n_a").cast("decimal(38,0)") * (col("n_a") + 1))
      .cast("double")
    wide.select(
      col("n_a").cast("long").as("n_a"),
      col("n_b").cast("long").as("n_b"),
      col("tie_vals").cast("long").as("tie_vals"),
      (u2a / 2.0).as("u_a"),
      (d("n_a") * d("n_b") - u2a / 2.0).as("u_b"),
      round((u2a / 2.0 - d("n_a") * d("n_b") / 2.0)
        / sqrt(d("n_a") * d("n_b") / 12.0
          * ((d("n_tot") + 1.0) - d("tsum") / (d("n_tot") * (d("n_tot") - 1.0)))),
        6).as("z"))
  }

  val oracleMannWhitney: String =
    s"""WITH x AS (
       |  SELECT c_mktsegment AS g, o_totalprice AS v
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment IN ('$MW_A', '$MW_B')),
       |c AS (SELECT v, count(*) AS cnt FROM x GROUP BY v),
       |r AS (SELECT v, cnt,
       |  2 * (sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS rank2
       |  FROM c),
       |t AS (SELECT
       |  sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tsum,
       |  sum(cnt) AS n_tot,
       |  sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS tie_vals FROM c),
       |g AS (SELECT x.g, count(*) AS n, sum(CAST(r.rank2 AS HUGEINT)) AS rs2
       |  FROM x JOIN r USING (v) GROUP BY x.g),
       |w AS (SELECT
       |  sum(CASE WHEN g = '$MW_A' THEN n END) AS n_a,
       |  sum(CASE WHEN g = '$MW_B' THEN n END) AS n_b,
       |  sum(CASE WHEN g = '$MW_A' THEN rs2 END) AS rs2_a FROM g)
       |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |  CAST(tie_vals AS BIGINT) AS tie_vals,
       |  CAST(rs2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
       |  CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
       |    - CAST(rs2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) / 2.0 AS u_b,
       |  round((CAST(rs2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) / 2.0
       |      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
       |    / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
       |      * ((CAST(n_tot AS DOUBLE) + 1.0)
       |         - CAST(tsum AS DOUBLE) / (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) - 1.0)))),
       |    6) AS z
       |FROM w, t""".stripMargin

  // ------------------------------------------------- Spearman rho
  /** Spearman rank correlation (`q_spearman`) between lineitem quantity
    * and extended price — the monotone-association gauge that survives
    * the heavy right tail Pearson ([[qCorrMatrix]]) is dragged by.
    *
    * Scale shape: both rank frames come from [[Ranks.avgRank2]]. The
    * quantity rank frame is broadcast (the quantity DOMAIN is a bounded
    * integer grid by construction); the price rank frame joins by
    * shuffle (AQE may still broadcast it at small SF). All five moments
    * fold as DECIMAL(38,0) over exact integer rank2 values; ρ is one
    * double expression over the single moment row, identical in both
    * engines.
    */
  def qSpearman(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_quantity").as("xq"), col("l_extendedprice").as("xp"))
    val rq = Ranks.avgRank2(s, li.select("xq"))
      .select(col("v").as("xq"), col("rank2").as("rq"))
    val rp = Ranks.avgRank2(s, li.select("xp"))
      .select(col("v").as("xp"), col("rank2").as("rp"))
    val j = li.join(broadcast(rq), Seq("xq")).join(rp, Seq("xp"))
      .select(col("rq").cast("decimal(38,0)").as("rq"),
        col("rp").cast("decimal(38,0)").as("rp"))
    val m = j.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("rq")).as("sq"), sum(col("rp")).as("sp"),
      sum(col("rq") * col("rq")).as("sqq"),
      sum(col("rp") * col("rp")).as("spp"),
      sum(col("rq") * col("rp")).as("sqp"))
    def d(c: String) = col(c).cast("double")
    m.select(
      col("n").cast("long").as("n"),
      round((d("n") * d("sqp") - d("sq") * d("sp"))
        / (sqrt(d("n") * d("sqq") - d("sq") * d("sq"))
          * sqrt(d("n") * d("spp") - d("sp") * d("sp"))), 6).as("rho"))
  }

  val oracleSpearman: String =
    """WITH li AS (SELECT l_quantity AS xq, l_extendedprice AS xp FROM lineitem),
      |cq AS (SELECT xq AS v, count(*) AS cnt FROM li GROUP BY xq),
      |rq AS (SELECT v,
      |  2 * (sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS rq
      |  FROM cq),
      |cp AS (SELECT xp AS v, count(*) AS cnt FROM li GROUP BY xp),
      |rp AS (SELECT v,
      |  2 * (sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS rp
      |  FROM cp),
      |j AS (SELECT CAST(rq.rq AS HUGEINT) AS rq, CAST(rp.rp AS HUGEINT) AS rp
      |  FROM li JOIN rq ON li.xq = rq.v JOIN rp ON li.xp = rp.v),
      |m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(rq) AS sq, sum(rp) AS sp,
      |  sum(rq * rq) AS sqq, sum(rp * rp) AS spp, sum(rq * rp) AS sqp FROM j)
      |SELECT CAST(n AS BIGINT) AS n,
      |  round((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
      |      * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))),
      |    6) AS rho
      |FROM m""".stripMargin

  // ------------------------------------------------- one-way ANOVA
  /** One-way ANOVA F (`q_anova`) of order value across the five market
    * segments — the k-group generalization of [[qAbWelch]] a pipeline
    * runs before pairwise tests to gate on "does segment matter at all".
    *
    * Determinism: group moments fold exactly (cents as DECIMAL(38,0));
    * the five per-group rational terms sc²/n — the only non-integer
    * step — fold in sorted group order on BOTH engines (the
    * qStlDecompose sorted-fold discipline) so a float addition-order
    * difference cannot cross the rounding grain. One fact shuffle on the
    * 5-value segment key; everything after runs on a 5-row frame.
    */
  def qAnova(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.dim(s, dir, "customer").select("c_custkey", "c_mktsegment")
    val x = Tables.orders(s, dir).select("o_custkey", "o_totalprice")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"),
        round(col("o_totalprice") * 100).cast("decimal(38,0)").as("cents"))
    val grp = x.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("cents")).as("sc"),
      sum(col("cents") * col("cents")).as("scc"))
    val qTerm = (col("sc").cast("double") * col("sc").cast("double")
      / col("n").cast("double")).as("q")
    val m = grp
      .agg(
        count(lit(1)).as("k"),
        sum(col("n")).as("n_tot"),
        sum(col("sc")).as("s_tot"),
        sum(col("scc")).as("scc_tot"),
        collect_list(struct(col("g"), qTerm)).as("qs"))
      .select(col("k"), col("n_tot"), col("s_tot"), col("scc_tot"),
        aggregate(array_sort(col("qs")), lit(0.0d),
          (acc, e) => acc + e.getField("q")).as("qsum"))
    def d(c: String) = col(c).cast("double")
    val ssb = col("qsum") - d("s_tot") * d("s_tot") / d("n_tot")
    val ssw = d("scc_tot") - col("qsum")
    m.select(
      col("k").cast("long").as("k"),
      col("n_tot").cast("long").as("n"),
      // NO 2dp round on the sums of squares: at sf1 they reach ~1e16,
      // where Spark's BigDecimal HALF_UP and DuckDB's float rounding
      // disagree by 1 ulp — the raw doubles are identical (both derive
      // from exact integer moments via the same expression tree)
      (ssb / 10000.0).as("ss_between"),
      (ssw / 10000.0).as("ss_within"),
      round((ssb / (d("k") - 1.0)) / (ssw / (d("n_tot") - d("k"))), 6).as("f_stat"),
      round(ssb / (ssb + ssw), 6).as("eta_sq"))
  }

  val oracleAnova: String =
    """WITH x AS (
      |  SELECT c_mktsegment AS g, CAST(round(o_totalprice * 100) AS HUGEINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |grp AS (SELECT g, count(*) AS n, sum(cents) AS sc, sum(cents * cents) AS scc
      |  FROM x GROUP BY g),
      |m AS (SELECT count(*) AS k, sum(n) AS n_tot, sum(sc) AS s_tot, sum(scc) AS scc_tot,
      |  list_reduce(list_prepend(0.0::DOUBLE,
      |    list(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY g)),
      |    (acc, x) -> acc + x) AS qsum
      |  FROM grp)
      |SELECT CAST(k AS BIGINT) AS k, CAST(n_tot AS BIGINT) AS n,
      |  (qsum - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)) / 10000.0 AS ss_between,
      |  (CAST(scc_tot AS DOUBLE) - qsum) / 10000.0 AS ss_within,
      |  round(((qsum - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
      |    / ((CAST(scc_tot AS DOUBLE) - qsum) / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat,
      |  round((qsum - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
      |    / ((qsum - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
      |       + (CAST(scc_tot AS DOUBLE) - qsum)), 6) AS eta_sq
      |FROM m""".stripMargin

  // ------------------------------------------------- Kendall tau-b
  /** Kendall tau-b (`q_kendall`) between lineitem quantity and discount —
    * the third member of the association family: Pearson
    * ([[qCorrMatrix]]) for linearity, Spearman ([[qSpearman]]) for
    * monotonicity on continuous domains, Kendall for ordinal pairs on
    * SMALL domains where tie mass dominates.
    *
    * Scale shape: both columns live on bounded domains (integer quantity
    * grid × the 11-value discount grid), so the contingency frame is
    * enum-sized BY CONSTRUCTION. One fact aggregate builds it
    * (map-side combinable); the pair census is a theta self-join of
    * that bounded frame (whitelisted bounded nested-loop — never
    * data-proportional); concordant/discordant mass folds as
    * DECIMAL(38,0) products of exact cell counts. The frame is
    * localCheckpointed once for its four consumers (pairs, two
    * marginals, totals).
    */
  def qKendall(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .groupBy(col("l_quantity").as("x"), col("l_discount").as("y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("c"))
      .localCheckpoint()
    val a = cells.select(col("x").as("xa"), col("y").as("ya"), col("c").as("ca"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("c").as("cb"))
    val pairs = a.join(b, col("xa") < col("xb"))
      .agg(
        sum(when(col("ya") < col("yb"), col("ca") * col("cb"))).as("conc"),
        sum(when(col("ya") > col("yb"), col("ca") * col("cb"))).as("disc"))
    val tx = cells.groupBy("x").agg(sum("c").as("t"))
      .agg(sum(col("t") * (col("t") - 1)).as("tx2"))
    val ty = cells.groupBy("y").agg(sum("c").as("t"))
      .agg(sum(col("t") * (col("t") - 1)).as("ty2"))
    val tot = cells.agg(sum("c").as("n"), count(lit(1)).as("cells"))
    def d(c: String) = col(c).cast("double")
    pairs.crossJoin(tx).crossJoin(ty).crossJoin(tot)
      .select(
        col("n").cast("long").as("n"),
        col("cells").cast("long").as("cells"),
        d("conc").as("conc"),
        d("disc").as("disc"),
        round((d("conc") - d("disc"))
          / (sqrt((d("n") * (d("n") - 1.0) - d("tx2")) / 2.0)
            * sqrt((d("n") * (d("n") - 1.0) - d("ty2")) / 2.0)), 6).as("tau_b"))
  }

  val oracleKendall: String =
    """WITH cells AS (
      |  SELECT l_quantity AS x, l_discount AS y, CAST(count(*) AS HUGEINT) AS c
      |  FROM lineitem GROUP BY l_quantity, l_discount),
      |p AS (SELECT
      |  sum(CASE WHEN a.y < b.y THEN a.c * b.c END) AS conc,
      |  sum(CASE WHEN a.y > b.y THEN a.c * b.c END) AS disc
      |  FROM cells a JOIN cells b ON a.x < b.x),
      |tx AS (SELECT sum(t * (t - 1)) AS tx2
      |  FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
      |ty AS (SELECT sum(t * (t - 1)) AS ty2
      |  FROM (SELECT sum(c) AS t FROM cells GROUP BY y)),
      |tot AS (SELECT sum(c) AS n, count(*) AS n_cells FROM cells)
      |SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS cells,
      |  CAST(conc AS DOUBLE) AS conc, CAST(disc AS DOUBLE) AS disc,
      |  round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
      |    / (sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) - CAST(tx2 AS DOUBLE)) / 2.0)
      |      * sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) - CAST(ty2 AS DOUBLE)) / 2.0)),
      |    6) AS tau_b
      |FROM p, tx, ty, tot""".stripMargin

  // ------------------------------------------------- permutation test
  /** Permutation replicates for [[qPermTest]]. */
  private[graft] val PERM_B = 64

  /** Permutation test (`q_perm_test`) for the BUILDING-vs-MACHINERY
    * order-value mean difference — the assumption-free companion to
    * [[qAbWelch]] (no normality) and [[qMannWhitney]] (tests the MEAN,
    * not stochastic dominance). Labels are re-drawn [[PERM_B]] times at
    * the observed group rate (binomial relabeling — the at-scale
    * permutation scheme; exact fixed-margin permutation needs a global
    * shuffle per replicate) from the deterministic two-round LCG of
    * (orderkey, replicate) — the [[qBootstrapCi]] discipline, so both
    * engines draw identical relabelings. p = (#extreme + 1)/(B + 1).
    *
    * Scale shape: one constant PERM_B× fan-out into a map-side
    * combinable per-replicate aggregate; everything downstream runs on
    * B rows. Cent sums exact; per-replicate means are single double
    * divisions.
    */
  def qPermTest(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.dim(s, dir, "customer")
      .filter(col("c_mktsegment").isin(MW_A, MW_B))
      .select("c_custkey", "c_mktsegment")
    val rows = Tables.orders(s, dir).select("o_custkey", "o_orderkey", "o_totalprice")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), (col("c_mktsegment") === MW_A).as("is_a"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val obs = rows.agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("is_a"), col("cents"))).as("sa"),
      sum(when(!col("is_a"), col("cents"))).as("sb")).localCheckpoint()
    def d(c: String) = col(c).cast("double")
    val h1 = ((col("o_orderkey") % LCG_M) * 1103515245L +
      col("b") * 2654435761L + 54321L) % LCG_M
    val h2 = (h1 * 1103515245L + 12345L) % LCG_M
    val u = (((h2 / 2048L).cast("long")) % 1000000L).cast("double") / 1000000d
    val reps = rows
      .select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(0), lit(PERM_B - 1))).as("b"))
      .crossJoin(broadcast(obs.select(
        (d("n_a") / (d("n_a") + d("n_b"))).as("p_a"))))
      .withColumn("to_a", u < col("p_a"))
      .groupBy("b")
      .agg(
        sum(when(col("to_a"), col("cents"))).as("rsa"),
        sum(when(col("to_a"), 1L).otherwise(0L)).as("rna"),
        sum(when(!col("to_a"), col("cents"))).as("rsb"),
        sum(when(!col("to_a"), 1L).otherwise(0L)).as("rnb"))
      .select((col("rsa").cast("double") / when(col("rna") =!= 0, col("rna"))
        - col("rsb").cast("double") / when(col("rnb") =!= 0, col("rnb"))).as("diff_b"))
    val obsD = obs.select(col("n_a"), col("n_b"),
      (d("sa") / d("n_a") - d("sb") / d("n_b")).as("dobs"))
    reps.crossJoin(broadcast(obsD))
      .agg(
        max("n_a").as("n_a"), max("n_b").as("n_b"), max("dobs").as("dobs"),
        sum(when(abs(col("diff_b")) >= abs(col("dobs")), 1L).otherwise(0L))
          .as("n_extreme"))
      .select(col("n_a"), col("n_b"),
        round(col("dobs") / 100.0, 4).as("diff_obs"),
        lit(PERM_B.toLong).as("b_reps"),
        col("n_extreme"),
        round((col("n_extreme") + 1).cast("double") / (PERM_B + 1).toDouble, 6)
          .as("p_value"))
  }

  val oraclePermTest: String = {
    val h1Sql = s"(((o_orderkey % $LCG_M) * 1103515245 + b * 2654435761 + 54321) % $LCG_M)"
    val h2Sql = s"(($h1Sql * 1103515245 + 12345) % $LCG_M)"
    val uSql = s"($h2Sql // 2048 % 1000000 / 1000000.0)"
    s"""WITH r AS (
       |  SELECT o_orderkey, c_mktsegment = '$MW_A' AS is_a,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment IN ('$MW_A', '$MW_B')),
       |obs AS (SELECT
       |  sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
       |  sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n_b,
       |  CAST(sum(CASE WHEN is_a THEN cents END) AS BIGINT) AS sa,
       |  CAST(sum(CASE WHEN NOT is_a THEN cents END) AS BIGINT) AS sb FROM r),
       |x AS (SELECT o_orderkey, cents,
       |  unnest(generate_series(0, ${PERM_B - 1})) AS b FROM r),
       |lab AS (SELECT cents, b,
       |  $uSql < (SELECT CAST(n_a AS DOUBLE) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
       |           FROM obs) AS to_a
       |  FROM x),
       |reps AS (SELECT b,
       |  CAST(sum(CASE WHEN to_a THEN cents END) AS BIGINT) AS rsa,
       |  sum(CASE WHEN to_a THEN 1 ELSE 0 END) AS rna,
       |  CAST(sum(CASE WHEN NOT to_a THEN cents END) AS BIGINT) AS rsb,
       |  sum(CASE WHEN NOT to_a THEN 1 ELSE 0 END) AS rnb
       |  FROM lab GROUP BY b),
       |dd AS (SELECT CAST(rsa AS DOUBLE) / nullif(rna, 0)
       |  - CAST(rsb AS DOUBLE) / nullif(rnb, 0) AS diff_b FROM reps),
       |od AS (SELECT n_a, n_b,
       |  CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
       |  - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS dobs FROM obs)
       |SELECT CAST(od.n_a AS BIGINT) AS n_a, CAST(od.n_b AS BIGINT) AS n_b,
       |  round(od.dobs / 100.0, 4) AS diff_obs,
       |  CAST(${PERM_B} AS BIGINT) AS b_reps,
       |  CAST(sum(CASE WHEN abs(diff_b) >= abs(od.dobs) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_extreme,
       |  round((sum(CASE WHEN abs(diff_b) >= abs(od.dobs) THEN 1 ELSE 0 END) + 1)
       |    / ${PERM_B + 1}.0, 6) AS p_value
       |FROM dd, od GROUP BY od.n_a, od.n_b, od.dobs""".stripMargin
  }

  // ------------------------------------------------- overdispersion
  /** Per-user event-count overdispersion (`q_dispersion`): the
    * Poisson-vs-negative-binomial triage [[graft.operators.EventOps
    * .qBurstiness]]'s per-user CV cannot give at the population level —
    * dispersion index Var/Mean (Poisson = 1) plus the method-of-moments
    * NB parameters (r = m²/(v−m), p = m/v) a capacity model would
    * plug in. All moments fold exactly: counts are integers, Σc and
    * Σc² as DECIMAL(38,0); one user-keyed aggregate then a 1-row
    * frame.
    */
  def qDispersion(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .select(col("c").cast("decimal(38,0)").as("c"))
    val m = perUser.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).as("sc"),
      sum(col("c") * col("c")).as("scc"))
    def d(c: String) = col(c).cast("double")
    val mean = d("sc") / d("n")
    val vr = (d("scc") - d("sc") * d("sc") / d("n")) / d("n")
    // Degenerate-input guards (r11 ADVICE): on equidispersed data
    // (var == mean) Spark's Divide yields NULL while DuckDB's IEEE
    // float ops yield Infinity — guard BOTH sides to NULL (when() here,
    // nullif() in the oracle) so the engines agree. Same for var == 0
    // (all users with identical counts) in nb_p; mean > 0 always holds
    // (every grouped user has >= 1 event).
    m.select(
      col("n").cast("long").as("n_users"),
      round(mean, 6).as("mean_events"),
      round(vr, 6).as("var_events"),
      round(vr / mean, 6).as("dispersion"),
      round(when(vr =!= mean, mean * mean / (vr - mean)), 6).as("nb_r"),
      round(when(vr =!= 0d, mean / vr), 6).as("nb_p"))
  }

  val oracleDispersion: String =
    """WITH per AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS c
      |  FROM events GROUP BY user_id),
      |m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(c) AS sc, sum(c * c) AS scc
      |  FROM per)
      |SELECT CAST(n AS BIGINT) AS n_users,
      |  round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_events,
      |  round((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS var_events,
      |  round(((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
      |    / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS dispersion,
      |  round((CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
      |    / nullif((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
      |       - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE), 0), 6) AS nb_r,
      |  round((CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
      |    / nullif((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0), 6) AS nb_p
      |FROM m""".stripMargin

  // ------------------------------------------------- Hill tail index
  /** Top-order statistics used by [[qHillTail]]. */
  private[graft] val HILL_K = 200

  /** Hill tail-index estimator (`q_hill_tail`) over the top
    * [[HILL_K]]+1 order values: α̂ = k / Σ ln(x_i/x_(k+1)) — the
    * heavy-tail exponent that tells a capacity planner whether the
    * revenue distribution even HAS a finite variance (α < 2 ⇒ no), the
    * question [[qMadOutliers]]'s robust flags and `q_hhi`'s
    * concentration number both dodge.
    *
    * Scale shape: the ONLY data-proportional work is a TakeOrdered
    * top-(k+1) (never a global sort); the log fold runs over the
    * sorted bounded array on both engines. Cents are exact integers,
    * so both engines feed identical values to ln; the ≤1-ulp libm
    * spread over 200 terms is ~1e-14 — far under the 6dp edge.
    */
  def qHillTail(s: SparkSession, dir: String): DataFrame = {
    val top = Tables.orders(s, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      .orderBy(desc("cents"), col("o_orderkey"))
      .limit(HILL_K + 1)
    val arr = top.agg(array_sort(collect_list(col("cents"))).as("xs"))
    // xs ascending: element 1 is x_(k+1), the rest are the top k
    val xref = element_at(col("xs"), 1).cast("double")
    val logSum = aggregate(slice(col("xs"), 2, HILL_K), lit(0.0d),
      (a, x) => a + log(x.cast("double") / xref))
    arr.select(
      lit(HILL_K.toLong).as("k"),
      (xref / 100.0).as("x_kth"),
      round(lit(HILL_K.toDouble) / logSum, 6).as("alpha"),
      round(logSum / HILL_K.toDouble, 6).as("mean_log_excess"))
  }

  val oracleHillTail: String =
    s"""WITH top AS (
       |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
       |  FROM orders ORDER BY cents DESC, o_orderkey LIMIT ${HILL_K + 1}),
       |arr AS (SELECT list_sort(list(cents)) AS xs FROM top)
       |SELECT CAST($HILL_K AS BIGINT) AS k,
       |  CAST(xs[1] AS DOUBLE) / 100.0 AS x_kth,
       |  round($HILL_K.0 / list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(xs[2:${HILL_K + 1}], x -> ln(CAST(x AS DOUBLE) / CAST(xs[1] AS DOUBLE)))),
       |    (a, v) -> a + v), 6) AS alpha,
       |  round(list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(xs[2:${HILL_K + 1}], x -> ln(CAST(x AS DOUBLE) / CAST(xs[1] AS DOUBLE)))),
       |    (a, v) -> a + v) / $HILL_K.0, 6) AS mean_log_excess
       |FROM arr""".stripMargin

  // ------------------------------------------------- Wasserstein-1
  /** Binned 1-Wasserstein (earth-mover) distance (`q_wasserstein`)
    * between the two segments' order-value distributions — the INTEGRAL
    * companion to [[qKsTest]]'s sup-gap: KS asks "is there a level where
    * the CDFs split", W1 asks "how many dollars must move to make them
    * equal" — the drift magnitude a rebalancing decision actually needs.
    * Same fixed KS_BIN grid (the 100 TB discipline: the CDF frame is
    * bounded by the value range, never the row count).
    *
    * Exactness: W1 = BIN/(n_a·n_b) · Σ_b |cumA_b·n_b − cumB_b·n_a| —
    * the summand is an exact INTEGER (DECIMAL(38,0) at scale), so the
    * bucket-order float-summation hazard of a naive Σ|F_a−F_b|·Δ is
    * engineered out; one double division at the edge.
    */
  def qWasserstein(s: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(s, dir)
      .join(Tables.dim(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B))
    val agg = seg.select(
        floor(col("o_totalprice") / KS_BIN).cast("long").as("b"),
        (col("c_mktsegment") === KS_SEG_A).cast("long").as("ia"),
        (col("c_mktsegment") === KS_SEG_B).cast("long").as("ib"))
      .groupBy("b").agg(sum("ia").as("na"), sum("ib").as("nb"))
    val w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // the bucket frame omits EMPTY buckets, but a CDF gap persists across
    // the hole — each present bucket's gap integrates over the span to
    // the NEXT present bucket (first written without the lead() width:
    // the spec's W1 >= |mean diff| identity caught the under-count)
    agg
      .withColumn("ta", sum("na").over(all))
      .withColumn("tb", sum("nb").over(all))
      .withColumn("width", lead("b", 1).over(Window.orderBy("b")) - col("b"))
      .withColumn("gap_i",
        abs(sum("na").over(w).cast("decimal(38,0)") * col("tb")
          - sum("nb").over(w).cast("decimal(38,0)") * col("ta")) * col("width"))
      .filter(col("width").isNotNull)
      .groupBy("ta", "tb")
      .agg(sum("gap_i").as("g"))
      .select(col("ta").cast("long").as("n_a"), col("tb").cast("long").as("n_b"),
        round(lit(KS_BIN) * col("g").cast("double")
          / (col("ta").cast("double") * col("tb").cast("double")), 4).as("w1_dollars"))
  }

  val oracleWasserstein: String =
    s"""WITH seg AS (
       |  SELECT floor(o_totalprice / $KS_BIN)::BIGINT AS b,
       |    CASE WHEN c_mktsegment = '$KS_SEG_A' THEN 1 ELSE 0 END AS ia,
       |    CASE WHEN c_mktsegment = '$KS_SEG_B' THEN 1 ELSE 0 END AS ib
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment IN ('$KS_SEG_A', '$KS_SEG_B')),
       |agg AS (SELECT b, sum(ia) AS na, sum(ib) AS nb FROM seg GROUP BY b),
       |cum AS (
       |  SELECT sum(na) OVER () AS ta, sum(nb) OVER () AS tb,
       |    lead(b) OVER (ORDER BY b) - b AS width,
       |    abs(CAST(sum(na) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS HUGEINT) * (sum(nb) OVER ())
       |      - CAST(sum(nb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS HUGEINT) * (sum(na) OVER ())) AS gap_i
       |  FROM agg)
       |SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
       |  round($KS_BIN * CAST(sum(gap_i * width) AS DOUBLE)
       |    / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 4) AS w1_dollars
       |FROM cum WHERE width IS NOT NULL GROUP BY ta, tb""".stripMargin

  // ------------------------------------------------------------ AR(2) fit
  /** Yule–Walker AR(2) fit (`q_ar_fit`) over the daily order-revenue
    * series: the autoregressive twin of `q_autocorr` and the
    * model-identification step `q_trend_forecast`'s straight line skips.
    * φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²), innovation-variance
    * ratio σ²ε/σ²ₓ = 1 − φ₁r₁ − φ₂r₂ — how much of the day-to-day
    * variance an AR(2) explains.
    *
    * Determinism (r13, the r12 ADVICE low): the series is EXACT integer
    * cents and the centering subtracts the FLOOR-mean (`stot div n`,
    * one integer per series) instead of the double mean — so the
    * deviations and their lag products are exact integers end to end
    * (per-day products reach ~1e22 at sf10: DECIMAL(38,0) sums here,
    * HUGEINT in the oracle), and the only doubles are two casts of the
    * same exact integers followed by identical expression trees — the
    * q_ols_multi / q_changepoint_split moment discipline. r₁/r₂ are
    * rounded 6dp BEFORE the closed form, so every downstream quotient
    * is rational arithmetic on identical inputs. The 1−r₁² denominator
    * gets the nullif guard (degenerate perfectly-correlated series
    * yields NULL in both engines, not ±Inf in one).
    */
  def qArFit(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byD = Window.orderBy("d")
    val d38 = "decimal(38,0)"
    val f = daily
      .withColumn("stot", sum("cents").over(all))
      .withColumn("nn", count(lit(1)).over(all))
      // floor-mean centering keeps dx an exact long (a <1-cent constant
      // offset to every term — immaterial to the fit, decisive for
      // cross-engine hashing)
      .withColumn("dx", col("cents") - expr("stot div nn"))
      .withColumn("dx1", lag("dx", 1).over(byD))
      .withColumn("dx2", lag("dx", 2).over(byD))
    val agg = f.agg(
      count(lit(1)).as("n_days"),
      sum(col("dx").cast(d38) * col("dx")).as("den"),
      sum(col("dx").cast(d38) * col("dx1")).as("num1"),
      sum(col("dx").cast(d38) * col("dx2")).as("num2"))
    agg.select(col("n_days"),
        round(col("num1").cast("double") / col("den").cast("double"), 6).as("r1"),
        round(col("num2").cast("double") / col("den").cast("double"), 6).as("r2"))
      .withColumn("det", col("r1") * col("r1")) // r1² — shared subterm
      .select(col("n_days"), col("r1"), col("r2"),
        round(col("r1") * (lit(1.0) - col("r2"))
          / nullif(lit(1.0) - col("det"), lit(0.0)), 6).as("phi1"),
        round((col("r2") - col("det"))
          / nullif(lit(1.0) - col("det"), lit(0.0)), 6).as("phi2"))
      .withColumn("innovation_ratio",
        round(lit(1.0) - col("phi1") * col("r1") - col("phi2") * col("r2"), 6) + lit(0.0))
  }

  val oracleArFit: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1),
      |dev AS (SELECT d,
      |  cents - (sum(cents) OVER () // count(*) OVER ()) AS dx FROM daily),
      |lagged AS (SELECT dx,
      |  lag(dx, 1) OVER (ORDER BY d) AS dx1,
      |  lag(dx, 2) OVER (ORDER BY d) AS dx2 FROM dev),
      |agg AS (
      |  SELECT count(*) AS n_days,
      |    sum(CAST(dx AS HUGEINT) * dx) AS den,
      |    sum(CAST(dx AS HUGEINT) * dx1) AS num1,
      |    sum(CAST(dx AS HUGEINT) * dx2) AS num2 FROM lagged),
      |r AS (
      |  SELECT n_days,
      |    round(CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS r1,
      |    round(CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS r2
      |  FROM agg),
      |phi AS (
      |  SELECT n_days, r1, r2,
      |    round(r1 * (1.0 - r2) / nullif(1.0 - r1 * r1, 0.0), 6) AS phi1,
      |    round((r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0), 6) AS phi2
      |  FROM r)
      |SELECT n_days, r1, r2, phi1, phi2,
      |  round(1.0 - phi1 * r1 - phi2 * r2, 6) + 0.0 AS innovation_ratio
      |FROM phi""".stripMargin

  // --------------------------------------------------- two-regressor OLS
  /** Two-regressor OLS (`q_ols_multi`): extended price regressed on
    * quantity and discount per returnflag class — the multivariate twin
    * of `q_trend_forecast`'s simple OLS, solved from the 2×2 normal
    * equations in closed form. The "does discount carry signal beyond
    * quantity" partial-effect question a single-regressor fit cannot
    * answer.
    *
    * Scale + determinism shape: ONE map-side-combinable aggregate per
    * group collects the 9 sufficient moments (n, Σx₁, Σx₂, Σy, Σx₁²,
    * Σx₂², Σx₁x₂, Σx₁y, Σx₂y) as EXACT integers (cents / basis points —
    * per-row products fit a long at any SF; the sums are DECIMAL(38,0)),
    * then the closed form runs on doubles cast from those exact integer
    * moments through identical expression trees in both engines —
    * bit-identical coefficients with no order-of-addition drift. Nothing
    * data-proportional leaves the executors: the result is |returnflag|
    * rows. det/Syy carry nullif guards (a degenerate constant-regressor
    * group yields NULLs, not engine-split ±Inf).
    */
  def qOlsMulti(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("x1"),   // centi-units
      round(col("l_discount") * 10000).cast("long").as("x2"), // basis points
      round(col("l_extendedprice") * 100).cast("long").as("y")) // cents
    val d38 = "decimal(38,0)"
    val m = li.groupBy("l_returnflag").agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("x1")).cast(d38).as("s1"),
      sum(col("x2")).cast(d38).as("s2"),
      sum(col("y")).cast(d38).as("sy"),
      // per-row products fit a long; the SUMS are decimal — Σy² alone
      // reaches ~2e21 at sf10, past any 64-bit accumulator
      sum((col("x1") * col("x1")).cast(d38)).as("s11"),
      sum((col("x2") * col("x2")).cast(d38)).as("s22"),
      sum((col("x1") * col("x2")).cast(d38)).as("s12"),
      sum((col("x1") * col("y")).cast(d38)).as("s1y"),
      sum((col("x2") * col("y")).cast(d38)).as("s2y"),
      sum((col("y") * col("y")).cast(d38)).as("syy"))
    // centered second moments ×n: exact decimal algebra → ONE cast each
    // to double, then identical closed-form trees in both engines
    val c = m.select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
      (col("n") * col("s11") - col("s1") * col("s1")).cast("double").as("c11"),
      (col("n") * col("s22") - col("s2") * col("s2")).cast("double").as("c22"),
      (col("n") * col("s12") - col("s1") * col("s2")).cast("double").as("c12"),
      (col("n") * col("s1y") - col("s1") * col("sy")).cast("double").as("c1y"),
      (col("n") * col("s2y") - col("s2") * col("sy")).cast("double").as("c2y"),
      (col("n") * col("syy") - col("sy") * col("sy")).cast("double").as("cyy"))
    c.select(col("l_returnflag"), col("n_rows"),
        round((col("c22") * col("c1y") - col("c12") * col("c2y"))
          / nullif(col("c11") * col("c22") - col("c12") * col("c12"), lit(0.0)), 6)
          .as("beta_qty"),
        round((col("c11") * col("c2y") - col("c12") * col("c1y"))
          / nullif(col("c11") * col("c22") - col("c12") * col("c12"), lit(0.0)), 6)
          .as("beta_disc"),
        (round(((col("c22") * col("c1y") - col("c12") * col("c2y")) * col("c1y")
          + (col("c11") * col("c2y") - col("c12") * col("c1y")) * col("c2y"))
          / nullif((col("c11") * col("c22") - col("c12") * col("c12")) * col("cyy"),
            lit(0.0)), 6) + lit(0.0)).as("r2"))
      .orderBy("l_returnflag")
  }

  val oracleOlsMulti: String =
    """WITH z AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS x1,
      |    CAST(round(l_discount * 10000) AS BIGINT) AS x2,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
      |    CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(x1 * x1) AS HUGEINT) AS s11, CAST(sum(x2 * x2) AS HUGEINT) AS s22,
      |    CAST(sum(x1 * x2) AS HUGEINT) AS s12, CAST(sum(x1 * y) AS HUGEINT) AS s1y,
      |    CAST(sum(x2 * y) AS HUGEINT) AS s2y, CAST(sum(y * y) AS HUGEINT) AS syy
      |  FROM z GROUP BY 1),
      |c AS (
      |  SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |    CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
      |    CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
      |    CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
      |    CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
      |    CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y,
      |    CAST(n * syy - sy * sy AS DOUBLE) AS cyy
      |  FROM m)
      |SELECT l_returnflag, n_rows,
      |  round((c22 * c1y - c12 * c2y) / nullif(c11 * c22 - c12 * c12, 0.0), 6) AS beta_qty,
      |  round((c11 * c2y - c12 * c1y) / nullif(c11 * c22 - c12 * c12, 0.0), 6) AS beta_disc,
      |  round(((c22 * c1y - c12 * c2y) * c1y + (c11 * c2y - c12 * c1y) * c2y)
      |    / nullif((c11 * c22 - c12 * c12) * cyy, 0.0), 6) + 0.0 AS r2
      |FROM c ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------- difference-in-diff
  /** Difference-in-differences (`q_did`) on the events stream: treated
    * cohort = user_id ≡ 0 (mod 3) (deterministic, PRNG-free), post
    * period = events after the exact midpoint of the observed time
    * range, outcome = mean event value. DiD = (T,post − T,pre) −
    * (C,post − C,pre) — the causal-contrast rung between `q_ab_welch`'s
    * static A/B and `q_cuped`'s variance reduction: it nets out both the
    * group baseline AND the common time trend.
    *
    * Determinism + scale: the midpoint is exact integer epoch-micros
    * arithmetic ((min+max) div 2 — floor division both engines); cell
    * sums are exact integer micros (round(value·1e6)) with counts, so
    * the four cell means are one double division each off exact ints
    * through identical trees. TWO passes over events (bounded stats
    * row + ONE conditional aggregate with map-side combine — no join,
    * no window); output is a single row.
    */
  def qDid(s: SparkSession, dir: String): DataFrame = {
    val ev = EventOps.events(s, dir).select(
      col("user_id"),
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
      round(col("value") * 1000000).cast("long").as("vm"))
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid_us"))
    val cells = ev.crossJoin(broadcast(mid)) // 1-row stats frame
      .select((col("user_id") % 3 === 0).as("treated"), (col("us") > col("mid_us")).as("post"),
        col("vm"))
      .agg(
        sum(when(col("treated") && col("post"), col("vm"))).as("s_tp"),
        count(when(col("treated") && col("post"), lit(1))).as("n_tp"),
        sum(when(col("treated") && !col("post"), col("vm"))).as("s_t0"),
        count(when(col("treated") && !col("post"), lit(1))).as("n_t0"),
        sum(when(!col("treated") && col("post"), col("vm"))).as("s_cp"),
        count(when(!col("treated") && col("post"), lit(1))).as("n_cp"),
        sum(when(!col("treated") && !col("post"), col("vm"))).as("s_c0"),
        count(when(!col("treated") && !col("post"), lit(1))).as("n_c0"))
    def mean(sc: String, nc: String) =
      col(sc).cast("double") / lit(1e6) / nullif(col(nc).cast("double"), lit(0.0))
    cells.select(
      col("n_tp"), col("n_t0"), col("n_cp"), col("n_c0"),
      (round(mean("s_tp", "n_tp"), 6) + lit(0.0)).as("mean_treated_post"),
      (round(mean("s_t0", "n_t0"), 6) + lit(0.0)).as("mean_treated_pre"),
      (round(mean("s_cp", "n_cp"), 6) + lit(0.0)).as("mean_control_post"),
      (round(mean("s_c0", "n_c0"), 6) + lit(0.0)).as("mean_control_pre"),
      (round((mean("s_tp", "n_tp") - mean("s_t0", "n_t0"))
        - (mean("s_cp", "n_cp") - mean("s_c0", "n_c0")), 6) + lit(0.0)).as("did"))
  }

  val oracleDid: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    epoch_ns(ts) // 1000 AS us,
      |    CAST(round(value * 1000000) AS BIGINT) AS vm
      |  FROM events),
      |mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM ev),
      |cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN user_id % 3 = 0 AND us > mid_us THEN vm END) AS BIGINT) AS s_tp,
      |    CAST(count(CASE WHEN user_id % 3 = 0 AND us > mid_us THEN 1 END) AS BIGINT) AS n_tp,
      |    CAST(sum(CASE WHEN user_id % 3 = 0 AND us <= mid_us THEN vm END) AS BIGINT) AS s_t0,
      |    CAST(count(CASE WHEN user_id % 3 = 0 AND us <= mid_us THEN 1 END) AS BIGINT) AS n_t0,
      |    CAST(sum(CASE WHEN user_id % 3 <> 0 AND us > mid_us THEN vm END) AS BIGINT) AS s_cp,
      |    CAST(count(CASE WHEN user_id % 3 <> 0 AND us > mid_us THEN 1 END) AS BIGINT) AS n_cp,
      |    CAST(sum(CASE WHEN user_id % 3 <> 0 AND us <= mid_us THEN vm END) AS BIGINT) AS s_c0,
      |    CAST(count(CASE WHEN user_id % 3 <> 0 AND us <= mid_us THEN 1 END) AS BIGINT) AS n_c0
      |  FROM ev, mid)
      |SELECT n_tp, n_t0, n_cp, n_c0,
      |  round(CAST(s_tp AS DOUBLE) / 1e6 / nullif(CAST(n_tp AS DOUBLE), 0.0), 6) + 0.0 AS mean_treated_post,
      |  round(CAST(s_t0 AS DOUBLE) / 1e6 / nullif(CAST(n_t0 AS DOUBLE), 0.0), 6) + 0.0 AS mean_treated_pre,
      |  round(CAST(s_cp AS DOUBLE) / 1e6 / nullif(CAST(n_cp AS DOUBLE), 0.0), 6) + 0.0 AS mean_control_post,
      |  round(CAST(s_c0 AS DOUBLE) / 1e6 / nullif(CAST(n_c0 AS DOUBLE), 0.0), 6) + 0.0 AS mean_control_pre,
      |  round((CAST(s_tp AS DOUBLE) / 1e6 / nullif(CAST(n_tp AS DOUBLE), 0.0)
      |    - CAST(s_t0 AS DOUBLE) / 1e6 / nullif(CAST(n_t0 AS DOUBLE), 0.0))
      |   - (CAST(s_cp AS DOUBLE) / 1e6 / nullif(CAST(n_cp AS DOUBLE), 0.0)
      |    - CAST(s_c0 AS DOUBLE) / 1e6 / nullif(CAST(n_c0 AS DOUBLE), 0.0)), 6) + 0.0 AS did
      |FROM cells""".stripMargin

  // ------------------------------------------------ binary-seg changepoint
  /** Minimum days on each side of a candidate split. */
  private val CPS_MIN = 7

  /** Binary-segmentation changepoint (`q_changepoint_split`): the single
    * split day of the daily-revenue series that maximizes between-group
    * sum of squares — CUSUM (`q_cusum_changepoint`) asks "is the level
    * drifting NOW"; this asks "WHERE did the level shift" after the
    * fact, the first step of the classic recursive segmentation.
    *
    * Determinism + scale: the fact stream reduces to the bounded |days|
    * frame first (ONE map-side-combinable shuffle); prefix sums are
    * exact integer cents over that bounded frame only; BSS(t) =
    * s₁²/n₁ + (S−s₁)²/(N−n₁) − S²/N is computed in doubles cast from
    * exact ints through identical trees, rounded 9dp BEFORE the argmax
    * (ties then break on the earlier day — the coreset pin, so a
    * cross-engine ulp can't flip the winner). Splits leaving fewer than
    * CPS_MIN days on either side are excluded. Output is one row.
    */
  def qChangepointSplit(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_orders"))
    val byD = Window.orderBy("d")
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val f = daily
      .withColumn("rn", row_number().over(byD)) // bounded |days| frame
      .withColumn("s1", sum("cents").over(byD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("stot", sum("cents").over(all))
      .withColumn("ntot", sum(lit(1L)).over(all))
      .filter(col("rn") >= CPS_MIN && (col("ntot") - col("rn")) >= CPS_MIN)
    val scored = f.select(col("d"), col("rn"), col("ntot"),
        col("s1").cast("double").as("s1d"),
        (col("stot") - col("s1")).cast("double").as("s2d"),
        col("rn").cast("double").as("n1d"),
        (col("ntot") - col("rn")).cast("double").as("n2d"),
        col("stot").cast("double").as("std"))
      .select(col("d"), col("rn").as("n_pre_days"), (col("ntot") - col("rn")).as("n_post_days"),
        col("s1d"), col("s2d"), col("n1d"), col("n2d"), col("std"),
        round(col("s1d") * col("s1d") / col("n1d")
          + col("s2d") * col("s2d") / col("n2d")
          - col("std") * col("std") / (col("n1d") + col("n2d")), 9).as("bss"))
    scored
      .orderBy(desc("bss"), col("d")) // 9dp-rounded key, day tiebreak
      .limit(1)
      .select(col("d").as("split_day"), col("n_pre_days"), col("n_post_days"),
        (round(col("s1d") / lit(100.0) / col("n1d"), 6) + lit(0.0)).as("mean_pre"),
        (round(col("s2d") / lit(100.0) / col("n2d"), 6) + lit(0.0)).as("mean_post"))
  }

  val oracleChangepointSplit: String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d,
       |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
       |  FROM orders GROUP BY 1),
       |pre AS (
       |  SELECT d,
       |    row_number() OVER (ORDER BY d) AS rn,
       |    sum(cents) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS s1,
       |    sum(cents) OVER () AS stot,
       |    count(*) OVER () AS ntot
       |  FROM daily),
       |scored AS (
       |  SELECT d, rn AS n_pre_days, ntot - rn AS n_post_days,
       |    CAST(s1 AS DOUBLE) AS s1d, CAST(stot - s1 AS DOUBLE) AS s2d,
       |    CAST(rn AS DOUBLE) AS n1d, CAST(ntot - rn AS DOUBLE) AS n2d,
       |    CAST(stot AS DOUBLE) AS std,
       |    round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(rn AS DOUBLE)
       |      + CAST(stot - s1 AS DOUBLE) * CAST(stot - s1 AS DOUBLE) / CAST(ntot - rn AS DOUBLE)
       |      - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(ntot AS DOUBLE), 9) AS bss
       |  FROM pre
       |  WHERE rn >= $CPS_MIN AND ntot - rn >= $CPS_MIN)
       |SELECT d AS split_day, CAST(n_pre_days AS BIGINT) AS n_pre_days,
       |  CAST(n_post_days AS BIGINT) AS n_post_days,
       |  round(s1d / 100.0 / n1d, 6) + 0.0 AS mean_pre,
       |  round(s2d / 100.0 / n2d, 6) + 0.0 AS mean_post
       |FROM scored ORDER BY bss DESC, d LIMIT 1""".stripMargin
}
