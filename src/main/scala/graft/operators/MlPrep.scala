package graft.operators

import graft.Tables
import graft.functions.HashFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-engineering primitives a model-training pipeline runs over
  * warehouse tables before any learning happens: leakage-free target
  * encoding of categoricals and hashing-trick feature bucketing.
  *
  * Both are single-scan shapes: a bounded per-category (or per-bucket)
  * aggregate joined/broadcast back onto the fact rows — no windows over
  * the raw stream, no driver-side loops, so they run unchanged at
  * 100 TB where the encode table is still only |categories| rows.
  */
object MlPrep {

  /** Leave-one-out target encoding (`q_target_encode`): encode each
    * order's customer-nation category by the mean order value of all
    * OTHER orders in that nation — the leakage-free mean-target
    * encoding (own row excluded, so the feature never memorizes its own
    * label). Categories with a single row fall back to the
    * leave-one-out GLOBAL mean.
    *
    * Cross-engine arithmetic pin: group sums run in DECIMAL(18,2)
    * (exact, order-independent) and only the final subtract-and-divide
    * drops to double — both engines divide the identical pair of
    * doubles, so 6dp rounding is stable. Scale shape: one
    * |categories|-row aggregate broadcast back onto the fact scan plus
    * one 1-row global frame; the fact table is scanned twice at most
    * and never shuffled by row.
    */
  def qTargetEncode(s: SparkSession, dir: String): DataFrame =
    targetEncode(Tables.orders(s, dir)
      .join(broadcast(Tables.dim(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey").as("cat"),
        col("o_totalprice").cast("decimal(18,2)").as("t")))

  /** Core on any (o_orderkey, cat, t DECIMAL(18,2)) frame. */
  private[graft] def targetEncode(rows: DataFrame): DataFrame = {
    val stats = rows.groupBy("cat").agg(sum("t").as("st"), count(lit(1)).as("n"))
    val g = rows.agg(sum("t").as("gst"), count(lit(1)).as("gn"))
    // no in-engine 6dp rounding: the exact-decimal sums make both
    // engines divide the identical pair of doubles, and in-engine
    // round() implementations disagree exactly at half boundaries —
    // emit the raw double and let the comparator round both sides
    // with one algorithm
    rows.join(broadcast(stats), "cat").crossJoin(broadcast(g))
      .select(col("o_orderkey"), col("cat"),
        when(col("n") > 1, (col("st") - col("t")).cast("double") / (col("n") - 1))
          .otherwise((col("gst") - col("t")).cast("double") / (col("gn") - 1))
          .as("te"))
      .orderBy("o_orderkey")
  }

  val oracleTargetEncode: String =
    """WITH r AS (
      |  SELECT o_orderkey, c_nationkey AS cat,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS t
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |s AS (SELECT cat, sum(t) AS st, count(*) AS n FROM r GROUP BY cat),
      |g AS (SELECT sum(t) AS gst, count(*) AS gn FROM r)
      |SELECT o_orderkey, cat,
      |  CASE WHEN n > 1 THEN CAST(st - t AS DOUBLE) / (n - 1)
      |       ELSE CAST(gst - t AS DOUBLE) / (gn - 1) END AS te
      |FROM r JOIN s USING (cat), g
      |ORDER BY o_orderkey""".stripMargin

  /** Hashed feature space width — small enough that collisions actually
    * occur on this corpus, so the audit exercises the interesting case. */
  private[graft] val FH_DIM = 64

  /** Hashing-trick feature bucketing (`q_feature_hash`): three
    * categorical feature families per customer (market segment, nation,
    * account-balance band) are hashed into a fixed `FH_DIM`-wide space
    * with a ±1 sign hash (Weinberger et al.'s feature hashing — the
    * fixed-dimension encoding that needs no vocabulary pass). Output is
    * the per-bucket audit: token count, distinct source features
    * (>1 = collision), and the net signed weight (cancellation).
    *
    * Scale shape: project → explode(3 tokens/row) → one map-side-
    * combinable hash-agg onto FH_DIM buckets; no vocabulary broadcast,
    * no shuffle wider than FH_DIM rows — the entire point of the
    * hashing trick, preserved in the plan.
    */
  def qFeatureHash(s: SparkSession, dir: String): DataFrame = {
    val feats = Tables.dim(s, dir, "customer")
      .select(explode(array(
        concat(lit("seg:"), col("c_mktsegment")),
        concat(lit("nat:"), col("c_nationkey").cast("string")),
        concat(lit("band:"), floor(col("c_acctbal") / 1000).cast("long").cast("string"))))
        .as("f"))
      // sign = bit log2(FH_DIM) of the hash, written division-free as
      // h % 2D >= D (Spark's `/` on longs is DOUBLE division — a
      // fractional remainder, not the bit)
      .select(col("f"), (h60(col("f")) % FH_DIM).as("bucket"),
        when(h60(col("f")) % (2 * FH_DIM) >= FH_DIM, -1L).otherwise(1L).as("sign"))
    feats.groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct("f").as("n_feats"),
        sum("sign").as("net_weight"))
      .orderBy("bucket")
  }

  /** Rules must hold in at least this fraction of baskets. */
  private val AR_MIN_SUP = "0.01" // literal text shared with the oracle
  private val AR_TOP = 20

  /** Market-basket association rules (`q_assoc_rules`): which part
    * brands co-occur in the same order beyond chance — the classic
    * support/confidence/lift pattern-mining readout, mined A-priori
    * style. Baskets are orders, items are the DISTINCT part brands in
    * each order (a bounded item vocabulary, so supports are dense and
    * the pair space is ≤|brands|² no matter the corpus).
    *
    * Scale shape: the pair generator is a self-join on the basket key —
    * fan-out bounded by (items-per-basket choose 2), never |items|² —
    * and everything after it is ≤|brands|²-row frames (item counts
    * broadcast, 1-row basket total). Ratios are each ONE division of
    * exact integer counts (lift's numerator/denominator multiplied out
    * in int64 first), so the doubles are engine-identical with no
    * rounding pin needed.
    */
  def qAssocRules(s: SparkSession, dir: String): DataFrame = {
    // ONE fact pass to per-basket sorted brand SETS (collect_set partial-
    // aggregates map-side), checkpointed so the basket total, the item
    // counts and the pair counts all read the ~|orders|-row set frame.
    // The r12 shape self-joined the exploded (bid, brand) frame on bid —
    // a second shuffle of the whole fact-derived frame plus a join whose
    // output re-aggregated to the same ≤|brands|² keys. Pairs are now
    // generated in-row from the sorted set (items-per-basket choose 2,
    // identical fan-out bound), never through a join (guide §2.4: the
    // equality self-join on the basket key was a removable shuffle).
    // sort_array + slice(i+2..) emit exactly the x < y pairs the join
    // produced, so every (x, y, n_both) count is unchanged.
    val bsets = Tables.lineitem(s, dir)
      .join(broadcast(Tables.dim(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("bid"), col("p_brand").as("brand"))
      .groupBy("bid").agg(sort_array(collect_set(col("brand"))).as("bs"))
      .localCheckpoint()
    val nB = bsets.agg(count(lit(1)).as("nb"))
    val items = bsets.select(explode(col("bs")).as("brand"))
      .groupBy("brand").agg(count(lit(1)).as("ni"))
    val pairs = bsets
      .select(posexplode(col("bs")).as(Seq("i", "x")), col("bs"))
      .select(col("x"),
        explode(slice(col("bs"), col("i") + 2, size(col("bs")))).as("y"))
      .groupBy("x", "y")
      .agg(count(lit(1)).as("n_both"))
    val rules = pairs.select(col("x").as("ant"), col("y").as("cons"), col("n_both"))
      .unionByName(pairs.select(col("y").as("ant"), col("x").as("cons"), col("n_both")))
    rules
      .join(broadcast(items.select(col("brand").as("ant"), col("ni").as("n_ant"))), "ant")
      .join(broadcast(items.select(col("brand").as("cons"), col("ni").as("n_cons"))), "cons")
      .crossJoin(broadcast(nB))
      .filter(col("n_both").cast("double") / col("nb") >= expr(AR_MIN_SUP))
      .select(col("ant"), col("cons"), col("n_both"),
        (col("n_both").cast("double") / col("nb")).as("support"),
        (col("n_both").cast("double") / col("n_ant")).as("confidence"),
        ((col("n_both") * col("nb")).cast("double") / (col("n_ant") * col("n_cons"))).as("lift"))
      .orderBy(desc("lift"), col("ant"), col("cons"))
      .limit(AR_TOP)
  }

  val oracleAssocRules: String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l_orderkey AS bid, p_brand AS brand
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |n AS (SELECT count(DISTINCT bid) AS nb FROM baskets),
       |items AS (SELECT brand, count(*) AS ni FROM baskets GROUP BY 1),
       |pairs AS (
       |  SELECT a.brand AS x, b.brand AS y, count(*) AS n_both
       |  FROM baskets a JOIN baskets b
       |    ON a.bid = b.bid AND a.brand < b.brand
       |  GROUP BY 1, 2),
       |rules AS (
       |  SELECT x AS ant, y AS cons, n_both FROM pairs
       |  UNION ALL SELECT y, x, n_both FROM pairs)
       |SELECT ant, cons, n_both,
       |  CAST(n_both AS DOUBLE) / nb AS support,
       |  CAST(n_both AS DOUBLE) / ia.ni AS confidence,
       |  CAST(n_both * nb AS DOUBLE) / (ia.ni * ic.ni) AS lift
       |FROM rules
       |  JOIN items ia ON rules.ant = ia.brand
       |  JOIN items ic ON rules.cons = ic.brand, n
       |WHERE CAST(n_both AS DOUBLE) / nb >= $AR_MIN_SUP
       |ORDER BY lift DESC, ant, cons LIMIT $AR_TOP""".stripMargin

  /** RRF smoothing constant (the standard k=60), fused-list depth, and
    * final cut. */
  private val RRF_C   = 60
  private val RRF_N   = 20
  private val RRF_TOP = 10

  /** Reciprocal-rank fusion of keyword and vector retrieval
    * (`q_rrf_fusion`): BM25's top-N for the fixed keyword query fused
    * with brute-cosine top-N for the vec-0 query vector by
    * RRF(d) = Σ 1/(60 + rank_r(d)) — the standard hybrid-search
    * combiner (Cormack et al.), score-scale-free so the two rankers
    * need no calibration against each other. vec_id ≡ doc_id in the
    * corpus, so the fusion join is the identity key.
    *
    * Scale shape: each ranker ends in TakeOrdered(N) — the only
    * unbounded work is the two scans the rankers already do; ranks,
    * the full-outer fusion join, and the final sort all run on
    * BOUNDED ≤N-row frames. The RRF score is a sum of two exact unit
    * fractions — engine-identical with no rounding pin.
    */
  def qRrfFusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bm = TextAnalysis.bm25Scores(s, dir)
      .orderBy(desc("score"), col("doc_id")).limit(RRF_N)
      .withColumn("rt", row_number().over(Window.orderBy(desc("score"), col("doc_id"))))
    val kn = Similarity.knnScores(s, dir)
      .orderBy(desc("cos"), col("vec_id")).limit(RRF_N)
      .withColumn("rv", row_number().over(Window.orderBy(desc("cos"), col("vec_id"))))
    bm.select(col("doc_id").as("id"), col("rt"))
      .join(kn.select(col("vec_id").as("id"), col("rv")), Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("rt"), lit(-1)).as("rank_text"),
        coalesce(col("rv"), lit(-1)).as("rank_vec"),
        (coalesce(lit(1.0) / (col("rt") + RRF_C), lit(0.0)) +
          coalesce(lit(1.0) / (col("rv") + RRF_C), lit(0.0))).as("rrf"))
      .orderBy(desc("rrf"), col("id"))
      .limit(RRF_TOP)
  }

  val oracleRrfFusion: String =
    s"""WITH ${TextAnalysis.bm25SqlCtes},
       |bmr AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rt
       |  FROM (SELECT * FROM bmscore ORDER BY score DESC, doc_id LIMIT $RRF_N)),
       |ev AS (
       |  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS emb
       |  FROM embeddings),
       |qv AS (SELECT emb AS qemb FROM ev WHERE vec_id = 0),
       |kn AS (
       |  SELECT vec_id, cos FROM (
       |    SELECT ev.vec_id, ${Similarity.cosSql("ev.emb", "qv.qemb")} AS cos
       |    FROM ev, qv WHERE ev.vec_id <> 0)
       |  ORDER BY cos DESC, vec_id LIMIT $RRF_N),
       |knr AS (SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS rv FROM kn)
       |SELECT coalesce(b.doc_id, k.vec_id) AS id,
       |  CAST(coalesce(rt, -1) AS INT) AS rank_text,
       |  CAST(coalesce(rv, -1) AS INT) AS rank_vec,
       |  coalesce(1.0::DOUBLE / (rt + $RRF_C), 0.0) +
       |    coalesce(1.0::DOUBLE / (rv + $RRF_C), 0.0) AS rrf
       |FROM bmr b FULL OUTER JOIN knr k ON b.doc_id = k.vec_id
       |ORDER BY rrf DESC, id LIMIT $RRF_TOP""".stripMargin

  /** Winsorization bounds. */
  private val WZ_LO = 0.01
  private val WZ_HI = 0.99

  /** Winsorized robust-scaling audit (`q_winsorize`): clamp
    * `l_extendedprice` to its per-group [p01, p99] and report the
    * clipping counts and the winsorized mean — the outlier-robust
    * feature-scaling pass (and its audit trail) that precedes any
    * scale-sensitive model on heavy-tailed warehouse features.
    *
    * Scale shape: percentile bounds come from the repo's two-phase
    * exact-percentile bracket (no whole-group sort), broadcast back as
    * a |groups|-row frame onto one more fact scan. The winsorized mean
    * is pinned exactly: clamped values are cast to DECIMAL(18,4)
    * (originals are 2dp, bounds are 4dp-rounded — both exact at scale
    * 4), summed exactly, and divided once.
    */
  def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_extendedprice"))
    val bounds = Relational.percentilesTwoPhase(
      src, "l_returnflag", "l_extendedprice",
      Seq("p01" -> WZ_LO, "p99" -> WZ_HI))
    src.join(broadcast(bounds), "l_returnflag")
      .select(col("l_returnflag"), col("l_extendedprice").as("x"),
        col("p01"), col("p99"),
        greatest(col("p01"), least(col("p99"), col("l_extendedprice")))
          .cast("decimal(18,4)").as("xw"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum((col("x") < col("p01")).cast("long")).as("n_clip_lo"),
        sum((col("x") > col("p99")).cast("long")).as("n_clip_hi"),
        first("p01").as("p01"), first("p99").as("p99"),
        (sum("xw").cast("double") / count(lit(1))).as("mean_w"))
      .orderBy("l_returnflag")
  }

  val oracleWinsorize: String =
    s"""WITH b AS (
       |  SELECT l_returnflag,
       |    round(quantile_cont(l_extendedprice, $WZ_LO), 4) AS p01,
       |    round(quantile_cont(l_extendedprice, $WZ_HI), 4) AS p99
       |  FROM lineitem GROUP BY 1),
       |w AS (
       |  SELECT l.l_returnflag, l.l_extendedprice AS x, p01, p99,
       |    CAST(greatest(p01, least(p99, l.l_extendedprice)) AS DECIMAL(18,4)) AS xw
       |  FROM lineitem l JOIN b USING (l_returnflag))
       |SELECT l_returnflag, count(*) AS n,
       |  CAST(sum(CASE WHEN x < p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
       |  CAST(sum(CASE WHEN x > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
       |  any_value(p01) AS p01, any_value(p99) AS p99,
       |  CAST(sum(xw) AS DOUBLE) / count(*) AS mean_w
       |FROM w GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val oracleFeatureHash: String = {
    val h = h60Sql("f")
    s"""WITH f AS (
       |  SELECT unnest([
       |    'seg:' || c_mktsegment,
       |    'nat:' || CAST(c_nationkey AS VARCHAR),
       |    'band:' || CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR)]) AS f
       |  FROM customer)
       |SELECT $h % $FH_DIM AS bucket,
       |  count(*) AS n_tokens,
       |  count(DISTINCT f) AS n_feats,
       |  CAST(sum(CASE WHEN $h % ${2 * FH_DIM} >= $FH_DIM THEN -1 ELSE 1 END) AS BIGINT) AS net_weight
       |FROM f GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** Number of cross-validation folds. */
  private[graft] val KFOLD = 5

  /** Group-aware k-fold assignment audit (`q_group_kfold`): assign
    * every order to one of KFOLD cross-validation folds BY CUSTOMER
    * (fold = h60("fold:" + custkey) % K), so all of a customer's orders
    * land in the same fold and a model can never see a validation
    * customer during training — the GroupKFold contract that
    * `q_split_leakage` checks for after the fact, built correct by
    * construction here. Output is the balance audit a pipeline reads
    * before trusting the folds: per-fold order/customer counts and
    * revenue share.
    *
    * Scale shape: the fold key is a stateless hash on the group column
    * — no group directory, no shuffle to assign; ONE map-side-combinable
    * aggregate to a K-row frame. Revenue sums run in DECIMAL(18,2)
    * (exact, order-independent); the share is one division of exact
    * values against a broadcast 1-row total.
    */
  def qGroupKfold(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice"),
        (h60(concat(lit("fold:"), col("o_custkey").cast("string"))) % KFOLD).as("fold"))
    val tot = orders.agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("tot"))
    orders.groupBy("fold")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct("o_custkey").as("n_customers"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"))
      .crossJoin(broadcast(tot))
      .select(col("fold"), col("n_orders"), col("n_customers"),
        col("revenue").cast("double").as("revenue"),
        round(col("revenue").cast("double") / col("tot").cast("double"), 6).as("rev_share"))
      .orderBy("fold")
  }

  val oracleGroupKfold: String = {
    val h = h60Sql("'fold:' || o_custkey")
    s"""WITH f AS (
       |  SELECT o_custkey, o_totalprice, $h % $KFOLD AS fold
       |  FROM orders),
       |g AS (
       |  SELECT fold, count(*) AS n_orders,
       |    count(DISTINCT o_custkey) AS n_customers,
       |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
       |  FROM f GROUP BY fold),
       |tot AS (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot FROM orders)
       |SELECT fold, n_orders, n_customers,
       |  CAST(revenue AS DOUBLE) AS revenue,
       |  round(CAST(revenue AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS rev_share
       |FROM g, tot ORDER BY fold""".stripMargin
  }

  // --------------------------------------------------------------- WOE/IV

  /** Laplace smoothing count for WOE — keeps ln finite for categories
    * with zero events on either side (the standard 0.5 adjustment). */
  private[graft] val WOE_SMOOTH = 0.5

  /** Weight-of-evidence + information value (`q_woe_iv`) — the
    * credit-scoring sibling of [[qTargetEncode]]: for each part brand,
    * WOE = ln(share-of-events / share-of-non-events) of the
    * returned-line outcome (l_returnflag = 'R'), with the per-category
    * IV contribution (p_evt − p_non)·WOE whose feature-level sum ranks
    * predictive power. Smoothed by [[WOE_SMOOTH]] on both counts so
    * one-sided categories stay finite.
    *
    * Scale shape: the part dim broadcasts onto the lineitem scan; one
    * map-side-combinable aggregate to the |brands| frame; the global
    * event/non-event totals are a 1-row broadcast. Counts are exact
    * integers, so both engines divide identical doubles — no rounding
    * ties.
    */
  def qWoeIv(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables.lineitem(s, dir)
      .join(broadcast(Tables.dim(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        (col("l_returnflag") === "R").cast("long").as("evt"))
    val byBrand = rows.groupBy("brand")
      .agg(sum("evt").as("n_evt"),
        (count(lit(1)) - sum("evt")).as("n_non"))
    val tot = byBrand.agg(sum("n_evt").as("g_evt"), sum("n_non").as("g_non"))
    byBrand.crossJoin(broadcast(tot))
      .withColumn("p_evt",
        (col("n_evt") + WOE_SMOOTH) / (col("g_evt") + WOE_SMOOTH))
      .withColumn("p_non",
        (col("n_non") + WOE_SMOOTH) / (col("g_non") + WOE_SMOOTH))
      .withColumn("woe", round(log(col("p_evt") / col("p_non")), 6))
      .select(col("brand"), col("n_evt"), col("n_non"), col("woe"),
        round((col("p_evt") - col("p_non")) * log(col("p_evt") / col("p_non")), 6)
          .as("iv_term"))
      .orderBy("brand")
  }

  val oracleWoeIv: String =
    s"""WITH r AS (
       |  SELECT p_brand AS brand,
       |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS evt
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |b AS (SELECT brand, CAST(sum(evt) AS BIGINT) AS n_evt,
       |        CAST(count(*) - sum(evt) AS BIGINT) AS n_non
       |      FROM r GROUP BY brand),
       |t AS (SELECT CAST(sum(n_evt) AS BIGINT) AS g_evt,
       |        CAST(sum(n_non) AS BIGINT) AS g_non FROM b),
       |p AS (
       |  SELECT brand, n_evt, n_non,
       |    (n_evt + $WOE_SMOOTH) / (g_evt + $WOE_SMOOTH) AS p_evt,
       |    (n_non + $WOE_SMOOTH) / (g_non + $WOE_SMOOTH) AS p_non
       |  FROM b, t)
       |SELECT brand, n_evt, n_non,
       |  round(ln(p_evt / p_non), 6) AS woe,
       |  round((p_evt - p_non) * ln(p_evt / p_non), 6) AS iv_term
       |FROM p ORDER BY brand""".stripMargin
}
