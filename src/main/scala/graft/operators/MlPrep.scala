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
}
