package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation building block (SURVEY §4): salted replicated join.
  *
  * A shuffle join on a key with few hot values (here `l_returnflag`,
  * which has THREE values — worst-case skew) lands each hot key on one
  * reducer; at 100 TB that reducer runs for hours while the rest idle.
  * The salted pattern replicates the small side `salts` times and
  * spreads the fact side by a row-dependent salt, so each hot key fans
  * out over `salts` reducers. AQE's skew-join split handles moderate
  * skew automatically; explicit salting is the deterministic tool for
  * the pathological case where one key IS the distribution.
  */
object SkewOps {

  val SALTS = 16

  /** Inner-join `fact` to `dim` on `key`, spreading each key value over
    * [[SALTS]] reducers. `saltOf` must be a deterministic row-dependent
    * expression on the fact side (e.g. `pmod(col("l_orderkey"), 16)`).
    * Result is identical to the unsalted join (spec-checked).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltOf: Column): DataFrame = {
    val saltedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(SALTS - 1))))
    fact.withColumn("__salt", pmod(saltOf, lit(SALTS)).cast("int"))
      .join(saltedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Worst-case-skew join demo, oracle-checked: lineitem (fact; 3-value
    * join key) joined to a derived returnflag dimension with salting,
    * then aggregated — the salt is invisible in the result, so the
    * oracle is the plain unsalted join.
    */
  def qSkewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val dim = li.select(col("l_returnflag")).distinct()
      .withColumn("flag_class", concat(lit("cls_"), col("l_returnflag")))
    // shuffle_hash hint: at test SF the dim would broadcast (making the
    // salt moot); the hint forces the shuffle join that salting exists
    // for, so the demonstrated plan hashpartitions on (key, __salt)
    saltedJoin(li, dim.hint("shuffle_hash"), "l_returnflag", pmod(col("l_orderkey"), lit(SALTS)))
      .groupBy("flag_class")
      // cents fold: raw double sums crossed the 6dp compare grain at the
      // sf1 battery's ~1e11 magnitudes (one ulp ~1.5e-5)
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0, 2)
          .as("sum_price"))
      .orderBy("flag_class")
  }

  val oracleSkewSaltedJoin: String =
    """WITH dim AS (SELECT DISTINCT l_returnflag, 'cls_' || l_returnflag AS flag_class FROM lineitem)
      |SELECT flag_class, count(*) AS n,
      | round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_price
      |FROM lineitem JOIN dim USING (l_returnflag)
      |GROUP BY flag_class ORDER BY flag_class""".stripMargin

  // ---------------------------------------------------------- skew report

  /** Join-key skew DIAGNOSTIC (`q_skew_report`) — the measurement that
    * decides whether the salted join / AQE skew handling above is needed
    * at all: per-key frequencies of a candidate shuffle key (here word
    * tokens — the dedup family's real join key, with genuine stopword
    * skew), reduced to scale-free indicators: max/avg ratio and the
    * top-10 share. Shape: one hash-agg on the key, a 1-row stats reduce,
    * and a TakeOrdered(10) for the head — no sort of the key frame, no
    * collect; works unchanged on a trillion-row key column.
    */
  def qSkewReport(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
    val top10 = counts.orderBy(desc("c"), col("k")).limit(10)
      .agg(sum("c").as("top10"))
    val stats = counts.agg(count(lit(1)).as("n_keys"), sum("c").as("total"),
      max("c").as("max_count"), round(avg("c"), 4).as("avg_count"))
    stats.crossJoin(broadcast(top10))
      .select(col("n_keys"), col("total"), col("max_count"), col("avg_count"),
        round(col("max_count") / col("avg_count"), 4).as("max_over_avg"),
        round(col("top10") / col("total"), 6).as("top10_share"))
  }

  val oracleSkewReport: String =
    """WITH counts AS (
      |  SELECT k, count(*) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS k FROM documents)
      |  GROUP BY k),
      |t10 AS (SELECT sum(c) AS top10 FROM (
      |  SELECT c FROM counts ORDER BY c DESC, k LIMIT 10)),
      |st AS (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS total, max(c) AS max_count,
      |        round(avg(c), 4) AS avg_count FROM counts)
      |SELECT n_keys, total, max_count, avg_count,
      | round(max_count / avg_count, 4) AS max_over_avg,
      | round(top10 * 1.0 / total, 6) AS top10_share
      |FROM st, t10""".stripMargin
}
