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
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("flag_class")
  }

  val oracleSkewSaltedJoin: String =
    """WITH dim AS (SELECT DISTINCT l_returnflag, 'cls_' || l_returnflag AS flag_class FROM lineitem)
      |SELECT flag_class, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem JOIN dim USING (l_returnflag)
      |GROUP BY flag_class ORDER BY flag_class""".stripMargin
}
