package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** SCD2 point-in-time join: exactly-one-version coverage and cutover
  * correctness on both sides of the effective date.
  */
class Scd2PitSpec extends AnyFunSpec with SparkTestBase {

  it("covers every order exactly once (the intervals partition time)") {
    val joined = Relational.qScd2Pit(spark, sfDir).collect()
    val nJoined = joined.map(_.getLong(2)).sum
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(nJoined == nOrders,
      s"point-in-time join lost/duplicated orders: $nJoined vs $nOrders")
  }

  it("orders route to version 1 before the cutover and version 2 after") {
    // rebuild one changed key's timeline and check routing by hand
    val changed = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey")).limit(1)
      .collect().headOption.map(_.getLong(0))
    assert(changed.nonEmpty, "fixture has no changed key")
    val key = changed.get
    val eff = java.time.LocalDate.parse("1995-01-01").plusDays(key % 1000)
    val orders = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") === key)
      .select(col("o_orderdate").cast("date")).collect()
      .map(_.getDate(0).toLocalDate)
    val before = orders.count(_.isBefore(eff))
    val after = orders.length - before
    // direct routing check through the same half-open predicate
    val perVersion = Tables.orders(spark, sfDir).filter(col("o_custkey") === key)
      .withColumn("version",
        when(col("o_orderdate") <
          date_add(lit("1995-01-01").cast("date"), (lit(key) % 1000).cast("int")).cast("timestamp"),
          1L).otherwise(2L))
      .groupBy("version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVersion.getOrElse(1L, 0L) == before)
    assert(perVersion.getOrElse(2L, 0L) == after)
  }

  it("plans a broadcast equality join with the interval as post-filter (no nested loop)") {
    val plan = Relational.qScd2Pit(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), s"dim must broadcast-hash-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval predicate must not force a nested loop:\n$plan")
  }
}
