package graft.plans

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** The whole-operator extension path: logical node → strategy → two-phase
  * physical operator, equivalent to the window shape without its sort.
  */
class TopKPerKeySpec extends AnyFunSpec with SparkTestBase {

  it("matches the row_number window implementation exactly (ties included)") {
    val viaOp = TopK.perKey(Tables.orders(spark, sfDir),
      col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"), 3)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority").orderBy(desc("o_totalprice"), col("o_orderkey"))
    val viaWindow = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaOp == viaWindow)
  }

  it("plans partial + exchange + final, and no Window/Sort of the key's row set") {
    val df = TopK.perKey(Tables.orders(spark, sfDir),
      col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"), 3)
    val plan = df.queryExecution.executedPlan.toString()
    assert("TopKPerKey".r.findAllIn(plan).size >= 2,
      s"expected partial+final custom operators:\n$plan")
    assert(plan.contains("Exchange"), "final phase must cluster by key")
    assert(!plan.contains("Window"), "the operator must not fall back to a window")
  }

  it("matches the window reference on generated data across k, skew, and tie density") {
    import spark.implicits._
    // fixed-seed generated datasets: heavy key skew, dense value ties
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      val key = s"k${if (rnd.nextDouble() < 0.5) 0 else rnd.nextInt(20)}" // hot key k0
      val v = rnd.nextInt(8).toDouble // dense ties
      (key, v, i.toLong)
    }
    val df = rows.toDF("k", "v", "id").repartition(7).cache()
    df.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(desc("v"), col("id"))
    for (k <- Seq(1, 3, 17)) {
      val viaOp = TopK.perKey(df, col("k"), col("v"), col("id"), k)
        .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(viaOp == viaWindow, s"divergence at k=$k")
    }
    df.unpersist()
  }

  it("ranks long ordinals above 2^53 exactly (no double round-trip)") {
    import spark.implicits._
    // 2^53 and 2^53+1 collide as doubles; native long ordering must not
    val big = (1L << 53)
    val df = Seq(("a", big, 1L), ("a", big + 1, 2L), ("a", big - 1, 3L))
      .toDF("k", "v", "id").repartition(3)
    val got = TopK.perKey(df, col("k"), col("v"), col("id"), 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L), s"expected the 2^53+1 row to win, got $got")
  }

  it("filters null ord/tie rows instead of ranking them as zero") {
    import spark.implicits._
    val df = Seq(("a", Some(-5.0), 1L), ("a", None, 2L), ("b", Some(1.0), 3L))
      .toDF("k", "v", "id").repartition(2)
    val got = TopK.perKey(df, col("k"), col("v"), col("id"), 1)
      .select("id").collect().map(_.getLong(0)).toSet
    // null v has no rank: group a keeps the -5.0 row (a null coerced to
    // 0.0 would have beaten it), group b its only non-null row
    assert(got == Set(1L, 3L), s"got $got")
  }

  it("handles duplicate rows, ties, and k larger than the group") {
    import spark.implicits._
    val tiny = Seq(("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 5.0, 2L), ("b", 1.0, 9L))
      .toDF("k", "v", "id").repartition(4)
    val got = TopK.perKey(tiny, col("k"), col("v"), col("id"), 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // group a: two best by (v desc, id asc) = (5.0,1) and one of the (5.0,2) dups
    assert(got.count(_._1 == "a") == 2)
    assert(got.filter(_._1 == "a").map(_._3).toSet == Set(1L, 2L))
    // group b has fewer rows than k: all kept
    assert(got.count(_._1 == "b") == 1)
  }
}
