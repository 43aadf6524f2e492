package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

class SkewOpsSpec extends AnyFunSpec with SparkTestBase {

  describe("saltedJoin") {
    it("produces exactly the unsalted join result") {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
      val dim = li.select("l_returnflag").distinct()
        .withColumn("flag_class", concat(lit("cls_"), col("l_returnflag")))
      val salted = SkewOps.saltedJoin(li, dim, "l_returnflag",
        pmod(col("l_orderkey"), lit(SkewOps.SALTS)))
      val plain = li.join(dim, Seq("l_returnflag"))
      assert(salted.count() == plain.count())
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    }

    it("spreads each key over SALTS distinct shuffle keys") {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_returnflag")
      // the fact side's derived (key, salt) pairs must cover all salts
      val spread = li
        .withColumn("__salt", pmod(col("l_orderkey"), lit(SkewOps.SALTS)).cast("int"))
        .groupBy("l_returnflag").agg(countDistinct("__salt").as("n_salts"))
        .collect()
      spread.foreach(r =>
        assert(r.getLong(1) == SkewOps.SALTS, s"key ${r.getString(0)} not spread"))
    }
  }

  describe("graft_h60 SQL function") {
    it("matches the driver-side h60Local and the Column h60") {
      graft.functions.CosineSimilarity.register(spark)
      if (!spark.catalog.functionExists("graft_h60")) {
        val d = graft.functions.HashFns.h60Descriptor
        spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
      }
      val v = spark.sql("SELECT graft_h60('abc') AS h").collect().head.getLong(0)
      assert(v == graft.functions.HashFns.h60Local("abc"))
      val viaColumn = spark.range(1).select(
        graft.functions.HashFns.h60(lit("abc")).as("h")).collect().head.getLong(0)
      assert(v == viaColumn)
    }
  }
}
