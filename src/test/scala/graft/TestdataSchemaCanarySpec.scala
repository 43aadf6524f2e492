package graft

import org.apache.spark.sql.types._
import org.scalatest.funspec.AnyFunSpec

/** CANARY: if this spec fails, the driver regenerated /root/testdata with
  * a schema this code has never seen — that is the r8 failure mode (ts
  * flipped BIGINT→TIMESTAMP and 12 queries silently erred). Fix the
  * LOADER (`Tables` / `EventOps.events`), not this spec, unless the new
  * shape is genuinely equivalent; then add it to the accepted set below.
  */
class TestdataSchemaCanarySpec extends AnyFunSpec with SparkTestBase {

  private def schemaOf(t: String): Map[String, DataType] =
    Tables.load(spark, sfDir, t).schema.fields.map(f => f.name -> f.dataType).toMap

  it("events.ts reads as one of the two known shapes (nanos LONG | timestamp)") {
    val ts = schemaOf("events")("ts")
    assert(ts == LongType || ts == TimestampType || ts == TimestampNTZType,
      s"events.ts arrived as $ts — a NEW physical shape. EventOps.events " +
        "branches on LongType vs timestamp types; teach it this shape.")
  }

  it("every table still carries the columns and type families the operators assume") {
    val expect: Map[String, Map[String, Set[DataType]]] = Map(
      "documents" -> Map(
        "doc_id" -> Set(LongType, IntegerType),
        "text" -> Set(StringType),
        "lang" -> Set(StringType),
        "source" -> Set(StringType)),
      "embeddings" -> Map(
        "vec_id" -> Set(LongType, IntegerType),
        "embedding" -> Set(ArrayType(FloatType, true), ArrayType(FloatType, false),
          ArrayType(DoubleType, true), ArrayType(DoubleType, false)),
        "label" -> Set(IntegerType, LongType)),
      "events" -> Map(
        "event_id" -> Set(LongType, IntegerType),
        "user_id" -> Set(LongType, IntegerType),
        "event_type" -> Set(StringType),
        "value" -> Set(DoubleType),
        "props" -> Set(StringType)),
      "orders" -> Map(
        "o_orderkey" -> Set(LongType, IntegerType),
        "o_custkey" -> Set(LongType, IntegerType),
        "o_totalprice" -> Set(DoubleType),
        "o_orderdate" -> Set(TimestampType, TimestampNTZType, DateType),
        "o_orderpriority" -> Set(StringType),
        "o_orderstatus" -> Set(StringType)),
      "lineitem" -> Map(
        "l_orderkey" -> Set(LongType, IntegerType),
        "l_suppkey" -> Set(LongType, IntegerType),
        "l_partkey" -> Set(LongType, IntegerType),
        "l_quantity" -> Set(DoubleType, LongType, IntegerType),
        "l_extendedprice" -> Set(DoubleType),
        "l_returnflag" -> Set(StringType),
        "l_shipdate" -> Set(TimestampType, TimestampNTZType, DateType)),
      "customer" -> Map(
        "c_custkey" -> Set(LongType, IntegerType),
        "c_nationkey" -> Set(LongType, IntegerType),
        "c_mktsegment" -> Set(StringType),
        "c_acctbal" -> Set(DoubleType)))
    val drift = expect.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val got = schemaOf(table)
      cols.toSeq.sortBy(_._1).flatMap { case (c, ok) =>
        got.get(c) match {
          case None => Seq(s"$table.$c MISSING (driver dropped/renamed it)")
          case Some(t) if !ok(t) => Seq(s"$table.$c arrived as $t, expected one of $ok")
          case _ => Nil
        }
      }
    }
    assert(drift.isEmpty,
      "TESTDATA REGENERATED WITH NEW SHAPES — update the loaders:\n" +
        drift.mkString("\n"))
  }
}
