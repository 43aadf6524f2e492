package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funspec.AnyFunSpec

/** The Avro round-trip (§2.6b's last unchecked item) built on the Avro
  * core + avro-mapred jars that DO ship in `/opt/spark/jars` — the
  * `spark-avro` datasource module does not, so [[AvroIO]] drives the
  * public `org.apache.avro.mapreduce` formats through Spark's Hadoop-file
  * APIs (task-commit on write, sync-marker splitting on read).
  */
class AvroRoundTripSpec extends AnyFunSpec with SparkTestBase {

  describe("AvroIO") {
    it("round-trips lineitem (long/string/double/timestamp) value-exactly") {
      withTempDir { dir =>
        val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_shipdate")
        AvroIO.writeAvro(src, s"$dir/li")
        val back = AvroIO.readAvro(spark, s"$dir/li", src.schema)
        assert(back.count() == src.count())
        // exceptAll both ways = multiset equality, bit-exact doubles included
        assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
      }
    }

    it("round-trips embeddings (array<float> + int) exactly") {
      withTempDir { dir =>
        val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
        AvroIO.writeAvro(src, s"$dir/emb")
        val back = AvroIO.readAvro(spark, s"$dir/emb", src.schema)
        assert(back.count() == src.count())
        assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
      }
    }

    it("carries nulls, booleans, binary and dates through the union codec") {
      withTempDir { dir =>
        val schema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("flag", BooleanType, nullable = true),
          StructField("blob", BinaryType, nullable = true),
          StructField("day", DateType, nullable = true),
          StructField("tags", ArrayType(StringType, containsNull = true), nullable = true)))
        val rows = Seq(
          Row(1L, true, Array[Byte](1, 2, -3), java.sql.Date.valueOf("2026-01-31"), Seq("a", null, "c")),
          Row(2L, null, null, null, null),
          Row(3L, false, Array.empty[Byte], java.sql.Date.valueOf("1969-12-31"), Seq.empty[String]))
        val src = spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          schema)
        AvroIO.writeAvro(src, s"$dir/mix")
        val back = AvroIO.readAvro(spark, s"$dir/mix", schema)
        assert(back.count() == 3)
        assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
      }
    }

    it("reads back through Avro schema resolution when the reader prunes columns") {
      withTempDir { dir =>
        val src = spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        AvroIO.writeAvro(src, s"$dir/o")
        // reader schema = a by-name subset → Avro's resolution drops the rest
        val pruned = StructType(Seq(
          StructField("o_orderkey", LongType, nullable = true),
          StructField("o_orderstatus", StringType, nullable = true)))
        val back = AvroIO.readAvro(spark, s"$dir/o", pruned)
        val want = src.select("o_orderkey", "o_orderstatus")
        assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty)
      }
    }

    it("timestamps survive as exact epoch-micros (timestamp-micros encoding)") {
      withTempDir { dir =>
        val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_orderkey", "l_shipdate")
        AvroIO.writeAvro(src, s"$dir/ts")
        val back = AvroIO.readAvro(spark, s"$dir/ts", src.schema)
        val a = src.agg(sum(unix_micros(col("l_shipdate").cast("timestamp")))).head.getLong(0)
        val b = back.agg(sum(unix_micros(col("l_shipdate").cast("timestamp")))).head.getLong(0)
        assert(a == b)
      }
    }
  }
}
