package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

class SourcesSpec extends AnyFunSpec with SparkTestBase {

  describe("CSV / JSONL round-trips") {
    it("CSV preserves integer/string values exactly") {
      withTempDir { dir =>
        val src = spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey", "o_orderstatus")
        Sources.writeCsv(src, s"$dir/o")
        val back = Sources.readCsv(spark, s"$dir/o", src.schema)
        assert(back.count() == src.count())
        assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
      }
    }

    it("JSONL round-trips text with full escaping fidelity") {
      withTempDir { dir =>
        val src = spark.read.parquet(s"$sfDir/documents.parquet")
          .select("doc_id", "text")
        Sources.writeJsonl(src, s"$dir/d")
        val back = Sources.readJsonl(spark, s"$dir/d", src.schema)
        val mismatch = back.alias("b")
          .join(src.alias("s"), col("b.doc_id") === col("s.doc_id"))
          .filter(col("b.text") =!= col("s.text")).count()
        assert(mismatch == 0)
      }
    }

    it("ORC round-trips doubles binary-faithfully and pushes filters to the scan") {
      withTempDir { dir =>
        val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
        Sources.writeOrc(src, s"$dir/li")
        val back = Sources.readOrc(spark, s"$dir/li")
        // exact double equality: ORC must carry the bits, unlike CSV
        assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
        val plan = back.filter(col("l_orderkey") === 42)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
        assert(plan.contains("PushedFilters") && plan.contains("l_orderkey"),
          s"ORC scan did not push the filter:\n$plan")
      }
    }

    it("FAILFAST surfaces corrupt input instead of silently dropping rows") {
      withTempDir { dir =>
        val p = new java.io.File(dir, "bad.json")
        java.nio.file.Files.writeString(p.toPath,
          """{"doc_id": 1, "text": "ok"}
            |{not json at all
            |""".stripMargin)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING")
        val err = intercept[Exception] {
          Sources.readJsonl(spark, p.getAbsolutePath, schema).collect()
        }
        val msg = err.getMessage.toUpperCase
        assert(msg.contains("MALFORMED") || msg.contains("FAILFAST") ||
          msg.contains("FAILED_READ"))
      }
    }

    it("quarantine read splits malformed CSV lines into a dead-letter frame") {
      withTempDir { dir =>
        val p = new java.io.File(dir, "mixed.csv")
        java.nio.file.Files.writeString(p.toPath,
          """id,qty,name
            |1,10,alpha
            |2,notanumber,beta
            |3,30,gamma
            |4,40
            |5,50,epsilon
            |""".stripMargin)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, qty BIGINT, name STRING")
        val (clean, quarantine) = Sources.readCsvQuarantine(spark, p.getAbsolutePath, schema)
        val good = clean.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
        assert(good == Set((1L, 10L, "alpha"), (3L, 30L, "gamma"), (5L, 50L, "epsilon")),
          s"clean rows: $good")
        val bad = quarantine.collect().map(_.getString(0)).toSet
        assert(bad.exists(_.contains("notanumber")), s"quarantine: $bad")
        assert(bad.size == 2, s"expected 2 dead-letter lines, got $bad")
        // nothing silently dropped: every input line is in exactly one channel
        assert(clean.count() + quarantine.count() == 5)
      }
    }
  }

  describe("partitioned writes") {
    it("reads with a partition filter prune to the matching directories") {
      withTempDir { dir =>
        val src = spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        Sources.writePartitioned(src, s"$dir/p", "o_orderstatus")
        val filtered = spark.read.parquet(s"$dir/p")
          .filter(col("o_orderstatus") === "O")
        val plan = filtered.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*o_orderstatus[^\\]]*\\].*"),
          s"partition filter not applied at scan:\n$plan")
        // pruning is real: only the O partition's rows are read
        val expected = src.filter(col("o_orderstatus") === "O").count()
        assert(filtered.count() == expected)
      }
    }
  }

  describe("catalog table (CTAS) lineage") {
    it("saveAsTable is captured as a table output; reading it back as a table input") {
      import graft.lineage._
      val sink = new InMemorySink
      val l = Lineage.installSync(spark, sink)
      try {
        spark.sql("DROP TABLE IF EXISTS graft_ctas_test")
        spark.read.parquet(s"$sfDir/region.parquet")
          .write.format("parquet").saveAsTable("graft_ctas_test")
        assert(eventually()(sink.records.exists(_.output.exists(_.kind == "table"))),
          s"no table-output record: ${sink.records.map(_.output)}")
        val rec = sink.records.find(_.output.exists(_.kind == "table")).get
        assert(rec.output.get.name.contains("graft_ctas_test"))
        sink.clear()
        val n = spark.table("graft_ctas_test").count()
        assert(n > 0)
        assert(eventually()(sink.records.exists(_.inputs.exists(i =>
          i.kind == "table" && i.name.contains("graft_ctas_test")))),
          s"table input not captured: ${sink.records.map(_.inputs)}")
      } finally {
        Lineage.uninstall(spark, l)
        spark.sql("DROP TABLE IF EXISTS graft_ctas_test")
      }
    }
  }
}
