package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** The record's "what did this job DO?" field (r12 VERDICT missing #1):
  * SQL text when the plan came from `spark.sql(...)`, an analyzed-plan
  * excerpt otherwise — sanitized, capped, JSONL-round-tripped, and
  * surfaced by [[LineageDiff]] on plan changes.
  */
class QueryTextSpec extends AnyFunSpec with SparkTestBase {

  describe("queryText on the lineage record") {

    it("records the original SQL for spark.sql() actions") {
      val sink = new InMemorySink
      val l = Lineage.installSync(spark, sink)
      try {
        val sql = "SELECT o_orderpriority, count(*) AS n FROM " +
          s"parquet.`$sfDir/orders.parquet` GROUP BY o_orderpriority"
        spark.sql(sql).collect()
        assert(eventually()(sink.records.exists(_.queryText.exists(_.startsWith("sql: ")))),
          "no SQL-texted record arrived")
        val rec = sink.records.find(_.queryText.exists(_.startsWith("sql: "))).get
        assert(rec.queryText.get.contains("o_orderpriority"),
          s"SQL text lost: ${rec.queryText}")
        assert(rec.queryText.get.contains("GROUP BY"))
      } finally Lineage.uninstall(spark, l)
    }

    it("records an analyzed-plan excerpt for DataFrame actions, naming the operators") {
      val sink = new InMemorySink
      val l = Lineage.installSync(spark, sink)
      try {
        spark.read.parquet(s"$sfDir/nation.parquet")
          .filter(col("n_regionkey") === 0).select("n_name").collect()
        // the plan string names operators and columns (the input PATHS are
        // already structured fields on the record — Relation doesn't print
        // its location)
        assert(eventually()(sink.records.exists(_.queryText.exists(t =>
          t.startsWith("plan: ") && t.contains("n_regionkey") && t.contains("Filter")))),
          s"no plan-texted record arrived: ${sink.records.flatMap(_.queryText)}")
      } finally Lineage.uninstall(spark, l)
    }

    it("masks credential-shaped pairs and honors the session redaction regex") {
      // built-in credential mask, no session conf needed
      val masked = LineageListener.queryText(spark,
        spark.sql("SELECT 'jdbc:pg://h/db?user=u&password=hunter2' AS dsn")
          .queryExecution.analyzed)
      assert(masked.exists(_.contains("password=*REDACTED*")), masked)
      assert(masked.forall(!_.contains("hunter2")), masked)
      // session redaction regex composes on top
      spark.conf.set("spark.sql.redaction.string.regex", "acct-\\d+")
      try {
        val t = LineageListener.queryText(spark,
          spark.sql("SELECT 'acct-12345' AS a").queryExecution.analyzed)
        assert(t.exists(_.contains("*REDACTED*")), t)
        assert(t.forall(!_.contains("acct-12345")), t)
      } finally spark.conf.unset("spark.sql.redaction.string.regex")
    }

    it("hard-caps the text with an explicit truncation marker") {
      // a giant hand-written SQL: Origin.sqlText carries it verbatim
      // (Spark's own plan-string truncation doesn't apply to SQL text)
      val giant = "SELECT " + (0 until 900).map(i => s"$i AS c$i").mkString(", ")
      val t = LineageListener.queryText(spark,
        spark.sql(giant).queryExecution.analyzed).get
      assert(t.length <= LineageListener.QUERY_TEXT_MAX + 20, s"len=${t.length}")
      assert(t.endsWith("...[truncated]"), t.takeRight(40))
    }

    it("round-trips through the JSONL catalog and is retrievable by a catalog query") {
      val sink = new InMemorySink
      val l = Lineage.installSync(spark, sink)
      withTempDir { dir =>
        try {
          spark.sql(s"SELECT max(n_nationkey) AS mx FROM parquet.`$sfDir/nation.parquet`")
            .collect()
          assert(eventually()(sink.records.exists(_.queryText.exists(_.startsWith("sql: ")))))
        } finally Lineage.uninstall(spark, l)
        val rec = sink.records.find(_.queryText.exists(_.startsWith("sql: "))).get
        val path = s"${dir.getAbsolutePath}/catalog.jsonl"
        val jsonl = new JsonlFileSink(path)
        jsonl.emit(rec); jsonl.close()
        // Seq-shaped reload preserves the field exactly
        val reloaded = LineageCatalog.load(spark, path)
        assert(reloaded.size == 1)
        assert(reloaded.head.queryText == rec.queryText)
        // and the DataFrame-shaped catalog can query it directly
        val hits = LineageCatalog.loadDf(spark, path)
          .filter(col("queryText").contains("max(n_nationkey)"))
          .count()
        assert(hits == 1L)
      }
    }

    it("LineageDiff surfaces both runs' query text on a plan change") {
      def rec(fp: String, text: String) = LineageRecord(
        appId = "a", appName = "n", user = "u", funcName = "save",
        status = "success", error = None, durationNs = 1L, timestampMs = 1L,
        inputs = Nil,
        output = Some(OutputEntity("path", "/t/out", None, None)),
        outputColumns = Seq("x"), columnLineage = Nil,
        schemaFingerprint = "f", rowsWritten = None,
        planFingerprint = fp, queryText = Some(text))
      val findings = LineageDiff.compareRuns(
        rec("fp1", "sql: SELECT a FROM t WHERE d > 1"),
        rec("fp2", "sql: SELECT a FROM t WHERE d > 2"))
      val pc = findings.filter(_.kind == "plan-changed")
      assert(pc.size == 1, findings.toString)
      assert(pc.head.detail.contains("WHERE d > 1"), pc.head.detail)
      assert(pc.head.detail.contains("WHERE d > 2"), pc.head.detail)
    }
  }
}
