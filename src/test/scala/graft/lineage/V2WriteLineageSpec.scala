package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Drives the four V2 write plans a lakehouse-format table hits —
  * AppendData, OverwriteByExpression, CreateTableAsSelect,
  * ReplaceTableAsSelect — through a real V2 catalog, asserting the
  * extractor's output entity (kind/name/mode) and that inputs + column
  * lineage still resolve through the V2 command's query.
  */
class V2WriteLineageSpec extends AnyFunSpec with SparkTestBase {

  private val CAT = "graft_testcat"

  private def withV2Catalog[T](f: => T): T = {
    spark.conf.set(s"spark.sql.catalog.$CAT", classOf[TestV2Catalog].getName)
    try f finally spark.conf.unset(s"spark.sql.catalog.$CAT")
  }

  private def src = spark.read.parquet(s"$sfDir/region.parquet")
    .select(col("r_regionkey"), upper(col("r_name")).as("uname"))

  describe("V2 write lineage") {

    it("captures CTAS-v2, append, overwrite and replace output entities") {
      withV2Catalog {
        val sink = new InMemorySink
        val l = Lineage.installSync(spark, sink)
        try {
          def recFor(mode: String): LineageRecord = {
            assert(eventually()(sink.records.exists(r =>
              r.output.exists(o => o.kind == "v2" && o.mode.contains(mode)))),
              s"no v2 $mode record: ${sink.records.flatMap(_.output)}")
            sink.records.find(_.output.exists(o =>
              o.kind == "v2" && o.mode.contains(mode))).get
          }

          src.writeTo(s"$CAT.ns.t1").create()
          val created = recFor("create")
          assert(created.output.get.name.contains("t1"), created.output.get.name)
          assert(created.inputs.exists(_.name.contains("region.parquet")),
            "CTAS-v2 must keep the source scan as an input")
          // column lineage resolves through the V2 command's query
          val lin = created.columnLineage.map(m => m.output -> m.sources.toSet).toMap
          assert(lin("uname").exists(_.endsWith(".r_name")), lin.toString)

          src.writeTo(s"$CAT.ns.t1").append()
          val appended = recFor("append")
          assert(appended.output.get.name.contains("t1"))
          assert(appended.inputs.exists(_.name.contains("region.parquet")))

          src.writeTo(s"$CAT.ns.t1").overwrite(lit(true))
          val overwritten = recFor("overwrite")
          assert(overwritten.output.get.name.contains("t1"))

          src.writeTo(s"$CAT.ns.t1").createOrReplace()
          val replaced = recFor("replace")
          assert(replaced.output.get.name.contains("t1"))
        } finally Lineage.uninstall(spark, l)
      }
    }
  }
}
