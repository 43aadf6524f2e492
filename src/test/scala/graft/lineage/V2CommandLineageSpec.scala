package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Row-level V2 command lineage: DELETE / UPDATE / MERGE analyzed
  * against a real V2 catalog resolve to output entities with the right
  * operation mode, and MERGE keeps BOTH sides (target + source) as
  * inputs. Plans are analyzed, never executed — the extractor works on
  * the analyzed `LogicalPlan`, which is exactly what the listener sees
  * for these commands regardless of how the table executes them.
  */
class V2CommandLineageSpec extends AnyFunSpec with SparkTestBase {

  private val CAT = "graft_cmdcat"

  private def withV2Catalog[T](f: => T): T = {
    spark.conf.set(s"spark.sql.catalog.$CAT", classOf[TestV2Catalog].getName)
    try f finally spark.conf.unset(s"spark.sql.catalog.$CAT")
  }

  private def analyzed(sql: String) =
    spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(sql)).analyzed

  describe("row-level V2 command lineage") {

    it("extracts DELETE / UPDATE / MERGE targets, modes and inputs") {
      withV2Catalog {
        spark.read.parquet(s"$sfDir/region.parquet")
          .select(col("r_regionkey"), upper(col("r_name")).as("uname"))
          .writeTo(s"$CAT.ns.cmd_t").create()

        val del = analyzed(s"DELETE FROM $CAT.ns.cmd_t WHERE r_regionkey < 2")
        val delOut = PlanExtractor.output(del).get
        assert(delOut.kind == "v2" && delOut.mode.contains("delete"), delOut)
        assert(delOut.name.contains("cmd_t"), delOut.name)
        // the command reads its own target (the condition scans it)
        assert(PlanExtractor.inputs(del).exists(i =>
          i.kind == "v2" && i.name.contains("cmd_t")))

        val upd = analyzed(
          s"UPDATE $CAT.ns.cmd_t SET uname = 'X' WHERE r_regionkey = 1")
        val updOut = PlanExtractor.output(upd).get
        assert(updOut.kind == "v2" && updOut.mode.contains("update"), updOut)
        assert(updOut.name.contains("cmd_t"), updOut.name)

        val mrg = analyzed(
          s"""MERGE INTO $CAT.ns.cmd_t t
             |USING parquet.`$sfDir/region.parquet` s
             |ON t.r_regionkey = s.r_regionkey
             |WHEN MATCHED THEN UPDATE SET uname = upper(s.r_name)
             |WHEN NOT MATCHED THEN
             |  INSERT (r_regionkey, uname) VALUES (s.r_regionkey, upper(s.r_name))
             |""".stripMargin)
        val mrgOut = PlanExtractor.output(mrg).get
        assert(mrgOut.kind == "v2" && mrgOut.mode.contains("merge"), mrgOut)
        assert(mrgOut.name.contains("cmd_t"), mrgOut.name)
        val mrgIn = PlanExtractor.inputs(mrg)
        assert(mrgIn.exists(i => i.kind == "v2" && i.name.contains("cmd_t")),
          s"merge target missing from inputs: $mrgIn")
        assert(mrgIn.exists(i => i.name.contains("region.parquet")),
          s"merge source missing from inputs: $mrgIn")
      }
    }
  }
}
