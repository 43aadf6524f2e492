package graft.lineage

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-checked end-to-end exercise of the lineage core (§2.1): run a
  * real parquet write with the listener attached, then surface the
  * captured record's deterministic fields as a DataFrame the driver can
  * hash-compare against DuckDB ground truth — `rows_written` must equal
  * `count(*)` of the source table, `columns_read` must be exactly the
  * pruned projection, `write_mode` must be the requested save mode.
  */
object SelfCheck {

  def qLineageSelfcheck(s: SparkSession, dir: String): DataFrame = {
    val sink = new InMemorySink
    val listener = Lineage.installSync(s, sink)
    val out = java.nio.file.Files.createTempDirectory("graft-selfcheck")
    try {
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite").parquet(s"$out/li.parquet")
      // the execution-listener bus is async; bounded wait for the record
      val deadline = System.currentTimeMillis() + 30000
      while (!sink.records.exists(_.output.isDefined) &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      val rec = sink.records.find(_.output.isDefined)
        .getOrElse(sys.error("lineage record never arrived"))
      val input = rec.inputs.headOption
        .getOrElse(sys.error("no input entity captured"))
      val tableName = ".*/([^/]+)\\.parquet$".r
        .findFirstMatchIn(input.name).map(_.group(1)).getOrElse(input.name)
      import s.implicits._
      Seq((
        tableName,
        input.columnsRead.sorted.mkString(","),
        rec.output.get.mode.getOrElse(""),
        rec.output.get.format.getOrElse(""),
        rec.rowsWritten.getOrElse(-1L),
        rec.columnLineage.map(m =>
          s"${m.output}<-${m.sources.map(_.split('.').last).sorted.mkString("+")}")
          .sorted.mkString(";")
      )).toDF("input_table", "columns_read", "write_mode", "format",
        "rows_written", "column_lineage")
    } finally {
      Lineage.uninstall(s, listener)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(out.toFile)
    }
  }

  val oracleLineageSelfcheck: String =
    """SELECT 'lineitem' AS input_table,
      |  'l_orderkey,l_quantity' AS columns_read,
      |  'overwrite' AS write_mode,
      |  'parquet' AS format,
      |  count(*) AS rows_written,
      |  'l_orderkey<-l_orderkey;l_quantity<-l_quantity' AS column_lineage
      |FROM lineitem""".stripMargin
}
