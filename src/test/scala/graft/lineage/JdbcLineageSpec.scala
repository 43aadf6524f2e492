package graft.lineage

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** JDBC input-entity naming, end-to-end against an embedded in-memory
  * Derby database (the one JDBC driver shipped in /opt/spark/jars):
  * a `spark.read.jdbc` relation must surface as a stable,
  * CREDENTIAL-FREE `jdbc` entity — scheme/host/db path plus table,
  * never the url's user/password attributes.
  */
class JdbcLineageSpec extends AnyFunSpec with SparkTestBase {

  describe("JDBC input naming") {

    it("names a Derby relation url!table with credentials scrubbed") {
      val plainUrl = "jdbc:derby:memory:graftjdbc;create=true"
      val conn = java.sql.DriverManager.getConnection(plainUrl)
      try {
        conn.createStatement().execute(
          "CREATE TABLE things(id INT, name VARCHAR(16))")
        conn.createStatement().execute(
          "INSERT INTO things VALUES (1, 'alpha'), (2, 'beta')")
      } finally conn.close()

      // read back with derby-style credential attributes on the url —
      // the entity name must not carry them
      val df = spark.read.format("jdbc")
        .option("url", "jdbc:derby:memory:graftjdbc;user=alice;password=sekrit")
        .option("dbtable", "APP.things") // created under the APP schema;
        // the credentialed session's default schema is ALICE
        .load()
      val inputs = PlanExtractor.inputs(df.queryExecution.analyzed)
      assert(inputs.exists(i => i.kind == "jdbc" &&
        i.name == "jdbc:derby:memory:graftjdbc!APP.things"), inputs.toString)
      assert(!inputs.exists(i => i.name.contains("sekrit") ||
        i.name.contains("alice")), s"credentials leaked: $inputs")
      // the relation actually reads (sanity that this is a live JDBC path)
      assert(df.count() == 2)
    }

    it("scrubs query-string and userinfo credential styles too") {
      assert(PlanExtractor.scrubJdbcUrl(
        "jdbc:mysql://db.example.com:3306/sales?user=u&password=p") ==
        "jdbc:mysql://db.example.com:3306/sales")
      assert(PlanExtractor.scrubJdbcUrl(
        "jdbc:postgresql://u:p@db.example.com/sales") ==
        "jdbc:postgresql://db.example.com/sales")
      assert(PlanExtractor.scrubJdbcUrl(
        "jdbc:derby:memory:graftjdbc;user=u;password=p") ==
        "jdbc:derby:memory:graftjdbc")
    }
  }
}
