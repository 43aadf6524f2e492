package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

class CosineSimilaritySpec extends AnyFunSpec with SparkTestBase {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  describe("graft_cosine native expression") {

    it("matches the composed zip_with/aggregate column tree bit-for-bit") {
      CosineSimilarity.register(spark)
      val composed = aggregate(zip_with(col("a.emb"), col("b.emb"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v) /
        (sqrt(aggregate(zip_with(col("a.emb"), col("a.emb"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)) *
         sqrt(aggregate(zip_with(col("b.emb"), col("b.emb"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)))
      val joined = emb.limit(50).as("a").crossJoin(emb.limit(50).as("b"))
        .select(expr("graft_cosine(a.emb, b.emb)").as("native"), composed.as("composed"))
        .collect()
      assert(joined.length == 2500)
      joined.foreach { r =>
        assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
          s"native=${r.getDouble(0)} composed=${r.getDouble(1)}")
      }
    }

    it("compiles under CODEGEN_ONLY (no interpreted fallback)") {
      CosineSimilarity.register(spark)
      val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
      try {
        spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        val rows = emb.limit(10).as("a").crossJoin(emb.limit(10).as("b"))
          .select(expr("graft_cosine(a.emb, b.emb)").as("c")).collect()
        assert(rows.length == 100)
        assert(rows.forall(r => !r.isNullAt(0)))
      } finally {
        prev match {
          case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
          case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
        }
      }
    }

    it("returns NULL for zero vectors, NULL inputs and ragged lengths, and errors on bad types") {
      CosineSimilarity.register(spark)
      val r = spark.sql(
        """SELECT graft_cosine(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS zero,
          |       graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS nul,
          |       graft_cosine(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS self,
          |       graft_cosine(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d)) AS ragged,
          |       aggregate(zip_with(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d),
          |                          (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS ragged_composed
          |""".stripMargin).collect().head
      assert(r.isNullAt(0) && r.isNullAt(1))
      assert(r.getDouble(2) == 1.0)
      // zip_with null-pads the shorter vector, so the composed tree is
      // NULL on ragged inputs — the native kernel must agree, not
      // silently truncate to the common prefix
      assert(r.isNullAt(3) && r.isNullAt(4))
      val err = intercept[Exception] {
        spark.sql("SELECT graft_cosine('a', 'b')").collect()
      }
      assert(err.getMessage.contains("graft_cosine") || err.getMessage.contains("DATATYPE"))
    }
  }

  describe("GraftExtensions injection") {
    it("registers the function and installs the lineage listener on a fresh session") {
      val base = spark // ensure shared context exists
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try {
        // `spark.sql.extensions` is a static conf read from the
        // SparkContext at startup, which a second in-JVM builder cannot
        // alter — withExtensions exercises the same injection object the
        // conf path would instantiate.
        val s2 = SparkSession.builder()
          .master("local[4]")
          .withExtensions(new graft.plans.GraftExtensions())
          .config("spark.sql.shuffle.partitions", "4")
          .getOrCreate()
        assert(s2 ne base)
        val v = s2.sql("SELECT graft_cosine(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS c")
          .collect().head.getDouble(0)
        assert(math.abs(v - 1.0) < 1e-12)
        assert(graft.plans.GraftExtensions.listenerFor(s2).isDefined,
          "check-rule install hook did not attach the lineage listener")
      } finally {
        SparkSession.clearActiveSession()
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    }

    it("attaches streaming lineage lazily — only once a streaming plan is analyzed") {
      val base = spark
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try {
        val s2 = SparkSession.builder()
          .master("local[4]")
          .withExtensions(new graft.plans.GraftExtensions())
          .config("spark.sql.shuffle.partitions", "4")
          .getOrCreate()
        s2.range(5).count() // batch work trips the check rule -> batch listener
        val l = graft.plans.GraftExtensions.listenerFor(s2)
          .getOrElse(fail("batch listener not installed"))
        // no streaming plan analyzed yet -> no context-wide bus registration
        assert(!graft.lineage.Lineage.streamingAttached(l),
          "streaming listener attached before any streaming plan")
        import s2.implicits._
        implicit val sqlCtx = s2.sqlContext
        val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
        stream.toDF().select(col("value") + 1) // analyzing a streaming plan trips the lazy attach
        assert(graft.lineage.Lineage.streamingAttached(l),
          "streaming listener not attached after a streaming plan was analyzed")
      } finally {
        SparkSession.clearActiveSession()
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    }

    it("does not pin sessions against GC (weak-keyed install registry)") {
      val before = graft.plans.GraftExtensions.installedCount
      // churn short-lived child sessions the way a Thrift server would;
      // ensureListener is the same path the check-rule hook takes
      var i = 0
      while (i < 8) {
        val child = spark.newSession()
        graft.plans.GraftExtensions.ensureListener(child)
        i += 1
      }
      SparkSession.clearActiveSession()
      val shrunk = eventually(timeoutMs = 20000, intervalMs = 100) {
        System.gc()
        graft.plans.GraftExtensions.installedCount <= before + 1
      }
      assert(shrunk,
        s"weak map retained ${graft.plans.GraftExtensions.installedCount} entries (started at $before)")
    }
  }
}
