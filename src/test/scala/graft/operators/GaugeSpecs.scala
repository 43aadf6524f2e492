package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Semantics behind the r6 gauge/monitor queries that the oracle hash
  * alone would not explain: drift flags fire exactly on shifted
  * distributions, theta estimates are exact below retention, KLL merges
  * cover every month, and the embedding profile partitions the corpus.
  */
class GaugeSpecs extends AnyFunSpec with SparkTestBase {

  describe("q_corpus_drift") {

    it("flags an injected length-shifted source and not a resampled one") {
      import scala.jdk.CollectionConverters._
      // uniform base: word counts 40..60; shifted source: 10x longer
      def doc(id: Long, src: String, words: Int) =
        org.apache.spark.sql.Row(id, Seq.fill(words)("w").mkString(" "), "en", src, words.toLong)
      // shifted stays a SMALL minority (~5%) so the global quantiles
      // remain those of the base distribution — a dominant new source
      // legitimately drags every OTHER source into drift
      val rows =
        (0L until 200L).map(i => doc(i, s"base${i % 4}", 40 + (i % 21).toInt)) ++
          (200L until 210L).map(i => doc(i, "shifted", 400 + (i % 21).toInt))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
      withTempDir { dir =>
        spark.createDataFrame(rows.asJava, schema).write.parquet(s"$dir/documents.parquet")
        val got = Pipeline.qCorpusDrift(spark, dir.toString).collect()
          .map(r => r.getString(0) -> r.getBoolean(5)).toMap
        assert(got("shifted"), "10x length shift not flagged")
        // the base sources share one distribution; none should drift
        got.filter(_._1.startsWith("base")).foreach { case (s, d) =>
          assert(!d, s"uniform source $s falsely flagged")
        }
      }
    }
  }

  describe("q_theta_sets") {

    it("theta estimates are exact below the sketch's retention threshold") {
      // customer key domain << 2^12 entries, so estimates must be EXACT
      val r = Relational.qThetaSets(spark, sfDir).collect().head
      assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5))
      val est = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "O")
        .agg(expr("theta_sketch_agg(o_custkey)").as("sko"))
        .crossJoin(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
          .agg(expr("theta_sketch_agg(o_custkey)").as("skf")))
        .select(
          expr("theta_sketch_estimate(theta_intersection(sko, skf))"),
          expr("theta_sketch_estimate(theta_union(sko, skf))"))
        .collect().head
      assert(est.getLong(0) == r.getLong(0), "intersection not exact")
      assert(est.getLong(1) == r.getLong(2), "union not exact")
    }
  }

  describe("q_quantile_merge") {

    it("merges one sketch per month and lands inside the tolerance") {
      val rows = Relational.qQuantileMerge(spark, sfDir).collect()
      assert(rows.nonEmpty)
      val months = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), month(col("l_shipdate")).as("m")).distinct()
        .groupBy("l_returnflag").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.foreach { r =>
        assert(r.getBoolean(4), s"KLL merged quantiles out of tolerance: $r")
        assert(r.getLong(3) == months(r.getString(0)),
          "sketch count != month count — a partition was skipped")
      }
    }
  }

  describe("q_embedding_profile") {

    it("partitions the corpus, pins the dimension, and orders the norm stats") {
      val rows = Similarity.qEmbeddingProfile(spark, sfDir).collect()
      val total = Tables.embeddings(spark, sfDir).count()
      assert(rows.map(_.getAs[Long]("n")).sum == total)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_zero") == 0L, "zero vector in the fixture corpus")
        assert(r.getAs[Long]("n_dims") == 1L && r.getAs[Int]("dim") == 64)
        val (mn, mean, mx) = (r.getAs[Double]("norm_min"),
          r.getAs[Double]("norm_mean"), r.getAs[Double]("norm_max"))
        assert(mn <= mean && mean <= mx)
      }
    }
  }
}
