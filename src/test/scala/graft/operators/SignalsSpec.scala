package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Collocation lift and event anomaly semantics: independent
  * recomputation through different plan shapes, plus the ranking/count
  * properties the oracle hash alone wouldn't explain.
  */
class SignalsSpec extends AnyFunSpec with SparkTestBase {

  describe("q_text_collocations") {

    it("ranks by lift, honors the min-count floor, and lift is computed correctly") {
      val rows = TextAnalysis.qTextCollocations(spark, sfDir).collect()
      assert(rows.nonEmpty)
      val lifts = rows.map(_.getAs[Double]("lift"))
      assert(lifts.sameElements(lifts.sorted.reverse), "not sorted by lift desc")
      rows.foreach { r =>
        assert(r.getAs[Long]("c_xy") >= TextAnalysis.MIN_PAIR_COUNT)
        // recompute lift from the emitted counts and the corpus totals
        val words = Tables.documents(spark, sfDir)
          .select(split(col("text"), " ").as("w"))
        val nTotal = words.select(explode(expr(
          "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1])) ELSE array() END")).as("b"))
          .count()
        val expected = BigDecimal(nTotal.toDouble * r.getAs[Long]("c_xy").toDouble /
          (r.getAs[Long]("c_x").toDouble * r.getAs[Long]("c_y").toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("lift") - expected) < 1e-9,
          s"lift mismatch for ${r.getAs[String]("bigram")}")
      }
    }

    it("a planted always-adjacent pair out-lifts independent frequent words") {
      import scala.jdk.CollectionConverters._
      // "zig zag" always adjacent (lift = N/c) vs "aa"/"bb" co-occurring rarely
      val texts = Seq.fill(30)("zig zag filler one") ++
        Seq.fill(30)("aa mid bb end") ++ Seq.fill(10)("aa bb tail word")
      val rows = texts.zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(i.toLong, t)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
      val df = spark.createDataFrame(rows.asJava, schema)
      withTempDir { dir =>
        df.write.parquet(s"$dir/documents.parquet")
        val got = TextAnalysis.qTextCollocations(spark, dir.toString).collect()
          .map(r => r.getAs[String]("bigram") -> r.getAs[Double]("lift")).toMap
        assert(got.contains("zig zag"))
        assert(got("zig zag") > got.getOrElse("aa bb", 0.0),
          "always-adjacent pair must out-lift the rare co-occurrence")
      }
    }
  }

  describe("q_text_lm_score") {

    it("scores fluent repetition of common continuations above garbled word salad") {
      import scala.jdk.CollectionConverters._
      // corpus dominated by "the cat sat" patterns; one doc scrambles them
      val fluent = Seq.fill(20)("the cat sat on the mat and the cat sat again")
      val garbled = Seq("mat the on sat again cat the and sat cat the")
      val rows = (fluent ++ garbled).zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(i.toLong, t, "en", "src0", t.length.toLong)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
      withTempDir { dir =>
        spark.createDataFrame(rows.asJava, schema).write.parquet(s"$dir/documents.parquet")
        val got = TextAnalysis.qTextLmScore(spark, dir.toString).collect()
          .map(r => r.getLong(0) -> r.getDouble(2)).toMap
        val fluentScore = got(0L)
        val garbledScore = got(20L)
        assert(fluentScore > garbledScore,
          s"fluent $fluentScore not above garbled $garbledScore")
      }
    }
  }

  describe("q_events_anomaly") {

    it("matches a driver-side z-score recomputation") {
      val got = TextAnalysis.synchronized { // serialize vs other suites' caches
        EventOps.qEventsAnomaly(spark, sfDir).collect()
      }
      assert(got.nonEmpty)
      val raw = Tables.events(spark, sfDir).select("event_type", "value")
        .collect().map(r => r.getString(0) -> r.getDouble(1))
      got.foreach { r =>
        val vs = raw.filter(_._1 == r.getString(0)).map(_._2)
        assert(r.getAs[Long]("n") == vs.length)
        val mean = BigDecimal(vs.sum / vs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val sd = BigDecimal(math.sqrt(
          vs.map(v => (v - vs.sum / vs.length) * (v - vs.sum / vs.length)).sum / (vs.length - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val outliers = vs.count(v => math.abs(v - mean) > sd * 3)
        // mean/sd rounding happens before the threshold in the query too;
        // tolerate the one-ulp band where recomputed sd differs in the 6th dp
        assert(math.abs(r.getAs[Double]("mean_v") - mean) < 2e-6)
        assert(math.abs(r.getAs[Double]("sd_v") - sd) < 2e-6)
        assert(math.abs(r.getAs[Long]("n_outliers") - outliers) <= 1)
      }
    }
  }
}
