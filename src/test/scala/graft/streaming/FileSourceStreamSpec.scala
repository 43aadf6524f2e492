package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funspec.AnyFunSpec

/** The one production streaming source testable offline: a WATCHED
  * DIRECTORY of parquet files (`readStream.format("parquet")`). Every
  * other streaming spec drives MemoryStream; this proves `curateStream`
  * end-to-end off real files — discovery of files landing in the
  * directory, exactly-once delivery across a checkpoint restart (file
  * offsets AND dedup state live in the checkpoint), and batch parity of
  * the curated output over the union of all landed files.
  *
  * Corpus rows come from the real documents table (real text through the
  * quality gate), with a planted cross-restart duplicate and a planted
  * low-quality doc.
  */
class FileSourceStreamSpec extends AnyFunSpec with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  it("curateStream runs off a watched parquet directory through a checkpoint restart") {
    withTempDir { dir =>
      val inDir = s"$dir/in"; val ckpt = s"$dir/ckpt"; val outDir = s"$dir/out"
      new java.io.File(inDir).mkdirs()

      // real corpus text, a deterministic ts per doc
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id").limit(40)
        .withColumn("ts", timestamp_seconds(lit(1000000) + col("doc_id")))
        .cache()
      val firstText = docs.orderBy("doc_id").select("text").head().getString(0)

      val sliceA = docs.filter(col("doc_id") < 20)
      // slice B lands AFTER the restart: new docs, a re-arrival of slice
      // A's first text under a fresh id (must be deduped by state that
      // SURVIVED the restart), and a junk doc for the quality gate
      val sliceB = docs.filter(col("doc_id") >= 20)
        .unionByName(spark.range(1).select(
          lit(900L).as("doc_id"), lit(firstText).as("text"),
          timestamp_seconds(lit(1000500)).as("ts")))
        .unionByName(spark.range(1).select(
          lit(901L).as("doc_id"), lit("zz").as("text"),
          timestamp_seconds(lit(1000501)).as("ts")))

      def start() = spark.readStream.schema(schema).parquet(inDir)
        .transform(StreamOps.curateStream(_))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .outputMode("append")
        .start()

      sliceA.write.mode("append").parquet(inDir)
      val q1 = start()
      q1.processAllAvailable()
      q1.stop()
      val afterA = spark.read.parquet(outDir).count()
      assert(afterA > 0, "no curated rows from the first slice of files")

      sliceB.write.mode("append").parquet(inDir)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      val streamed = spark.read.parquet(outDir)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("quality"), r.getAs[String]("split"))).toMap

      // batch parity over the union of everything that landed: quality
      // gate, FIRST-arrival exact dedup (ts order), identical split rule
      val all: DataFrame = sliceA.unionByName(sliceB)
      val expected = all
        .select(col("doc_id"), col("ts"),
          graft.operators.Pipeline.qualityScore.as("quality"),
          md5(col("text")).as("h"),
          graft.operators.Pipeline.splitCol.as("split"))
        .filter(col("quality") >= graft.operators.Pipeline.QUALITY_T)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("h").orderBy("ts", "doc_id")))
        .filter(col("rn") === 1)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("quality"), r.getAs[String]("split"))).toMap

      assert(streamed.keySet == expected.keySet,
        s"stream-only: ${streamed.keySet -- expected.keySet}; " +
          s"missing: ${expected.keySet -- streamed.keySet}")
      assert(streamed == expected, "quality/split values diverged from batch")
      // the cross-restart duplicate was suppressed by checkpointed state
      assert(!streamed.contains(900L), "restart lost the dedup state")
      // the junk doc was gated
      assert(!streamed.contains(901L), "quality gate failed on the stream")
      // exactly-once: slice-A rows were not re-emitted by the restart
      assert(spark.read.parquet(outDir).groupBy("doc_id").count()
        .filter(col("count") > 1).isEmpty, "restart duplicated output rows")
      docs.unpersist()
    }
  }
}
