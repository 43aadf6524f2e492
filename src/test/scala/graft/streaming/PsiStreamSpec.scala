package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Streaming PSI drift monitor off the trained length-decile artifact:
  * artifact sanity (shares sum to 1, cuts monotone), exact batch/stream
  * parity on real documents, the zero closed form (a window replaying
  * the reference distribution scores psi = 0), and a concentrated
  * length flood crossing the drifted threshold.
  */
class PsiStreamSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  it("trains a valid artifact and scores a stream identically to batch") {
    implicit val sql = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
    val (cuts, ref) = StreamOps.trainLengthDeciles(docs)
    assert(cuts.zip(cuts.tail).forall { case (a, b) => a <= b }, s"cuts not monotone: $cuts")
    assert(math.abs(ref.sum - 1.0) < 1e-9, s"ref shares must sum to 1: $ref")
    assert(ref.forall(_ >= 0))

    val probe = docs.select(col("doc_id"), col("text")).limit(100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val staticDf = probe.toSeq.toDF("doc_id", "text")
      .withColumn("ts", lit(ts(100)))
    val batch = StreamOps.psiMonitor(staticDf, cuts, ref).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Double]("psi"),
        r.getAs[Boolean]("drifted")))

    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamOps.psiMonitor(
        stream.toDF().toDF("doc_id", "text", "ts"), cuts, ref)
      .writeStream.format("memory").queryName("psimon_out")
      .outputMode("append").start()
    try {
      stream.addData(probe.toSeq.map { case (id, t) => (id, t, ts(100)) }: _*)
      q.processAllAvailable()
      stream.addData((0L, "late", ts(20000))) // advance watermark, close hour 0
      q.processAllAvailable()
      val streamed = spark.table("psimon_out").collect()
        .map(r => (r.getAs[Long]("n_docs"), r.getAs[Double]("psi"),
          r.getAs[Boolean]("drifted")))
      assert(streamed.toSet == batch.toSet, "stream/batch psi divergence")
    } finally q.stop()
  }

  it("scores zero on a reference replay and drifts on a concentrated flood") {
    // artifact from a tiny corpus with lengths 1..10 → every bin holds
    // exactly one doc, shares are uniform 0.1
    val train = (1 to 10).map(n => (n.toLong, Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val (cuts, ref) = StreamOps.trainLengthDeciles(train)
    assert(ref.forall(s => math.abs(s - 0.1) < 1e-9), s"uniform shares expected: $ref")

    val replay = (1 to 10).map(n =>
        (n.toLong, Seq.fill(n)("w").mkString(" "), ts(100)))
      .toDF("doc_id", "text", "ts")
    val zero = StreamOps.psiMonitor(replay, cuts, ref).collect().head
    assert(zero.getAs[Double]("psi") == 0.0, s"reference replay must score 0: $zero")
    assert(!zero.getAs[Boolean]("drifted"))

    // flood: every doc lands in the top bin → p=(1,0,...,0.9-clamped)
    val flood = (1 to 20).map(i => (i.toLong, Seq.fill(50)("w").mkString(" "), ts(100)))
      .toDF("doc_id", "text", "ts")
    val hot = StreamOps.psiMonitor(flood, cuts, ref).collect().head
    assert(hot.getAs[Boolean]("drifted"),
      s"concentrated flood must drift: $hot")
    // closed form: 9 bins at (eps - 0.1)ln(eps/0.1) + top bin (1 - 0.1)ln(1/0.1)
    val eps = graft.operators.Pipeline.PSI_EPS
    val expect = 9 * (eps - 0.1) * math.log(eps / 0.1) +
      (1.0 - 0.1) * math.log(1.0 / 0.1)
    assert(math.abs(hot.getAs[Double]("psi") - expect) < 1e-6,
      s"flood psi ${hot.getAs[Double]("psi")} vs closed form $expect")
  }
}
