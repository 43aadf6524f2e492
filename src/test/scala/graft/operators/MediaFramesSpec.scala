package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** Frame sampling from the packed container: byte-exact round-trip
  * against a driver-side re-synthesis, stride coverage, projection plan.
  */
class MediaFramesSpec extends AnyFunSpec with SparkTestBase {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  it("sampled frame fingerprints match a sequential re-synthesis of the container") {
    val rows = Multimodal.qMediaFrames(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, f, fp, firstByte) =>
      val frameHex = md5hex(s"$doc:$f").substring(0, 32)
      val expFp = java.lang.Long.parseLong(md5hex(frameHex).substring(0, 15), 16)
      assert(fp == expFp, s"frame fingerprint mismatch doc=$doc f=$f")
      assert(firstByte == java.lang.Long.parseLong(frameHex.substring(0, 2), 16))
    }
  }

  it("samples every 2nd frame: even indices only, ceil(nf/2) per doc") {
    val byDoc = Multimodal.qMediaFrames(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1)
    byDoc.foreach { case (doc, fs) =>
      val idxs = fs.map(_._2).sorted
      assert(idxs.forall(_ % 2 == 0), s"odd frame sampled for doc $doc")
      val nf = (4 + doc % 5).toInt
      assert(idxs.length == (nf + 1) / 2, s"doc $doc: ${idxs.length} frames for nf=$nf")
      assert(idxs.last == ((nf - 1) / 2) * 2)
    }
  }

  it("slicing stays a per-row projection (one exchange for the output sort only)") {
    val plan = Multimodal.qMediaFrames(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = plan.linesIterator.count(_.matches("^\\(\\d+\\) Exchange.*"))
    assert(exchanges <= 1, s"frame sampling shuffled:\n$plan")
  }
}
