package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Perceptual-hash near-dup (`q_media_phash`) and the Zipf rank-frequency
  * fit (`q_zipf_fit`): banding recall guarantees, brute-force consistency,
  * and the slope on a constructed power law.
  */
class PhashZipfSpec extends AnyFunSpec with SparkTestBase {

  import spark.implicits._

  describe("q_media_phash (phashPairs)") {

    it("identical payloads pair at hamming 0; disjoint payloads stay apart") {
      val t1 = (1 to 60).map(i => s"w$i").mkString(" ")
      val t2 = (1 to 60).map(i => s"z${i * 7}").mkString(" ")
      val docs = Seq((1L, t1), (2L, t1), (3L, t2)).toDF("doc_id", "text")
      val pairs = Multimodal.phashPairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(pairs.get((1L, 2L)).contains(0L), s"identical docs must pair at 0: $pairs")
    }

    it("reported pairs equal the banded-candidate brute force (and cover ham <= bands-1)") {
      val docs = graft.Tables.documents(spark, sfDir)
      val h = docs.filter(length(col("text")) >= 2)
        .select(col("doc_id"), Multimodal.dhash(col("text")).as("dh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      // driver-side reference: same banding, same verify
      def bands(dh: Long) = (0 until Multimodal.PH_BANDS)
        .map(b => (b, (dh >>> (b * 14)) & 16383L))
      val expect = (for {
        (a, da) <- h; (b, db) <- h if a < b
        if bands(da).intersect(bands(db)).nonEmpty
        ham = java.lang.Long.bitCount(da ^ db)
        if ham <= Multimodal.PH_T
      } yield (a, b, ham.toLong)).toSet
      val got = Multimodal.phashPairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"banded pairs diverge: got ${got.size}, expect ${expect.size}")
      // pigeonhole: every pair within bands-1 bits MUST be reported
      val guaranteed = (for {
        (a, da) <- h; (b, db) <- h if a < b
        ham = java.lang.Long.bitCount(da ^ db)
        if ham <= Multimodal.PH_BANDS - 1
      } yield (a, b, ham.toLong)).toSet
      assert(guaranteed.subsetOf(got))
      // hashes stay inside the 56-bit range
      assert(h.forall { case (_, dh) => dh >= 0L && dh < (1L << 56) })
    }
  }

  describe("q_media_thumbnail") {

    it("is deterministic with sane luma bounds over the corpus") {
      val a = Multimodal.qMediaThumbnail(spark, sfDir).collect()
      val b = Multimodal.qMediaThumbnail(spark, sfDir).collect()
      assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "thumbnail not deterministic")
      assert(a.nonEmpty)
      a.foreach { r =>
        val (fp, mean, mn, mx) =
          (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))
        assert(mn <= mx && mean >= mn && mean <= mx, r.toString)
        assert(mn >= 0 && mx <= 255, s"luma outside byte range: $r")
        assert(fp > 0)
      }
      // the grid actually discriminates payloads: fingerprints are not all equal
      assert(a.map(_.getLong(1)).distinct.length > 1)
    }
  }

  describe("q_zipf_fit (zipfFitOf)") {

    it("recovers slope ~ -1 with high r2 on a constructed Zipf corpus") {
      // word r appears floor(2000/r) times, r = 1..40 — a clean power law
      val text = (1 to 40).flatMap(r => Seq.fill(2000 / r)(s"zipf$r")).mkString(" ")
      val row = TextAnalysis.zipfFitOf(Seq((1L, text)).toDF("doc_id", "text"))
        .collect().head
      val (n, slope, r2) = (row.getLong(0), row.getDouble(1), row.getDouble(3))
      assert(n == 40)
      assert(slope > -1.1 && slope < -0.9, s"slope=$slope not ~ -1")
      assert(r2 > 0.98, s"r2=$r2 not a clean power law")
    }

    it("a flat (template-flooded) corpus scores slope ~ 0") {
      val text = (1 to 40).flatMap(r => Seq.fill(50)(s"flat$r")).mkString(" ")
      val row = TextAnalysis.zipfFitOf(Seq((1L, text)).toDF("doc_id", "text"))
        .collect().head
      assert(math.abs(row.getDouble(1)) < 1e-9, s"flat corpus slope=${row.getDouble(1)}")
    }
  }
}
