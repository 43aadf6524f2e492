package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

class MultimodalSpec extends AnyFunSpec with SparkTestBase {

  describe("Multimodal decode plumbing") {

    it("decodes every record partition-locally with the declared shape") {
      val media = Multimodal.mediaTable(spark, sfDir)
      val decoded = Multimodal.decodeFeatures(media)
      // partition-preserving: no shuffle may appear between read and decode
      assert(decoded.rdd.getNumPartitions == media.rdd.getNumPartitions)
      val rows = decoded.collect()
      assert(rows.length == media.count())
      rows.foreach { f =>
        assert(f.byte_len > 0)
        assert(f.width >= 16 && f.height >= 16)
        assert(f.n_frames >= 1)
        assert(f.frame_hashes.size == math.min(f.n_frames, 3))
        assert(f.frame_hashes.forall(_.length == 32)) // md5 hex
      }
    }

    it("batched decode produces identical features to per-record decode") {
      val media = Multimodal.mediaTable(spark, sfDir)
      val a = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
      val b = Multimodal.decodeFeaturesBatched(media, batchSize = 7).collect().sortBy(_.doc_id)
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) =>
        assert(x.doc_id == y.doc_id && x.byte_len == y.byte_len &&
          x.frame_hashes == y.frame_hashes)
      }
    }

    it("is deterministic (stub codec is a pure function of the payload)") {
      val a = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
        .collect().sortBy(_.doc_id).take(20)
      val b = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
        .collect().sortBy(_.doc_id).take(20)
      assert(a.map(x => (x.doc_id, x.byte_len, x.width, x.height, x.n_frames, x.frame_hashes)).toSeq ==
        b.map(x => (x.doc_id, x.byte_len, x.width, x.height, x.n_frames, x.frame_hashes)).toSeq)
    }
  }

  describe("binaryFile blob ingest") {

    it("reads a blob-store layout into MediaRecords and decodes identically to the table path") {
      withTempDir { dir =>
        val recs = Multimodal.mediaTable(spark, sfDir).collect().take(24)
        val bySrc = recs.groupBy(_.source)
        bySrc.foreach { case (src, rs) =>
          val d = new java.io.File(dir, src); d.mkdirs()
          rs.foreach { r =>
            java.nio.file.Files.write(
              new java.io.File(d, s"${r.doc_id}.bin").toPath, r.payload)
          }
        }
        val ingested = Multimodal
          .mediaFromBinaryFiles(spark, dir.getAbsolutePath + "/*")
          .collect().sortBy(_.doc_id)
        assert(ingested.length == recs.length)
        val want = recs.sortBy(_.doc_id)
        ingested.zip(want).foreach { case (a, b) =>
          assert(a.doc_id == b.doc_id && a.source == b.source &&
            java.util.Arrays.equals(a.payload, b.payload),
            s"blob mismatch at ${b.doc_id}")
        }
        // decode parity: the stub codec sees identical bytes either way
        val viaBlobs = Multimodal.decodeFeatures(
            Multimodal.mediaFromBinaryFiles(spark, dir.getAbsolutePath + "/*"))
          .collect().sortBy(_.doc_id)
          .map(x => (x.doc_id, x.byte_len, x.width, x.height, x.n_frames, x.frame_hashes))
        val viaTable = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
          .collect().filter(f => want.exists(_.doc_id == f.doc_id)).sortBy(_.doc_id)
          .map(x => (x.doc_id, x.byte_len, x.width, x.height, x.n_frames, x.frame_hashes))
        assert(viaBlobs.toSeq == viaTable.toSeq)
      }
    }

    it("pathGlobFilter prunes to one source at file-listing time") {
      withTempDir { dir =>
        val recs = Multimodal.mediaTable(spark, sfDir).collect().take(24)
        recs.groupBy(_.source).foreach { case (src, rs) =>
          val d = new java.io.File(dir, src); d.mkdirs()
          rs.foreach { r =>
            java.nio.file.Files.write(
              new java.io.File(d, s"${r.doc_id}.bin").toPath, r.payload)
          }
        }
        val src0 = recs.map(_.source).min
        val only = Multimodal.mediaFromBinaryFiles(
            spark, dir.getAbsolutePath + s"/$src0")
          .collect()
        val want = recs.filter(_.source == src0)
        assert(only.length == want.length && only.forall(_.source == src0),
          s"glob pruning leaked: ${only.map(_.source).distinct.toSeq}")
      }
    }
  }

  describe("query smoke (sf0.001)") {
    it("every SparkEntry query executes and the flagship returns rows") {
      assert(graft.SparkEntry.entry(spark).count() > 0)
      // cheap structural smoke: every registered query must at least plan+run
      graft.SparkEntry.queries.foreach { case (name, fn) =>
        val n = fn(spark, sfDir).count()
        assert(n >= 0, s"$name failed")
      }
    }

    it("every query has a matching oracle entry") {
      val q = graft.SparkEntry.queries.keySet
      val o = graft.SparkEntry.oracleSql.keySet
      assert(q == o, s"queries without oracle: ${q -- o}; oracles without query: ${o -- q}")
    }
  }
}
