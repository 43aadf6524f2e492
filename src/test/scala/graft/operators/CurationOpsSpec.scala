package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Round-5 curation operators: PII redaction, sequence packing, inverted
  * index. Oracle parity is the driver gate; these specs pin the
  * SEMANTICS (redaction completeness, packing invariants, bounded
  * posting heads) that a hash-compare alone wouldn't explain.
  */
class CurationOpsSpec extends AnyFunSpec with SparkTestBase {

  describe("Privacy.scrub") {
    it("redacts emails, phones and IPs to typed placeholders") {
      import spark.implicits._
      val in = Seq(
        "mail bob.smith_1@sub.example.org now",
        "call 555-123-4567 or 555-000-1111",
        "host 192.168.0.1 and 10.0.0.255",
        "mixed a@b.co 111-222-3333 1.2.3.4",
        "clean text with no pii at all").toDF("t")
      val out = in.select(Privacy.scrub(col("t")).as("c")).as[String].collect()
      assert(out(0) == "mail <EMAIL> now")
      assert(out(1) == "call <PHONE> or <PHONE>")
      assert(out(2) == "host <IP> and <IP>")
      assert(out(3) == "mixed <EMAIL> <PHONE> <IP>")
      assert(out(4) == "clean text with no pii at all")
    }

    it("leaves zero residual PII on the dirty-fixture corpus") {
      val rows = Privacy.qPiiRedact(spark, sfDir).collect()
      assert(rows.length > 0)
      assert(rows.forall(_.getAs[Long]("residual") == 0L), "post-scrub PII survived")
      // the fixture is non-vacuous: every 5th doc carries an email+phone,
      // every 7th an IP
      rows.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        assert(r.getAs[Long]("n_emails") == (if (id % 5 == 0) 1L else 0L), s"doc $id emails")
        assert(r.getAs[Long]("n_phones") == (if (id % 5 == 0) 1L else 0L), s"doc $id phones")
        assert(r.getAs[Long]("n_ips") == (if (id % 7 == 0) 1L else 0L), s"doc $id ips")
      }
    }
  }

  describe("Privacy.qKAnonymity") {
    it("generalization monotonically improves every risk metric") {
      val rows = Privacy.qKAnonymity(spark, sfDir).collect()
        .map(r => r.getAs[Int]("gen_level") -> r).toMap
      assert(rows.keySet == Set(0, 1))
      val (fine, coarse) = (rows(0), rows(1))
      // level-1 bands (width 2000) are exact unions of level-0 bands
      // (width 100), so every coarse group is a union of fine groups:
      // group count shrinks, min size and diversity can only rise
      assert(coarse.getAs[Long]("n_groups") < fine.getAs[Long]("n_groups"))
      assert(coarse.getAs[Long]("min_group_size") >= fine.getAs[Long]("min_group_size"))
      assert(coarse.getAs[Long]("n_unsafe_groups") <= fine.getAs[Long]("n_unsafe_groups"))
      assert(coarse.getAs[Double]("risky_frac") <= fine.getAs[Double]("risky_frac"))
      assert(coarse.getAs[Long]("min_l") >= fine.getAs[Long]("min_l"))
      // the audit is non-vacuous at this SF: fine bands leave unsafe groups
      assert(fine.getAs[Long]("n_unsafe_groups") > 0L)
      assert(fine.getAs[Long]("risky_rows") >= fine.getAs[Long]("n_unsafe_groups"))
    }
  }

  describe("Pipeline.qPackSequences") {
    it("packs every document exactly once into contiguous zero-based bins per shard") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
      val bins = Pipeline.qPackSequences(spark, sfDir).collect()
      assert(bins.map(_.getAs[Long]("n_docs")).sum == docs, "packing dropped or duplicated docs")
      // per (source, shard): bins are 0..max with no gaps (concatenate-
      // and-chunk cannot skip a window), and every bin holds tokens
      bins.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("shard"))).foreach {
        case ((src, sh), rs) =>
          val ids = rs.map(_.getAs[Long]("bin")).sorted
          assert(ids.head == 0L, s"$src/$sh first bin ${ids.head}")
          assert(ids.toSeq == (0L until ids.length).toSeq, s"$src/$sh gap in bins: ${ids.toSeq}")
      }
      assert(bins.forall(_.getAs[Long]("bin_tokens") > 0L))
    }

    it("matches a sequential concatenate-and-chunk replay (docs assigned by start offset)") {
      val toks = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("source"),
          pmod(col("doc_id"), lit(4)).as("shard"),
          size(split(col("text"), " ")).cast("long").as("n"))
        .filter(col("shard") === 0)
        .collect()
      val expected = scala.collection.mutable.Map.empty[(String, Long), Long].withDefaultValue(0L)
      toks.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
        var cum = 0L
        rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
          expected((src, cum / Pipeline.PACK_BUDGET)) += 1
          cum += r.getAs[Long]("n")
        }
      }
      val actual = Pipeline.qPackSequences(spark, sfDir)
        .filter(col("shard") === 0).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin")) -> r.getAs[Long]("n_docs"))
        .toMap
      assert(actual == expected.toMap, "window-cumsum packing diverged from the sequential replay")
    }
  }

  describe("TextAnalysis.qTfidfTop") {
    it("emits at most 3 ranked distinctive terms per doc with score = tf/df") {
      val rows = TextAnalysis.qTfidfTop(spark, sfDir).collect()
      assert(rows.nonEmpty)
      rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
        val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
        assert(ranks == (1L to ranks.length), s"doc $doc ranks $ranks")
        assert(ranks.length <= 3)
        // scores are non-increasing with rank and equal tf/df
        val byRank = rs.sortBy(_.getAs[Long]("rank"))
        byRank.sliding(2).foreach {
          case Array(hi, lo) =>
            assert(hi.getAs[Double]("score") >= lo.getAs[Double]("score"), s"doc $doc")
          case _ =>
        }
        byRank.foreach { r =>
          val expect = BigDecimal(r.getAs[Long]("tf").toDouble / r.getAs[Long]("df"))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(r.getAs[Double]("score") - expect) < 1e-9)
        }
      }
    }
  }

  describe("TextAnalysis.qInvertedIndex") {
    it("returns the vocabulary head with bounded posting lists") {
      val rows = TextAnalysis.qInvertedIndex(spark, sfDir).collect()
      assert(rows.length == 20)
      // df is sorted descending with term tiebreak
      val dfs = rows.map(_.getAs[Long]("df")).toSeq
      assert(dfs == dfs.sorted.reverse, s"df not descending: $dfs")
      rows.foreach { r =>
        val head = r.getAs[String]("postings_head").split(",")
        assert(head.length <= 5, s"posting head too long for ${r.getAs[String]("term")}")
        val ids = head.map(_.toLong).toSeq
        assert(ids == ids.sorted, "posting head not sorted")
        assert(r.getAs[Long]("tf_total") >= r.getAs[Long]("df"))
      }
    }
  }

  describe("Pipeline.qSampleImportance") {
    // sf0.01 (500 docs) so sampling noise is small enough to assert on
    val sf01 = "/root/testdata/sf0.01"

    it("realized acceptance tracks the mean quality per corpus") {
      val rows = Pipeline.qSampleImportance(spark, sf01).collect()
      assert(rows.nonEmpty)
      val total = rows.map(_.getAs[Long]("n_total")).sum
      val kept = rows.map(_.getAs[Long]("n_kept")).sum
      val expected = rows.map(r =>
        r.getAs[Double]("expected_pct") * r.getAs[Long]("n_total")).sum / total
      val realized = kept * 100.0 / total
      assert(math.abs(realized - expected) < 10.0,
        s"realized $realized far from expected $expected")
    }

    it("acceptance is monotone in quality (above-median kept more often)") {
      val quality = Pipeline.qualityScore
      val kept = (graft.functions.HashFns.h60(
        concat_ws(":", lit("imp"), col("doc_id"))) % 10000 <
        floor(quality * 10000)).cast("double")
      val scored = graft.Tables.documents(spark, sf01)
        .select(quality.as("q"), kept.as("k"))
      val med = scored.stat.approxQuantile("q", Array(0.5), 0.001).head
      val rates = scored
        .groupBy((col("q") >= med).as("hi"))
        .agg(avg("k").as("rate"))
        .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
      assert(rates(true) > rates(false),
        s"high-quality rate ${rates(true)} not above low-quality ${rates(false)}")
    }
  }
}
