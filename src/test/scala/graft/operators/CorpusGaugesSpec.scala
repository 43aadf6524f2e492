package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Round-11 corpus/warehouse gauges (q_value_share, q_lapsed_balance,
  * q_reident_risk, q_vocab_coverage, q_prefix_dup, q_neg_sampling,
  * q_corpus_diversity): each pinned by an invariant recomputed through an
  * independent path (plain aggregates or a driver-side fold), never by
  * replaying the query's own plan; the DuckDB oracle re-checks
  * cross-engine at sf0.01.
  */
class CorpusGaugesSpec extends AnyFunSpec with SparkTestBase {

  describe("q_value_share") {
    lazy val rows = Relational.qValueShare(spark, sfDir).collect()

    lazy val totalCents = Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long").as("c"))
      .agg(sum("c")).head.getLong(0)

    lazy val nParts = Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().count()

    it("admits exactly the parts whose value exceeds 1.5x the mean part") {
      assert(rows.nonEmpty, "vacuous: no important parts")
      rows.foreach { r =>
        val partCents = math.round(r.getDouble(1) * 100)
        assert(BigInt(partCents) * nParts * 2 > BigInt(totalCents) * 3,
          s"part ${r.getLong(0)} below threshold")
      }
    }

    it("orders by part value descending and shares stay in (0, 1]") {
      val vals = rows.map(_.getDouble(1))
      assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
      rows.foreach { r =>
        val share = r.getDouble(2)
        assert(share > 0 && share <= 1.0)
      }
    }

    it("no excluded part beats the smallest admitted one") {
      val admitted = rows.map(_.getLong(0)).toSet
      val floor = rows.map(r => math.round(r.getDouble(1) * 100)).min
      val cents = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
      val excludedRow = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), cents.as("c"))
        .groupBy("l_partkey").agg(sum("c").as("pc"))
        .filter(!col("l_partkey").isin(admitted.toSeq: _*))
        .agg(max("pc")).head
      if (!excludedRow.isNullAt(0)) { // at tiny SF every part can qualify
        val bestExcluded = excludedRow.getLong(0)
        assert(BigInt(bestExcluded) * nParts * 2 <= BigInt(totalCents) * 3,
          "an excluded part passes the mean-relative threshold")
        assert(bestExcluded <= floor)
      }
    }
  }

  describe("q_lapsed_balance") {
    lazy val rows = Relational.qLapsedBalance(spark, sfDir).collect()

    it("reconciles with an independent per-customer recount") {
      val cust = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey").cast("long"),
          round(col("c_acctbal") * 100).cast("long").as("bc"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val pos = cust.map(_._3).filter(_ > 0)
      val (sumPos, nPos) = (pos.sum, pos.length.toLong)
      val recent = Tables.orders(spark, sfDir)
        .filter(year(col("o_orderdate")) === 1998)
        .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
      val expected = cust
        .filter { case (k, _, bc) => bc * nPos > sumPos && !recent.contains(k) }
        .groupBy(_._2).view
        .mapValues(cs => (cs.length.toLong, cs.map(_._3).sum)).toMap
      assert(rows.nonEmpty, "vacuous: no lapsed customers")
      assert(rows.length == expected.size)
      rows.foreach { r =>
        val nation = r.getAs[Number](0).longValue
        val (n, cents) = expected(nation)
        assert(r.getLong(1) == n, s"nation $nation count")
        assert(math.round(r.getDouble(2) * 100) == cents,
          s"nation $nation balance")
      }
    }
  }

  describe("q_reident_risk") {
    lazy val rows = Privacy.qReidentRisk(spark, sfDir).collect()

    it("emits one row per generalization level with coherent risk bounds") {
      assert(rows.length == Privacy.ANON_BANDS.length)
      rows.foreach { r =>
        val (nGroups, minSz, nUnique) =
          (r.getLong(1), r.getLong(2), r.getLong(3))
        val (uniqFrac, prosecutor, marketer) =
          (r.getDouble(4), r.getDouble(5), r.getDouble(6))
        assert(minSz >= 1 && nUnique <= nGroups)
        assert(prosecutor == BigDecimal(1.0 / minSz)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        // marketer risk (avg 1/sz) is bounded by the worst-case record;
        // both sides carry independent 6dp rounding, hence the 2e-6 slack
        assert(marketer <= prosecutor + 2e-6)
        assert(uniqFrac <= marketer + 2e-6,
          "unique mass cannot exceed expected re-identification rate")
      }
    }

    it("coarser bands never increase group count") {
      // ANON_BANDS is ordered by widening band width
      val byLevel = rows.sortBy(_.getInt(0)).map(_.getLong(1))
      assert(byLevel.zip(byLevel.tail).forall { case (a, b) => b <= a })
    }
  }

  describe("q_vocab_coverage") {
    lazy val rows = TextAnalysis.qVocabCoverage(spark, sfDir).collect()

    it("token totals reconcile with a direct corpus count") {
      val direct = Tables.documents(spark, sfDir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n"))
        .groupBy("source").agg(sum("n").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(1) == direct(r.getString(0)),
          s"source ${r.getString(0)} token count")
      }
    }

    it("OOV mass excludes exactly the top-V corpus vocabulary") {
      val vocab = Tables.documents(spark, sfDir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").count()
        .orderBy(desc("count"), col("tok"))
        .limit(TextAnalysis.VOCAB_V)
        .collect().map(_.getString(0)).toSet
      val oovDirect = Tables.documents(spark, sfDir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(!col("tok").isin(vocab.toSeq: _*))
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.foreach { r =>
        assert(r.getLong(3) == oovDirect.getOrElse(r.getString(0), 0L),
          s"source ${r.getString(0)} oov tokens")
        assert(r.getLong(3) <= r.getLong(1) && r.getLong(4) <= r.getLong(2))
      }
    }
  }

  describe("q_prefix_dup") {
    lazy val rows = TextAnalysis.qPrefixDup(spark, sfDir).collect()

    it("every cluster has >= 2 docs and n_dropped = n_docs - 1") {
      assert(rows.nonEmpty, "vacuous: no prefix clusters")
      rows.foreach { r =>
        assert(r.getLong(1) >= 2)
        assert(r.getLong(3) == r.getLong(1) - 1)
      }
    }

    it("keeper is the minimum doc_id of its cluster, recomputed directly") {
      val byPfx = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          substring(regexp_replace(col("text"), "[^a-z0-9]", ""), 1,
            TextAnalysis.PREFIX_LEN).as("pfx"))
        .collect().groupBy(_.getString(1))
      rows.foreach { r =>
        val members = byPfx(r.getString(0)).map(_.getLong(0))
        assert(members.length.toLong == r.getLong(1))
        assert(members.min == r.getLong(2))
      }
    }
  }

  describe("q_neg_sampling") {
    lazy val rows = TextAnalysis.qNegSampling(spark, sfDir).collect()

    it("weights follow the 3/4-power law of the raw counts exactly") {
      assert(rows.length == TextAnalysis.NEG_TOP)
      rows.foreach { r =>
        val c = r.getLong(1).toDouble
        assert(r.getLong(2) == math.round(math.sqrt(c * math.sqrt(c)) * 1e6),
          s"token ${r.getString(0)} smoothed weight")
      }
    }

    it("probabilities are a descending sub-distribution") {
      val ps = rows.map(_.getDouble(3))
      assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
      assert(ps.sum <= 1.0 + 1e-6)
      assert(ps.forall(p => p > 0 && p < 1))
    }
  }

  describe("q_corpus_diversity") {
    lazy val rows = TextAnalysis.qCorpusDiversity(spark, sfDir).collect()

    it("indices are internally consistent per source") {
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (nToks, nTypes) = (r.getLong(1), r.getLong(2))
        val (ttr, simpson, gini, inv) =
          (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
        assert(nTypes <= nToks)
        assert(math.abs(ttr - nTypes.toDouble / nToks) < 1e-6)
        assert(math.abs(gini - (1.0 - simpson)) < 2e-6,
          "gini-simpson must complement simpson")
        assert(simpson > 0 && simpson < 1)
        // inverse-Simpson is the reciprocal of the (unbiased) Simpson
        // index; it can slightly EXCEED the type count (the unbiased
        // sum c(c-1) undershoots the plug-in sum c^2), so pin the
        // reciprocal identity instead of a K bound
        assert(inv >= 1.0)
        assert(math.abs(inv * simpson - 1.0) < 1e-3)
      }
    }

    it("simpson matches a driver-side recount on one source") {
      val src = rows.head.getString(0)
      val counts = Tables.documents(spark, sfDir)
        .filter(col("source") === src)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").count().collect().map(_.getLong(1))
      val n = counts.sum
      val pairs = counts.map(c => BigInt(c) * BigInt(c - 1)).sum
      val expected = BigDecimal(pairs) / (BigDecimal(n) * BigDecimal(n - 1))
      assert(math.abs(rows.head.getDouble(4) - expected.toDouble) < 1e-6)
    }
  }
}
