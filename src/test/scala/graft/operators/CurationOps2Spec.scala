package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Driver-side replays and plan shape for the chunking / attribution /
  * group-k-fold / knn-outlier additions.
  */
class CurationOps2Spec extends AnyFunSpec with SparkTestBase {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  describe("q_chunk_overlap") {

    it("matches a driver-side sliding-window chunker doc for doc") {
      val (w, st) = (Pipeline.CHUNK_W, Pipeline.CHUNK_STRIDE)
      val expected = Tables.documents(spark, sfDir)
        .select("doc_id", "text").collect()
        .flatMap { r =>
          val toks = r.getString(1).split(" ", -1)
          val nc = 1 + (math.max(toks.length - w, 0) + st - 1) / st
          (0 until nc).map { i =>
            val sl = toks.slice(i * st, i * st + w)
            (r.getLong(0), i, i * st, sl.length.toLong, md5Hex(sl.mkString(" ")))
          }
        }.toSet
      val got = Pipeline.qChunkOverlap(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4)))
        .toSet
      assert(got == expected)
    }

    it("reconstructs every document: chunks tile with exactly W-stride overlap") {
      val (w, st) = (Pipeline.CHUNK_W, Pipeline.CHUNK_STRIDE)
      val byDoc = Pipeline.qChunkOverlap(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .groupBy(_._1)
      val nDocs = Tables.documents(spark, sfDir).count()
      assert(byDoc.size == nDocs, "every doc chunked")
      byDoc.values.foreach { chunks =>
        val sorted = chunks.sortBy(_._2)
        assert(sorted.head._3 == 0, "first chunk starts at token 0")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(b._3 == a._3 + st, "starts advance by the stride")
            assert(a._3 + a._4 >= b._3, "consecutive chunks overlap or touch")
          case _ =>
        }
        // full chunks carry exactly W tokens; only the last may be short
        sorted.init.foreach(c => assert(c._4 == w))
      }
    }

    it("chunking itself needs no shuffle (only the presentation sort exchanges)") {
      val plan = Pipeline.qChunkOverlap(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "no hash exchange anywhere in the chunker")
    }
  }

  describe("q_attribution") {

    it("matches a driver-side journey replay under both credit models") {
      // read ordering key through the normalized loader (physical ts type
      // has shifted across data generations: nanos LONG vs TIMESTAMP)
      val evs = EventOps.events(spark, sfDir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val touchesBySeg = evs.groupBy(_._1).values.flatMap { userEvs =>
        val ordered = userEvs.sortBy(e => (e._3, e._2))
        var seg = 0L
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, String, Long, Long)]()
        val closed = scala.collection.mutable.Set[(Long, Long)]()
        ordered.foreach { e =>
          if (e._4 == "purchase") { closed += ((e._1, seg)); seg += 1 }
          else out += ((e._1, seg, e._4, e._3, e._2))
        }
        out.filter(t => closed((t._1, t._2)))
      }.toSeq.groupBy(t => (t._1, t._2))
      val expected = scala.collection.mutable.Map[String, (Long, Long, BigDecimal)]()
        .withDefaultValue((0L, 0L, BigDecimal(0)))
      touchesBySeg.values.foreach { seg =>
        val n = seg.length
        val credit = BigDecimal(1.0 / n).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        val last = seg.maxBy(t => (t._4, t._5))
        seg.foreach { t =>
          val (nt, lt, lin) = expected(t._3)
          expected(t._3) = (nt + 1, lt + (if (t eq last) 1L else 0L), lin + credit)
        }
      }
      val got = EventOps.qAttribution(spark, sfDir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got.keySet == expected.keySet)
      got.foreach { case (t, (nt, lt, lin)) =>
        val (ent, elt, elin) = expected(t)
        assert(nt == ent, s"$t n_touch")
        assert(lt == elt, s"$t last_touch")
        assert(math.abs(lin - elin.toDouble) < 1e-9, s"$t linear")
      }
    }

    it("credit conservation: linear credit sums to the closed-conversion count") {
      val rows = EventOps.qAttribution(spark, sfDir).collect()
      val totalLinear = rows.map(_.getDouble(3)).sum
      val lastTouches = rows.map(_.getLong(2)).sum
      // one unit of linear credit and exactly one last-touch per credited journey
      assert(lastTouches > 0)
      assert(math.abs(totalLinear - lastTouches) < 1e-4,
        "sum of per-touch 1/n credits = number of credited journeys")
    }
  }

  describe("q_group_kfold") {

    it("folds partition the orders and groups never straddle folds") {
      val rows = MlPrep.qGroupKfold(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      assert(rows.map(_._1).toSeq == (0L until MlPrep.KFOLD).toSeq)
      val nOrders = Tables.orders(spark, sfDir).count()
      assert(rows.map(_._2).sum == nOrders, "orders partitioned")
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4, "revenue shares sum to 1")
      // exclusivity: each customer maps to exactly one fold by construction
      import graft.functions.HashFns.h60
      val straddlers = Tables.orders(spark, sfDir)
        .select(col("o_custkey"),
          (h60(concat(lit("fold:"), col("o_custkey").cast("string"))) % MlPrep.KFOLD).as("fold"))
        .groupBy("o_custkey").agg(countDistinct("fold").as("nf"))
        .filter(col("nf") > 1).count()
      assert(straddlers == 0)
      // balance: hash assignment keeps folds within a sane band
      val shares = rows.map(_._2.toDouble / nOrders)
      assert(shares.min > 0.5 / MlPrep.KFOLD && shares.max < 2.0 / MlPrep.KFOLD)
    }
  }

  describe("q_knn_outlier") {

    it("matches a driver-side k-th-neighbor scan within the same cells") {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cent = Similarity.trainedCentroids(spark, e)
      val assigned = Similarity.assignCells(spark, e, cent).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / math.sqrt(na * nb)
      }
      def r9(x: Double): Double =
        BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expected = assigned.groupBy(_._2).values.flatMap { cell =>
        cell.map { a =>
          val nbs = cell.filter(_._1 != a._1)
            .map(b => (-r9(cos(a._3, b._3)), b._1)).sorted
          (a._1, nbs)
        }.collect { case (id, nbs) if nbs.length >= Similarity.OUT_K =>
          val kth = nbs(Similarity.OUT_K - 1)
          (id, BigDecimal(-kth._1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }.toSeq.sortBy(t => (t._2, t._1)).take(10)
      val got = Similarity.qKnnOutlier(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(got == expected)
    }

    it("reported outliers are less central than the corpus median vector") {
      val out = Similarity.qKnnOutlier(spark, sfDir).collect().map(_.getDouble(2))
      assert(out.nonEmpty && out.forall(_ < 1.0))
      assert(out.toSeq == out.sorted.toSeq, "ascending isolation order")
    }
  }
}
